package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Dedup

/** Streaming duplicated-substring spans: each micro-batch is probed
  * against the grams of everything that ARRIVED BEFORE it (span-level
  * continuous dedup — flag the re-crawled boilerplate passage the moment
  * it re-enters the pipeline), then contributes its own grams to the
  * store for future batches.
  *
  * State design: the cross-batch state is the accumulated DISTINCT gram
  * set, persisted as a parquet directory — linear in distinct corpus
  * grams (8 B each in the default hashed mode), never in documents, and
  * shared/restartable because it is a plain table, not driver memory.
  * Each batch appends only its OWN new gram files; the probe pins the
  * file list that existed when the batch began, so a batch can never
  * match its own grams regardless of evaluation order — the
  * strictly-prior-corpus contract of `Dedup.duplicateSpansAgainst`,
  * extended through time. (Intra-batch duplication is a separate,
  * batch-local question: run `Dedup.duplicateSpans` on the batch if you
  * also want it.)
  */
object StreamingSpanDedup {

  /** Driver-held handle on the gram store. `hashGrams = true` (default)
    * stores xxhash64 longs — the scale mode; `false` stores gram strings
    * (engine-portable, e.g. for an external-oracle audit of the output).
    */
  final class SpanDeduper(spark: SparkSession, storePath: String,
                          idCol: String, textCol: String, k: Int = 5,
                          hashGrams: Boolean = true) {

    /** Store layout: one `batch=<id>/` parquet directory per micro-batch.
      * The probe reads only directories with a STRICTLY SMALLER batch id,
      * and each batch OVERWRITES its own directory — so a foreachBatch
      * RETRY of batch n is idempotent (its first, partial attempt cannot
      * leak into its own probe, and its grams are written exactly once),
      * and the strictly-prior contract holds by construction rather than
      * by timing.
      */
    private def priorGramFiles(batchId: Long): Seq[String] = {
      val dir = new Path(storePath)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter { s =>
          val name = s.getPath.getName
          s.isDirectory && name.startsWith("batch=") &&
            scala.util.Try(name.stripPrefix("batch=").toLong).toOption
              .exists(_ < batchId)
        }
        .flatMap(d => fs.listStatus(d.getPath).toSeq)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    }

    /** Probe `batch` against the strictly-prior store, write the batch's
      * grams under its own `batch=<id>` directory (overwrite →
      * retry-idempotent), and return the spans frame tagged with the
      * batch id.
      */
    def update(batch: DataFrame, batchId: Long): DataFrame = synchronized {
      val files = priorGramFiles(batchId)
      val gramType = if (hashGrams) "bigint" else "string"
      val store =
        if (files.isEmpty)
          spark.range(0).select(col("id").cast(gramType).as("gram"))
        else spark.read.parquet(files: _*)
      val spans = Dedup.duplicateSpansAgainstGrams(
          batch, store, idCol, textCol, k, hashGrams)
        .select(lit(batchId).as("batch_id"), col(idCol),
          col("span_start"), col("span_end"), col("n_grams"))
      Dedup.corpusGrams(batch, textCol, k, hashGrams).distinct()
        .write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
      spans
    }

    /** foreachBatch adapter: hand each batch's spans to `sink`. */
    def asForeachBatch(sink: DataFrame => Unit): (DataFrame, Long) => Unit =
      (batch, id) => sink(update(batch, id))
  }

  /** Attach span dedup to a stream: every micro-batch, `sink` receives
    * the spans of that batch found in the strictly-prior corpus.
    */
  def start(stream: DataFrame, storePath: String,
            idCol: String, textCol: String, k: Int = 5,
            sink: DataFrame => Unit,
            queryName: String = "graft-stream-span-dedup",
            checkpoint: Option[String] = None): StreamingQuery = {
    val deduper = new SpanDeduper(stream.sparkSession, storePath,
      idCol, textCol, k)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(deduper.asForeachBatch(sink))
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Batch replay — the oracle-gateable twin (the StreamingProfile
    * idiom): fold `batches` in order through the same store code and
    * union the per-batch span frames. Uses string grams so the output is
    * replicable by an external SQL engine.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, idCol: String, textCol: String,
              k: Int = 5): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val deduper = new SpanDeduper(spark, storePath, idCol, textCol, k,
      hashGrams = false)
    batches.zipWithIndex
      .map { case (b, i) => deduper.update(b, i.toLong) }
      .reduce(_.unionByName(_))
  }
}
