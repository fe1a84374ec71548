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
  * set, persisted as a parquet store — linear in distinct corpus
  * grams (8 B each in the default hashed mode), never in documents, and
  * shared/restartable because it is plain storage, not driver memory.
  *
  * Store layout — compacted base + recent deltas (the LSM shape):
  *  - `compacted_upto_<n>/`: ONE bucketed-by-gram table holding the
  *    distinct grams of all batches < n, registered in the catalog so
  *    the scan reports its hash-partitioning. The per-batch probe's
  *    semi-join therefore NEVER shuffles the base — only the (tiny)
  *    batch postings move to meet it — where a flat store would
  *    re-exchange the whole accumulated gram set every batch, a cost
  *    that grows with corpus age rather than batch size.
  *  - `batch=<id>/`: per-batch delta directories of batches not yet
  *    compacted (at most `compactEvery`). Small; the probe's planner
  *    broadcasts them.
  *  Every `compactEvery` batches the deltas fold into a NEW
  *  `compacted_upto_` version with `distinct()` — so the store is
  *  sub-linear in repeated content (a boilerplate passage recrawled
  *  daily stores its grams once, not once per day) and bounded by the
  *  corpus's distinct-gram count.
  *
  * Each batch appends only its OWN new gram files; the probe pins the
  * strictly-prior store state, so a batch can never match its own grams
  * regardless of evaluation order — the strictly-prior-corpus contract
  * of `Dedup.duplicateSpansAgainst`, extended through time.
  * (Intra-batch duplication is a separate, batch-local question: run
  * `Dedup.duplicateSpans` on the batch if you also want it.)
  */
object StreamingSpanDedup {

  /** Driver-held handle on the gram store. `hashGrams = true` (default)
    * stores xxhash64 longs — the scale mode; `false` stores gram strings
    * (engine-portable, e.g. for an external-oracle audit of the output).
    * `numBuckets` must be stable across restarts of the same store (it
    * is the physical layout of the compacted base).
    */
  final class SpanDeduper(spark: SparkSession, storePath: String,
                          idCol: String, textCol: String, k: Int = 5,
                          hashGrams: Boolean = true,
                          compactEvery: Int = 8, numBuckets: Int = 32) {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")

    private def fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private val gramSqlType = if (hashGrams) "BIGINT" else "STRING"

    /** Catalog identity of a compacted version: derived from the store
      * PATH (two dedupers on one store share tables; different stores —
      * e.g. parallel test suites — never collide).
      */
    private val tablePrefix = {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(storePath.getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
      s"graft_gram_store_$digest"
    }
    private def tableName(upTo: Long) = s"${tablePrefix}_upto_$upTo"
    private def compactedDir(upTo: Long) = s"$storePath/compacted_upto_$upTo"

    /** Compacted versions ON DISK (the source of truth — the catalog is
      * session-scoped and empty after a restart), newest first.
      */
    private def compactedVersions(): Seq[Long] = {
      val dir = new Path(storePath)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("compacted_upto_"))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripPrefix("compacted_upto_").toLong).toOption)
        .sorted(Ordering[Long].reverse)
    }

    /** The newest compacted base covering only batches strictly below
      * `batchId`, (re-)registered in the catalog so its scan reports the
      * bucket partitioning (after a restart the files exist but the
      * session catalog does not know them — the DDL restores the bucket
      * spec, which is why `numBuckets` must be restart-stable).
      */
    private def baseFor(batchId: Long): Option[(Long, DataFrame)] =
      compactedVersions().find(_ <= batchId).map { upTo =>
        val name = tableName(upTo)
        if (!spark.catalog.tableExists(name)) {
          spark.sql(
            s"""CREATE TABLE IF NOT EXISTS $name (gram $gramSqlType)
               |USING parquet
               |CLUSTERED BY (gram) SORTED BY (gram) INTO $numBuckets BUCKETS
               |LOCATION '${compactedDir(upTo)}'""".stripMargin)
        }
        upTo -> spark.table(name)
      }

    /** Parquet files of delta batches with id in [from, until) — the
      * not-yet-compacted slice of the strictly-prior store.
      */
    private def deltaFiles(from: Long, until: Long): Seq[String] = {
      val dir = new Path(storePath)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter { s =>
          val name = s.getPath.getName
          s.isDirectory && name.startsWith("batch=") &&
            scala.util.Try(name.stripPrefix("batch=").toLong).toOption
              .exists(id => id >= from && id < until)
        }
        .flatMap(d => fs.listStatus(d.getPath).toSeq)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    }

    /** Fold deltas [c, batchId) into a new compacted version when due.
      * Idempotent under foreachBatch retry: the new version writes with
      * overwrite to a name derived from `batchId`, and once it exists
      * the `batchId - c` gap is 0 so a retry compacts nothing. Cleanup
      * (old versions, folded deltas) runs AFTER the new version commits,
      * so a crash mid-compaction leaves a readable store: the next call
      * just sees the newest complete version.
      */
    private def maybeCompact(batchId: Long): Unit = {
      val base = baseFor(batchId)
      val c = base.map(_._1).getOrElse(0L)
      if (batchId - c < compactEvery) return
      val deltas = deltaFiles(c, batchId)
      val parts = base.map(_._2).toSeq ++
        (if (deltas.isEmpty) Seq.empty else Seq(spark.read.parquet(deltas: _*)))
      if (parts.isEmpty) return
      parts.reduce(_ unionByName _).distinct()
        .write.mode("overwrite")
        .bucketBy(numBuckets, "gram").sortBy("gram")
        .option("path", compactedDir(batchId))
        .format("parquet")
        .saveAsTable(tableName(batchId))
      // cleanup: folded deltas and superseded versions (files + catalog)
      (c until batchId).foreach { id =>
        fs.delete(new Path(s"$storePath/batch=$id"), true)
      }
      compactedVersions().filter(_ < batchId).foreach { old =>
        spark.sql(s"DROP TABLE IF EXISTS ${tableName(old)}")
        fs.delete(new Path(compactedDir(old)), true)
      }
    }

    /** The strictly-prior store as probe PARTS (compacted base first,
      * then the delta slice) — also the audit surface for store-size
      * assertions.
      */
    def storeParts(batchId: Long): Seq[DataFrame] = {
      val base = baseFor(batchId)
      val from = base.map(_._1).getOrElse(0L)
      val files = deltaFiles(from, batchId)
      base.map(_._2).toSeq ++
        (if (files.isEmpty) Seq.empty else Seq(spark.read.parquet(files: _*)))
    }

    /** Probe `batch` against the strictly-prior store, write the batch's
      * grams under its own `batch=<id>` directory (overwrite →
      * retry-idempotent), and return the spans frame tagged with the
      * batch id. Compaction, when due, runs BEFORE the probe and folds
      * only batches < batchId — the strictly-prior contract is untouched.
      */
    def update(batch: DataFrame, batchId: Long): DataFrame = synchronized {
      maybeCompact(batchId)
      val gramType = if (hashGrams) "bigint" else "string"
      val parts = storeParts(batchId) match {
        case Seq() =>
          Seq(spark.range(0).select(col("id").cast(gramType).as("gram")))
        case ps => ps
      }
      val spans = Dedup.duplicateSpansAgainstGramParts(
          batch, parts, idCol, textCol, k, hashGrams)
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
