package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Dedup

/** Continuous corpus-frequency boilerplate strip: each micro-batch drops
  * every line whose CUMULATIVE distinct-document count — all prior
  * batches plus this one — has reached `minDocs`, and re-emits the
  * batch's documents rebuilt from the surviving lines. The continuous
  * form of [[graft.ext.Dedup.stripBoilerplate]] (q128's policy) running
  * at ingest time: template chrome is recognized the moment enough
  * documents have shipped it, without ever re-scanning the corpus.
  *
  * State = the accumulated (norm_key, n_docs) frequency store in a
  * [[KeyedBatchStore]] in `countCol` sum-merge mode: linear in DISTINCT
  * corpus lines (8 B keys in hashed mode), never in documents;
  * compaction folds per-batch counts into one row per line, so a line
  * recrawled every batch costs one store row, not one per crawl.
  *
  * Unlike the dedup siblings, a batch's decision INCLUDES its own
  * counts — a line shipped by `minDocs` documents inside one batch is
  * exactly as worthless as one spread over three — so a single-batch
  * run reproduces the batch operator verbatim. What stays
  * strictly-prior is the STORE: each batch appends only its own counts
  * and reads accumulated state from batches strictly before it, which
  * keeps `update` retry-idempotent (a replayed batch overwrites its own
  * delta, it can never double-count itself). Documents of earlier
  * batches are not retroactively re-stripped — the stream already
  * emitted them; the line disappears from every batch at and after the
  * threshold crossing.
  */
object StreamingBoilerplate {

  /** Driver-held handle on the counting line store. `hashKeys = true`
    * (default) stores xxhash64 longs — the scale mode, where a hash
    * collision can only cause an extra drop; `false` stores normalized
    * line strings (engine-portable, for external-oracle audits).
    * `numBuckets` must be restart-stable for the same store.
    */
  final class BoilerplateStripper(spark: SparkSession, storePath: String,
                                  idCol: String, textCol: String,
                                  minDocs: Int = 3, sep: String = "\n",
                                  hashKeys: Boolean = true,
                                  compactEvery: Int = 8,
                                  numBuckets: Int = 32) {
    private val store = new KeyedBatchStore(spark, storePath, "norm_key",
      if (hashKeys) "BIGINT" else "STRING", compactEvery, numBuckets,
      countCol = Some("n_docs"))

    /** The strictly-prior store as probe parts — the audit surface for
      * store-size assertions.
      */
    def storeParts(batchId: Long): Seq[DataFrame] = store.parts(batchId)

    /** Strip `batch` against the cumulative counts (strictly-prior
      * store + the batch's own), append the batch's own per-line
      * distinct-document counts (overwrite → retry-idempotent), and
      * return the rebuilt documents tagged with the batch id.
      * Compaction, when due, runs BEFORE the probe and sum-merges only
      * batches < batchId.
      *
      * CONTRACT: the returned frame still reads the strictly-prior
      * store's files, which a LATER update's compaction deletes —
      * consume it (write / collect / localCheckpoint) before calling
      * update again, as a foreachBatch sink naturally does.
      */
    def update(batch: DataFrame, batchId: Long): DataFrame = synchronized {
      store.maybeCompact(batchId)
      val (docs, counts) = Dedup.stripBoilerplateAndCounts(
        batch, store.parts(batchId), idCol, textCol, minDocs, sep, hashKeys)
      val out = docs.select(lit(batchId).as("batch_id"), col(idCol),
        col("clean_text"), col("n_paras"), col("n_kept"))
      store.append(counts, batchId)
      out
    }

    /** foreachBatch adapter: hand each batch's stripped docs to `sink`. */
    def asForeachBatch(sink: DataFrame => Unit): (DataFrame, Long) => Unit =
      (batch, id) => sink(update(batch, id))
  }

  /** Attach the continuous strip to a stream: every micro-batch, `sink`
    * receives that batch's documents rebuilt without the lines whose
    * cumulative corpus frequency has reached `minDocs`.
    */
  def start(stream: DataFrame, storePath: String,
            idCol: String, textCol: String, minDocs: Int = 3,
            sep: String = "\n",
            sink: DataFrame => Unit = _ => (),
            queryName: String = "graft-stream-boilerplate",
            checkpoint: Option[String] = None): StreamingQuery = {
    val stripper = new BoilerplateStripper(stream.sparkSession, storePath,
      idCol, textCol, minDocs, sep)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(stripper.asForeachBatch(sink))
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Batch replay — the oracle-gateable twin: fold `batches` in order
    * through the same store code and union the per-batch outputs. Uses
    * string keys so the output is replicable by an external SQL engine.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, idCol: String, textCol: String,
              minDocs: Int = 3, sep: String = "\n"): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val stripper = new BoilerplateStripper(spark, storePath, idCol,
      textCol, minDocs, sep, hashKeys = false)
    batches.zipWithIndex
      // localCheckpoint per batch: update's contract requires each
      // output consumed before the next update — a later compaction
      // deletes the store files a lazy plan would still reference
      .map { case (b, i) => stripper.update(b, i.toLong).localCheckpoint() }
      .reduce(_.unionByName(_))
  }
}
