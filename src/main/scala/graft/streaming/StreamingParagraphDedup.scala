package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Dedup

/** Streaming paragraph-level dedup: each micro-batch keeps only the
  * paragraphs never seen before — not in any PRIOR batch (the
  * accumulated store) and not earlier within the batch itself — and
  * re-emits its documents rebuilt from the surviving paragraphs (the
  * continuous form of `Dedup.paragraphDedupIncremental`, the
  * boilerplate killer running at ingest time).
  *
  * State = the accumulated DISTINCT normalized-paragraph key set in a
  * [[KeyedBatchStore]] (bucketed compacted base + per-batch deltas):
  * linear in distinct corpus paragraphs — 8 B each in hashed mode —
  * never in documents; the per-batch anti-join probes the base without
  * shuffling it, and recrawled boilerplate stores its key once, not
  * once per crawl.
  *
  * Each batch appends only its OWN keys and probes the strictly-prior
  * store state, so a batch can never suppress its own first
  * occurrences regardless of evaluation order — the same
  * strictly-prior contract as [[StreamingSpanDedup]].
  */
object StreamingParagraphDedup {

  /** Driver-held handle on the paragraph store. `hashKeys = true`
    * (default) stores xxhash64 longs — the scale mode, where a hash
    * collision can only cause an extra drop; `false` stores normalized
    * paragraph strings (engine-portable, for external-oracle audits).
    * `numBuckets` must be restart-stable for the same store.
    */
  final class ParagraphDeduper(spark: SparkSession, storePath: String,
                               idCol: String, textCol: String,
                               sep: String = "\n",
                               hashKeys: Boolean = true,
                               compactEvery: Int = 8, numBuckets: Int = 32) {

    private val store = new KeyedBatchStore(spark, storePath, "norm_key",
      if (hashKeys) "BIGINT" else "STRING", compactEvery, numBuckets)

    /** The strictly-prior store as probe parts — the audit surface for
      * store-size assertions.
      */
    def storeParts(batchId: Long): Seq[DataFrame] = store.parts(batchId)

    /** Dedup `batch` against the strictly-prior store, append the
      * batch's own paragraph keys (overwrite → retry-idempotent), and
      * return the rebuilt documents tagged with the batch id.
      * Compaction, when due, runs BEFORE the probe and folds only
      * batches < batchId. The probe and the key append share one
      * checkpointed exploded frame (one scan per batch), and the keys
      * carry only documents the probe can emit — a null-id document
      * never seeds the store, so its content is never suppressed
      * unseen.
      *
      * CONTRACT: the returned frame still reads the strictly-prior
      * store's files, which a LATER update's compaction deletes —
      * consume it (write / collect / localCheckpoint) before calling
      * update again, as a foreachBatch sink naturally does.
      */
    def update(batch: DataFrame, batchId: Long): DataFrame = synchronized {
      store.maybeCompact(batchId)
      val (docs, keys) = Dedup.paragraphDedupAndKeys(
        batch, store.parts(batchId), idCol, textCol, sep, hashKeys)
      val out = docs.select(lit(batchId).as("batch_id"), col(idCol),
        col("clean_text"), col("n_paras"), col("n_kept"))
      store.append(keys, batchId)
      out
    }

    /** foreachBatch adapter: hand each batch's rebuilt docs to `sink`. */
    def asForeachBatch(sink: DataFrame => Unit): (DataFrame, Long) => Unit =
      (batch, id) => sink(update(batch, id))
  }

  /** Attach paragraph dedup to a stream: every micro-batch, `sink`
    * receives that batch's documents rebuilt from never-seen-before
    * paragraphs.
    */
  def start(stream: DataFrame, storePath: String,
            idCol: String, textCol: String, sep: String = "\n",
            sink: DataFrame => Unit,
            queryName: String = "graft-stream-paragraph-dedup",
            checkpoint: Option[String] = None): StreamingQuery = {
    val deduper = new ParagraphDeduper(stream.sparkSession, storePath,
      idCol, textCol, sep)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(deduper.asForeachBatch(sink))
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Batch replay — the oracle-gateable twin: fold `batches` in order
    * through the same store code and union the per-batch outputs. Uses
    * string keys so the output is replicable by an external SQL engine.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, idCol: String, textCol: String,
              sep: String = "\n"): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val deduper = new ParagraphDeduper(spark, storePath, idCol, textCol,
      sep, hashKeys = false)
    batches.zipWithIndex
      // localCheckpoint per batch: update's contract requires each
      // output consumed before the next update — a later compaction
      // deletes the store files a lazy plan would still reference
      .map { case (b, i) => deduper.update(b, i.toLong).localCheckpoint() }
      .reduce(_.unionByName(_))
  }
}
