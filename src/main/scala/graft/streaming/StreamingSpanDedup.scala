package graft.streaming

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
    * is the physical layout of the compacted base). Store mechanics
    * (LSM layout, compaction, retry-idempotence) live in the shared
    * [[KeyedBatchStore]].
    */
  final class SpanDeduper(spark: SparkSession, storePath: String,
                          idCol: String, textCol: String, k: Int = 5,
                          hashGrams: Boolean = true,
                          compactEvery: Int = 8, numBuckets: Int = 32) {

    private val store = new KeyedBatchStore(spark, storePath, "gram",
      if (hashGrams) "BIGINT" else "STRING", compactEvery, numBuckets)

    /** The strictly-prior store as probe PARTS (compacted base first,
      * then the delta slice) — also the audit surface for store-size
      * assertions.
      */
    def storeParts(batchId: Long): Seq[DataFrame] = store.parts(batchId)

    /** Probe `batch` against the strictly-prior store, write the batch's
      * grams under its own `batch=<id>` directory (overwrite →
      * retry-idempotent), and return the spans frame tagged with the
      * batch id. Compaction, when due, runs BEFORE the probe and folds
      * only batches < batchId — the strictly-prior contract is untouched.
      *
      * CONTRACT: the returned frame still reads the strictly-prior
      * store's files, which a LATER update's compaction deletes —
      * consume it (write / collect / localCheckpoint) before calling
      * update again, as a foreachBatch sink naturally does.
      */
    def update(batch: DataFrame, batchId: Long): DataFrame = synchronized {
      store.maybeCompact(batchId)
      val gramType = if (hashGrams) "bigint" else "string"
      val parts = store.parts(batchId) match {
        case Seq() =>
          Seq(spark.range(0).select(col("id").cast(gramType).as("gram")))
        case ps => ps
      }
      // the probe and the store append share one checkpointed postings
      // frame — a single scan/canonicalize/gram pass per batch
      val (spans0, grams) = Dedup.spanDedupAndGrams(
        batch, parts, idCol, textCol, k, hashGrams)
      val spans = spans0
        .select(lit(batchId).as("batch_id"), col(idCol),
          col("span_start"), col("span_end"), col("n_grams"))
      store.append(grams, batchId)
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
      // localCheckpoint per batch: update's contract requires each
      // output consumed before the next update — a later compaction
      // deletes the store files a lazy plan would still reference
      .map { case (b, i) => deduper.update(b, i.toLong).localCheckpoint() }
      .reduce(_.unionByName(_))
  }
}
