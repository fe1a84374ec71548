package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous heavy-hitters: cumulative per-key counts over a keyed
  * stream, queryable as an exact top-k at any batch boundary — the
  * ingest-side frequency monitor (hot URLs / domains / tokens) every
  * crawl pipeline runs next to its dedup stores.
  *
  * State is a [[KeyedBatchStore]] in `countCol` sum-merge mode: each
  * micro-batch appends its OWN per-key partial counts (one aggregated
  * skinny frame — the batch never rewrites history) and compaction
  * folds deltas so a key seen in every batch costs one store row, not
  * one per batch. Exactness with no sketch: unlike count-min /
  * SpaceSaving this stores every distinct key — the right trade when
  * the key domain is bounded (domains, event types, canonical hosts);
  * a truly unbounded domain belongs in the sketch operators (q22/q39).
  *
  * The top-k itself is `TakeOrderedAndProject` over the store scan —
  * per-partition heaps then one k-row merge, never a global sort — with
  * the deterministic (count DESC, key ASC) tiebreak so results are
  * stable across partitionings and replayable by an external engine.
  *
  * Retry-idempotent: a replayed batch overwrites its own `batch=<id>`
  * delta (the [[KeyedBatchStore]] contract), so foreachBatch retries
  * can never double-count.
  */
object StreamingTopK {

  /** Driver-held handle on the counting store. */
  final class TopKCounter(spark: SparkSession, storePath: String,
                          keyCol: String,
                          compactEvery: Int = 8, numBuckets: Int = 32) {
    private val store = new KeyedBatchStore(spark, storePath, keyCol,
      "STRING", compactEvery, numBuckets, countCol = Some("n"))

    /** Append one batch's per-key counts (null keys dropped). */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      store.maybeCompact(batchId)
      store.append(batch
        .filter(col(keyCol).isNotNull)
        .groupBy(col(keyCol))
        .agg(count(lit(1)).cast("long").as("n")), batchId)
    }

    /** Store parts strictly below `batchId` — the audit surface. */
    def storeParts(batchId: Long): Seq[DataFrame] = store.parts(batchId)

    /** Exact top-k over everything in batches < `uptoBatch`. */
    def topK(k: Int, uptoBatch: Long): DataFrame = {
      require(k >= 1, s"k must be >= 1, got $k")
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.groupBy(col(keyCol))
          .agg(sum(col("n")).cast("long").as("n_total"))
          .orderBy(col("n_total").desc, col(keyCol).asc)
          .limit(k))
        .getOrElse(spark.sql(
          s"SELECT CAST(NULL AS STRING) AS $keyCol, " +
            "CAST(NULL AS BIGINT) AS n_total WHERE FALSE"))
    }

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (batch, id) => update(batch, id)
  }

  /** Attach the counter to a stream; query `counter.topK` between/after
    * batches.
    */
  def start(stream: DataFrame, storePath: String, keyCol: String,
            queryName: String = "graft-stream-topk",
            checkpoint: Option[String] = None): (StreamingQuery, TopKCounter) = {
    val counter = new TopKCounter(stream.sparkSession, storePath, keyCol)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(counter.asForeachBatch)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    (writer.start(), counter)
  }

  /** Batch replay — the oracle-gateable twin: fold `batches` in order,
    * then the final top-k, which must equal the one-shot group-count
    * top-k over the concatenation.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, keyCol: String, k: Int): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val counter = new TopKCounter(spark, storePath, keyCol)
    batches.zipWithIndex.foreach { case (b, i) => counter.update(b, i.toLong) }
    counter.topK(k, batches.length.toLong)
  }
}
