package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous uniform k-sample of an unbounded keyed stream — the
  * bottom-k reservoir: every identity gets the deterministic priority
  * `md5(key)`, and the reservoir at any batch boundary is the k keys
  * with the smallest priority seen so far. Uniform over distinct
  * identities, batch-split INVARIANT (the global bottom-k is always
  * contained in the union of per-batch bottom-k's — the classic
  * distributed bottom-k merge), and replayable by any engine with md5 —
  * no RNG state, no arrival-order dependence, unlike the textbook
  * Vitter reservoir whose sample depends on stream order and a seed.
  *
  * State: each micro-batch appends only its OWN bottom-k (≤ k rows) to
  * a [[KeyedBatchStore]] in distinct mode, so state is ≤ k · batches
  * rows before compaction folds duplicates — never the stream. The
  * sample itself is `TakeOrderedAndProject` over the store scan
  * (per-partition heaps, one k-row merge — no global sort).
  *
  * Retry-idempotent by the store contract: a replayed batch overwrites
  * its own `batch=<id>` delta, so foreachBatch retries cannot skew the
  * sample.
  */
object StreamingReservoir {

  /** The priority — the module's whole contract (the gate oracle
    * replays exactly this expression).
    */
  def priority(key: Column): Column = md5(key.cast("string"))

  /** Driver-held handle on the reservoir store. */
  final class ReservoirSampler(spark: SparkSession, storePath: String,
                               keyCol: String, keySqlType: String,
                               k: Int, compactEvery: Int = 8,
                               numBuckets: Int = 8) {
    require(k >= 1, s"k must be >= 1, got $k")
    private val store = new KeyedBatchStore(spark, storePath, keyCol,
      keySqlType, compactEvery, numBuckets)

    /** Fold one batch in: only ITS bottom-k can ever enter the global
      * bottom-k, so only those ≤ k keys are stored.
      */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      store.maybeCompact(batchId)
      store.append(batch
        .filter(col(keyCol).isNotNull)
        .select(col(keyCol)).distinct()
        .orderBy(priority(col(keyCol)).asc, col(keyCol).asc)
        .limit(k), batchId)
    }

    /** Store parts strictly below `batchId` — the audit surface. */
    def storeParts(batchId: Long): Seq[DataFrame] = store.parts(batchId)

    /** The reservoir over everything in batches < `uptoBatch`:
      * (key, priority), the k smallest priorities (key asc on the
      * astronomically-unlikely md5 tie).
      */
    def sample(uptoBatch: Long): DataFrame = {
      val parts = store.parts(uptoBatch)
      require(parts.nonEmpty, s"no batches below $uptoBatch in $storePath")
      parts.reduce(_ unionByName _)
        .select(col(keyCol)).distinct()
        .withColumn("priority", priority(col(keyCol)))
        .orderBy(col("priority").asc, col(keyCol).asc)
        .limit(k)
    }
  }

  /** Batch-mode driver for gates/tests: fold `batches` in order, return
    * the final reservoir.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, keyCol: String, keySqlType: String,
              k: Int): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val acc = new ReservoirSampler(spark, storePath, keyCol, keySqlType, k)
    batches.zipWithIndex.foreach { case (b, i) => acc.update(b, i.toLong) }
    acc.sample(batches.length.toLong)
  }
}
