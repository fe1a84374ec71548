package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous CDC upsert — the streaming form of [[graft.ext.Merge]]'s
  * batch latest-wins: a current-state table (one row per key, the
  * newest VERSION of that key ever seen) maintained across micro-
  * batches. The ingest half of every mutable-entity pipeline: user
  * profiles, crawl frontier states, document revisions.
  *
  * Latest-wins is defined by `orderCols` — the winner per key is the
  * row with the MAX (orderCols…) struct, compared lexicographically —
  * and deliberately NOT by arrival: a late-arriving batch carrying an
  * older version must lose to state, which makes the final table a
  * pure function of the union of all rows, independent of how the
  * stream was batched (spec-asserted under randomized splits). Callers
  * make (orderCols) unique per key (append a unique id as the last
  * column) or ties resolve arbitrarily.
  *
  * Scale shape — the part that matters at 100 TB of state: the state
  * table is hash-partitioned into `numBuckets` key buckets on disk,
  * and a micro-batch REWRITES ONLY THE BUCKETS ITS KEYS TOUCH (dynamic
  * partition overwrite; untouched buckets are never read or written).
  * Per batch: one argmax aggregate over the batch, a partition-pruned
  * read of the touched buckets, one merge aggregate bounded by
  * |touched state| + |batch|, one bucket-targeted write. A batch
  * touching k buckets costs O(state/numBuckets · k), not O(state).
  *
  * Retry-idempotence: the merge is associative/idempotent (max), and a
  * replayed batch recomputes exactly the same touched-bucket contents
  * — dynamic overwrite replaces them with identical rows.
  */
object StreamingMerge {

  /** Driver-held handle on the bucketed current-state table. */
  final class StateStore(spark: SparkSession, storePath: String,
                         keyCol: String, orderCols: Seq[String],
                         numBuckets: Int = 32) {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    private val statePath = s"$storePath/state"
    private def fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    private def withBucket(df: DataFrame): DataFrame =
      df.withColumn("__bucket",
        pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int"))

    /** max-by-(orderCols) row per key; input must carry __bucket. */
    private def latestPerKey(df: DataFrame): DataFrame = {
      val payload = df.columns.filter(_ != keyCol)
      df.groupBy(col(keyCol))
        .agg(max_by(struct(payload.map(col).toIndexedSeq: _*),
          struct(orderCols.map(col): _*)).as("__w"))
        .select(col(keyCol) +: payload.map(c => col(s"__w.$c").as(c)): _*)
    }

    /** Merge one batch into the state (latest-wins). */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      val clean = batch.filter(col(keyCol).isNotNull &&
        orderCols.map(col(_).isNotNull).reduce(_ && _))
      val best = latestPerKey(withBucket(clean))
      if (best.isEmpty) return
      val touched = best.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toSeq // bounded by numBuckets
      val merged = if (fs.exists(new Path(statePath))) {
        val existing = spark.read.parquet(statePath)
          .filter(col("__bucket").isin(touched: _*))
          .select(best.columns.map(col).toIndexedSeq: _*)
        latestPerKey(existing.unionByName(best))
      } else best
      merged
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(statePath)
    }

    /** The current-state table (without the bucket column). */
    def current(): DataFrame = {
      require(fs.exists(new Path(statePath)),
        s"state store at $statePath has no batches yet")
      spark.read.parquet(statePath).drop("__bucket")
    }

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (df, id) => update(df, id)
  }

  /** Streaming entry: maintain the state table from a stream. */
  def start(stream: DataFrame, storePath: String, keyCol: String,
            orderCols: Seq[String], numBuckets: Int = 32): StreamingQuery = {
    val store = new StateStore(stream.sparkSession, storePath, keyCol,
      orderCols, numBuckets)
    stream.writeStream
      .outputMode("update")
      .foreachBatch(store.asForeachBatch)
      .start()
  }

  /** Deterministic batch-replay (the gate harness): fold the batches in
    * order, return the final current state.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, keyCol: String,
              orderCols: Seq[String], numBuckets: Int = 32): DataFrame = {
    val store = new StateStore(spark, storePath, keyCol, orderCols, numBuckets)
    batches.zipWithIndex.foreach { case (b, i) => store.update(b, i.toLong) }
    store.current()
  }
}
