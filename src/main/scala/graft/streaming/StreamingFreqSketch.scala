package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.FreqSketch

/** Continuous count–min sketch: cross-batch frequency accumulation with
  * FIXED-SIZE state — the unbounded-domain complement of
  * [[StreamingTopK]] (which stores every distinct key and is exact, the
  * right trade only when the key domain is bounded). Here the state is
  * the CMS cell grid — at most `Depth × width` counters no matter how
  * many distinct items the stream ever carries — so hot-token / hot-URL
  * monitoring over a 100 TB crawl keeps a KB-scale store while still
  * answering `est(item)` with the no-false-negative guarantee
  * (estimates only over-count).
  *
  * State rides the shared [[KeyedBatchStore]] LSM in sum-merge mode,
  * keyed by the `"j:bucket"` cell id: per-batch deltas are each batch's
  * OWN sketch (one aggregated `(cell, cnt)` frame, ≤ Depth×width rows),
  * compaction folds them cell-wise — which is EXACTLY `cmsMerge`, so
  * the accumulated sketch equals the one-shot sketch of the
  * concatenated stream (the mergeability the batch operator's spec
  * pins), and the store inherits retry-idempotence (a replayed batch
  * overwrites its own delta) and restart recovery from the base class.
  */
object StreamingFreqSketch {

  /** Driver-held handle on the accumulating sketch store. */
  final class SketchAccumulator(spark: SparkSession, storePath: String,
                                itemCol: String, width: Int,
                                compactEvery: Int = 8) {
    require(width >= 16, s"width must be >= 16, got $width")
    // numBuckets=1: the whole sketch is at most Depth*width rows — one
    // bucket keeps the store a single small file per version
    private val store = new KeyedBatchStore(spark, storePath, "cell",
      "STRING", compactEvery, numBuckets = 1, countCol = Some("cnt"))

    /** Append one batch's sketch (cell-wise counts of the batch only). */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      store.maybeCompact(batchId)
      store.append(
        FreqSketch.cmsSketch(batch, itemCol, width)
          .select(concat_ws(":", col("j"), col("bucket")).as("cell"),
            col("cnt")),
        batchId)
    }

    /** The accumulated sketch over batches < `uptoBatch`, in the
      * (j, bucket, cnt) relational shape the batch operators consume.
      */
    def sketch(uptoBatch: Long): DataFrame =
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.groupBy(col("cell"))
          .agg(sum(col("cnt")).cast("long").as("cnt"))
          .select(
            split(col("cell"), ":").getItem(0).cast("int").as("j"),
            split(col("cell"), ":").getItem(1).cast("long").as("bucket"),
            col("cnt")))
        .getOrElse(spark.sql(
          "SELECT CAST(NULL AS INT) AS j, CAST(NULL AS BIGINT) AS bucket, " +
            "CAST(NULL AS BIGINT) AS cnt WHERE FALSE"))

    /** Point estimates for a probe set against the accumulated sketch. */
    def estimate(probes: DataFrame, probeCol: String,
                 uptoBatch: Long): DataFrame =
      FreqSketch.cmsEstimate(sketch(uptoBatch), probes, probeCol, width)

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (batch, id) => update(batch, id)
  }

  /** Attach the accumulator to a stream; query `estimate` between/after
    * batches.
    */
  def start(stream: DataFrame, storePath: String, itemCol: String,
            width: Int = 4096,
            queryName: String = "graft-stream-cms",
            checkpoint: Option[String] = None)
      : (StreamingQuery, SketchAccumulator) = {
    val acc = new SketchAccumulator(stream.sparkSession, storePath,
      itemCol, width)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(acc.asForeachBatch)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    (writer.start(), acc)
  }

  /** Batch replay — the oracle-gateable twin: fold `batches` in order,
    * then estimate `probes`; by cell-wise mergeability the result must
    * equal the ONE-SHOT sketch estimate over the concatenation, which
    * is what the oracle replays.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, itemCol: String,
              probes: DataFrame, probeCol: String, width: Int,
              minCount: Long): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val acc = new SketchAccumulator(spark, storePath, itemCol, width)
    batches.zipWithIndex.foreach { case (b, i) => acc.update(b, i.toLong) }
    acc.estimate(probes, probeCol, batches.length.toLong)
      .filter(col("est") >= minCount)
  }
}
