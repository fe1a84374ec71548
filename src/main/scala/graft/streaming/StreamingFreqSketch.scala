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

  /** Driver-held handle on the accumulating sketch store.
    *
    * `groupCol` makes the accumulator PER-GROUP (frequencies per event
    * type / tenant / source — the streaming member of the
    * [[FreqSketch.cmsSketchBy]] family, completing the grouped
    * streaming-sketch symmetry with [[StreamingTDigest]],
    * [[StreamingHll]] and [[StreamingHdr]]): cells key as
    * `j:bucket:grp` with the group value LAST, because a group value
    * may itself contain the `:` separator and only the tail field may
    * be separator-ambiguous (the limit-3 split recovers it intact).
    * State is ≤ groups × Depth × width counter rows; estimates answer
    * per `(group, item)` pair and over-count only within the group's
    * own weight.
    */
  final class SketchAccumulator(spark: SparkSession, storePath: String,
                                itemCol: String, width: Int,
                                compactEvery: Int = 8,
                                groupCol: Option[String] = None) {
    require(width >= 16, s"width must be >= 16, got $width")
    // numBuckets=1: the whole sketch is at most Depth*width rows per
    // group domain — one bucket keeps the store a single small file per
    // version
    private val store = new KeyedBatchStore(spark, storePath, "cell",
      "STRING", compactEvery, numBuckets = 1, countCol = Some("cnt"))

    /** Append one batch's sketch (cell-wise counts of the batch only). */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      store.maybeCompact(batchId)
      val cells = groupCol match {
        case Some(g) =>
          FreqSketch.cmsSketchBy(batch, g, itemCol, width)
            .select(concat_ws(":", col("j"), col("bucket"), col("grp"))
              .as("cell"), col("cnt"))
        case None =>
          FreqSketch.cmsSketch(batch, itemCol, width)
            .select(concat_ws(":", col("j"), col("bucket")).as("cell"),
              col("cnt"))
      }
      store.append(cells, batchId)
    }

    /** The accumulated sketch over batches < `uptoBatch`, in the
      * (j, bucket, cnt) relational shape the batch operators consume.
      */
    def sketch(uptoBatch: Long): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use sketchBy/estimateBy")
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
    }

    /** The accumulated PER-GROUP sketch over batches < `uptoBatch`, in
      * the `(grp, j, bucket, cnt)` shape [[FreqSketch.cmsEstimateBy]]
      * consumes. The limit-3 split keeps a group value containing `:`
      * intact.
      */
    def sketchBy(uptoBatch: Long): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use sketch/estimate")
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.groupBy(col("cell"))
          .agg(sum(col("cnt")).cast("long").as("cnt"))
          .select(
            element_at(split(col("cell"), ":", 3), 3).as("grp"),
            split(col("cell"), ":").getItem(0).cast("int").as("j"),
            split(col("cell"), ":").getItem(1).cast("long").as("bucket"),
            col("cnt")))
        .getOrElse(spark.sql(
          "SELECT CAST(NULL AS STRING) AS grp, CAST(NULL AS INT) AS j, " +
            "CAST(NULL AS BIGINT) AS bucket, " +
            "CAST(NULL AS BIGINT) AS cnt WHERE FALSE"))
    }

    /** Point estimates for a probe set against the accumulated sketch. */
    def estimate(probes: DataFrame, probeCol: String,
                 uptoBatch: Long): DataFrame =
      FreqSketch.cmsEstimate(sketch(uptoBatch), probes, probeCol, width)

    /** Per-(group, item) estimates for probe PAIRS against the
      * accumulated per-group sketch.
      */
    def estimateBy(probes: DataFrame, probeGroupCol: String,
                   probeCol: String, uptoBatch: Long): DataFrame =
      FreqSketch.cmsEstimateBy(sketchBy(uptoBatch), probes,
        probeGroupCol, probeCol, width)

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
            checkpoint: Option[String] = None,
            groupCol: Option[String] = None)
      : (StreamingQuery, SketchAccumulator) = {
    val acc = new SketchAccumulator(stream.sparkSession, storePath,
      itemCol, width, groupCol = groupCol)
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

  /** Grouped batch replay: fold `batches` in order, then estimate
    * `(group, item)` probe pairs — by per-group cell-wise mergeability
    * the result equals the one-shot [[FreqSketch.cmsSketchBy]] estimate
    * over the concatenation, which is what the oracle replays.
    */
  def byBatchBy(spark: SparkSession, batches: Seq[DataFrame],
                storePath: String, groupCol: String, itemCol: String,
                probes: DataFrame, probeGroupCol: String,
                probeCol: String, width: Int,
                minCount: Long): DataFrame = {
    require(batches.nonEmpty, "byBatchBy needs at least one batch")
    val acc = new SketchAccumulator(spark, storePath, itemCol, width,
      groupCol = Some(groupCol))
    batches.zipWithIndex.foreach { case (b, i) => acc.update(b, i.toLong) }
    acc.estimateBy(probes, probeGroupCol, probeCol, batches.length.toLong)
      .filter(col("est") >= minCount)
  }
}
