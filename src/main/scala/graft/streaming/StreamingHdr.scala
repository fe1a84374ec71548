package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.FreqSketch

/** Continuous HDR quantiles: cross-batch latency/size percentile
  * tracking with FIXED-SIZE state — the quantile member of the
  * streaming-sketch family next to [[StreamingFreqSketch]] (counts)
  * and [[StreamingBloom]] (membership). State is the HDR bucket
  * histogram — structurally ≤ (63 − subBits + 1)·2^subBits rows for
  * the whole nonnegative BIGINT domain (~1.9k at subBits 5) no matter
  * how many values the stream ever carries — so p50/p99 request-time
  * dashboards over a 100 TB log stream keep a KB-scale store and
  * answer with EXACT [lo, hi] value bounds per quantile.
  *
  * State rides the shared [[KeyedBatchStore]] LSM in sum-merge mode
  * keyed by the bucket id: per-batch deltas are each batch's OWN
  * histogram (one aggregated ≤ ~1.9k-row frame), compaction folds them
  * bucket-wise — which is EXACTLY [[FreqSketch.hdrMerge]], so the
  * accumulated histogram equals the one-shot histogram of the
  * concatenated stream (mergeability the batch spec pins) and the
  * store inherits retry-idempotence and restart recovery.
  */
object StreamingHdr {

  /** Driver-held handle on the accumulating histogram store.
    *
    * `groupCol` makes the accumulator PER-GROUP (p99 latency per
    * endpoint / size per source — the streaming member of the
    * [[FreqSketch.hdrHistogramBy]] family): histogram rows key as
    * `bucket:grp` with the group value LAST (a group value may itself
    * contain `:`; only the tail field of a limit-2 split may be
    * separator-ambiguous), sum-merged per key by the same store mode.
    * State ≤ groups × ~1.9k rows, corpus-free.
    */
  final class HdrAccumulator(spark: SparkSession, storePath: String,
                             valueCol: String, subBits: Int = 5,
                             compactEvery: Int = 8,
                             groupCol: Option[String] = None) {
    // numBuckets=1: the whole histogram is ~1.9k rows (× groups when
    // grouped) — one store bucket keeps it a single small file per
    // version
    private val store = groupCol match {
      case Some(_) => new KeyedBatchStore(spark, storePath, "cell",
        "STRING", compactEvery, numBuckets = 1, countCol = Some("cnt"))
      case None => new KeyedBatchStore(spark, storePath, "bucket",
        "BIGINT", compactEvery, numBuckets = 1, countCol = Some("cnt"))
    }

    /** Append one batch's histogram (bucket counts of the batch only). */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      // fail fast on a renumbered stream: counts are SUM-merged, so a
      // restarted-from-0 stream would overwrite (and lose) the real
      // batch-0 delta while double-counting everything after it
      store.requireNoRegression(batchId)
      store.maybeCompact(batchId)
      val delta = groupCol match {
        case Some(g) => FreqSketch.hdrHistogramBy(batch, g, valueCol, subBits)
          .select(concat_ws(":", col("bucket"), col("grp")).as("cell"),
            col("cnt"))
        case None => FreqSketch.hdrHistogram(batch, valueCol, subBits)
      }
      store.append(delta, batchId)
    }

    /** The accumulated histogram over batches < `uptoBatch`, in the
      * (bucket, cnt) shape the batch operators consume.
      */
    def histogram(uptoBatch: Long): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use histogramBy/quantilesBy")
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.groupBy(col("bucket"))
          .agg(sum(col("cnt")).cast("long").as("cnt")))
        .getOrElse(spark.sql(
          "SELECT CAST(NULL AS BIGINT) AS bucket, " +
            "CAST(NULL AS BIGINT) AS cnt WHERE FALSE"))
    }

    /** The accumulated PER-GROUP histogram over batches < `uptoBatch`,
      * `(grp, bucket, cnt)` shaped for the grouped batch operators —
      * the fold is bucket-wise count addition per group, exactly
      * [[FreqSketch.hdrMergeBy]].
      */
    def histogramBy(uptoBatch: Long): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use histogram/quantiles")
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.select(
          element_at(split(col("cell"), ":", 2), 2).as("grp"),
          split(col("cell"), ":").getItem(0).cast("long").as("bucket"),
          col("cnt"))
          .groupBy(col("grp"), col("bucket"))
          .agg(sum(col("cnt")).cast("long").as("cnt")))
        .getOrElse(spark.sql(
          "SELECT CAST(NULL AS STRING) AS grp, " +
            "CAST(NULL AS BIGINT) AS bucket, " +
            "CAST(NULL AS BIGINT) AS cnt WHERE FALSE"))
    }

    /** Quantile picks with exact value bounds over the accumulated
      * histogram.
      */
    def quantiles(qs: Seq[Double], uptoBatch: Long): DataFrame =
      FreqSketch.hdrQuantiles(histogram(uptoBatch), qs, subBits)

    /** Per-group quantile picks — one row per (group, q). */
    def quantilesBy(qs: Seq[Double], uptoBatch: Long): DataFrame =
      FreqSketch.hdrQuantilesBy(histogramBy(uptoBatch), qs, subBits)

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (batch, id) => update(batch, id)
  }

  /** Attach the accumulator to a stream; query `quantiles` between or
    * after batches.
    */
  def start(stream: DataFrame, storePath: String, valueCol: String,
            subBits: Int = 5,
            queryName: String = "graft-stream-hdr",
            checkpoint: Option[String] = None,
            groupCol: Option[String] = None)
      : (StreamingQuery, HdrAccumulator) = {
    val acc = new HdrAccumulator(stream.sparkSession, storePath,
      valueCol, subBits, groupCol = groupCol)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(acc.asForeachBatch)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    (writer.start(), acc)
  }

  /** Batch replay — the oracle-gateable twin: fold `batches` in order,
    * reporting the RUNNING quantiles after each batch, so the gate
    * checks the accumulation at every step (not just the final state,
    * which mergeability alone would guarantee).
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, valueCol: String, qs: Seq[Double],
              subBits: Int = 5): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    val acc = new HdrAccumulator(spark, storePath, valueCol, subBits)
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.quantiles(qs, i.toLong + 1)
        .withColumn("batch_id", lit(i.toLong))
        .select("batch_id", "q", "rank", "bucket", "lo", "hi")
    }.reduce(_ unionByName _)
  }

  /** Grouped batch replay — the oracle-gateable twin of [[byBatch]]:
    * running PER-GROUP quantiles after each batch.
    */
  def byBatchBy(spark: SparkSession, batches: Seq[DataFrame],
                storePath: String, groupCol: String, valueCol: String,
                qs: Seq[Double], subBits: Int = 5): DataFrame = {
    require(batches.nonEmpty, "byBatchBy needs at least one batch")
    val acc = new HdrAccumulator(spark, storePath, valueCol, subBits,
      groupCol = Some(groupCol))
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.quantilesBy(qs, i.toLong + 1)
        .withColumn("batch_id", lit(i.toLong))
        .select("batch_id", "grp", "q", "rank", "bucket", "lo", "hi")
    }.reduce(_ unionByName _)
  }
}
