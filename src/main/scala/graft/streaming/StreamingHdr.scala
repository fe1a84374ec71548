package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
                             groupCol: Option[String] = None,
                             windowed: Boolean = false,
                             keepBatches: Int = 0) {
    require(keepBatches >= 0, s"keepBatches must be >= 0, got $keepBatches")
    require(keepBatches == 0 || windowed,
      "keepBatches retention only applies to a windowed store (a " +
        "cumulative store folds every batch into one histogram — " +
        "there is nothing batch-tagged to expire)")
    // numBuckets=1: the whole histogram is ~1.9k rows (× groups when
    // grouped, × batches when windowed) — one store bucket keeps it a
    // single small file per version. keepBatches > 0 (windowed stores):
    // cells with a batch tag older than the retention horizon drop at
    // each fold, so state is ≤ (keepBatches + compactEvery) × histogram
    // instead of growing with stream lifetime — set it to the widest
    // window/decay span any reader will ever ask for.
    private val store =
      if (groupCol.isDefined || windowed)
        new KeyedBatchStore(spark, storePath, "cell",
          "STRING", compactEvery, numBuckets = 1, countCol = Some("cnt"),
          retainAtCompact =
            if (keepBatches == 0) None
            else Some(upTo => substring_index(col("cell"), ":", 1) >=
              lpad(lit(math.max(0L, upTo - keepBatches)).cast("string"),
                9, "0")))
      else new KeyedBatchStore(spark, storePath, "bucket",
        "BIGINT", compactEvery, numBuckets = 1, countCol = Some("cnt"))

    /** Batches strictly below this id may have been evicted by
      * retention; see [[StreamingFreqSketch.SketchAccumulator.evictedBefore]].
      */
    def evictedBefore(): Long =
      if (keepBatches == 0) 0L
      else store.latestCompactedUpTo()
        .map(u => math.max(0L, u - keepBatches)).getOrElse(0L)

    /** Append one batch's histogram (bucket counts of the batch only).
      * `windowed` stores tag cells with the batch id (zero-padded, the
      * [[StreamingHll]] key convention): counts sum per (batch,
      * bucket), window reads fold only the batches in range, and state
      * is batches × ~1.9k rows instead of one histogram — the sliding
      * p99 a cumulative histogram cannot answer (bucket counts DO
      * subtract, but subtraction-based expiry needs every retired
      * batch replayed exactly once — the same bookkeeping as keeping
      * the per-batch rows, with none of the decay reads).
      */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      // fail fast on a renumbered stream: counts are SUM-merged, so a
      // restarted-from-0 stream would overwrite (and lose) the real
      // batch-0 delta while double-counting everything after it
      store.requireNoRegression(batchId)
      store.maybeCompact(batchId)
      val grid = groupCol match {
        case Some(g) => FreqSketch.hdrHistogramBy(batch, g, valueCol, subBits)
        case None => FreqSketch.hdrHistogram(batch, valueCol, subBits)
      }
      val keyParts =
        (if (windowed)
          Seq(lpad(lit(batchId).cast("string"), 9, "0")) else Nil) ++
        Seq(col("bucket")) ++ groupCol.map(_ => col("grp")).toSeq
      val delta =
        if (keyParts.size == 1) grid // plain global: BIGINT bucket key
        else grid.select(concat_ws(":", keyParts: _*).as("cell"),
          col("cnt"))
      store.append(delta, batchId)
    }

    /** Parse stored cells back to the histogram relation, optionally
      * restricted to batches `[fromBatch, uptoBatch)` (windowed
      * stores) and with per-batch integer decay factors applied. The
      * group value is the LAST key field (separator-safe limit split).
      */
    private def grid(uptoBatch: Long, fromBatch: Long,
                     factor: Option[Column => Column]): DataFrame = {
      require(windowed || (fromBatch == 0L && factor.isEmpty),
        "windowed/decayed reads need a windowed store " +
          "(HdrAccumulator(windowed = true))")
      // full-coverage-or-fail (the StreamingTDigest windowMembers
      // discipline) on a retention store — guards every read,
      // including cumulative and default-fromBatch decayed ones
      if (keepBatches > 0) {
        val horizon = evictedBefore()
        require(fromBatch >= horizon,
          s"read [$fromBatch, $uptoBatch) reaches batches evicted by " +
            s"retention (< $horizon) — raise keepBatches or start the " +
            "read at fromBatch >= " + horizon)
      }
      val parts = store.parts(uptoBatch).reduceOption(_ unionByName _)
      val bIdx = if (windowed) 1 else 0
      val limit = (if (windowed) 1 else 0) + 1 +
        (if (groupCol.isDefined) 1 else 0)
      val grpField = element_at(split(col("cell"), ":", limit), limit)
      parts.map { df =>
        if (limit == 1) // plain global store: already (bucket, cnt)
          df.groupBy(col("bucket"))
            .agg(sum(col("cnt")).cast("long").as("cnt"))
        else {
          val ranged =
            if (!windowed) df
            else {
              val from = lpad(lit(fromBatch).cast("string"), 9, "0")
              val upto = lpad(lit(uptoBatch).cast("string"), 9, "0")
              val bid = substring_index(col("cell"), ":", 1)
              df.filter(bid >= from && bid < upto)
            }
          val weighted = factor match {
            case Some(f) => ranged.withColumn("cnt", col("cnt") *
              f(substring_index(col("cell"), ":", 1).cast("long")))
            case None => ranged
          }
          weighted
            .select((groupCol.map(_ => grpField.as("grp")).toSeq ++ Seq(
              split(col("cell"), ":").getItem(bIdx).cast("long")
                .as("bucket"),
              col("cnt"))): _*)
            .groupBy((groupCol.map(_ => col("grp")).toSeq :+
              col("bucket")): _*)
            .agg(sum(col("cnt")).cast("long").as("cnt"))
        }
      }.getOrElse(spark.sql(
        (if (groupCol.isDefined) "SELECT CAST(NULL AS STRING) AS grp, "
        else "SELECT ") +
          "CAST(NULL AS BIGINT) AS bucket, " +
          "CAST(NULL AS BIGINT) AS cnt WHERE FALSE"))
    }

    private def requireWindowed(): Unit =
      require(windowed,
        "windowed/decayed reads need a windowed store " +
          "(HdrAccumulator(windowed = true))")

    /** The accumulated histogram over batches < `uptoBatch`, in the
      * (bucket, cnt) shape the batch operators consume.
      */
    def histogram(uptoBatch: Long): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use histogramBy/quantilesBy")
      grid(uptoBatch, 0L, None)
    }

    /** The accumulated PER-GROUP histogram over batches < `uptoBatch`,
      * `(grp, bucket, cnt)` shaped for the grouped batch operators —
      * the fold is bucket-wise count addition per group, exactly
      * [[FreqSketch.hdrMergeBy]].
      */
    def histogramBy(uptoBatch: Long): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use histogram/quantiles")
      grid(uptoBatch, 0L, None)
    }

    /** Quantile picks with exact value bounds over the accumulated
      * histogram.
      */
    def quantiles(qs: Seq[Double], uptoBatch: Long): DataFrame =
      FreqSketch.hdrQuantiles(histogram(uptoBatch), qs, subBits)

    /** Per-group quantile picks — one row per (group, q). */
    def quantilesBy(qs: Seq[Double], uptoBatch: Long): DataFrame =
      FreqSketch.hdrQuantilesBy(histogramBy(uptoBatch), qs, subBits)

    /** SLIDING-WINDOW quantiles — p50/p99 over the last
      * `uptoBatch − fromBatch` batches only, with the same exact
      * [lo, hi] value bounds (latency NOW, not since the stream
      * began).
      */
    def quantilesWindow(qs: Seq[Double], uptoBatch: Long,
                        fromBatch: Long): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use quantilesWindowBy")
      requireWindowed()
      FreqSketch.hdrQuantiles(grid(uptoBatch, fromBatch, None), qs,
        subBits)
    }

    /** Per-group sliding-window quantile picks. */
    def quantilesWindowBy(qs: Seq[Double], uptoBatch: Long,
                          fromBatch: Long): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use quantilesWindow")
      requireWindowed()
      FreqSketch.hdrQuantilesBy(grid(uptoBatch, fromBatch, None), qs,
        subBits)
    }

    /** DECAYED quantiles — recent batches count more: bucket counts
      * scale by the exact integer `2^(freshness / halfLifeBatches)`
      * ([[BatchDecay]]) before the rank pick, so quantiles answer over
      * the decay-weighted multiset (the generation-weighted read, the
      * [[StreamingTDigest]] decay twin for the integer domain).
      */
    def quantilesDecayed(qs: Seq[Double], uptoBatch: Long,
                         halfLifeBatches: Int,
                         fromBatch: Long = 0L): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use quantilesDecayedBy")
      requireWindowed()
      FreqSketch.hdrQuantiles(grid(uptoBatch, fromBatch,
        Some(BatchDecay.factor(uptoBatch, fromBatch, halfLifeBatches))),
        qs, subBits)
    }

    /** Per-group decayed quantile picks. */
    def quantilesDecayedBy(qs: Seq[Double], uptoBatch: Long,
                           halfLifeBatches: Int,
                           fromBatch: Long = 0L): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use quantilesDecayed")
      requireWindowed()
      FreqSketch.hdrQuantilesBy(grid(uptoBatch, fromBatch,
        Some(BatchDecay.factor(uptoBatch, fromBatch, halfLifeBatches))),
        qs, subBits)
    }

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
    // compactEvery = batches.size + 1: the per-step quantile reads are
    // lazy plans over the delta files alive at build time — see
    // byBatchWindow
    val acc = new HdrAccumulator(spark, storePath, valueCol, subBits,
      compactEvery = batches.size + 1)
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.quantiles(qs, i.toLong + 1)
        .withColumn("batch_id", lit(i.toLong))
        .select("batch_id", "q", "rank", "bucket", "lo", "hi")
    }.reduce(_ unionByName _)
  }

  /** Windowed/decayed batch replay — the oracle-gateable twin of
    * [[HdrAccumulator.quantilesWindow]] / `quantilesDecayed`: fold
    * `batches` into a windowed store, report the last-`window`-batches
    * quantiles after each batch, and (when `decayHalfLife` is set) one
    * final decayed read over the whole run.
    */
  def byBatchWindow(spark: SparkSession, batches: Seq[DataFrame],
                    storePath: String, valueCol: String, qs: Seq[Double],
                    window: Int, subBits: Int = 5,
                    decayHalfLife: Option[Int] = None): DataFrame = {
    require(batches.nonEmpty, "byBatchWindow needs at least one batch")
    require(window >= 1, s"window must be >= 1, got $window")
    // compactEvery = batches.size + 1: the per-state window reads below
    // are LAZY plans over the delta files existing when each was built;
    // a fold during a later update would delete those files and the
    // final union would fail at execution (the StreamingTDigest
    // keepVersions discipline — StreamingIvf.byBatch hit the same
    // hazard and solved it by eager materialization; here the unfolded
    // replay is ≤ batches × ~1.9k rows, so skipping the fold is free).
    val acc = new HdrAccumulator(spark, storePath, valueCol, subBits,
      compactEvery = batches.size + 1, windowed = true)
    val outCols = Seq("batch_id", "kind", "q", "rank", "bucket",
      "lo", "hi")
    val states = batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.quantilesWindow(qs, i.toLong + 1,
          fromBatch = math.max(0L, i.toLong + 1 - window))
        .withColumn("batch_id", lit(i.toLong))
        .withColumn("kind", lit("window"))
        .select(outCols.head, outCols.tail: _*)
    }
    val decayed = decayHalfLife.toSeq.map { h =>
      acc.quantilesDecayed(qs, batches.size.toLong, h)
        .withColumn("batch_id", lit(batches.size.toLong - 1))
        .withColumn("kind", lit("decay"))
        .select(outCols.head, outCols.tail: _*)
    }
    (states ++ decayed).reduce(_ unionByName _)
  }

  /** Grouped windowed/decayed batch replay — the oracle-gateable twin
    * of [[HdrAccumulator.quantilesWindowBy]] / `quantilesDecayedBy`:
    * fold `batches` into a GROUPED windowed store, report the
    * last-`window`-batches per-group quantiles after each batch, and
    * (when `decayHalfLife` is set) one final decayed read over the
    * whole run.
    */
  def byBatchWindowBy(spark: SparkSession, batches: Seq[DataFrame],
                      storePath: String, groupCol: String,
                      valueCol: String, qs: Seq[Double],
                      window: Int, subBits: Int = 5,
                      decayHalfLife: Option[Int] = None): DataFrame = {
    require(batches.nonEmpty, "byBatchWindowBy needs at least one batch")
    require(window >= 1, s"window must be >= 1, got $window")
    // compactEvery = batches.size + 1: see byBatchWindow
    val acc = new HdrAccumulator(spark, storePath, valueCol, subBits,
      compactEvery = batches.size + 1, groupCol = Some(groupCol),
      windowed = true)
    val outCols = Seq("batch_id", "kind", "grp", "q", "rank", "bucket",
      "lo", "hi")
    val states = batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.quantilesWindowBy(qs, i.toLong + 1,
          fromBatch = math.max(0L, i.toLong + 1 - window))
        .withColumn("batch_id", lit(i.toLong))
        .withColumn("kind", lit("window"))
        .select(outCols.head, outCols.tail: _*)
    }
    val decayed = decayHalfLife.toSeq.map { h =>
      acc.quantilesDecayedBy(qs, batches.size.toLong, h)
        .withColumn("batch_id", lit(batches.size.toLong - 1))
        .withColumn("kind", lit("decay"))
        .select(outCols.head, outCols.tail: _*)
    }
    (states ++ decayed).reduce(_ unionByName _)
  }

  /** Grouped batch replay — the oracle-gateable twin of [[byBatch]]:
    * running PER-GROUP quantiles after each batch.
    */
  def byBatchBy(spark: SparkSession, batches: Seq[DataFrame],
                storePath: String, groupCol: String, valueCol: String,
                qs: Seq[Double], subBits: Int = 5): DataFrame = {
    require(batches.nonEmpty, "byBatchBy needs at least one batch")
    // compactEvery = batches.size + 1: per-step lazy reads, see byBatch
    val acc = new HdrAccumulator(spark, storePath, valueCol, subBits,
      compactEvery = batches.size + 1, groupCol = Some(groupCol))
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.quantilesBy(qs, i.toLong + 1)
        .withColumn("batch_id", lit(i.toLong))
        .select("batch_id", "grp", "q", "rank", "bucket", "lo", "hi")
    }.reduce(_ unionByName _)
  }
}
