package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
                                groupCol: Option[String] = None,
                                windowed: Boolean = false,
                                keepBatches: Int = 0) {
    require(width >= 16, s"width must be >= 16, got $width")
    require(keepBatches >= 0, s"keepBatches must be >= 0, got $keepBatches")
    require(keepBatches == 0 || windowed,
      "keepBatches retention only applies to a windowed store (a " +
        "cumulative store folds every batch into one grid — there is " +
        "nothing batch-tagged to expire)")
    // numBuckets=1: the whole sketch is at most Depth*width rows per
    // group domain — one bucket keeps the store a single small file per
    // version. keepBatches > 0 (windowed stores): cells whose batch tag
    // is older than the retention horizon are dropped at each fold, so
    // state is ≤ (keepBatches + compactEvery) × grid instead of growing
    // with stream lifetime — set it to the widest window/decay span any
    // reader will ever ask for.
    private val store = new KeyedBatchStore(spark, storePath, "cell",
      "STRING", compactEvery, numBuckets = 1, countCol = Some("cnt"),
      retainAtCompact =
        if (keepBatches == 0) None
        else Some(upTo => substring_index(col("cell"), ":", 1) >=
          lpad(lit(math.max(0L, upTo - keepBatches)).cast("string"),
            9, "0")))

    /** Batches strictly below this id may have been evicted by
      * retention: everything at or above `latestCompactedUpTo −
      * keepBatches` is guaranteed still stored (eviction only happens
      * at a fold), so windowed reads must start at or after this.
      * Derived purely from the on-disk compaction frontier — correct
      * across restarts with no extra marker.
      */
    def evictedBefore(): Long =
      if (keepBatches == 0) 0L
      else store.latestCompactedUpTo()
        .map(u => math.max(0L, u - keepBatches)).getOrElse(0L)

    /** Append one batch's sketch (cell-wise counts of the batch only).
      * `windowed` stores tag cells with the batch id (zero-padded so
      * string order follows numeric order, the [[StreamingHll]] key
      * convention) — counters then sum per (batch, cell), window reads
      * fold only the batches in range, and state is batches × grid
      * instead of one grid (expiry costs retention; counters DO
      * subtract, but a subtraction-based expiry would need every
      * retired batch replayed exactly once — the same bookkeeping as
      * keeping the per-batch rows, with none of the decay reads).
      * Batch-id regression corrupts windowed reads, so windowed
      * appends fail fast on a renumbered stream.
      */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      // fail fast on a renumbered stream UNCONDITIONALLY: counts are
      // SUM-merged, so a stream restarted without its checkpoint would
      // overwrite (and lose) the real batch-0 delta and double-count
      // every later batch even in the cumulative store — the windowed
      // store additionally corrupts [fromBatch, uptoBatch) reads
      store.requireNoRegression(batchId)
      store.maybeCompact(batchId)
      val grid = groupCol match {
        case Some(g) =>
          FreqSketch.cmsSketchBy(batch, g, itemCol, width)
        case None =>
          FreqSketch.cmsSketch(batch, itemCol, width)
      }
      val keyParts =
        (if (windowed)
          Seq(lpad(lit(batchId).cast("string"), 9, "0")) else Nil) ++
        Seq(col("j"), col("bucket")) ++
        groupCol.map(_ => col("grp")).toSeq
      store.append(
        grid.select(concat_ws(":", keyParts: _*).as("cell"), col("cnt")),
        batchId)
    }

    /** Parse stored cells back to the relational grid, optionally
      * restricted to batches `[fromBatch, uptoBatch)` (windowed stores)
      * and with per-batch integer weight factors applied (decay reads).
      * The group value is the LAST key field (separator-safe via the
      * limit split).
      */
    private def grid(uptoBatch: Long, fromBatch: Long,
                     factor: Option[Column => Column]): DataFrame = {
      require(windowed || (fromBatch == 0L && factor.isEmpty),
        "windowed/decayed reads need a windowed store " +
          "(SketchAccumulator(windowed = true))")
      // full-coverage-or-fail (the StreamingTDigest windowMembers
      // discipline): a read that silently lost its oldest batches to
      // retention would answer a different question than asked — this
      // guards EVERY read on a retention store, including cumulative
      // `sketch`/`estimate` (fromBatch = 0) and decayed reads
      // defaulting fromBatch = 0, which must pass an explicit
      // fromBatch ≥ evictedBefore() once eviction starts.
      if (keepBatches > 0) {
        val horizon = evictedBefore()
        require(fromBatch >= horizon,
          s"read [$fromBatch, $uptoBatch) reaches batches evicted by " +
            s"retention (< $horizon) — raise keepBatches or start the " +
            "read at fromBatch >= " + horizon)
      }
      val parts = store.parts(uptoBatch).reduceOption(_ unionByName _)
      val jIdx = if (windowed) 1 else 0
      val limit = (if (windowed) 1 else 0) + 2 +
        (if (groupCol.isDefined) 1 else 0)
      val grpField = element_at(split(col("cell"), ":", limit), limit)
      parts.map { df =>
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
            split(col("cell"), ":").getItem(jIdx).cast("int").as("j"),
            split(col("cell"), ":").getItem(jIdx + 1).cast("long")
              .as("bucket"),
            col("cnt"))): _*)
          .groupBy((groupCol.map(_ => col("grp")).toSeq ++
            Seq(col("j"), col("bucket"))): _*)
          .agg(sum(col("cnt")).cast("long").as("cnt"))
      }.getOrElse(spark.sql(
        (if (groupCol.isDefined) "SELECT CAST(NULL AS STRING) AS grp, "
        else "SELECT ") +
          "CAST(NULL AS INT) AS j, CAST(NULL AS BIGINT) AS bucket, " +
          "CAST(NULL AS BIGINT) AS cnt WHERE FALSE"))
    }

    /** The accumulated sketch over batches < `uptoBatch`, in the
      * (j, bucket, cnt) relational shape the batch operators consume.
      */
    def sketch(uptoBatch: Long): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use sketchBy/estimateBy")
      grid(uptoBatch, 0L, None)
    }

    /** The accumulated PER-GROUP sketch over batches < `uptoBatch`, in
      * the `(grp, j, bucket, cnt)` shape [[FreqSketch.cmsEstimateBy]]
      * consumes. The limit split keeps a group value containing `:`
      * intact.
      */
    def sketchBy(uptoBatch: Long): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use sketch/estimate")
      grid(uptoBatch, 0L, None)
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

    /** SLIDING-WINDOW estimates — frequencies over the last
      * `uptoBatch − fromBatch` batches only (hot items RIGHT NOW, not
      * since the stream began). Needs a windowed store; the usual CMS
      * guarantees hold within the window (never under the window's own
      * true count).
      */
    def estimateWindow(probes: DataFrame, probeCol: String,
                       uptoBatch: Long, fromBatch: Long): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use estimateWindowBy")
      requireWindowed()
      FreqSketch.cmsEstimate(grid(uptoBatch, fromBatch, None),
        probes, probeCol, width)
    }

    // explicit even for the degenerate fromBatch = 0 case (which a
    // cumulative store could technically answer): a caller asking for
    // window reads on a store that cannot expire is a config bug, not
    // a question to answer differently
    private def requireWindowed(): Unit =
      require(windowed,
        "windowed/decayed reads need a windowed store " +
          "(SketchAccumulator(windowed = true))")

    /** Per-(group, item) sliding-window estimates. */
    def estimateWindowBy(probes: DataFrame, probeGroupCol: String,
                         probeCol: String, uptoBatch: Long,
                         fromBatch: Long): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use estimateWindow")
      requireWindowed()
      FreqSketch.cmsEstimateBy(grid(uptoBatch, fromBatch, None),
        probes, probeGroupCol, probeCol, width)
    }

    /** DECAYED estimates — recent batches count more: batch counts
      * scale by `2^(freshness / halfLifeBatches)` before the per-cell
      * sum, so `est(item)` answers over the decay-weighted stream (the
      * decayed-heavy-hitters read; [[StreamingTDigest.TDigestAccumulator.quantilesDecayed]]
      * is the quantile twin). Still never under the decayed true count.
      */
    def estimateDecayed(probes: DataFrame, probeCol: String,
                        uptoBatch: Long, halfLifeBatches: Int,
                        fromBatch: Long = 0L): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use estimateDecayedBy")
      requireWindowed()
      FreqSketch.cmsEstimate(grid(uptoBatch, fromBatch,
        Some(BatchDecay.factor(uptoBatch, fromBatch, halfLifeBatches))),
        probes, probeCol, width)
    }

    /** Per-(group, item) decayed estimates. */
    def estimateDecayedBy(probes: DataFrame, probeGroupCol: String,
                          probeCol: String, uptoBatch: Long,
                          halfLifeBatches: Int,
                          fromBatch: Long = 0L): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use estimateDecayed")
      requireWindowed()
      FreqSketch.cmsEstimateBy(grid(uptoBatch, fromBatch,
        Some(BatchDecay.factor(uptoBatch, fromBatch, halfLifeBatches))),
        probes, probeGroupCol, probeCol, width)
    }

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

  /** Windowed/decayed batch replay — the oracle-gateable twin of
    * [[SketchAccumulator.estimateWindow]] / `estimateDecayed`: fold
    * `batches` into a windowed store, report the last-`window`-batches
    * estimates after each batch, and (when `decayHalfLife` is set) one
    * final decayed read over the whole run.
    */
  def byBatchWindow(spark: SparkSession, batches: Seq[DataFrame],
                    storePath: String, itemCol: String,
                    probes: DataFrame, probeCol: String, width: Int,
                    window: Int, minCount: Long,
                    decayHalfLife: Option[Int] = None): DataFrame = {
    require(batches.nonEmpty, "byBatchWindow needs at least one batch")
    require(window >= 1, s"window must be >= 1, got $window")
    // compactEvery = batches.size + 1: every per-state window read below
    // is a LAZY plan over the delta files existing when it was built —
    // a fold during a later update would delete those files and the
    // final union would fail at execution (the StreamingTDigest
    // keepVersions discipline). State is ≤ batches × grid rows, so an
    // unfolded replay is cheap; production streams fold via the
    // accumulator's own default.
    val acc = new SketchAccumulator(spark, storePath, itemCol, width,
      compactEvery = batches.size + 1, windowed = true)
    val states = batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.estimateWindow(probes, probeCol, i.toLong + 1,
          fromBatch = math.max(0L, i.toLong + 1 - window))
        .withColumn("batch_id", lit(i.toLong))
        .withColumn("kind", lit("window"))
    }
    val decayed = decayHalfLife.toSeq.map { h =>
      acc.estimateDecayed(probes, probeCol, batches.size.toLong, h)
        .withColumn("batch_id", lit(batches.size.toLong - 1))
        .withColumn("kind", lit("decay"))
    }
    (states ++ decayed).reduce(_ unionByName _)
      .filter(col("est") >= minCount)
      .select("batch_id", "kind", "item", "est")
  }

  /** Grouped windowed/decayed batch replay — the oracle-gateable twin
    * of [[SketchAccumulator.estimateWindowBy]] / `estimateDecayedBy`:
    * fold `batches` into a GROUPED windowed store, report the
    * last-`window`-batches per-(group, item) estimates after each
    * batch, and (when `decayHalfLife` is set) one final decayed read
    * over the whole run.
    */
  def byBatchWindowBy(spark: SparkSession, batches: Seq[DataFrame],
                      storePath: String, groupCol: String, itemCol: String,
                      probes: DataFrame, probeGroupCol: String,
                      probeCol: String, width: Int,
                      window: Int, minCount: Long,
                      decayHalfLife: Option[Int] = None): DataFrame = {
    require(batches.nonEmpty, "byBatchWindowBy needs at least one batch")
    require(window >= 1, s"window must be >= 1, got $window")
    // compactEvery = batches.size + 1: see byBatchWindow
    val acc = new SketchAccumulator(spark, storePath, itemCol, width,
      compactEvery = batches.size + 1, groupCol = Some(groupCol),
      windowed = true)
    val states = batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      acc.estimateWindowBy(probes, probeGroupCol, probeCol, i.toLong + 1,
          fromBatch = math.max(0L, i.toLong + 1 - window))
        .withColumn("batch_id", lit(i.toLong))
        .withColumn("kind", lit("window"))
    }
    val decayed = decayHalfLife.toSeq.map { h =>
      acc.estimateDecayedBy(probes, probeGroupCol, probeCol,
          batches.size.toLong, h)
        .withColumn("batch_id", lit(batches.size.toLong - 1))
        .withColumn("kind", lit("decay"))
    }
    (states ++ decayed).reduce(_ unionByName _)
      .filter(col("est") >= minCount)
      .select("batch_id", "kind", "grp", "item", "est")
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
