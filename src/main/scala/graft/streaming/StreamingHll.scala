package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.FreqSketch

/** Continuous distinct counting: cross-batch HLL accumulation with
  * BOUNDED state — the distinct-count member of the streaming-sketch
  * family next to [[StreamingFreqSketch]] (frequencies),
  * [[StreamingBloom]] (membership) and [[StreamingHdr]] (quantiles).
  * "Distinct users this month so far" at 100 TB is a sketch problem:
  * exact distinct state grows with the user space, HLL registers do
  * not.
  *
  * State is per-BATCH register rows `batch:bucket:rho` in the shared
  * [[KeyedBatchStore]] LSM (distinct mode): ≤ 2^p rows per batch, and
  * with `keepBatches` set, ≤ (keepBatches + compactEvery) × 2^p rows
  * TOTAL — expired batches evict at each fold. Keeping the
  * batch id IN the key is what buys the sliding window: registers OR
  * together by per-bucket max (the [[FreqSketch.hllMergeBy]] law), so
  * the CUMULATIVE estimate folds every batch and a WINDOWED estimate
  * (distinct users over the last W batches) folds only the batches in
  * range — the expiry a plain max-merged register table cannot do,
  * because max-merge is not invertible.
  */
object StreamingHll {

  /** Driver-held handle on the accumulating register store.
    *
    * `groupCol` makes the accumulator PER-GROUP (distinct users per
    * event type / source / tenant — the streaming member of the
    * [[FreqSketch.hllSketchBy]] family): register rows key as
    * `batch:bucket:rho:grp` with the group value LAST, because a group
    * value may itself contain the `:` separator and only the tail
    * field may be separator-ambiguous (the limit-4 split recovers it
    * intact). State is ≤ groups × 2^p rows per batch.
    */
  final class HllAccumulator(spark: SparkSession, storePath: String,
                             itemCol: String, p: Int = 8,
                             compactEvery: Int = 8,
                             groupCol: Option[String] = None,
                             keepBatches: Int = 0) {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    require(keepBatches >= 0, s"keepBatches must be >= 0, got $keepBatches")
    // The HLL store is ALWAYS batch-tagged (the batch id leads every
    // cell key — that is what buys the sliding window), so unlike the
    // CMS/HDR accumulators there is no separate `windowed` mode to
    // gate retention on. keepBatches > 0 bounds state at ≤
    // (keepBatches + compactEvery) × 2^p × groups register rows instead
    // of growing with stream lifetime: cells whose batch tag is older
    // than the retention horizon are dropped at each fold (the
    // [[StreamingFreqSketch]] retention discipline) — set it to the
    // widest window any reader will ever ask for. Max-merge is not
    // invertible, so eviction is the ONLY way a register table forgets.
    private val store = new KeyedBatchStore(spark, storePath, "cell",
      "STRING", compactEvery, numBuckets = 1,
      retainAtCompact =
        if (keepBatches == 0) None
        else Some(upTo => substring_index(col("cell"), ":", 1) >=
          lpad(lit(math.max(0L, upTo - keepBatches)).cast("string"),
            9, "0")))

    /** Batches strictly below this id may have been evicted by
      * retention: everything at or above `latestCompactedUpTo −
      * keepBatches` is guaranteed still stored (eviction only happens
      * at a fold), so reads must start at or after this. Derived purely
      * from the on-disk compaction frontier — correct across restarts.
      */
    def evictedBefore(): Long =
      if (keepBatches == 0) 0L
      else store.latestCompactedUpTo()
        .map(u => math.max(0L, u - keepBatches)).getOrElse(0L)

    // full-coverage-or-fail (the StreamingFreqSketch grid discipline):
    // a read that silently lost its oldest batches to retention would
    // answer a different question than asked — this guards EVERY read
    // on a retention store, including cumulative reads (fromBatch = 0)
    private def requireCovered(fromBatch: Long, uptoBatch: Long): Unit =
      if (keepBatches > 0) {
        val horizon = evictedBefore()
        require(fromBatch >= horizon,
          s"read [$fromBatch, $uptoBatch) reaches batches evicted by " +
            s"retention (< $horizon) — raise keepBatches or start the " +
            "read at fromBatch >= " + horizon)
      }

    /** Append one batch's registers (the batch's OWN sketch, batch id
      * folded into the cell key; zero-padded so string order follows
      * numeric order).
      */
    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      // fail fast on a renumbered stream: batch ids live INSIDE the
      // cell keys, so a regression corrupts windowed register reads
      store.requireNoRegression(batchId)
      store.maybeCompact(batchId)
      val bid = lpad(lit(batchId).cast("string"), 9, "0")
      val cells = groupCol match {
        case Some(g) =>
          FreqSketch.hllSketchBy(batch, g, itemCol, p)
            .select(concat_ws(":", bid, col("bucket"), col("rho"),
              col("grp")).as("cell"))
        case None =>
          FreqSketch.hllSketch(batch, itemCol, p)
            .select(concat_ws(":", bid, col("bucket"), col("rho"))
              .as("cell"))
      }
      store.append(cells, batchId)
    }

    private def inRange(fromBatch: Long) = {
      val from = lpad(lit(fromBatch).cast("string"), 9, "0")
      substring_index(col("cell"), ":", 1) >= from
    }

    /** Register table folded over batches in `[fromBatch, uptoBatch)`,
      * in the (bucket, rho) shape the batch estimators consume.
      */
    def registers(uptoBatch: Long, fromBatch: Long = 0L): DataFrame = {
      require(groupCol.isEmpty,
        "grouped accumulator: use registersBy/estimateBy")
      requireCovered(fromBatch, uptoBatch)
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.filter(inRange(fromBatch))
          .select(
            split(col("cell"), ":").getItem(1).cast("int").as("bucket"),
            split(col("cell"), ":").getItem(2).cast("int").as("rho"))
          .groupBy(col("bucket"))
          .agg(max(col("rho")).as("rho")))
        .getOrElse(spark.sql(
          "SELECT CAST(NULL AS INT) AS bucket, " +
            "CAST(NULL AS INT) AS rho WHERE FALSE"))
    }

    /** Per-group register table over `[fromBatch, uptoBatch)` — the
      * [[FreqSketch.hllMergeBy]] fold of the stored per-batch sketches,
      * `(grp, bucket, rho)` shaped for [[FreqSketch.hllEstimateBy]].
      * The limit-4 split keeps a group value containing `:` intact.
      */
    def registersBy(uptoBatch: Long, fromBatch: Long = 0L): DataFrame = {
      require(groupCol.isDefined,
        "ungrouped accumulator: use registers/estimate")
      requireCovered(fromBatch, uptoBatch)
      store.parts(uptoBatch)
        .reduceOption(_ unionByName _)
        .map(_.filter(inRange(fromBatch))
          .select(
            element_at(split(col("cell"), ":", 4), 4).as("grp"),
            split(col("cell"), ":").getItem(1).cast("int").as("bucket"),
            split(col("cell"), ":").getItem(2).cast("int").as("rho"))
          .groupBy(col("grp"), col("bucket"))
          .agg(max(col("rho")).as("rho")))
        .getOrElse(spark.sql(
          "SELECT CAST(NULL AS STRING) AS grp, " +
            "CAST(NULL AS INT) AS bucket, " +
            "CAST(NULL AS INT) AS rho WHERE FALSE"))
    }

    /** Distinct-count estimate over `[fromBatch, uptoBatch)`. */
    def estimate(uptoBatch: Long, fromBatch: Long = 0L): DataFrame =
      FreqSketch.hllEstimate(registers(uptoBatch, fromBatch), p)

    /** Per-group distinct-count estimates over `[fromBatch,
      * uptoBatch)` — one row per group present in the range.
      */
    def estimateBy(uptoBatch: Long, fromBatch: Long = 0L): DataFrame =
      FreqSketch.hllEstimateBy(registersBy(uptoBatch, fromBatch), p)

    /** foreachBatch adapter. */
    def asForeachBatch: (DataFrame, Long) => Unit =
      (batch, id) => update(batch, id)
  }

  /** Attach the accumulator to a stream; query `estimate` between or
    * after batches (cumulative, or the last-W-batches window via
    * `fromBatch`).
    */
  def start(stream: DataFrame, storePath: String, itemCol: String,
            p: Int = 8,
            queryName: String = "graft-stream-hll",
            checkpoint: Option[String] = None,
            groupCol: Option[String] = None)
      : (StreamingQuery, HllAccumulator) = {
    val acc = new HllAccumulator(stream.sparkSession, storePath,
      itemCol, p, groupCol = groupCol)
    val writer = stream.writeStream
      .queryName(queryName)
      .foreachBatch(acc.asForeachBatch)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    (writer.start(), acc)
  }

  /** Batch replay — the oracle-gateable twin: fold `batches` in order,
    * reporting after each batch BOTH the cumulative estimate and the
    * sliding estimate over the last `window` batches — the two reads a
    * register store with batch-scoped keys supports.
    */
  def byBatch(spark: SparkSession, batches: Seq[DataFrame],
              storePath: String, itemCol: String, p: Int,
              window: Int): DataFrame = {
    require(batches.nonEmpty, "byBatch needs at least one batch")
    require(window >= 1, s"window must be >= 1, got $window")
    // compactEvery = batches.size + 1: every per-state read below is a
    // LAZY plan over the delta files existing when it was built — a
    // fold during a later update would delete those files and the final
    // union would fail at execution (the StreamingFreqSketch
    // byBatchWindow replay discipline). State is ≤ batches × 2^p rows,
    // so an unfolded replay is cheap; production streams fold via the
    // accumulator's own default.
    val acc = new HllAccumulator(spark, storePath, itemCol, p,
      compactEvery = batches.size + 1)
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      val cum = acc.estimate(i.toLong + 1)
        .select(col("estimate").as("est_cum"))
      val win = acc.estimate(i.toLong + 1,
          math.max(0L, i.toLong - window + 1))
        .select(col("estimate").as("est_win"))
      cum.crossJoin(broadcast(win))
        .select(lit(i.toLong).as("batch_id"), col("est_cum"),
          col("est_win"))
    }.reduce(_ unionByName _)
  }

  /** Grouped batch replay — the oracle-gateable twin of [[byBatch]]:
    * per batch, the PER-GROUP cumulative and last-`window` sliding
    * estimates (one row per (batch, group) seen so far).
    */
  def byBatchBy(spark: SparkSession, batches: Seq[DataFrame],
                storePath: String, groupCol: String, itemCol: String,
                p: Int, window: Int): DataFrame = {
    require(batches.nonEmpty, "byBatchBy needs at least one batch")
    require(window >= 1, s"window must be >= 1, got $window")
    // compactEvery = batches.size + 1: see byBatch
    val acc = new HllAccumulator(spark, storePath, itemCol, p,
      compactEvery = batches.size + 1, groupCol = Some(groupCol))
    batches.zipWithIndex.map { case (b, i) =>
      acc.update(b, i.toLong)
      val cum = acc.estimateBy(i.toLong + 1)
        .select(col("grp"), col("estimate").as("est_cum"))
      val win = acc.estimateBy(i.toLong + 1,
          math.max(0L, i.toLong - window + 1))
        .select(col("grp"), col("estimate").as("est_win"))
      // a group absent from the window range still has a cumulative
      // estimate — left join, absent window estimates surface as NULL
      cum.join(win, Seq("grp"), "left")
        .select(lit(i.toLong).as("batch_id"), col("grp"),
          col("est_cum"), col("est_win"))
    }.reduce(_ unionByName _)
  }
}
