package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared integer decay weighting for windowed streaming stores
  * ([[StreamingFreqSketch]] counts, [[StreamingHdr]] histograms — the
  * generation-weighted reads next to [[StreamingTDigest]]'s digest
  * scaling): the stored batch `bid`, read at `uptoBatch` over
  * `[fromBatch, uptoBatch)`, carries the multiplier
  * `2^(maxShift − age/halfLife)` with age = uptoBatch−1−bid — every
  * `halfLifeBatches` of age HALVES a row's contribution relative to
  * the newest batch. Factors are exact powers of two (pow(2, s) is
  * exact in an IEEE double for s ≤ 52 and the cap keeps s ≤ 20;
  * functions.shiftleft only accepts a literal bit count), so every
  * decayed read is integer arithmetic and replays bit-for-bit.
  */
private[streaming] object BatchDecay {

  def factor(uptoBatch: Long, fromBatch: Long,
             halfLifeBatches: Int): Column => Column = {
    require(halfLifeBatches >= 1,
      s"halfLifeBatches must be >= 1, got $halfLifeBatches")
    val maxShift = ((uptoBatch - 1 - fromBatch) / halfLifeBatches).toInt
    require(maxShift <= 20,
      s"decay span too wide: ${uptoBatch - fromBatch} batches at " +
        s"half-life $halfLifeBatches needs a 2^$maxShift count " +
        "factor — shrink the window (fromBatch) or raise the half-life")
    // the age division truncates non-negative smalls — floor semantics
    bid => pow(lit(2.0),
      (lit(maxShift) - ((lit(uptoBatch - 1) - bid) /
        lit(halfLifeBatches.toLong)).cast("int")).cast("double"))
      .cast("long")
  }
}
