package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream interval join — the attribution primitive (view→click,
  * impression→conversion, request→error) expressed the Structured
  * Streaming way: both sides watermarked, the join condition carrying
  * an explicit event-time BOUND so the state store can expire rows.
  *
  * Why the bound is not optional: an unbounded stream–stream equi-join
  * must buffer both streams forever (any future row might match any
  * past row). With `rightTs ∈ [leftTs, leftTs + maxDelay]` plus
  * watermarks on both sides, Spark derives state-eviction thresholds —
  * each side's buffer holds only rows inside watermark + maxDelay, so
  * state size tracks RATE, not history. That is the difference between
  * a join that survives a month of uptime on a 1000-executor cluster
  * and one that OOMs on day two.
  *
  * The same plan runs in BATCH mode unchanged (`withWatermark` is a
  * documented no-op there), which is exactly how the q184 gate replays
  * it against a plain SQL interval join; the streaming semantics
  * (late-row eviction, cross-batch matching) are spec-driven through
  * MemoryStream.
  */
object StreamJoin {

  /** Inner interval join: (left row, right row) pairs with equal
    * `keyCol` and `rightTs` within `[leftTs, leftTs + maxDelay]`.
    * Output columns are the left columns (prefixed `l_`), then the
    * right columns (prefixed `r_`), key and timestamps included —
    * callers project what they need.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTsCol: String, rightTsCol: String,
                   maxDelay: String = "30 minutes",
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left
      .filter(col(keyCol).isNotNull && col(leftTsCol).isNotNull)
      .withWatermark(leftTsCol, watermarkDelay)
      .select(left.columns.map(c => col(c).as(s"l_$c")).toSeq: _*)
    val r = right
      .filter(col(keyCol).isNotNull && col(rightTsCol).isNotNull)
      .withWatermark(rightTsCol, watermarkDelay)
      .select(right.columns.map(c => col(c).as(s"r_$c")).toSeq: _*)
    l.join(r,
      col(s"l_$keyCol") === col(s"r_$keyCol") &&
        col(s"r_$rightTsCol") >= col(s"l_$leftTsCol") &&
        col(s"r_$rightTsCol") <= col(s"l_$leftTsCol") + expr(s"INTERVAL $maxDelay"))
  }
}
