package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each entity, the
  * earliest strictly-increasing chain of timestamps through the given step
  * sequence (view → click → purchase, ...), and how deep the chain got.
  * The temporal-ordering trick is the reference's own Days-Apart pattern —
  * deriving both sides of a time comparison from one scan
  * (`example_queries/days_apart_analysis.sql:18-24`) — generalized from
  * one (write, read) pair to an ordered k-step chain.
  *
  * Algorithm: one `(entity, step)` min-aggregate per funnel stage, each
  * conditioned on the previous stage's completion time — the "earliest
  * completion" recurrence. Stage k is a groupBy over ONLY the events of
  * step k (filter pushed to the scan) joined to the (small) per-entity
  * result of stage k-1, so work shrinks monotonically down the funnel:
  * no window over all events, no per-entity event collection, state is
  * one row per surviving entity per stage. At 100 TB the dominant cost is
  * the first stage's scan+aggregate; every later stage joins against an
  * entity set that AQE broadcast-sizes.
  */
object Funnel {

  /** Returns one row per entity that completed step 1, with `t_1..t_k`
    * (null once the chain breaks) and `depth` = number of steps completed
    * in order.
    */
  def funnel(events: DataFrame, entityCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // the stage columns are generated names; a frame already carrying one
    // (e.g. funnel output fed back in) would make the stage joins
    // ambiguous — fail loudly instead
    val reserved = events.columns.filter(c => c == "depth" || c.matches("t_\\d+"))
    require(reserved.isEmpty,
      s"funnel generates columns t_1..t_${steps.length} and depth; input " +
        s"already has: ${reserved.mkString(", ")} — rename or drop them first")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("t_1"))
    val chained = steps.zipWithIndex.tail.foldLeft(first) {
      case (prev, (step, i)) =>
        val tPrev = s"t_$i"
        val tCur = s"t_${i + 1}"
        val nextMin = events.filter(col(typeCol) === step)
          .join(prev.select(col(entityCol), col(tPrev)), Seq(entityCol))
          .filter(col(tsCol) > col(tPrev))
          .groupBy(col(entityCol))
          .agg(min(col(tsCol)).as(tCur))
        prev.join(nextMin.select(col(entityCol), col(tCur)),
          Seq(entityCol), "left")
    }
    val depth = steps.indices
      .map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    chained.withColumn("depth", depth.cast("long"))
  }
}
