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

  /** Clickstream paths — one row per (entity, session) with the ordered
    * event-type path ("view>view>click>purchase"), the raw material of
    * path analysis and conversion attribution that [[funnel]]'s fixed
    * stage list can't express (it asks "did A then B happen"; paths ask
    * "what actually happened"). Sessions split on `gapMinutes` of
    * event-time silence (the q19 rule); within a session events order
    * by (ts, idCol) — a total order, so the path string is a pure
    * function of the data.
    *
    * Scale shape: three per-entity windows (lag + running session sum +
    * in-session rank — entity-bounded, the sessionization shape) and
    * one hash aggregate; the path assembles from a collect_list SORTED
    * INSIDE THE ROW (array_sort over structs), so partition order never
    * leaks into the string. Paths cap at `maxPathEvents` events, and
    * the cap is applied BEFORE collection (only rows with in-session
    * rank ≤ cap enter the aggregation buffer) — a runaway entity with
    * 10⁷ events in one session costs a 10⁷-row count, never a 10⁷-
    * struct array in a single buffer. The cap is part of the declared
    * semantics, with the true count still reported exactly in
    * n_events.
    */
  def sessionPaths(events: DataFrame, entityCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   gapMinutes: Int = 30,
                   maxPathEvents: Int = 64): DataFrame = {
    require(gapMinutes >= 1, s"gapMinutes must be >= 1, got $gapMinutes")
    require(maxPathEvents >= 1, s"maxPathEvents must be >= 1, got $maxPathEvents")
    // the window orders by the derived __us (micros of tsCol) + idCol —
    // tsCol itself is projected away before the window applies
    val byEntity = org.apache.spark.sql.expressions.Window
      .partitionBy(entityCol).orderBy(col("__us"), col(idCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull &&
        col(idCol).isNotNull && col(typeCol).isNotNull)
      .select(col(entityCol), col(idCol), col(typeCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col("__us"), 1).over(byEntity))
      .withColumn("__new",
        when(col("__prev").isNull || col("__us") - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("__new")).over(byEntity.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(entityCol), col("sess_id"))
          .orderBy(col("__us"), col(idCol))))
      .groupBy(col(entityCol), col("sess_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"),
        // cap INSIDE the collect: collect_list skips the nulls the
        // when() emits past the cap, so the buffer holds ≤ cap structs
        array_join(
          transform(
            array_sort(collect_list(when(col("__rn") <= maxPathEvents,
              struct(col("__us").as("u"),
                col(idCol).as("i"), col(typeCol).as("t"))))),
            s => s.getField("t")), ">").as("path"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }

  /** Retention-cohort matrix — the log-analytics classic behind every
    * "D1/D7/D30 retention" dashboard: entities cohort by their FIRST
    * active day, each later active day lands in `(cohort_day,
    * offset_days)`, and the cell counts distinct active entities.
    *
    * Scale shape: one `(entity, day)` distinct (the only corpus-sized
    * shuffle), a per-entity window min for the cohort day (frames are
    * per-entity active-day sets — calendar-bounded), then a hash
    * aggregate over the `(cohort, offset)` grid, which is at most
    * `days × maxOffsetDays` rows. `cohort_size` rides along via a
    * bounded window over each cohort's ≤ `maxOffsetDays + 1` rows, and
    * `retention_e6` is the integer-exact ppm ratio (engine-portable —
    * no float division).
    */
  def retentionCohorts(events: DataFrame, entityCol: String, tsCol: String,
                       maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0, got $maxOffsetDays")
    val active = events
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(col(entityCol).as("__e"), to_date(col(tsCol)).as("__day"))
      .distinct()
    val byEntity = org.apache.spark.sql.expressions.Window.partitionBy("__e")
    val cells = active
      .withColumn("cohort_day", min(col("__day")).over(byEntity))
      .withColumn("offset_days", datediff(col("__day"), col("cohort_day")))
      .filter(col("offset_days") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("offset_days"))
      // (entity, day) is distinct, so each entity contributes exactly
      // one row per cell: count(*) IS the distinct-entity count
      .agg(count(lit(1)).cast("long").as("n_active"))
    val byCohort = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_day")
    cells
      .withColumn("cohort_size",
        max(when(col("offset_days") === 0, col("n_active")))
          .over(byCohort).cast("long"))
      .withColumn("retention_e6",
        expr("CAST(n_active * 1000000L div cohort_size AS BIGINT)"))
  }
}
