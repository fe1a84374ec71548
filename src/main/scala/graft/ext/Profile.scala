package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the QA pass a training-data pipeline runs
  * before (and after) every transformation: null rates, cardinalities, and
  * value ranges per column, computed in ONE job over the input.
  *
  * The reference's analogue is its in-band parse-quality signal (the
  * PERMISSIVE `error_line` column,
  * `scripts/oss_s3_server_side_logging_compacter.py:49-69`): corruption is
  * *measured*, not fatal. This module generalizes that stance to arbitrary
  * columns.
  *
  * Scale notes:
  *  - [[columnProfile]] uses exact `count(DISTINCT c)` per column. Catalyst
  *    plans k distinct aggregates as one Expand (k× row multiplication) +
  *    two hash aggregates — a single shuffle whose width grows with the
  *    number of profiled columns, fine for the handful of columns a QA
  *    gate watches, wrong for "profile all 200 columns of a 100 TB table".
  *  - [[columnProfileApprox]] is the wide/scale path: HLL sketches
  *    (`approx_count_distinct`) make every statistic a plain partial+final
  *    aggregate — no Expand, one pass, constant memory per column.
  *
  * Both emit the same long-form shape: one row per profiled column, so the
  * result can be diffed across pipeline stages or dataset versions with a
  * plain join.
  */
object Profile {

  /** Shared body of the exact/approx profiles: one wide aggregation row,
    * reshaped long-form. Only the distinct-count aggregate differs.
    */
  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Exact profile of `cols`: (column, n_rows, n_null, n_distinct,
    * min_value, max_value), min/max rendered as strings so mixed-type
    * column sets fit one frame. One aggregation job; see scale notes.
    * Caveat: the string rendering of floating-point min/max follows the
    * engine's double formatter (Spark: scientific notation past 1e7) —
    * pre-round/format float columns if profiles are diffed across engines.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** Per-key distribution audit — the input to a skew-mitigation decision
    * (salting factor, AQE skew thresholds): every key's share of the table
    * and its ratio to the mean key load, flagged against `ratioThreshold`.
    * One hash aggregate + one broadcast of the (tiny) global stats row:
    * cost is a groupBy on the join key you were about to shuffle on anyway.
    * Returns (key, n_rows, mean_rows, ratio, is_hot) for keys ≥ the
    * threshold ratio, plus nothing for balanced keys (audit output stays
    * small even when the table is not).
    */
  def skewAudit(df: DataFrame, keyCol: String,
                ratioThreshold: Double = 2.0): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(
      (sum("n_rows").cast("double") / count(lit(1))).as("mean_rows"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyCol), col("n_rows"), col("mean_rows"),
        (col("n_rows").cast("double") / col("mean_rows")).as("ratio"))
      .filter(col("ratio") >= ratioThreshold)
      .withColumn("is_hot", lit(true))
  }

  /** Rows whose value is a per-group z-score outlier (|z| > `zThreshold`).
    * Moments come from DECIMAL power sums (the q64/StatMoments idiom:
    * Spark's native stddev merges in partition order and drifts by ulps),
    * so mean/sd — and therefore the flagged row set — are identical on
    * every engine and partitioning. Two passes over the group: one
    * aggregate, one broadcast-join back; no window sort.
    */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     zThreshold: Double = 2.5,
                     decimalType: String = "decimal(18,2)"): DataFrame = {
    // dx is EXACT when the value has ≤ the decimal type's scale (money-like
    // columns); pass a wider type for higher-precision inputs
    val dx = col(valueCol).cast(decimalType)
    val moments = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"), sum(dx).as("sxd"), sum(dx * dx).as("sxxd"))
    val n = col("n").cast("double")
    val sx = col("sxd").cast("double")
    val sxx = col("sxxd").cast("double")
    // degenerate groups produce no outliers BY DEFINITION: a single-row
    // group has no sd (n-1 = 0 — divides by zero under ANSI, hence the
    // n > 1 guard -> null), and a constant group has sd = 0 (an unguarded
    // z would divide by zero / flag everything, since Spark orders NaN
    // above every number). Rows are filtered on sd BEFORE z is computed;
    // try_divide keeps z total even if a zero sd ever slipped past.
    val stats = moments.select(col(groupCol),
      (sx / n).as("mean"),
      when(col("n") > 1, sqrt((sxx - sx * sx / n) / (n - 1))).as("sd"))
    // NO forced broadcast hint: `stats` is one row per group, which is
    // tiny for a handful of groups but unbounded for a high-cardinality
    // group column — a forced hint would OOM the broadcast at 100× scale
    // instead of degrading to a shuffle join. AQE broadcasts the stats
    // side at runtime whenever its actual size is small; otherwise both
    // sides hash-shuffle on the group key (the correct degraded plan).
    df.join(stats, Seq(groupCol))
      .filter(col("sd").isNotNull && !isnan(col("sd")) && col("sd") > lit(0.0))
      .withColumn("z",
        try_divide(col(valueCol).cast("double") - col("mean"), col("sd")))
      .filter(abs(col("z")) > zThreshold)
  }

  /** Equal-frequency bins of `valueCol` (deterministic: ties broken by
    * `tieCol`), with per-bin count and value range — feature binning and
    * range-partition boundary planning in one op. NOTE the exact-ntile
    * window is UNPARTITIONED: Spark plans it as a single-partition sort
    * (one task holds the whole input), which is only acceptable for
    * the reduced/sample-sized frames a binning decision is usually made
    * on. At scale, use [[equalFrequencyBinsApprox]] — same output shape,
    * approx_percentile boundaries, one parallel pass, no single-task sort
    * (the Layout module's quantile-vs-ntile trade, applied to binning).
    */
  def equalFrequencyBins(df: DataFrame, valueCol: String, tieCol: String,
                         bins: Int): DataFrame = {
    // single-task by declared contract (the small-frame path; the
    // quantile sibling below is the scale path) — the constant
    // partition key states that intent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(SingleTask.key(col(tieCol)))
      .orderBy(col(valueCol), col(tieCol))
    df.select(col(valueCol), ntile(bins).over(w).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Scale path of [[equalFrequencyBins]]: same output shape
    * (bin, n_rows, lo, hi), but bin boundaries come from ONE
    * `approx_percentile` aggregation pass (GK sketch, partial+final merge)
    * and rows are assigned to bins by comparing against the broadcast
    * boundary array — no window, no single-partition sort, nothing
    * driver-side. The plan is: scan → global aggregate (boundaries) →
    * broadcast-nested-loop of the ONE-row boundary frame → hash aggregate
    * per bin. Every stage is a plain distributed pass, so this is the
    * variant to run on the full table instead of a sample.
    *
    * Approximate by nature: boundary placement is within the sketch's
    * `accuracy` rank error, and ties AT a boundary all fall to the lower
    * bin (a value equal to boundary b goes to b's bin), so per-bin counts
    * are near-equal rather than exactly equal — the price of removing the
    * global sort. Bins are 1-based like ntile; empty bins (heavy ties) are
    * absent from the output rather than padded.
    */
  def equalFrequencyBinsApprox(df: DataFrame, valueCol: String, bins: Int,
                               accuracy: Int = 10000): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    if (bins == 1) // degenerate: one bin, no boundaries — percentile_approx
      return df.filter(col(valueCol).isNotNull) // rejects an empty prob array
        .groupBy(lit(1L).as("bin"))
        .agg(count(lit(1)).as("n_rows"),
          min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
    val probs = (1 until bins).map(_.toDouble / bins)
    val boundaries = df.agg(
      percentile_approx(col(valueCol), array(probs.map(lit): _*), lit(accuracy))
        .as("__bounds"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(boundaries)) // one-row frame: constant-size, scale-safe
      .select(col(valueCol),
        (aggregate(col("__bounds"), lit(0L),
          (acc, b) => acc + when(col(valueCol) > b, 1L).otherwise(0L)) + 1L)
          .as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  /** Diff two long-form profiles (the [[columnProfile]] /
    * [[columnProfileApprox]] output shape) — the dataset-version DRIFT
    * report: per column, count deltas and whether the value range moved.
    * Full-outer on the column name so added/removed columns surface as
    * rows instead of disappearing; join cost is O(profiled columns), not
    * data. Wire it behind `StreamingProfile` (per-batch cumulative vs the
    * previous version's profile) and the QA gate runs continuously.
    */
  def diffProfiles(before: DataFrame, after: DataFrame): DataFrame = {
    def side(df: DataFrame, p: String) = df.select(
      col("column"),
      col("n_rows").as(s"${p}_rows"), col("n_null").as(s"${p}_null"),
      col("n_distinct").as(s"${p}_distinct"),
      col("min_value").as(s"${p}_min"), col("max_value").as(s"${p}_max"))
    side(before, "b").join(side(after, "a"), Seq("column"), "full_outer")
      .select(col("column"),
        (coalesce(col("a_rows"), lit(0L)) - coalesce(col("b_rows"), lit(0L)))
          .as("d_rows"),
        (coalesce(col("a_null"), lit(0L)) - coalesce(col("b_null"), lit(0L)))
          .as("d_null"),
        (coalesce(col("a_distinct"), lit(0L)) - coalesce(col("b_distinct"), lit(0L)))
          .as("d_distinct"),
        (!(col("a_min") <=> col("b_min"))).as("min_changed"),
        (!(col("a_max") <=> col("b_max"))).as("max_changed"),
        when(col("b_rows").isNull, "added")
          .when(col("a_rows").isNull, "removed")
          .otherwise("common").as("presence"))
  }

  /** Sketch-based profile for wide tables / 100 TB inputs: identical shape
    * to [[columnProfile]] but `n_distinct` is an HLL estimate (`rsd`
    * standard error), so the plan is Expand-free: one partial+final
    * aggregate pass regardless of how many columns are profiled.
    */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
                          rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  /** Recency-weighted activity mass per key — the freshness signal a
    * crawl scheduler (or a training-mix ager) sorts on: every event
    * contributes `1e6 >> (age div halfLifeDays)`, i.e. weight HALVES
    * each half-life elapsed before `refDate`. Exact-integer throughout:
    * the decay factor is a power of two (clamped at 2^30 — older events
    * floor to 0), so the per-key sum is a BIGINT an external engine
    * replays bit-for-bit, with none of exp(-λt)'s float drift.
    *
    * Null key / null timestamp rows are dropped; events dated AFTER
    * `refDate` (clock skew) clamp to age 0 rather than amplifying.
    * One partial-aggregated groupBy — the decay arithmetic rides the
    * scan.
    */
  def decayedCounts(df: DataFrame, keyCol: String, tsCol: String,
                    refDate: String, halfLifeDays: Int = 3): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val age = greatest(
      datediff(lit(refDate).cast("date"), col(tsCol).cast("date")), lit(0))
    // 2^b exact in a double for b <= 30, so the cast-then-div chain is
    // pure integer floor division on both engines
    val bucket = least(floor(age / halfLifeDays), lit(30)).cast("int")
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__b", bucket)
      .withColumn("__w", expr("1000000L div cast(pow(2.0, __b) as bigint)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("__w")).cast("long").as("decayed_mass"))
  }

  /** Burst / abuse signals per key — the bot screen every access-log
    * pipeline runs before its traffic numbers mean anything: the peak
    * request count inside any sliding `windowSecs` window (a RANGE
    * window over epoch seconds — event-time, not arrival), the error
    * ratio as an exact e6 integer, and the flag combining both.
    *
    * Scale shape: the sliding count is a per-key range window — bounded
    * by one key's event history, which is exactly the thing being
    * measured (a key hot enough to hurt the window IS the positive
    * class; there is no correct salting for a semantics that needs the
    * key's full timeline). Everything else is one hash aggregate.
    */
  def burstSignals(df: DataFrame, keyCol: String, tsCol: String,
                   typeCol: String, errorType: String,
                   windowSecs: Int = 60, rateThreshold: Long = 10L,
                   errorRatioE6Threshold: Long = 250000L): DataFrame = {
    require(windowSecs >= 1, s"windowSecs must be >= 1, got $windowSecs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col("__sec"))
      .rangeBetween(-(windowSecs - 1).toLong, 0L)
    df.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("__sec"),
        (col(typeCol) === errorType).cast("long").as("__err"))
      .withColumn("__burst", count(lit(1)).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("__err")).cast("long").as("n_errors"),
        max(col("__burst")).cast("long").as("max_burst"))
      .withColumn("error_ratio_e6",
        expr("n_errors * 1000000L div n_events"))
      .withColumn("is_suspect",
        col("max_burst") >= rateThreshold ||
          col("error_ratio_e6") >= errorRatioE6Threshold)
  }
}
