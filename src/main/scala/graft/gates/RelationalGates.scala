package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — general relational operators: joins (asof/range/anti/full/skew/fuzzy), windows, rollup/cube/pivot, upsert/CDC-adjacent diffing.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object RelationalGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext streaming-shape — sessionization via windows (gap > 30 min).
    "q19_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            (unix_micros(col("ts")) - col("prev_us")) > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum("is_new").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id")
        .agg(max("sess_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // §2.5 ext — anti join (customers with no large orders).
    "q20_anti_join" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.4 ext — rollup (hierarchical grouping sets), via the SQL entry
    // point (the DataFrame rollup API trips Spark's ambiguous-self-join
    // false positive on join-derived frames, SPARK-??; SQL resolution
    // doesn't carry dataset-id tags and is the idiomatic path anyway).
    "q21_rollup" -> ((s, dir) => {
      tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name")
        .createOrReplaceTempView("q21_joined")
      // Spark ASC default is NULLS FIRST (matches the oracle's explicit
      // NULLS FIRST; DuckDB's default is NULLS LAST).
      s.sql("""SELECT r_name, n_name, count(*) AS n_customers
              |FROM q21_joined
              |GROUP BY ROLLUP (r_name, n_name)
              |ORDER BY r_name, n_name""".stripMargin)
    }),

    // ext skew — salted equi-join; correctness contract: identical result
    // to the plain join (the oracle runs the plain join).
    "q27_skew_salted_join" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem").select("l_suppkey", "l_extendedprice")
      val sup = tbl(s, dir, "supplier").select("s_suppkey", "s_name")
        .withColumnRenamed("s_suppkey", "l_suppkey")
      val hot = ext.SkewJoin.hotKeys(l, "l_suppkey", hotThreshold = 50)
      ext.SkewJoin.saltedJoin(l, sup, "l_suppkey", hot, saltBuckets = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy("s_name")
    }),

    // §2.5 ext — set operations (INTERSECT / EXCEPT).
    "q29_setops" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val high = o.filter(col("o_totalprice") > 250000).select(col("o_custkey").as("custkey"))
      val low = o.filter(col("o_totalprice") < 50000).select(col("o_custkey").as("custkey"))
      high.intersect(low)            // customers with both bands
        .except(low.filter(col("custkey") % 100 === 0)) // minus a carved-out set
        .orderBy("custkey")
    }),

    // §2.4 ext — pivot (wide aggregation by category).
    "q30_pivot" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .orderBy("user_id")
    }),

    // §2.4 ext — exact percentiles (linear interpolation, same definition
    // as DuckDB quantile_cont).
    "q33_percentiles" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_quantity, 0.99)").as("p99_qty"))
        .orderBy("l_returnflag")
    }),

    // ext window frames — running (cumulative) revenue per customer in
    // order-date order; decimal-exact accumulation.
    "q34_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // §2.5 ext — correlated scalar subqueries (Catalyst decorrelates them
    // to aggregates + joins; the oracle runs the same SQL). "Above twice
    // the customer's average" is compared multiplied-through
    // (price·n > 2·sum) in DECIMAL: an avg() would round differently per
    // engine (Spark decimal avg → decimal(·,6), DuckDB → double) and could
    // flip boundary rows.
    "q38_correlated_subquery" -> ((s, dir) => {
      tbl(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_v o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          |    (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) >
          |  2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
          |       FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // ext fuzzy match — edit-distance entity resolution: nearest of two
    // probe templates per document head (levenshtein is identically
    // defined in Spark and DuckDB).
    "q36_fuzzy_match" -> ((s, dir) => {
      val head = substring(col("text"), 1, 30)
      val d1 = levenshtein(head, lit("the quick brown fox jumps over"))
      val d2 = levenshtein(head, lit("spark query engine data stream"))
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          d1.cast("long").as("dist_prose"),
          d2.cast("long").as("dist_tech"),
          when(d1 <= d2, lit("prose")).otherwise(lit("tech")).as("nearest"))
    }),

    // ext temporal — as-of join: each event sees the most recent purchase
    // (inclusive) by the same user. One key-shuffle union+window, no
    // nested-loop; oracle is DuckDB's native ASOF LEFT JOIN.
    "q40_asof_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val probe = e.select(col("event_id"), col("ts"), col("user_id"))
      val build = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      ext.TemporalJoins.asofJoin(probe, build, "user_id", "ts", "p_ts",
          Seq("p_ts", "p_event_id", "p_value"), prefix = "")
        .select(col("event_id"),
          col("p_event_id").as("prior_purchase_id"),
          (unix_micros(col("ts")) - unix_micros(col("p_ts")))
            .as("micros_since_purchase"),
          col("p_value").as("prior_purchase_value"))
        .orderBy("event_id")
    }),

    // ext temporal — interval (range) join via day-bucket expansion: promo
    // windows derived from a sample of orders, lineitems matched by
    // ship-date containment; an equi-join on the bucket instead of the
    // BroadcastNestedLoopJoin a raw non-equi condition would produce.
    "q41_range_join" -> ((s, dir) => {
      val promos = tbl(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey").as("promo_id"),
          col("o_orderdate").as("start_ts"),
          (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("end_ts"))
      val probe = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
      ext.TemporalJoins.byTimeBuckets(probe, promos, "l_shipdate",
          "start_ts", "end_ts")
        .groupBy("promo_id")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy("promo_id")
    }),

    // §2.4 ext — GROUPING SETS with grouping() indicators (via SQL for the
    // same join-derived-frame reason as q21_rollup).
    "q42_grouping_sets" -> ((s, dir) => {
      tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "c_mktsegment", "c_acctbal")
        .createOrReplaceTempView("q42_joined")
      s.sql("""SELECT r_name, c_mktsegment,
              |  CAST(grouping(r_name) AS INT) AS g_region,
              |  CAST(grouping(c_mktsegment) AS INT) AS g_segment,
              |  count(*) AS n_customers,
              |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
              |FROM q42_joined
              |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment), ())
              |ORDER BY r_name, c_mktsegment""".stripMargin)
    }),

    // §2.4 ext — array aggregation: deterministic sorted collect, argmax
    // via struct-max (max_by's tie-break is engine-arbitrary; lexicographic
    // struct comparison is not), array slicing. The arrays are serialized
    // to CSV in the output because the gate's comparator sorts rows in
    // pandas, where array cells are unhashable — the aggregation itself is
    // still array-typed end-to-end.
    "q43_array_agg" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
          array_sort(collect_list(col("o_orderkey"))).as("keys_arr"),
          count(lit(1)).as("n_orders"),
          max(struct(col("o_totalprice"), col("o_orderkey")))
            .getField("o_orderkey").as("top_order"))
        .select(col("o_custkey"),
          array_join(col("keys_arr").cast("array<string>"), ",").as("order_keys"),
          array_join(slice(col("keys_arr"), 1, 3).cast("array<string>"), ",").as("first3"),
          col("n_orders"), col("top_order"))
        .orderBy("o_custkey")
    }),

    // §2.4 ext — unpivot / melt (wide metrics → long), the inverse of q30.
    "q44_unpivot" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_discount").cast("decimal(18,2)")).cast("double").as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
        .orderBy("l_returnflag", "metric")
    }),

    // §2.4 ext — fixed-width histogram by arithmetic bucketing (the
    // distributed width_bucket: one hash aggregate, no sort of the data).
    "q46_histogram" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("bucket")
    }),

    // ext streaming-shape — hopping (sliding) windows: 1-day windows every
    // 12 hours, each event contributing to exactly two windows; the same
    // groupBy(window(...)) works unchanged under readStream.
    "q48_sliding_window" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // ext streaming-shape — native session windows (gap-merged), the
    // declarative twin of q19's lag/cumsum sessionization and of
    // LogStream.sessionize's stateful form; works unchanged under
    // readStream with a watermark.
    "q55_session_window" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // ext time-series — gap filling + forward fill: each user's sparse
    // daily purchase totals densified over their [first, last] day span
    // (sequence+explode) and forward-filled with last(ignoreNulls).
    // Leading gaps stay null. The resample primitive every time-series
    // pipeline needs; all shuffles are on user_id.
    "q57_gap_fill" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val daily = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      val spans = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val allDays = spans.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      allDays.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), col("v"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
        .orderBy("user_id", "day")
    }),

    // ext time-series — 7-day moving average over the daily revenue
    // series via a RANGE window frame (day-distance, not row-count, so
    // calendar gaps shorten the frame). Decimal window sums: a double
    // sum's association order differs across engines' segment-tree
    // evaluation. A single-task window is fine HERE because the input is
    // already one row per day (~thousands) — never do this on raw rows;
    // the constant partition key states that intent explicitly.
    "q58_moving_avg" -> ((s, dir) => {
      val daily = tbl(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("t"))
      val w = Window.partitionBy(ext.SingleTask.key(col("day")))
        .orderBy(unix_date(to_date(col("day"))))
        .rangeBetween(-6, 0)
      daily.select(col("day"), col("t").cast("double").as("daily_total"),
          (sum(col("t")).over(w).cast("double") / count(col("t")).over(w)).as("ma7"),
          count(col("t")).over(w).as("n_days"))
        .orderBy("day")
    }),

    // ext top-k — the SCALE path for q08's "top 3 per customer": a bounded
    // k-row Aggregator with map-side partial aggregation, so the exchange
    // carries <= k rows per (task, key) instead of the whole table. Same
    // oracle as q08 — identical semantics, different physical shape.
    "q54_topk_per_group" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(graft.functions.TopKAgg.column(3,
          col("o_totalprice"), -col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "s")))
        .select(col("o_custkey"),
          (-col("s.id")).as("o_orderkey"),
          col("s.score").as("o_totalprice"),
          (col("i") + 1).cast("int").as("rn"))
    }),

    // §2.4 ext — CUBE: all four grouping-set combinations in one pass
    // (Expand feeds a single partial+final hash aggregate; no re-scan per
    // grouping set).
    "q61_cube" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.4 ext — second-moment statistics (stddev/variance/covariance/
    // correlation/regression) in one partial+final hash aggregate. The
    // moments are derived from DECIMAL-exact power sums rather than the
    // built-in stddev/corr aggregates: the built-ins' single-pass
    // co-moment merge is partition-order-dependent at the ulp level
    // (nondeterministic across runs, unmatchable across engines), while
    // decimal sums are order-independent and the final double arithmetic
    // is the same IEEE expression tree in Spark and the oracle. Same
    // shuffle shape either way: one map-side-combined aggregate.
    // (The built-in stddev_samp/corr/regr_* functions are exercised with
    // tolerance in a ScalaTest instead.)
    "q64_stat_moments" -> ((s, dir) => {
      val dx = col("l_quantity").cast("decimal(18,2)")
      val dy = col("l_extendedprice").cast("decimal(18,2)")
      val agg = tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dx).as("sxd"), sum(dy).as("syd"),
          sum(dx * dx).as("sxxd"), sum(dy * dy).as("syyd"),
          sum(dx * dy).as("sxyd"))
      val n = col("n").cast("double")
      val sx = col("sxd").cast("double"); val sy = col("syd").cast("double")
      val sxx = col("sxxd").cast("double"); val syy = col("syyd").cast("double")
      val sxy = col("sxyd").cast("double")
      val mxx = sxx - sx * sx / n   // n * population co-moments
      val myy = syy - sy * sy / n
      val mxy = sxy - sx * sy / n
      agg.select(col("l_returnflag"), col("n"),
          sqrt(mxx / (n - 1)).as("sd_qty"),
          (myy / (n - 1)).as("var_price"),
          (mxy / (sqrt(mxx) * sqrt(myy))).as("corr_qty_price"),
          (mxy / (n - 1)).as("cov_qty_price"),
          (mxy / mxx).as("slope"),
          ((sy - (mxy / mxx) * sx) / n).as("intercept"))
        .orderBy("l_returnflag")
    }),

    // §2.4 ext — full analytic-window surface: offsets (lag/lead), frame
    // endpoints (first/last over a running frame), and rank distributions
    // (percent_rank/cume_dist) in ONE window spec — single sort+shuffle
    // on (custkey, orderdate), every function evaluated in the same pass.
    "q65_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      tbl(s, dir, "orders")
        .filter(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          lag("o_orderdate", 1).over(w).as("prev_date"),
          lead("o_orderdate", 1).over(w).as("next_date"),
          first("o_orderkey").over(w).as("first_key"),
          last("o_orderkey").over(w).as("latest_key"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // ext merge — CDC upsert without a table format: changed rows replace,
    // new rows append, untouched base passes through one anti join.
    "q67_merge_upsert" -> ((s, dir) => {
      val base = tbl(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val changed = base.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"))
      val inserts = base.filter(col("o_orderkey") % 17 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      ext.Merge.upsert(base, changed.unionByName(inserts), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // ext funnel — ordered-step funnel (view → click → purchase): one
    // shrinking min-aggregate per stage, no window over the event stream.
    "q71_funnel" -> ((s, dir) => {
      ext.Funnel.funnel(tbl(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // ext profile — per-key skew audit feeding the salting decision
    // (q27's mitigation): folding keys ≥ 50 into one synthesizes the hot
    // key the uniform testdata lacks.
    "q73_skew_audit" -> ((s, dir) => {
      val keyed = tbl(s, dir, "orders")
        .select(least(col("o_custkey"), lit(50L)).as("key"))
      ext.Profile.skewAudit(keyed, "key", ratioThreshold = 2.0)
        .orderBy("key")
    }),

    // ext text — co-occurrence lift (log-free PMI) over per-document
    // distinct terms: integer-exact count products, one double division.
    "q74_cooccurrence" -> ((s, dir) => {
      TextStats.cooccurrenceLift(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text", minPairs = 25L)
        .orderBy("term_a", "term_b")
    }),

    // ext profile — per-group z-score outliers from decimal power sums
    // (q64's determinism idiom applied to row-level filtering).
    "q75_zscore_outliers" -> ((s, dir) => {
      ext.Profile.zscoreOutliers(tbl(s, dir, "events"), "value", "event_type",
          zThreshold = 2.5)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    }),

    // ext profile — equal-frequency binning (deterministic ntile):
    // feature bins / range-partition boundaries with per-bin stats.
    "q77_quantile_bins" -> ((s, dir) => {
      ext.Profile.equalFrequencyBins(tbl(s, dir, "orders"),
          "o_totalprice", "o_orderkey", bins = 20)
        .orderBy("bin")
    }),

    // ext dedup — sub-document CONTAINMENT pairs (|A∩B|/|A| ≥ 0.9, the
    // asymmetric dedup Jaccard misses: a page inside a boilerplate-
    // wrapped copy); derived sub-documents are the first 60% of a doc's
    // words, so every one is exactly contained in its source.
    "q79_containment" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val k = greatest(floor(size(words) * 0.6).cast("int"), lit(3))
      val sub = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 30000).as("doc_id"),
          array_join(slice(words, lit(1), k), " ").as("text"))
      // 3-gram shingles: the corpus' word VOCABULARY is tiny, so word-set
      // containment is near-vacuous; shingle order-sensitivity makes
      // containment mean actual sub-document structure
      Dedup.containmentPairs(docs.union(sub), "doc_id", "text",
          threshold = 0.9, shingleSize = 3)
        .orderBy("id_a", "id_b")
    }),

    // §2.5 ext — FULL OUTER join (the reconciliation join: rows surviving
    // on either side, with a side indicator), completing the join-type
    // surface next to q05/q06 (inner), q20 (anti), q65-adjacent semis.
    "q78_full_outer" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("k"), col("c_name"))
      val o = tbl(s, dir, "orders").filter(col("o_custkey") % 2 === 0)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
      c.join(o, Seq("k"), "full_outer")
        .select(col("k"), col("c_name"), col("n_orders"),
          when(col("c_name").isNull, "orders_only")
            .when(col("n_orders").isNull, "customer_only")
            .otherwise("both").as("side"))
        .orderBy("k")
    }),

    // ext curation — the CAPSTONE composition: quality + repetition gates
    // → exact dedup → near-dedup (exact pair path) → benchmark
    // decontamination → leakage-safe split (components over the FULL
    // 0.6-threshold pair graph, computed once and reused by dedup) →
    // context-length chunking. Every stage is also independently gated;
    // this query gates the composition itself.
    // ext scale — Bloom-filter runtime join pruning: the probe (lineitem)
    // is pre-filtered by a one-row broadcast bitset of the selective build
    // side's keys BEFORE the join shuffle. No false negatives, so the
    // oracle is simply the plain inner join — identical result, cheaper
    // exchange. 2^17 bits over ~1.5k urgent orders at sf0.01 ≈ the ~1% FP
    // regime the module documents.
    "q96_bloom_prune_join" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val urgent = tbl(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      ext.BloomJoin.prunedJoin(li, urgent, "l_orderkey", "o_orderkey",
          numBits = 1 << 17, numHashes = 5)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .orderBy("o_custkey")
    }),

    // ext profile — recency-decayed activity mass per event type:
    // weight halves every 3 days before the fixed reference date, as an
    // exact power-of-two integer decay (no exp() float drift), summed
    // in one partial-aggregated pass.
    "q162_decay_counts" -> ((s, dir) => {
      ext.Profile.decayedCounts(tbl(s, dir, "events"), "event_type", "ts",
          refDate = "2024-02-01", halfLifeDays = 3)
        .orderBy("event_type")
    }),

    // ext linkage — blocked fuzzy join (entity resolution): typo'd probe
    // names re-linked to the name table through the (4-char prefix, ±2
    // length band) blocking contract + native codegen'd Jaro–Winkler
    // (byte-semantics pinned to DuckDB's, verified on adversarial
    // pairs). The oracle replays the same blocking predicate, so the
    // equi-join+explode blocking must lose exactly nothing. Score is
    // round-e4: every gate value sits ≥0.01 from a rounding boundary
    // (measured), so double noise cannot flip it.
    "q177_fuzzy_join" -> ((s, dir) => {
      val names = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          trim(lower(substring(col("text"), 1, 20))).as("name"))
      val probes = names.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 90000).as("probe_id"),
          expr("concat(substr(name,1,4), substr(name,6,1), " +
            "substr(name,5,1), substr(name,7))").as("name"))
      ext.Linkage.fuzzyJoin(probes, "probe_id", "name",
          names, "doc_id", "name", threshold = 0.85, lengthBand = 2,
          blockPrefix = 4)
        .select(col("id_l"), col("id_r"),
          round(col("jw") * 10000).cast("long").as("jw_e4"))
        .orderBy("id_l", "id_r")
    }),

    // ext versioning — corpus snapshot diff: prev = docs without the
    // %17 slice, next = docs without the %19 slice and with the %11
    // slice's text rewritten — so the diff must report added (in next
    // only), removed (in prev only) and changed (digest differs), and
    // NOTHING else. Digests join, documents never shuffle.
    "q196_snapshot_diff" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val prev = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(lit("edited: "), col("text"))).otherwise(col("text"))
            .as("text"))
      ext.Merge.snapshotDiff(prev, next, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext linkage — SymSpell edit-distance-1 join: every %4==0 doc's
    // name gets a one-deletion typo twin (id+90000); the deletion-
    // neighborhood equi-join is LOSSLESS for ed ≤ 1 (unlike q177's
    // stated-recall blocking), so the oracle is the plain all-pairs
    // levenshtein filter.
    "q201_symspell_join" -> ((s, dir) => {
      val names = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          trim(lower(substring(col("text"), 1, 14))).as("name"))
      val typos = names.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 90000).as("doc_id"),
          concat(substring(col("name"), 1, 5),
            substring(col("name"), 7, 1000)).as("name"))
      ext.Linkage.editDistanceOneJoin(names.union(typos), "doc_id", "name")
        .orderBy("id_a", "id_b")
    }),

    // ext temporal — clickstream paths per (user, session): q19's gap
    // rule, (ts, event_id) total order, the path string assembled by
    // an in-row struct sort so partition order can't leak. Oracle uses
    // DuckDB's ordered string_agg over the same session frame.
    "q209_session_paths" -> ((s, dir) => {
      ext.Funnel.sessionPaths(tbl(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type", gapMinutes = 30)
        .select("user_id", "sess_id", "n_events", "start_us", "end_us",
          "duration_us", "path")
        .orderBy("user_id", "sess_id")
    }),

    // ext analytics — retention-cohort matrix over events: entities
    // cohort by first active day, cells count distinct active entities
    // per (cohort, day-offset), cohort size + ppm retention ride along.
    // One corpus-sized distinct, calendar-bounded windows, a grid-sized
    // aggregate.
    "q223_retention_cohorts" -> ((s, dir) => {
      ext.Funnel.retentionCohorts(tbl(s, dir, "events"), "user_id", "ts",
          maxOffsetDays = 14)
        .orderBy("cohort_day", "offset_days")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q38_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
        |  2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    // Bloom pruning has no false negatives, so the oracle is the PLAIN
    // inner join — the equivalence is the entire correctness claim
    "q96_bloom_prune_join" ->
      """SELECT o_custkey,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // Session windows re-derived via lag/cumsum: session_start = min ts of
    // each gap-merged run per user.
    "q55_session_window" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e),
         |y AS (
         |  SELECT user_id, ts,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM x)
         |SELECT min(ts) AS session_start, user_id,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM y
         |GROUP BY user_id, sess
         |ORDER BY user_id, session_start""".stripMargin,

    "q57_gap_fill" ->
      s"""WITH e AS ($EventsCte),
         |daily AS (
         |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |  FROM e WHERE event_type = 'purchase'
         |  GROUP BY 1, 2),
         |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         |alldays AS (
         |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
         |  FROM spans)
         |SELECT a.user_id, a.day, d.v,
         |  last_value(d.v IGNORE NULLS) OVER (
         |    PARTITION BY a.user_id ORDER BY a.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM alldays a LEFT JOIN daily d ON a.user_id = d.user_id AND a.day = d.day
         |ORDER BY a.user_id, a.day""".stripMargin,

    "q58_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(t AS DOUBLE) AS daily_total,
        |  CAST(sum(t) OVER w AS DOUBLE)
        |    / count(t) OVER w AS ma7,
        |  CAST(count(t) OVER w AS BIGINT) AS n_days
        |FROM daily
        |WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    // same semantics as q08, via the partial top-k Aggregator
    "q54_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    "q19_sessionize" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM e),
         |y AS (
         |  SELECT user_id, event_id, us,
         |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
         |  FROM x),
         |z AS (
         |  SELECT user_id,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM y)
         |SELECT user_id,
         |  CAST(max(sess_id) AS BIGINT) AS n_sessions,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM z
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q20_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q21_rollup" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    // The salted join must be indistinguishable from the plain join.
    "q27_skew_salted_join" ->
      """SELECT s_name,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q29_setops" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice < 50000
        |) EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 50000 AND o_custkey % 100 = 0
        |ORDER BY custkey""".stripMargin,

    // Pivot: absent (user, type) combinations yield NULL (count over an
    // empty filtered set via sum-of-cases mirrors Spark pivot-count).
    "q30_pivot" ->
      s"""WITH e AS ($EventsCte)
         |SELECT user_id,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
         |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
         |FROM e
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q33_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_quantity, 0.99) AS p99_qty
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q34_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q36_fuzzy_match" ->
      """SELECT doc_id,
        |  CAST(levenshtein(substr(text, 1, 30), 'the quick brown fox jumps over') AS BIGINT) AS dist_prose,
        |  CAST(levenshtein(substr(text, 1, 30), 'spark query engine data stream') AS BIGINT) AS dist_tech,
        |  CASE WHEN levenshtein(substr(text, 1, 30), 'the quick brown fox jumps over')
        |         <= levenshtein(substr(text, 1, 30), 'spark query engine data stream')
        |       THEN 'prose' ELSE 'tech' END AS nearest
        |FROM documents""".stripMargin,

    "q40_asof_join" ->
      s"""WITH e AS ($EventsCte),
         |b AS (SELECT user_id, ts, event_id, value FROM e WHERE event_type = 'purchase')
         |SELECT a.event_id,
         |  b.event_id AS prior_purchase_id,
         |  epoch_us(a.ts) - epoch_us(b.ts) AS micros_since_purchase,
         |  b.value AS prior_purchase_value
         |FROM e a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
         |ORDER BY a.event_id""".stripMargin,

    "q41_range_join" ->
      """WITH promos AS (
        |  SELECT o_orderkey AS promo_id, o_orderdate AS start_ts,
        |         o_orderdate + INTERVAL 7 DAY AS end_ts
        |  FROM orders WHERE o_orderkey % 500 = 0)
        |SELECT promo_id,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN promos
        |  ON l_shipdate >= start_ts AND l_shipdate < end_ts
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q42_grouping_sets" ->
      """SELECT r_name, c_mktsegment,
        |  CAST(grouping(r_name) AS INT) AS g_region,
        |  CAST(grouping(c_mktsegment) AS INT) AS g_segment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment), ())
        |ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q43_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
        |  array_to_string((list(o_orderkey ORDER BY o_orderkey))[1:3], ',') AS first3,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS top_order
        |FROM orders
        |WHERE o_custkey < 200
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q44_unpivot" ->
      """SELECT l_returnflag, metric, val FROM (
        |  UNPIVOT (
        |    SELECT l_returnflag,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        |    FROM lineitem GROUP BY 1)
        |  ON sum_qty, sum_price, sum_disc INTO NAME metric VALUE val)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q46_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q48_sliding_window" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT unnest([
         |      make_timestamp((epoch_us(ts) // 43200000000) * 43200000000),
         |      make_timestamp(((epoch_us(ts) // 43200000000) - 1) * 43200000000)]) AS w_start,
         |    event_type, value
         |  FROM e)
         |SELECT w_start, event_type,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM x
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q61_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // decimal-exact power sums → identical IEEE double arithmetic (same
    // expression tree as the Spark side; see the q64 query comment)
    "q64_stat_moments" ->
      """WITH sums AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sxd,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS syd,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxxd,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syyd,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxyd
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(sxd AS DOUBLE) AS sx, CAST(syd AS DOUBLE) AS sy,
        |    CAST(sxxd AS DOUBLE) AS sxx, CAST(syyd AS DOUBLE) AS syy,
        |    CAST(sxyd AS DOUBLE) AS sxy
        |  FROM sums),
        |m AS (
        |  SELECT l_returnflag, n, nd, sx, sy,
        |    sxx - sx * sx / nd AS mxx,
        |    syy - sy * sy / nd AS myy,
        |    sxy - sx * sy / nd AS mxy
        |  FROM d)
        |SELECT l_returnflag, n,
        |  sqrt(mxx / (nd - 1)) AS sd_qty,
        |  myy / (nd - 1) AS var_price,
        |  mxy / (sqrt(mxx) * sqrt(myy)) AS corr_qty_price,
        |  mxy / (nd - 1) AS cov_qty_price,
        |  mxy / mxx AS slope,
        |  (sy - (mxy / mxx) * sx) / nd AS intercept
        |FROM m
        |ORDER BY l_returnflag""".stripMargin,

    "q65_window_analytics" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  lag(o_orderdate, 1) OVER w AS prev_date,
        |  lead(o_orderdate, 1) OVER w AS next_date,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS latest_key,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WHERE o_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q67_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        |  FROM base WHERE o_orderkey % 17 = 0)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM upd
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice FROM base
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |ORDER BY o_orderkey""".stripMargin,

    "q71_funnel" ->
      s"""WITH ev AS ($EventsCte),
         |s1 AS (SELECT user_id, min(ts) AS t_1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t_2 FROM ev e JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.ts > s1.t_1 GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts) AS t_3 FROM ev e JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_2 GROUP BY 1)
         |SELECT s1.user_id, t_1, t_2, t_3,
         |  CAST(1 + (CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END)
         |         + (CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY 1""".stripMargin,

    "q73_skew_audit" ->
      """WITH k AS (SELECT least(o_custkey, 50) AS key FROM orders),
        |c AS (SELECT key, CAST(count(*) AS BIGINT) AS n_rows FROM k GROUP BY 1),
        |s AS (SELECT CAST(sum(n_rows) AS DOUBLE) / count(*) AS mean_rows FROM c)
        |SELECT key, n_rows, mean_rows,
        |  CAST(n_rows AS DOUBLE) / mean_rows AS ratio,
        |  TRUE AS is_hot
        |FROM c CROSS JOIN s
        |WHERE CAST(n_rows AS DOUBLE) / mean_rows >= 2.0
        |ORDER BY key""".stripMargin,

    "q74_cooccurrence" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
        |dt AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |    FROM d)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
        |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n_t FROM dt GROUP BY 1),
        |p AS (
        |  SELECT a.term AS term_a, b.term AS term_b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING count(*) >= 25)
        |SELECT term_a, term_b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
        |  CAST(n_ab * n_docs AS DOUBLE) / CAST(ta.n_t * tb.n_t AS DOUBLE) AS lift
        |FROM p
        |JOIN tf ta ON p.term_a = ta.term
        |JOIN tf tb ON p.term_b = tb.term
        |CROSS JOIN nd
        |ORDER BY term_a, term_b""".stripMargin,

    // q64's decimal power-sum idiom: value is 2-decimal money-like, so the
    // DECIMAL(18,2) cast and the decimal products/sums are EXACT; the
    // mean/sd derivation mirrors zscoreOutliers' association order step
    // for step, making the flagged row set engine-identical.
    "q75_zscore_outliers" ->
      s"""WITH ev AS ($EventsCte),
         |m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(value AS DECIMAL(18,2))) AS sxd,
         |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxxd
         |  FROM ev GROUP BY 1),
         |s AS (
         |  SELECT event_type,
         |    CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    sqrt((CAST(sxxd AS DOUBLE)
         |        - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n AS DOUBLE) - 1)) AS sd
         |  FROM m)
         |SELECT event_id, e.event_type, value, (value - mean) / sd AS z
         |FROM ev e JOIN s ON e.event_type = s.event_type
         |WHERE NOT isnan(sd) AND sd > 0 AND abs((value - mean) / sd) > 2.5
         |ORDER BY event_id""".stripMargin,

    "q77_quantile_bins" ->
      """WITH b AS (
        |  SELECT o_totalprice,
        |    ntile(20) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
        |  FROM orders)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM b GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // brute-force exact oracle — the engine's asymmetric prefix filter is
    // lossless, so the pair sets must match exactly
    "q79_containment" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 30000,
         |    array_to_string(list_slice(string_split(text, ' '), 1,
         |      greatest(CAST(floor(len(string_split(text, ' ')) * 0.6) AS INT), 3)),
         |      ' ') AS text
         |  FROM documents WHERE doc_id % 9 = 0),
         |$ShingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS containment
         |FROM sh a JOIN sh b ON a.doc_id != b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    "q78_full_outer" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, c_name FROM customer WHERE c_custkey % 3 = 0),
        |o AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1)
        |SELECT k, c_name, n_orders,
        |  CASE WHEN c_name IS NULL THEN 'orders_only'
        |       WHEN n_orders IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS side
        |FROM c FULL JOIN o USING (k)
        |ORDER BY k""".stripMargin,

    // the same clamped power-of-two decay, replayed per event
    "q162_decay_counts" -> {
      s"""WITH e AS ($EventsCte)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(1000000 // CAST(power(2, least(
         |    greatest(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01'), 0)
         |      // 3, 30)) AS BIGINT)) AS BIGINT) AS decayed_mass
         |FROM e
         |WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin
    },

    // the full blocking contract in the WHERE clause: first char equal,
    // length within the band, JW ≥ threshold (DuckDB's byte-based
    // jaro_winkler_similarity is the pinned reference semantics)
    "q177_fuzzy_join" ->
      """WITH names AS (
        |  SELECT doc_id, trim(lower(substr(text, 1, 20))) AS n
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |probes AS (
        |  SELECT doc_id + 90000 AS id_l,
        |    concat(substr(n, 1, 4), substr(n, 6, 1),
        |      substr(n, 5, 1), substr(n, 7)) AS p
        |  FROM names WHERE doc_id % 3 = 0)
        |SELECT a.id_l, b.doc_id AS id_r,
        |  CAST(round(jaro_winkler_similarity(a.p, b.n) * 10000) AS BIGINT)
        |    AS jw_e4
        |FROM probes a JOIN names b
        |  ON substr(a.p, 1, 4) = substr(b.n, 1, 4)
        |  AND abs(length(a.p) - length(b.n)) <= 2
        |  AND length(a.p) > 0 AND length(b.n) > 0
        |  AND jaro_winkler_similarity(a.p, b.n) >= 0.85
        |ORDER BY id_l, id_r""".stripMargin,

    // membership by the mod slices; changed = the rewritten %11 slice
    // present on both sides
    "q196_snapshot_diff" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 17 = 0 THEN 'added'
        |       WHEN doc_id % 19 = 0 THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM d
        |WHERE (doc_id % 17 = 0 AND doc_id % 19 <> 0)
        |   OR (doc_id % 19 = 0 AND doc_id % 17 <> 0)
        |   OR (doc_id % 11 = 0 AND doc_id % 17 <> 0 AND doc_id % 19 <> 0)
        |ORDER BY doc_id""".stripMargin,

    // the blocking is lossless, so the oracle is brute force: all pairs
    // over names ∪ one-deletion typos with levenshtein ≤ 1
    "q201_symspell_join" ->
      """WITH n AS (
        |  SELECT doc_id, trim(lower(substr(text, 1, 14))) AS name
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 90000,
        |    substr(trim(lower(substr(text, 1, 14))), 1, 5)
        |      || substr(trim(lower(substr(text, 1, 14))), 7)
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0),
        |nn AS (SELECT doc_id, name FROM n WHERE length(name) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM nn a JOIN nn b ON b.doc_id > a.doc_id
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // the q19 session CTEs + an ORDER BY inside string_agg
    "q209_session_paths" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev_us
         |  FROM e
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
         |y AS (
         |  SELECT user_id, event_id, event_type, us,
         |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
         |      THEN 1 ELSE 0 END AS is_new
         |  FROM x),
         |z AS (
         |  SELECT user_id, event_id, event_type, us,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM y),
         |p AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
         |    ORDER BY us, event_id) AS rn
         |  FROM z)
         |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(min(us) AS BIGINT) AS start_us,
         |  CAST(max(us) AS BIGINT) AS end_us,
         |  CAST(max(us) - min(us) AS BIGINT) AS duration_us,
         |  string_agg(CASE WHEN rn <= 64 THEN event_type END, '>'
         |    ORDER BY us, event_id) AS path
         |FROM p GROUP BY user_id, sess_id
         |ORDER BY user_id, sess_id""".stripMargin,

    "q223_retention_cohorts" ->
      s"""WITH e AS ($EventsCte),
         |a AS (
         |  SELECT DISTINCT user_id AS ue, CAST(ts AS DATE) AS day
         |  FROM e WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |c AS (
         |  SELECT ue, day, min(day) OVER (PARTITION BY ue) AS cohort_day
         |  FROM a),
         |cells AS (
         |  SELECT cohort_day,
         |    CAST(day - cohort_day AS INT) AS offset_days,
         |    CAST(count(*) AS BIGINT) AS n_active
         |  FROM c WHERE day - cohort_day <= 14
         |  GROUP BY 1, 2)
         |SELECT cohort_day, offset_days, n_active,
         |  CAST(max(CASE WHEN offset_days = 0 THEN n_active END)
         |    OVER (PARTITION BY cohort_day) AS BIGINT) AS cohort_size,
         |  CAST(n_active * 1000000 //
         |    max(CASE WHEN offset_days = 0 THEN n_active END)
         |      OVER (PARTITION BY cohort_day) AS BIGINT) AS retention_e6
         |FROM cells
         |ORDER BY cohort_day, offset_days""".stripMargin,
  )
}
