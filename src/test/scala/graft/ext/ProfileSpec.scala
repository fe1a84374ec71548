package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (3L, None, 20.0),
    (4L, Some("a"), 30.0),
    (5L, None, 10.0)
  ).toDF("id", "cat", "v")

  test("exact profile: counts, nulls, distincts, min/max per column") {
    val p = Profile.columnProfile(df, Seq("id", "cat", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((5L, 0L, 5L, "1", "5")))
    assert(p("cat") == ((5L, 2L, 2L, "a", "b")))
    assert(p("v") == ((5L, 0L, 3L, "10.0", "30.0")))
  }

  test("approx profile: same shape, estimate within rsd, no Expand node") {
    val p = Profile.columnProfileApprox(df, Seq("id", "cat"), rsd = 0.01)
    val rows = p.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("id") == 5L && rows("cat") == 2L) // tiny input: exact
    // the scale property: HLL profile must not plan the k-distinct Expand
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile planned an Expand:\n$plan")
    val exactPlan = Profile.columnProfile(df, Seq("id", "cat"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand")) // and the exact one does (k=2 distincts)
  }

  test("profile over an empty frame yields zero rows/nulls and null min/max") {
    val p = Profile.columnProfile(df.filter(col("id") < 0), Seq("id", "cat"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.isNullAt(4), r.isNullAt(5)))).toMap
    assert(p("id") == ((0L, 0L, 0L, true, true)))
    assert(p("cat") == ((0L, 0L, 0L, true, true)))
  }

  test("skewAudit flags only keys above the ratio threshold") {
    // key 1: 8 rows; keys 2..5: 1 row each -> mean 2.4, ratio(1) = 3.33
    val rows = (Seq.fill(8)(1L) ++ Seq(2L, 3L, 4L, 5L)).toDF("k")
    val hot = Profile.skewAudit(rows, "k", ratioThreshold = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(hot.toSeq == Seq((1L, 8L, 8.0 / 2.4)))
  }

  test("zscoreOutliers: only the planted outlier crosses the threshold") {
    val vals = (Seq.fill(30)(10.0) ++ Seq(11.0, 9.0, 100.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "grp", "v")
    val out = Profile.zscoreOutliers(vals, "v", "grp", zThreshold = 2.5)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((32L, 100.0)))
  }

  test("zscoreOutliers: constant and single-row groups flag NOTHING") {
    // constant group -> sd = 0 -> z = NaN; single row -> sd = NaN. Spark
    // orders NaN above every number, so an unguarded abs(z) > t would
    // return the entire group as "outliers".
    val vals = (Seq.fill(10)((1L, "const", 5.0)) ++ Seq((99L, "solo", 7.0)) ++
      Seq.fill(30)((2L, "ok", 10.0)) :+ ((3L, "ok", 100.0)))
      .toDF("id", "grp", "v")
    val out = Profile.zscoreOutliers(vals, "v", "grp", zThreshold = 2.5)
      .select("grp", "v").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(out == Seq(("ok", 100.0)))
  }

  test("equalFrequencyBins: near-equal sizes, contiguous non-overlapping ranges") {
    val df = spark.range(0, 1003).select(col("id").as("tie"),
      (col("id") * 7 % 1003).cast("double").as("v"))
    val bins = Profile.equalFrequencyBins(df, "v", "tie", bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bins.length == 10)
    assert(bins.map(_._2).sum == 1003L)
    assert(bins.map(_._2).max - bins.map(_._2).min <= 1) // equal frequency
    bins.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"bin ranges overlap: $lo vs $hi")
    }
  }

  test("equalFrequencyBinsApprox: same shape, near-equal sizes, NO global sort") {
    val df = spark.range(0, 5000).select(
      (col("id") * 7 % 5000).cast("double").as("v"))
      .repartition(4)
    val out = Profile.equalFrequencyBinsApprox(df, "v", bins = 10)
    val bins = out.orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(bins.map(_._2).sum == 5000L)
    assert(bins.length == 10)
    // approximate equal-frequency: each bin within 20% of the ideal 500
    assert(bins.map(_._2).forall(n => n > 400 && n < 600),
      s"bins far from equal-frequency: ${bins.map(_._2).toSeq}")
    // ranges contiguous and non-overlapping
    bins.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"bin ranges overlap: $lo vs $hi")
    }
    // the scale property: no window, no sort AT ALL — the whole point of
    // the approx path vs the exact ntile. (The percentile_approx global
    // aggregate does merge its constant-size sketch buffers through a
    // one-row SinglePartition exchange; that is not a data sort and is
    // fine — what must be absent is any WindowExec/SortExec over the
    // input rows.)
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = out.queryExecution.executedPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      s"approx bins planned a window:\n$plan")
    assert(plan.collect { case s: SortExec => s }.isEmpty,
      s"approx bins planned a sort:\n$plan")
  }

  test("diffProfiles: deltas, range-change flags, added/removed columns") {
    val before = Profile.columnProfile(df, Seq("id", "cat"))
    val after = Profile.columnProfile(
      df.filter(col("id") <= 3).withColumnRenamed("cat", "category"),
      Seq("id", "category"))
    val out = Profile.diffProfiles(before, after)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(4), r.getBoolean(5), r.getString(6)))).toMap
    assert(out("id") == ((-2L, false, true, "common"))) // max 5 -> 3
    assert(out("category")._4 == "added")
    assert(out("cat")._4 == "removed")
  }

  test("equalFrequencyBinsApprox: bins=1 degenerates to one whole-range bin") {
    val df = spark.range(0, 100).select(col("id").cast("double").as("v"))
    val out = Profile.equalFrequencyBinsApprox(df, "v", bins = 1).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 100L)
    assert(out(0).getDouble(2) == 0.0 && out(0).getDouble(3) == 99.0)
  }

  test("zscoreOutliers degrades to a shuffle join when broadcast is off (no forced hint)") {
    val vals = (Seq.fill(30)(10.0) ++ Seq(100.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, s"g${i % 3}", v) }
      .toDF("id", "grp", "v")
    // string-match the FINAL adaptive plan: in Spark 4 AQE the stages nest
    // inside QueryStageExec nodes whose contents a plain collect() does
    // not traverse
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    // broadcast disabled: a forced hint would still broadcast (the OOM
    // path at high group cardinality); the unhinted join must degrade to
    // a shuffled join instead
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.flatMap(Option(_))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = finalPlan(Profile.zscoreOutliers(vals, "v", "grp", zThreshold = 2.5))
      assert(!p.contains("BroadcastHashJoin"),
        s"broadcast disabled but the stats join still broadcasts (forced hint?):\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffled stats join:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
    // defaults back on: AQE sees the tiny per-group stats side and
    // broadcasts it at runtime — small-group case stays a broadcast join
    val p2 = finalPlan(Profile.zscoreOutliers(vals, "v", "grp", zThreshold = 2.5))
    assert(p2.contains("BroadcastHashJoin"),
      s"small stats side did not broadcast under AQE:\n$p2")
  }

  test("decayedCounts: exact power-of-two halving, clamps, null hygiene") {
    val rows = Seq(
      (Some("a"), Some("2024-01-31 12:00:00")), // age 1 → bucket 0 → 1e6
      (Some("a"), Some("2024-01-26 00:00:00")), // age 6 → bucket 2 → 250000
      (Some("a"), Some("2023-01-01 00:00:00")), // age 396 → clamp 30 → 0
      (Some("b"), Some("2024-02-05 00:00:00")), // future → age 0 → 1e6
      (None, Some("2024-01-31 00:00:00")),      // null key dropped
      (Some("c"), None))                        // null ts dropped
      .toDF("k", "ts_s")
      .selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts")
    val got = Profile.decayedCounts(rows, "k", "ts", "2024-02-01", 3)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map("a" -> (3L, 1250000L), "b" -> (1L, 1000000L)))
  }

  test("burstSignals: sliding event-time window, ratios, flags") {
    def ts(sec: Long) = new java.sql.Timestamp(
      java.sql.Timestamp.valueOf("2024-03-01 12:00:00").getTime + sec * 1000)
    val rows = Seq(
      // user 1: 3 events inside 60s (0, 30, 59), 1 outside (200) → burst 3
      (1L, ts(0), "view"), (1L, ts(30), "view"), (1L, ts(59), "click"),
      (1L, ts(200), "view"),
      // user 2: spread out, but half errors → flagged on ratio
      (2L, ts(0), "error"), (2L, ts(500), "view"),
      // user 3: quiet and clean
      (3L, ts(0), "view"), (3L, ts(1000), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Profile.burstSignals(rows, "user_id", "ts", "event_type",
        "error", windowSecs = 60, rateThreshold = 3L,
        errorRatioE6Threshold = 500000L)
      .select("user_id", "n_events", "n_errors", "max_burst",
        "error_ratio_e6", "is_suspect")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((4L, 0L, 3L, 0L, true)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 1L, 500000L, true)))
    assert(got(3L) == ((2L, 0L, 1L, 0L, false)))
    // window is EVENT time: an event exactly 60s later must not stack
    val edge = Seq((9L, ts(0), "view"), (9L, ts(60), "view"))
      .toDF("user_id", "ts", "event_type")
    val b = Profile.burstSignals(edge, "user_id", "ts", "event_type",
        "error", windowSecs = 60, 99L, 999999L)
      .select("max_burst").as[Long].collect().head
    assert(b == 1L)
  }
}
