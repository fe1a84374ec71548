package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("earliest strictly-increasing chain per user, depth counts stages") {
    val events = Seq(
      // u1 completes the funnel, with decoys: a click BEFORE the first
      // view must not count; the earliest valid click does
      (1L, ts("2024-01-01 09:00:00"), "click"),
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 10:30:00"), "view"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 stalls after click
      (2L, ts("2024-01-02 10:00:00"), "view"),
      (2L, ts("2024-01-02 11:00:00"), "click"),
      // u3 purchases BEFORE clicking: chain must not skip order
      (3L, ts("2024-01-03 10:00:00"), "view"),
      (3L, ts("2024-01-03 09:00:00"), "purchase"),
      // u4 never views: excluded entirely
      (4L, ts("2024-01-04 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")

    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Long)]
      .collect().toSeq

    assert(out == Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 11:00:00")),
        Some(ts("2024-01-01 12:00:00")), 3L),
      (2L, ts("2024-01-02 10:00:00"), Some(ts("2024-01-02 11:00:00")), None, 2L),
      (3L, ts("2024-01-03 10:00:00"), None, None, 1L)))
  }

  test("equal timestamps do not advance the funnel (strict ordering)") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("view", "click")).collect()
    assert(out.length == 1 && out(0).isNullAt(2) && out(0).getLong(3) == 1L)
  }

  test("single-step funnel degenerates to a min aggregate") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 09:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Funnel.funnel(events, "user_id", "ts", "event_type", Seq("view"))
      .as[(Long, Timestamp, Long)].collect().toSeq
    assert(out == Seq((1L, ts("2024-01-01 09:00:00"), 1L)))
  }

  test("sessionPaths: gap split, in-row order, cap, partition invariance") {
    def t(min: Long) = new Timestamp(
      Timestamp.valueOf("2024-03-01 12:00:00").getTime + min * 60000)
    val events = Seq(
      (1L, t(0), 10L, "view"), (1L, t(5), 11L, "click"),
      (1L, t(10), 12L, "purchase"),
      (1L, t(100), 13L, "view"),                       // new session (gap)
      (2L, t(0), 20L, "view"),
      // same-timestamp pair: event_id breaks the tie deterministically
      (3L, t(0), 31L, "b"), (3L, t(0), 30L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Funnel.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30)
      .select("user_id", "sess_id", "n_events", "duration_us", "path")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 1L)) == ((3L, 600000000L, "view>click>purchase")))
    assert(got((1L, 2L)) == ((1L, 0L, "view")))
    assert(got((2L, 1L)) == ((1L, 0L, "view")))
    assert(got((3L, 1L)) == ((2L, 0L, "a>b")), "event_id breaks ts ties")
    // cap: path truncates, n_events does not
    val capped = Funnel.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30, maxPathEvents = 2)
      .filter($"user_id" === 1L && $"sess_id" === 1L)
      .select("n_events", "path").as[(Long, String)].collect().head
    assert(capped == ((3L, "view>click")))
    // repartitioning cannot change any path (in-row sort, not order-by)
    val again = Funnel.sessionPaths(events.repartition(7), "user_id", "ts",
        "event_id", "event_type", gapMinutes = 30)
      .select("user_id", "sess_id", "path").as[(Long, Long, String)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(again == got.view.mapValues(_._3).toMap)
  }

  test("sessionPaths: a runaway 1e5-event session collects only the cap") {
    // one bot entity, 100k events in a single session (1s apart, gap
    // never fires): the collect buffer must hold ≤ maxPathEvents structs
    // — the cap applies BEFORE collection — while n_events stays exact
    val base = Timestamp.valueOf("2024-05-01 00:00:00").getTime
    val n = 100000
    val events = spark.range(n.toLong).select(
      lit(9L).as("user_id"),
      timestamp_millis(lit(base) + col("id") * 1000L).as("ts"),
      col("id").as("event_id"),
      concat(lit("e"), (col("id") % 7).cast("string")).as("event_type"))
    val got = Funnel.sessionPaths(events, "user_id", "ts", "event_id",
        "event_type", gapMinutes = 30, maxPathEvents = 8)
      .select("n_events", "path").as[(Long, String)].collect()
    assert(got.length == 1)
    val (nEvents, path) = got.head
    assert(nEvents == n.toLong, "true count reported exactly")
    assert(path == (0 until 8).map(i => s"e${i % 7}").mkString(">"),
      "path holds exactly the first cap-many events in time order")
  }

  test("retentionCohorts: matrix matches the hand computation") {
    def ts(d: String) = Timestamp.valueOf(s"2024-06-$d 10:00:00")
    // u1 cohort 01, active 01/02/04; u2 cohort 01, active 01 only;
    // u3 cohort 02, active 02/03; u4 cohort 01 but offset 20 > cap;
    // duplicate same-day events never double-count
    val events = Seq(
      (1L, ts("01")), (1L, ts("01")), (1L, ts("02")), (1L, ts("04")),
      (2L, ts("01")),
      (3L, ts("02")), (3L, ts("03")),
      (4L, ts("01")), (4L, ts("21"))
    ).toDF("user_id", "ts")
    val got = Funnel.retentionCohorts(events, "user_id", "ts",
        maxOffsetDays = 14)
      .select(col("cohort_day").cast("string"), col("offset_days"),
        col("n_active"), col("cohort_size"), col("retention_e6"))
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-06-01", 0, 3L, 3L, 1000000L),
      ("2024-06-01", 1, 1L, 3L, 333333L),
      ("2024-06-01", 3, 1L, 3L, 333333L),
      ("2024-06-02", 0, 1L, 1L, 1000000L),
      ("2024-06-02", 1, 1L, 1L, 1000000L)))
  }

  test("retentionCohorts: nulls dropped, offset-0 row always present") {
    val events = Seq(
      (Some(1L), Some(Timestamp.valueOf("2024-06-01 00:00:00"))),
      (None, Some(Timestamp.valueOf("2024-06-01 00:00:00"))),
      (Some(2L), None)
    ).toDF("user_id", "ts")
    val got = Funnel.retentionCohorts(events, "user_id", "ts")
      .select("offset_days", "n_active", "cohort_size")
      .as[(Int, Long, Long)].collect()
    assert(got.toSeq == Seq((0, 1L, 1L)))
  }
}
