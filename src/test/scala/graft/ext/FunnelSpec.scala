package graft.ext

import java.sql.Timestamp

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
}
