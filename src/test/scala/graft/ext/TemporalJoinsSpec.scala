package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin: most recent build row at or before each probe time") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any build row
      (3L, ts("2024-01-01 09:00:00"), "p4")  // key with no build rows
    ).toDF("k", "t", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (2L, ts("2024-01-01 09:00:00"), 30.0)  // equal time: inclusive match
    ).toDF("k", "bt", "v")

    val out = TemporalJoins.asofJoin(probe, build, "k", "t", "bt",
        Seq("bt", "v"))
      .select("tag", "asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(out("p1").contains(10.0), "10:00 sees the 09:30 build row")
    assert(out("p2").contains(20.0), "12:00 sees the 11:00 row, not 09:30")
    assert(out("p3").contains(30.0), "equal timestamps match (inclusive)")
    assert(out("p4").isEmpty, "left semantics: no build rows -> null")
  }

  test("asofJoin: null keys never match (SQL equality semantics)") {
    val probe = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), "pnull"),
      (Some(1L), ts("2024-01-01 10:00:00"), "p1"))
      .toDF("k", "t", "tag")
    val build = Seq((Option.empty[Long], ts("2024-01-01 09:00:00"), 5.0),
      (Some(1L), ts("2024-01-01 09:00:00"), 7.0))
      .toDF("k", "bt", "v")
    val out = TemporalJoins.asofJoin(probe, build, "k", "t", "bt", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("pnull").isEmpty, "null-key probe must NOT match null-key build")
    assert(out("p1").contains(7.0))
  }

  test("asofJoin: equal-time build duplicates resolve deterministically") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5.0),
      (1L, ts("2024-01-01 09:00:00"), 7.0)
    ).toDF("k", "bt", "v")
    val picked = (1 to 5).map { _ =>
      TemporalJoins.asofJoin(probe, build, "k", "t", "bt", Seq("v"))
        .select("asof_v").as[Double].head()
    }
    assert(picked.distinct.size == 1, s"must be stable across runs: $picked")
    assert(picked.head == 7.0, "payload-order tie-break keeps the greatest")
  }

  test("byTimeBuckets: equals the naive non-equi join, boundaries exact") {
    val probe = Seq(
      (1L, ts("2024-01-05 00:00:00")),  // == start: included
      (2L, ts("2024-01-07 23:59:59")),
      (3L, ts("2024-01-08 00:00:00")),  // == end: excluded
      (4L, ts("2024-02-01 12:00:00"))   // no interval
    ).toDF("pid", "pt")
    val intervals = Seq(
      (100L, ts("2024-01-05 00:00:00"), ts("2024-01-08 00:00:00")),
      (200L, ts("2024-01-07 12:00:00"), ts("2024-01-09 00:00:00"))
    ).toDF("iid", "start", "end")

    val fast = TemporalJoins.byTimeBuckets(probe, intervals, "pt", "start", "end")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = probe.join(intervals,
        col("pt") >= col("start") && col("pt") < col("end"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive)
    assert(fast == Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L)))
  }

  test("physical plans: equi-join shapes, no nested loop") {
    val probe = Seq((1L, ts("2024-01-05 10:30:00"))).toDF("pid", "pt")
    val intervals = Seq((100L, ts("2024-01-05 10:00:00"), ts("2024-01-05 12:00:00")))
      .toDF("iid", "start", "end")
    val rangePlan = TemporalJoins.byTimeBuckets(probe, intervals, "pt", "start", "end")
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("BroadcastNestedLoop"),
      s"range join must be an equi-join on the bucket, got:\n$rangePlan")

    val build = Seq((1L, ts("2024-01-05 09:00:00"), 5.0)).toDF("pid", "bt", "v")
    val asofPlan = TemporalJoins.asofJoin(probe, build, "pid", "pt", "bt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!asofPlan.contains("Join"),
      s"as-of join must be union+window (zero join operators), got:\n$asofPlan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(asofPlan).size
    assert(shuffles == 1,
      s"as-of join must shuffle exactly once, on the key; got $shuffles:\n$asofPlan")
  }

  test("byTimeBuckets: sub-bucket intervals and each pair exactly once") {
    // a 2-hour interval inside one day bucket, plus a probe hitting an
    // interval spanning three buckets — still exactly one output row each
    val probe = Seq(
      (1L, ts("2024-01-05 10:30:00")),
      (2L, ts("2024-01-06 03:00:00"))
    ).toDF("pid", "pt")
    val intervals = Seq(
      (100L, ts("2024-01-05 10:00:00"), ts("2024-01-05 12:00:00")),
      (200L, ts("2024-01-04 12:00:00"), ts("2024-01-07 00:00:00"))
    ).toDF("iid", "start", "end")
    val out = TemporalJoins.byTimeBuckets(probe, intervals, "pt", "start", "end")
      .groupBy("pid", "iid").count().as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 100L, 1L), (1L, 200L, 1L), (2L, 200L, 1L)),
      "every qualifying pair exactly once, never duplicated by bucket fan-out")
  }
}
