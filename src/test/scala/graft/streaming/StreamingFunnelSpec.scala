package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.streaming.StreamingFunnel.FunnelEvent

class StreamingFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(1700000000000L + s * 1000L)
  private val steps = Seq("view", "click", "purchase")

  test("funnel state advances ACROSS micro-batches; stages are immutable") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FunnelEvent]
    val query = StreamingFunnel.progress(mem.toDS(), steps).toDF()
      .writeStream.format("memory").queryName("funnel_progress")
      .outputMode(OutputMode.Update)
      .start()
    try {
      // batch 0: user 1 views; user 2 clicks without a view (no progress)
      mem.addData(FunnelEvent(1L, ts(10), "view"), FunnelEvent(2L, ts(5), "click"))
      query.processAllAvailable()
      // batch 1: user 1 clicks (advances to depth 2); an out-of-order view
      // older than the committed t_1 must NOT rewrite it; user 2 views
      mem.addData(
        FunnelEvent(1L, ts(20), "click"), FunnelEvent(1L, ts(1), "view"),
        FunnelEvent(2L, ts(6), "view"))
      query.processAllAvailable()
      // batch 2: user 1 purchases; user 2's purchase skips click (ignored)
      mem.addData(FunnelEvent(1L, ts(30), "purchase"),
        FunnelEvent(2L, ts(7), "purchase"))
      query.processAllAvailable()

      val out = spark.table("funnel_progress")
        .as[(Long, Seq[Timestamp], Int)].collect()
      // latest row per entity (Update mode appends one per touched batch)
      val latest = out.groupBy(_._1).map { case (e, rows) =>
        e -> rows.maxBy(_._3)
      }
      assert(latest(1L)._2 == Seq(ts(10), ts(20), ts(30)) && latest(1L)._3 == 3,
        "user 1 must complete the chain with the COMMITTED t_1 (ts 10, not 1)")
      assert(latest(2L)._2 == Seq(ts(6)) && latest(2L)._3 == 1,
        "user 2: click-before-view and purchase-without-click never advance")
      // user 2 emitted nothing in batch 0 (flatMap contract: no step-1 row)
      assert(out.count(_._1 == 2L) == 2)
    } finally query.stop()
  }

  test("batch replay equals the batch funnel recurrence") {
    val events = Seq(
      (1L, ts(10), "view"), (1L, ts(8), "click"), (1L, ts(12), "click"),
      (1L, ts(12), "purchase"), (1L, ts(15), "purchase"),
      (2L, ts(1), "click"), (2L, ts(2), "purchase"),
      (3L, ts(5), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = StreamingFunnel.batchFunnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
      .collect().toSeq
    val expect = graft.ext.Funnel.funnel(events, "user_id", "ts", "event_type", steps)
      .orderBy("user_id")
      .as[(Long, Option[Timestamp], Option[Timestamp], Option[Timestamp], Long)]
      .collect().toSeq
    assert(got == expect)
    // user 1: click@8 precedes the view -> excluded; purchase@12 equals
    // t_2 -> excluded (strict); chain is 10, 12, 15
    assert(got.head == ((1L, Some(ts(10)), Some(ts(12)), Some(ts(15)), 3L)))
  }
}
