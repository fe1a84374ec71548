package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  // minutes offset from a 2024 base, NOT raw epoch: timestamps near
  // epoch 0 put the derived watermark below zero, where the symmetric
  // hash join's state predicates silently drop every buffered row
  // (observed empirically on 4.1.2) — real event time never goes there
  private val base = java.sql.Timestamp.valueOf("2024-03-01 12:00:00").getTime
  private def ts(min: Long): java.sql.Timestamp =
    new java.sql.Timestamp(base + min * 60000L)

  test("batch mode equals an in-memory interval-join reference") {
    val rnd = new scala.util.Random(41)
    val views = (0 until 60).map(i =>
      (i.toLong, ts(rnd.nextInt(200).toLong), rnd.nextInt(6).toLong))
    val buys = (0 until 60).map(i =>
      (1000L + i, ts(rnd.nextInt(200).toLong), rnd.nextInt(6).toLong))
    val got = StreamJoin.intervalJoin(
        views.toDF("event_id", "ts", "user_id"),
        buys.toDF("event_id", "ts", "user_id"),
        "user_id", "ts", "ts", maxDelay = "30 minutes")
      .select("l_event_id", "r_event_id").as[(Long, Long)].collect().toSet
    val expect = (for {
      (vi, vt, vu) <- views; (bi, bt, bu) <- buys
      if vu == bu && bt.getTime >= vt.getTime &&
        bt.getTime <= vt.getTime + 30 * 60000L
    } yield (vi, bi)).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("streaming: cross-batch matches inside the bound, none outside") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      lmem.toDF().toDF("event_id", "ts", "user_id"),
      rmem.toDF().toDF("event_id", "ts", "user_id"),
      "user_id", "ts", "ts", maxDelay = "30 minutes",
      watermarkDelay = "10 minutes")
    val query = joined.select($"l_event_id", $"r_event_id")
      .writeStream.format("memory").queryName("sj_basic")
      .outputMode("append").start()
    try {
      lmem.addData((1L, ts(0), 7L), (2L, ts(3), 8L))
      query.processAllAvailable()
      // later BATCH, inside the 30-minute bound → must still match
      // (the whole point of buffered stream-stream state)
      rmem.addData((100L, ts(10), 7L))
      query.processAllAvailable()
      // same user, outside the bound → never a match
      rmem.addData((101L, ts(45), 7L))
      // right event BEFORE the view → never a match
      rmem.addData((102L, ts(1), 8L).copy(_2 = ts(2)))
      query.processAllAvailable()
      val got = spark.table("sj_basic").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L)))
    } finally query.stop()
  }

  test("streaming: rows later than the watermark are dropped from the join") {
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val rmem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = StreamJoin.intervalJoin(
      lmem.toDF().toDF("event_id", "ts", "user_id"),
      rmem.toDF().toDF("event_id", "ts", "user_id"),
      "user_id", "ts", "ts", maxDelay = "30 minutes",
      watermarkDelay = "10 minutes")
    val query = joined.select($"l_event_id", $"r_event_id")
      .writeStream.format("memory").queryName("sj_late")
      .outputMode("append").start()
    try {
      lmem.addData((1L, ts(0), 7L))
      query.processAllAvailable()
      // advance BOTH watermarks far past the left row's eviction point
      // (global watermark is the min across inputs)
      lmem.addData((2L, ts(500), 9L))
      rmem.addData((200L, ts(500), 9L).copy(_3 = 10L))
      query.processAllAvailable()
      query.processAllAvailable()
      // a right row that WOULD have matched view 1 arrives hours late:
      // the left state was evicted, no pair may appear
      rmem.addData((201L, ts(10), 7L))
      query.processAllAvailable()
      val got = spark.table("sj_late").as[(Long, Long)].collect().toSet
      assert(!got.contains((1L, 201L)),
        s"late row joined against evicted state: $got")
    } finally query.stop()
  }
}
