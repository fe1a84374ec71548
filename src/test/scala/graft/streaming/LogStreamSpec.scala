package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.logs.LogLineParser

class LogStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def line(day: Int, hh: Int, op: String, bytes: Long): String =
    s"own bkt [0$day/Feb/2019:${f"$hh%02d"}:00:00 +0000] 10.0.0.1 " +
      s"arn:aws:iam::1:user/u R$day$hh$op $op some/key " +
      "\"GET /k HTTP/1.1\" 200 - " + bytes + " - 5 - \"-\" \"ua/1.0\" -"

  test("streaming parse + windowed daily counts with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val parsed = LogLineParser.parse(
      LogLineParser.dropBlankLines(mem.toDF().toDF("value")))
    val counts = LogStream.dailyOperationCounts(parsed)
      .selectExpr("window.start AS day", "operation", "n_requests", "total_bytes")

    val query = counts.writeStream
      .format("memory").queryName("daily_counts")
      .outputMode(OutputMode.Complete)
      .start()
    try {
      mem.addData(
        line(6, 1, "REST.GET.OBJECT", 100),
        line(6, 2, "REST.GET.OBJECT", 50),
        line(6, 3, "REST.PUT.OBJECT", 10),
        line(7, 1, "REST.GET.OBJECT", 7),
        "corrupt line, not parseable", "")
      query.processAllAvailable()
      val out = spark.table("daily_counts")
        .as[(java.sql.Timestamp, String, Long, Long)].collect()
        .map(r => (r._1.toString.take(10), r._2) -> (r._3, r._4)).toMap
      assert(out(("2019-02-06", "REST.GET.OBJECT")) == ((2L, 150L)))
      assert(out(("2019-02-06", "REST.PUT.OBJECT")) == ((1L, 10L)))
      assert(out(("2019-02-07", "REST.GET.OBJECT")) == ((1L, 7L)))
      // the corrupt line has null request_time → filtered, not crashed
      assert(out.size == 3)
    } finally query.stop()
  }

  test("file source → parse → date-partitioned parquet sink, end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream")
    val (in, out, ckpt) = (tmp.resolve("in"), tmp.resolve("out"), tmp.resolve("ckpt"))
    java.nio.file.Files.createDirectories(in)
    java.nio.file.Files.write(in.resolve("batch0.log"),
      (Seq(line(6, 1, "REST.GET.OBJECT", 100), line(7, 2, "REST.PUT.OBJECT", 5),
        "not a parseable log line").mkString("\n")).getBytes)

    val parsed = LogStream.parsedStream(spark, in.toString)
    val query = LogStream.writeCompacted(parsed, out.toString, ckpt.toString)
    try {
      query.processAllAvailable()
      // a second file arriving later is picked up incrementally
      java.nio.file.Files.write(in.resolve("batch1.log"),
        line(6, 3, "REST.GET.OBJECT", 7).getBytes)
      query.processAllAvailable()
    } finally query.stop()

    val back = spark.read.parquet(out.toString)
    assert(back.count() == 4)
    val days = back.selectExpr("CAST(dt AS STRING) AS dt").distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.sameElements(Array("2019-02-06", "2019-02-07", "corrupt")),
      "sink must lay out dt= partitions; corrupt rows get a sentinel partition")
    assert(java.nio.file.Files.list(out).toArray.map(_.toString)
      .exists(_.contains("dt=2019-02-06")))
    // the corrupt row stays queryable with its raw line intact
    assert(back.filter("dt = 'corrupt'").selectExpr("error_line")
      .collect().map(_.getString(0)).sameElements(Array("not a parseable log line")))
  }

  test("file-sink query restarted from its checkpoint neither loses nor duplicates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-restart")
    val (in, out, ckpt) = (tmp.resolve("in"), tmp.resolve("out"), tmp.resolve("ckpt"))
    java.nio.file.Files.createDirectories(in)
    java.nio.file.Files.write(in.resolve("a.log"), line(6, 1, "REST.GET.OBJECT", 1).getBytes)

    val q1 = LogStream.writeCompacted(
      LogStream.parsedStream(spark, in.toString), out.toString, ckpt.toString)
    try q1.processAllAvailable() finally q1.stop()

    // second file arrives while the query is DOWN; restart from checkpoint
    java.nio.file.Files.write(in.resolve("b.log"), line(7, 2, "REST.GET.OBJECT", 2).getBytes)
    val q2 = LogStream.writeCompacted(
      LogStream.parsedStream(spark, in.toString), out.toString, ckpt.toString)
    try q2.processAllAvailable() finally q2.stop()

    val back = spark.read.parquet(out.toString)
    assert(back.count() == 2, "exactly the two lines: a.log not reprocessed, b.log picked up")
  }

  test("streaming dedup within watermark drops redelivered request ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val deduped = LogStream.dedupStream(
      LogLineParser.parse(mem.toDF().toDF("value")))
    val query = deduped.writeStream
      .format("memory").queryName("deduped")
      .outputMode(OutputMode.Append)
      .start()
    try {
      val l = line(6, 1, "REST.GET.OBJECT", 100) // fixed request_id R61REST.GET.OBJECT
      mem.addData(l, l, line(6, 2, "REST.PUT.OBJECT", 5))
      query.processAllAvailable()
      assert(spark.table("deduped").count() == 2, "duplicate delivery must be dropped")
    } finally query.stop()
  }

  test("stream-stream interval join: GETs matched to PUTs within the bound") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val joined = LogStream.getsAfterPuts(
      LogLineParser.parse(mem.toDF().toDF("value")), within = "1 hour")
    val query = joined.writeStream
      .format("memory").queryName("gets_after_puts")
      .outputMode(OutputMode.Append)
      .start()
    try {
      def l(hh: Int, mm: Int, op: String, key: String) =
        s"own bkt [06/Feb/2019:${f"$hh%02d"}:${f"$mm%02d"}:00 +0000] 10.0.0.1 " +
          s"arn:aws:iam::1:user/u R$hh$mm$op $op $key " +
          "\"GET /k HTTP/1.1\" 200 - 10 - 5 - \"-\" \"ua/1.0\" -"
      mem.addData(
        l(1, 0, "REST.PUT.OBJECT", "a/k1"),
        l(1, 30, "REST.GET.OBJECT", "a/k1"),  // 30 min after: joined
        l(3, 0, "REST.GET.OBJECT", "a/k1"),   // 2h after: outside bound
        l(1, 10, "REST.GET.OBJECT", "b/k2"))  // no PUT for this key
      query.processAllAvailable()
      val out = spark.table("gets_after_puts")
        .selectExpr("key", "millis_after_put").as[(String, Long)].collect()
      assert(out.toSeq == Seq(("a/k1", 30L * 60 * 1000)),
        "exactly the in-bound GET joins; late GET and unmatched key do not")
    } finally query.stop()
  }

  test("stateful sessionization with mapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val parsed = LogLineParser.parse(mem.toDF().toDF("value"))
    val sessions = LogStream.sessionize(parsed, gapMs = 30L * 60 * 1000)

    val query = sessions.writeStream
      .format("memory").queryName("sessions")
      .outputMode(OutputMode.Update)
      .start()
    try {
      // two events 1h apart IN ONE BATCH → the first session must be
      // emitted CLOSED (flatMap shape) and the second opened fresh
      mem.addData(line(6, 1, "REST.GET.OBJECT", 1), line(6, 2, "REST.GET.OBJECT", 1))
      query.processAllAvailable()
      val out = spark.table("sessions")
        .as[LogStream.SessionUpdate].collect()
      assert(out.length == 2)
      val (closed, open) = (out.filter(_.closed), out.filterNot(_.closed))
      assert(closed.length == 1 && closed.head.n_requests == 1L,
        "intra-batch gap must close the first session")
      assert(closed.head.session_start.toString.startsWith("2019-02-06 01"))
      assert(open.length == 1 && open.head.n_requests == 1L)
      assert(open.head.session_start.toString.startsWith("2019-02-06 02"))
    } finally query.stop()
  }
}
