package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingBoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-linestore").toString + "/lines"

  test("line strips the moment its cumulative doc count reaches minDocs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val received = ListBuffer.empty[(Long, Long, String, Long, Long)]
    val query = StreamingBoilerplate.start(
      mem.toDF().toDF("doc_id", "text"), tmpStore(), "doc_id", "text",
      minDocs = 3,
      sink = df => received.synchronized {
        received ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      })
    try {
      // batch 0: footer in 2 docs — below threshold, everything survives
      mem.addData((1L, "intro one\nshared footer"),
        (2L, "intro two\nshared footer"))
      query.processAllAvailable()
      assert(received.toSet == Set(
        (0L, 1L, "intro one\nshared footer", 2L, 2L),
        (0L, 2L, "intro two\nshared footer", 2L, 2L)))
      received.clear()
      // batch 1: doc 3 carries the footer (cumulative 2+1 = 3 → strip,
      // normalization folds case/whitespace); doc 4 is untouched
      mem.addData((3L, "intro three\nSHARED   footer"),
        (4L, "intro four\nother line"))
      query.processAllAvailable()
      assert(received.toSet == Set(
        (1L, 3L, "intro three", 2L, 1L),
        (1L, 4L, "intro four\nother line", 2L, 2L)))
      received.clear()
      // batch 2: once over threshold, the footer stays dead
      mem.addData((5L, "intro five\nshared footer"))
      query.processAllAvailable()
      assert(received.toSet == Set((2L, 5L, "intro five", 2L, 1L)))
    } finally query.stop()
  }

  test("a single batch reproduces the batch operator verbatim") {
    val docs = Seq(
      (1L, "alpha\ncommon line"), (2L, "beta\ncommon line"),
      (3L, "gamma\ncommon line"), (4L, "delta only")).toDF("doc_id", "text")
    val streamed = StreamingBoilerplate.byBatch(spark, Seq(docs), tmpStore(),
        "doc_id", "text", minDocs = 3)
      .select("doc_id", "clean_text", "n_paras", "n_kept")
      .as[(Long, String, Long, Long)].collect().toSet
    val batch = graft.ext.Dedup.stripBoilerplate(docs, "doc_id", "text",
        minDocs = 3)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set(
      (1L, "alpha", 2L, 1L), (2L, "beta", 2L, 1L), (3L, "gamma", 2L, 1L),
      (4L, "delta only", 1L, 1L)))
  }

  test("retry idempotency: a replayed batch never double-counts itself") {
    val stripper = new StreamingBoilerplate.BoilerplateStripper(spark,
      tmpStore(), "doc_id", "text", minDocs = 3)
    val b0 = Seq((1L, "one\ndaily footer")).toDF("doc_id", "text")
    val first = stripper.update(b0, 0L).collect()
    val retry = stripper.update(b0, 0L).collect() // foreachBatch retry
    assert(first.map(_.toSeq).toSet == retry.map(_.toSeq).toSet)
    // cumulative count must be 1 (not 2 from the replay) + 1 here = 2 < 3
    val out = stripper.update(
        Seq((2L, "two\ndaily footer")).toDF("doc_id", "text"), 1L)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((2L, "two\ndaily footer")),
      "a retried batch must not inflate the frequency store")
  }

  test("a null-id document never feeds the frequency store") {
    val stripper = new StreamingBoilerplate.BoilerplateStripper(spark,
      tmpStore(), "doc_id", "text", minDocs = 3)
    val b0 = Seq[(java.lang.Long, String)](
      (null, "ghost\ncommon tail"),
      (java.lang.Long.valueOf(1L), "one\ncommon tail"),
      (java.lang.Long.valueOf(2L), "two\ncommon tail"))
      .toDF("doc_id", "text")
    // 2 countable docs carry the tail (the ghost is not emittable, so it
    // must not count) — below minDocs, everything emitted survives
    val out = stripper.update(b0, 0L).collect()
      .map(r => (r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, "one\ncommon tail"), (2L, "two\ncommon tail")))
  }

  test("store is sub-linear in recrawls; counts and cadence survive compaction") {
    def run(store: String, compactEvery: Int): (Set[String], Long, Long) = {
      val stripper = new StreamingBoilerplate.BoilerplateStripper(spark,
        store, "doc_id", "text", minDocs = 4, hashKeys = true,
        compactEvery = compactEvery, numBuckets = 4)
      val outs = (0 until 6).map { i =>
        stripper.update(Seq((i.toLong, s"unique intro $i\nsame daily footer"))
          .toDF("doc_id", "text"), i.toLong).collect()
          .map(r => s"${r.getLong(1)}:${r.getString(2)}").toSeq
      }
      val parts = stripper.storeParts(6L)
      val rows = parts.map(_.count()).sum
      val footerCount = parts.map(_.filter(
          org.apache.spark.sql.functions.col("norm_key") ===
            org.apache.spark.sql.functions.xxhash64(
              org.apache.spark.sql.functions.lit("same daily footer")))
          .agg(org.apache.spark.sql.functions.sum("n_docs"))
          .head().getLong(0)).sum
      (outs.flatten.toSet, rows, footerCount)
    }
    val (aOut, aRows, aFooter) = run(tmpStore(), compactEvery = 2)
    val (bOut, bRows, bFooter) = run(tmpStore(), compactEvery = 100)
    assert(aOut == bOut, "compaction cadence changed observable output")
    // batches 0-2 keep the footer (cumulative 1,2,3 < 4); from batch 3 on
    // the cumulative count reaches 4 and the footer dies
    assert(aOut == (0 until 6).map(i =>
      if (i < 3) s"$i:unique intro $i\nsame daily footer"
      else s"$i:unique intro $i").toSet)
    // sum-merge preserves the cumulative footer frequency either way
    assert(aFooter == 6L && bFooter == 6L)
    // 6 batches × 2 lines, but the footer is ONE compacted row: base
    // holds ≤7 distinct keys, plus ≤2 delta batches × 2 keys
    assert(aRows <= 7 + 4, s"compacted store holds $aRows rows")
    assert(bRows == 12L, s"uncompacted store should hold every delta: $bRows")
  }
}
