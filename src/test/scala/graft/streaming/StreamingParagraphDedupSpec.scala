package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingParagraphDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-parastore").toString + "/paras"

  test("paragraphs dedup against strictly-prior batches AND within the batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val received = ListBuffer.empty[(Long, Long, String, Long, Long)]
    val query = StreamingParagraphDedup.start(
      mem.toDF().toDF("doc_id", "text"), tmpStore(), "doc_id", "text",
      sink = df => received.synchronized {
        received ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
      })
    try {
      // batch 0: no prior store; within-batch dedup still applies —
      // doc 2 loses the paragraph doc 1 already carries
      mem.addData((1L, "intro one\nshared footer"),
        (2L, "intro two\nshared footer"))
      query.processAllAvailable()
      assert(received.toSet == Set(
        (0L, 1L, "intro one\nshared footer", 2L, 2L),
        (0L, 2L, "intro two", 2L, 1L)))
      received.clear()
      // batch 1: the footer and 'intro one' are now in the store; a
      // fully-absorbed doc emits nothing
      mem.addData((10L, "fresh para\nshared footer"),
        (11L, "intro one\nSHARED   footer")) // normalized dups only
      query.processAllAvailable()
      assert(received.toSet == Set((1L, 10L, "fresh para", 2L, 1L)))
    } finally query.stop()
  }

  test("byBatch replay: same semantics, string keys, batch-tagged union") {
    val b0 = Seq((1L, "alpha\nbeta")).toDF("doc_id", "text")
    val b1 = Seq((2L, "beta\ngamma"), (3L, "alpha\nbeta")).toDF("doc_id", "text")
    val out = StreamingParagraphDedup.byBatch(spark, Seq(b0, b1), tmpStore(),
        "doc_id", "text")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 1L, "alpha\nbeta", 2L, 2L),
      (1L, 2L, "gamma", 2L, 1L))) // doc 3 fully absorbed
  }

  test("retry idempotency: re-running a batch does not suppress its own paragraphs") {
    val store = tmpStore()
    val deduper = new StreamingParagraphDedup.ParagraphDeduper(spark, store,
      "doc_id", "text")
    val b0 = Seq((1L, "solo para\ncommon tail")).toDF("doc_id", "text")
    val first = deduper.update(b0, 0L).collect()
    val retry = deduper.update(b0, 0L).collect() // foreachBatch retry
    assert(first.map(_.toSeq).toSet == retry.map(_.toSeq).toSet)
    assert(retry.map(r => r.getString(2)).toSeq == Seq("solo para\ncommon tail"))
  }

  test("byBatch survives compaction: more batches than compactEvery") {
    // regression: byBatch's per-batch plans once stayed lazy past the
    // compaction that deletes the delta files they read — 9+ batches
    // with the default compactEvery=8 threw FileNotFoundException at
    // the final union collect
    val batches = (0 until 10).map { i =>
      Seq((i.toLong, s"para $i\ncommon footer")).toDF("doc_id", "text")
    }
    val out = StreamingParagraphDedup.byBatch(spark, batches, tmpStore(),
        "doc_id", "text")
      .as[(Long, Long, String, Long, Long)].collect().toSet
    assert(out == (0 until 10).map { i =>
      if (i == 0) (0L, 0L, "para 0\ncommon footer", 2L, 2L)
      else (i.toLong, i.toLong, s"para $i", 2L, 1L)
    }.toSet)
  }

  test("a null-id document neither emits nor seeds the store") {
    // regression: the store append once used the raw batch while the
    // dedup path drops null-id rows — a null-id doc's paragraphs were
    // stored as 'seen' and suppressed every later occurrence unseen
    val deduper = new StreamingParagraphDedup.ParagraphDeduper(spark,
      tmpStore(), "doc_id", "text")
    val b0 = Seq((null.asInstanceOf[java.lang.Long], "orphan para"))
      .toDF("doc_id", "text")
    assert(deduper.update(b0, 0L).collect().isEmpty)
    val b1 = Seq((5L, "orphan para")).toDF("doc_id", "text")
    val out = deduper.update(b1, 1L).collect()
    assert(out.map(r => (r.getLong(1), r.getString(2))).toSeq ==
      Seq((5L, "orphan para")))
  }

  test("store is sub-linear in recrawled content; compaction cadence invisible") {
    def run(store: String, compactEvery: Int): (Set[String], Long) = {
      val deduper = new StreamingParagraphDedup.ParagraphDeduper(spark, store,
        "doc_id", "text", hashKeys = true, compactEvery = compactEvery,
        numBuckets = 4)
      val outs = (0 until 6).map { i =>
        deduper.update(Seq((i.toLong, s"unique intro $i\nsame daily footer"))
          .toDF("doc_id", "text"), i.toLong).collect()
          .map(r => s"${r.getLong(1)}:${r.getString(2)}").toSeq
      }
      (outs.flatten.toSet, deduper.storeParts(6L).map(_.count()).sum)
    }
    val (aOut, aRows) = run(tmpStore(), compactEvery = 2)
    val (bOut, bRows) = run(tmpStore(), compactEvery = 100)
    assert(aOut == bOut, "compaction cadence changed observable output")
    // only batch 0 keeps the footer; later docs keep just their intro
    assert(aOut == (0 until 6).map(i =>
      if (i == 0) s"$i:unique intro $i\nsame daily footer"
      else s"$i:unique intro $i").toSet)
    // 6 batches × 2 paragraphs each, but the footer is ONE distinct key:
    // compacted store ≤ base(7 distinct) + ≤2 delta batches × 2 keys
    assert(aRows <= 7 + 4, s"compacted store holds $aRows rows")
    assert(bRows == 12L, s"uncompacted store should hold every delta: $bRows")
  }
}
