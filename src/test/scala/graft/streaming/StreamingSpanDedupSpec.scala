package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingSpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-gramstore").toString + "/grams"

  test("spans flag only against STRICTLY-PRIOR batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val received = ListBuffer.empty[(Long, Long, Long, Long, Long)]
    val query = StreamingSpanDedup.start(
      mem.toDF().toDF("doc_id", "text"), tmpStore(), "doc_id", "text", k = 5,
      sink = df => received.synchronized {
        received ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      })
    try {
      // batch 0: establishes the corpus; nothing prior → no spans,
      // including the intra-batch duplicate pair 2/3
      val dup = "alpha beta gamma delta epsilon zeta"
      mem.addData((1L, "one two three four five six seven"),
        (2L, dup), (3L, dup))
      query.processAllAvailable()
      assert(received.isEmpty)
      // batch 1: doc 10 re-quotes batch-0 doc 1's run → flagged;
      // doc 11 is fresh → clean
      mem.addData((10L, "XX one two three four five six YY"),
        (11L, "entirely new material in this later batch"))
      query.processAllAvailable()
      // doc 10 tokens: xx one two three four five six yy → windows 1,2
      // match (five-grams inside the quoted run) → merged span [1, 6]
      assert(received.toList == List((1L, 10L, 1L, 6L, 2L)))
    } finally query.stop()
  }

  test("byBatch replay: same semantics, string grams, batch-tagged union") {
    val b0 = Seq((1L, "p q r s t u v")).toDF("doc_id", "text")
    val b1 = Seq((2L, "a p q r s t b"), (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = StreamingSpanDedup.byBatch(spark, Seq(b0, b1), tmpStore(),
        "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // batch 0 empty store → nothing; batch 1 doc 2: only the window at
    // pos 1 ("p q r s t") exists in batch 0 → span [1, 5], one gram
    assert(out == Set((1L, 2L, 1L, 5L, 1L)))
  }

  test("retry idempotency: re-running a batch neither double-writes nor self-matches") {
    val store = tmpStore()
    val deduper = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5)
    val b0 = Seq((1L, "p q r s t u")).toDF("doc_id", "text")
    val b1 = Seq((2L, "x p q r s t y")).toDF("doc_id", "text")
    assert(deduper.update(b0, 0L).count() == 0)
    val first = deduper.update(b1, 1L).collect().toSeq
    val retry = deduper.update(b1, 1L).collect().toSeq // foreachBatch retry
    assert(first == retry && first.nonEmpty)
    // batch 1's own grams never entered its probe: doc 2's unique
    // window "x p q r s" would self-match if the first attempt leaked
    assert(first.map(_.getLong(2)).min == 1L) // span starts at "p", not "x"
  }

  test("store accumulates: a third batch sees grams from both earlier batches") {
    val store = tmpStore()
    val b0 = Seq((1L, "m n o p q r")).toDF("doc_id", "text")
    val b1 = Seq((2L, "c d e f g h")).toDF("doc_id", "text")
    val b2 = Seq((3L, "z m n o p q y c d e f g x")).toDF("doc_id", "text")
    val out = StreamingSpanDedup.byBatch(spark, Seq(b0, b1, b2), store,
        "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc 3: "m n o p q" (pos 1) from b0 and "c d e f g" (pos 7) from b1
    assert(out == Set((2L, 3L, 1L, 5L, 1L), (2L, 3L, 7L, 11L, 1L)))
  }
}
