package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StreamingTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-topk").toString + "/counts"

  test("byBatch: incremental fold equals one-shot top-k, ties by key") {
    val batches = Seq(
      Seq("a", "b", "a", "c").toDF("key"),
      Seq("b", "a", "d", "d").toDF("key"),
      Seq("c", "c", "e").toDF("key"))
    val got = StreamingTopK.byBatch(spark, batches, tmpStore(), "key", k = 3)
      .as[(String, Long)].collect().toSeq
    // a:3, c:3, b:2, d:2, e:1 → ties broken by key ascending
    assert(got == Seq(("a", 3L), ("c", 3L), ("b", 2L)))
  }

  test("k larger than the key domain returns everything, ordered") {
    val got = StreamingTopK.byBatch(spark,
        Seq(Seq("x", "y", "x").toDF("key")), tmpStore(), "key", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 2L), ("y", 1L)))
  }

  test("null keys are dropped, not counted") {
    val batch = Seq(Some("a"), None, Some("a"), None).toDF("key")
    val got = StreamingTopK.byBatch(spark, Seq(batch), tmpStore(), "key", 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L)))
  }

  test("compaction folds per-batch deltas without changing counts") {
    val store = tmpStore()
    val counter = new StreamingTopK.TopKCounter(spark, store, "key",
      compactEvery = 2, numBuckets = 2)
    // 6 batches of the same two keys: compaction triggers repeatedly
    (0 until 6).foreach { i =>
      counter.update(Seq("hot", "warm", "hot").toDF("key"), i.toLong)
    }
    val got = counter.topK(2, 6L).as[(String, Long)].collect().toSeq
    assert(got == Seq(("hot", 12L), ("warm", 6L)))
    // the store holds per-key rows, not per-(key, batch) rows, after
    // compaction: strictly fewer rows than batches × keys
    val storeRows = counter.storeParts(6L)
      .map(_.count()).sum
    assert(storeRows < 12L, s"store should compact: $storeRows rows")
  }

  test("live stream: counts accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val (query, counter) = StreamingTopK.start(
      mem.toDF().select(col("value").as("key")), tmpStore(), "key")
    try {
      mem.addData("a", "b", "a")
      query.processAllAvailable()
      mem.addData("b", "a")
      query.processAllAvailable()
      val got = counter.topK(2, Long.MaxValue)
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("a", 3L), ("b", 2L)))
    } finally query.stop()
  }
}
