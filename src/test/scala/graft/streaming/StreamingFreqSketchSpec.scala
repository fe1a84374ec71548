package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.FreqSketch

class StreamingFreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-cms").toString + "/cms"

  private val corpus = {
    val rnd = new scala.util.Random(43)
    (0 until 3000).map(_ => s"t${(math.pow(rnd.nextDouble(), 3) * 120).toInt}")
  }

  test("byBatch fold equals the one-shot corpus sketch estimate") {
    val batches = corpus.grouped(1000).map(_.toDF("word")).toSeq
    val probes = corpus.distinct.toDF("word")
    val streamed = StreamingFreqSketch.byBatch(spark, batches, tmpStore(),
        "word", probes, "word", width = 256, minCount = 0L)
      .as[(String, Long)].collect().toMap
    val oneShot = FreqSketch.cmsEstimate(
        FreqSketch.cmsSketch(corpus.toDF("word"), "word", width = 256),
        probes, "word", width = 256)
      .as[(String, Long)].collect().toMap
    assert(streamed == oneShot)
    // and still never under the exact count
    val exact = corpus.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    exact.foreach { case (w, n) => assert(streamed(w) >= n) }
  }

  test("retry idempotence: a replayed batch never double-counts") {
    val store = tmpStore()
    val acc = new StreamingFreqSketch.SketchAccumulator(spark, store,
      "word", width = 128)
    val batch = Seq("x", "x", "y").toDF("word")
    acc.update(batch, 0L)
    acc.update(batch, 0L) // foreachBatch retry of the SAME batch id
    acc.update(Seq("x").toDF("word"), 1L)
    val est = acc.estimate(Seq("x", "y").toDF("word"), "word", 2L)
      .as[(String, Long)].collect().toMap
    assert(est == Map("x" -> 3L, "y" -> 1L))
  }

  test("restart: a fresh accumulator on the same path sees prior state") {
    val store = tmpStore()
    val acc1 = new StreamingFreqSketch.SketchAccumulator(spark, store,
      "word", width = 128, compactEvery = 2)
    (0 until 4).foreach(i => acc1.update(Seq("hot", "cold").toDF("word"), i.toLong))
    val acc2 = new StreamingFreqSketch.SketchAccumulator(spark, store,
      "word", width = 128, compactEvery = 2)
    acc2.update(Seq("hot").toDF("word"), 4L)
    val est = acc2.estimate(Seq("hot", "cold").toDF("word"), "word", 5L)
      .as[(String, Long)].collect().toMap
    assert(est == Map("hot" -> 5L, "cold" -> 4L))
  }

  test("state stays cell-bounded however many distinct items stream by") {
    val store = tmpStore()
    val acc = new StreamingFreqSketch.SketchAccumulator(spark, store,
      "word", width = 64, compactEvery = 2)
    (0 until 4).foreach { i =>
      acc.update((0 until 500).map(j => s"item_${i}_$j").toDF("word"), i.toLong)
    }
    assert(acc.sketch(4L).count() <= FreqSketch.Depth * 64L)
  }

  test("grouped fold equals the one-shot per-group sketch; groups are " +
      "isolated; separator in a group value survives") {
    val rows = corpus.zipWithIndex.map { case (w, i) =>
      (if (i % 2 == 0) "a:grp" else "b", w) // a group value WITH ':'
    }
    val batches = rows.grouped(1000)
      .map(_.toDF("g", "word")).toSeq
    val probes = rows.distinct.toDF("g", "word")
    val streamed = StreamingFreqSketch.byBatchBy(spark, batches,
        tmpStore(), "g", "word", probes, "g", "word",
        width = 256, minCount = 0L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val oneShot = FreqSketch.cmsEstimateBy(
        FreqSketch.cmsSketchBy(rows.toDF("g", "word"), "g", "word",
          width = 256),
        probes, "g", "word", width = 256)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == oneShot)
    // group isolation: estimates never under the group's own exact
    // count, and a word heavy in one group doesn't have to be heavy in
    // the other (bounded by the GROUP total, not the corpus total)
    val exact = rows.groupBy(identity)
      .map { case (k, vs) => k -> vs.size.toLong }
    exact.foreach { case (k, n) => assert(streamed(k) >= n,
      s"$k: ${streamed(k)} < $n") }
    val totals = rows.groupBy(_._1).map { case (g, vs) => g -> vs.size.toLong }
    streamed.foreach { case ((g, _), est) =>
      assert(est <= totals(g),
        s"estimate in group $g exceeds the group's own weight")
    }
    // the ':'-bearing group value round-trips the cell key intact
    assert(streamed.keys.exists(_._1 == "a:grp"))
  }

  test("live stream: estimates accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val (query, acc) = StreamingFreqSketch.start(
      mem.toDF().select(col("value").as("word")), tmpStore(), "word",
      width = 128)
    try {
      mem.addData("a", "b", "a")
      query.processAllAvailable()
      mem.addData("a")
      query.processAllAvailable()
      val est = acc.estimate(Seq("a", "b").toDF("word"), "word",
          uptoBatch = Long.MaxValue)
        .as[(String, Long)].collect().toMap
      assert(est == Map("a" -> 3L, "b" -> 1L))
    } finally query.stop()
  }
}
