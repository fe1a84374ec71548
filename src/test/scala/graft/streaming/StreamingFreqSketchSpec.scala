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

  test("windowed store: window reads equal the one-shot sketch of the " +
      "window's own batches; decay scales by freshness; guards hold") {
    val store = tmpStore()
    val acc = new StreamingFreqSketch.SketchAccumulator(spark, store,
      "word", width = 128, compactEvery = 2, windowed = true)
    val b = Seq(
      Seq("old", "old", "old", "both"),   // batch 0
      Seq("both", "mid"),                 // batch 1
      Seq("new", "new", "both"))          // batch 2
    b.zipWithIndex.foreach { case (ws, i) =>
      acc.update(ws.toDF("word"), i.toLong)
    }
    val probes = Seq("old", "mid", "new", "both").toDF("word")
    def est(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().toMap
    // window [1, 3): batch 0 expired — "old" gone, counts are the
    // window's own (min over slices never under the window truth, and
    // for this tiny fixture there are no collisions to over-count)
    val w = est(acc.estimateWindow(probes, "word", 3L, 1L))
    assert(w == Map("old" -> 0L, "mid" -> 1L, "new" -> 2L, "both" -> 2L),
      s"window estimates wrong: $w")
    // window read equals the ONE-SHOT sketch of exactly those batches
    val oneShot = est(FreqSketch.cmsEstimate(
      FreqSketch.cmsSketch((b(1) ++ b(2)).toDF("word"), "word", 128),
      probes, "word", 128))
    assert(est(acc.estimateWindow(probes, "word", 3L, 1L)) == oneShot)
    // decay halfLife 1 over 3 batches: factors 1/2/4 —
    // old: 3·1, mid: 1·2, new: 2·4, both: 1+2+4
    val d = est(acc.estimateDecayed(probes, "word", 3L, 1))
    assert(d == Map("old" -> 3L, "mid" -> 2L, "new" -> 8L, "both" -> 7L),
      s"decayed estimates wrong: $d")
    // cumulative read still works on a windowed store
    assert(est(acc.estimate(probes, "word", 3L)) ==
      Map("old" -> 3L, "mid" -> 1L, "new" -> 2L, "both" -> 3L))
    // batch-id regression fails fast (ids live in the cell keys)
    val e = intercept[IllegalArgumentException] {
      acc.update(Seq("x").toDF("word"), 0L)
    }
    assert(e.getMessage.contains("checkpointLocation"))
    // a PLAIN store refuses windowed/decayed reads
    val plain = new StreamingFreqSketch.SketchAccumulator(spark,
      tmpStore(), "word", width = 128)
    plain.update(Seq("x").toDF("word"), 0L)
    val e2 = intercept[IllegalArgumentException] {
      plain.estimateWindow(probes, "word", 1L, 0L)
    }
    assert(e2.getMessage.contains("windowed store"))
    // decay span cap fails loud
    val e3 = intercept[IllegalArgumentException] {
      acc.estimateDecayed(probes, "word", 100L, 1)
    }
    assert(e3.getMessage.contains("decay span"))
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
