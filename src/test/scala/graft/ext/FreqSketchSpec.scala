package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FreqSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val words = {
    // zipf-ish corpus with known exact counts
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 200).map(i => s"w$i")
    (0 until 5000).map(_ => vocab(math.min(
      (math.pow(rnd.nextDouble(), 2.5) * vocab.size).toInt, vocab.size - 1)))
  }
  private def exact: Map[String, Long] =
    words.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }

  test("cmsEstimate never under-estimates, and is exact without collisions") {
    val df = words.toDF("word")
    val probes = exact.keys.toSeq.toDF("word")
    // narrow sketch: collisions certain — every estimate >= truth
    val est256 = FreqSketch.cmsEstimate(
        FreqSketch.cmsSketch(df, "word", width = 256), probes, "word", 256)
      .as[(String, Long)].collect().toMap
    exact.foreach { case (w, n) =>
      assert(est256(w) >= n, s"$w: est ${est256(w)} < true $n")
    }
    // wide sketch: 200 items into 4x65536 cells — with 4 independent
    // slices a same-cell collision in ALL four rows is (200/65536)^4,
    // so the min equals the exact count for every item here
    val estWide = FreqSketch.cmsEstimate(
        FreqSketch.cmsSketch(df, "word", width = 65536), probes, "word", 65536)
      .as[(String, Long)].collect().toMap
    assert(estWide == exact)
  }

  test("cmsMerge of split corpora equals the single-corpus sketch") {
    val (l, r) = words.splitAt(2000)
    val whole = FreqSketch.cmsSketch(words.toDF("word"), "word", width = 512)
    val merged = FreqSketch.cmsMerge(Seq(
      FreqSketch.cmsSketch(l.toDF("word"), "word", width = 512),
      FreqSketch.cmsSketch(r.toDF("word"), "word", width = 512)))
    val a = whole.as[(Int, Long, Long)].collect().toSet
    val b = merged.as[(Int, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("heavyHitters keeps every true heavy hitter (no false negatives)") {
    val df = words.toDF("word")
    val probes = exact.keys.toSeq.toDF("word")
    val kept = FreqSketch.heavyHitters(df, "word", probes, minCount = 100L,
        width = 256).select("item").as[String].collect().toSet
    val trueHeavy = exact.filter(_._2 >= 100L).keySet
    assert(trueHeavy.subsetOf(kept),
      s"lost heavy hitters: ${trueHeavy -- kept}")
  }

  test("weighted counts and null items") {
    val df = Seq(("a", 5L), ("a", 7L), ("b", 1L), (null, 100L))
      .toDF("word", "w")
    val est = FreqSketch.cmsEstimate(
        FreqSketch.cmsSketch(df, "word", width = 1024, weightCol = Some("w")),
        Seq("a", "b").toDF("word"), "word", 1024)
      .as[(String, Long)].collect().toMap
    assert(est == Map("a" -> 12L, "b" -> 1L))
  }

  test("sketch relation is bounded by depth*width regardless of corpus") {
    val sk = FreqSketch.cmsSketch(words.toDF("word"), "word", width = 64)
    assert(sk.count() <= FreqSketch.Depth * 64L)
  }
}
