package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ext.FreqSketch

class StreamingHllSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-shll-$tag").toString + "/store"

  private val b0 = (0 until 3000).map(i => s"k$i")
  private val b1 = (1500 until 4500).map(i => s"k$i")
  private val b2 = (6000 until 9000).map(i => s"k$i") // disjoint from b0/b1

  test("cumulative registers equal the one-shot sketch of the concatenation") {
    val acc = new StreamingHll.HllAccumulator(spark, tmp("merge"), "it",
      p = 8, compactEvery = 2)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      acc.update(b.toDF("it"), i.toLong)
    }
    val got = acc.registers(3L).as[(Int, Int)].collect().toSet
    val want = FreqSketch.hllSketch((b0 ++ b1 ++ b2).toDF("it"), "it")
      .as[(Int, Int)].collect().toSet
    assert(got == want)
  }

  test("windowed registers equal the one-shot sketch of the window") {
    val acc = new StreamingHll.HllAccumulator(spark, tmp("win"), "it",
      p = 8, compactEvery = 8)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      acc.update(b.toDF("it"), i.toLong)
    }
    val got = acc.registers(3L, fromBatch = 1L)
      .as[(Int, Int)].collect().toSet
    val want = FreqSketch.hllSketch((b1 ++ b2).toDF("it"), "it")
      .as[(Int, Int)].collect().toSet
    assert(got == want, "expiry must drop batch 0's registers exactly")
  }

  test("byBatch: cumulative grows, window expires, estimates track truth") {
    val rows = StreamingHll.byBatch(spark,
        Seq(b0.toDF("it"), b1.toDF("it"), b2.toDF("it")),
        tmp("run"), "it", p = 8, window = 2)
      .orderBy("batch_id").as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // truths: cum = 3000, 4500, 7500; win = 3000, 4500, 6000
    val cumTruth = Seq(3000.0, 4500.0, 7500.0)
    val winTruth = Seq(3000.0, 4500.0, 6000.0)
    rows.foreach { case (i, cum, win) =>
      assert(math.abs(cum - cumTruth(i.toInt)) / cumTruth(i.toInt) < 0.2,
        s"batch $i cum $cum vs ${cumTruth(i.toInt)}")
      assert(math.abs(win - winTruth(i.toInt)) / winTruth(i.toInt) < 0.2,
        s"batch $i win $win vs ${winTruth(i.toInt)}")
    }
    // the expiry is visible: batch-2 window estimate < cumulative
    assert(rows(2)._3 < rows(2)._2)
  }

  test("grouped: per-group registers equal each group's one-shot sketch") {
    // two groups with different item streams; group values contain ':'
    // to exercise the tail-field key packing
    def gb(b: Seq[String]) = b.zipWithIndex
      .map { case (it, i) => (if (i % 2 == 0) "g:a" else "g:b", it) }
      .toDF("g", "it")
    val acc = new StreamingHll.HllAccumulator(spark, tmp("grp"), "it",
      p = 8, compactEvery = 2, groupCol = Some("g"))
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      acc.update(gb(b), i.toLong)
    }
    val got = acc.registersBy(3L)
      .as[(String, Int, Int)].collect().toSet
    val all = gb(b0).unionByName(gb(b1)).unionByName(gb(b2))
    val want = FreqSketch.hllSketchBy(all, "g", "it")
      .as[(String, Int, Int)].collect().toSet
    assert(got == want && got.map(_._1) == Set("g:a", "g:b"))
    // windowed per-group fold equals the one-shot sketch of the window
    val gotWin = acc.registersBy(3L, fromBatch = 2L)
      .as[(String, Int, Int)].collect().toSet
    val wantWin = FreqSketch.hllSketchBy(gb(b2), "g", "it")
      .as[(String, Int, Int)].collect().toSet
    assert(gotWin == wantWin)
    // per-group estimates land near each group's truth
    val est = acc.estimateBy(3L).select("grp", "estimate")
      .as[(String, Double)].collect().toMap
    val truth = all.distinct().groupBy("g").count()
      .as[(String, Long)].collect().toMap
    Seq("g:a", "g:b").foreach { g =>
      assert(est(g) > truth(g) / 2.0 && est(g) < truth(g) * 2.0,
        s"$g: ${est(g)} vs ${truth(g)}")
    }
    // mode guards
    intercept[IllegalArgumentException] { acc.registers(3L) }
    val plain = new StreamingHll.HllAccumulator(spark, tmp("plain"), "it")
    plain.update(b0.toDF("it"), 0L)
    intercept[IllegalArgumentException] { plain.registersBy(1L) }
  }
  test("batch-id regression fails fast instead of corrupting window reads") {
    // batch ids live INSIDE the stored cell keys: a stream restarted
    // WITHOUT its checkpoint re-numbers from 0 and would interleave new
    // registers under old ids, corrupting [from, upto) windowed reads
    val acc = new StreamingHll.HllAccumulator(spark, tmp("regress"), "it",
      p = 8, compactEvery = 8)
    acc.update(b0.toDF("it"), 0L)
    acc.update(b1.toDF("it"), 1L)
    val err = intercept[IllegalArgumentException] {
      acc.update(b2.toDF("it"), 0L)
    }
    assert(err.getMessage.contains("checkpointLocation"),
      s"message must point at checkpoint/storePath reuse: ${err.getMessage}")
    // a RETRY of the latest batch id is allowed (overwrite-idempotent)
    acc.update(b1.toDF("it"), 1L)
    val got = acc.registers(2L).as[(Int, Int)].collect().toSet
    val want = FreqSketch.hllSketch((b0 ++ b1).toDF("it"), "it")
      .as[(Int, Int)].collect().toSet
    assert(got == want, "rejected update must leave the store untouched")
  }
}
