package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class StreamingTDigestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-stdg-$tag").toString + "/store"

  // three batches shifting the distribution (negatives + reals — the
  // domain HDR cannot carry) so running quantiles must move
  private val b0 = (0 until 1000).map(i => -50.0 + (i % 100) * 0.25)
  private val b1 = (0 until 1000).map(i => 10.5 + (i % 900) * 0.5)
  private val b2 = (0 until 1000).map(i => 1000.0 + (i % 5000) * 0.125)

  test("byBatch running brackets contain the true running quantiles") {
    val rows = StreamingTDigest.byBatch(spark,
        Seq(b0.toDF("v"), b1.toDF("v"), b2.toDF("v")),
        tmp("run"), "v", Seq(0.1, 0.5, 0.99), delta = 32)
      .select(col("batch_id"), col("q"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"),
        col("estimate"))
      .orderBy("batch_id", "q")
      .as[(Long, Double, Long, Double, Double, Double)].collect()
    assert(rows.length == 9, "3 batches x 3 quantiles, one row each")
    val prefixes = Seq(b0, b0 ++ b1, b0 ++ b1 ++ b2)
    rows.foreach { case (bid, q, r, lo, hi, est) =>
      val sorted = prefixes(bid.toInt).sorted
      assert(r == math.floor(q * (sorted.size - 1)).toLong)
      val truth = sorted(r.toInt)
      assert(lo <= truth && truth <= hi,
        s"batch $bid q$q: true $truth outside [$lo, $hi]")
      assert(lo <= est && est <= hi, "estimate inside its own bracket")
    }
    // the p50 bracket must move up as later, larger batches accumulate
    val p50his = rows.filter(_._2 == 0.5).sortBy(_._1).map(_._5)
    assert(p50his(0) < p50his(1) && p50his(1) < p50his(2),
      s"p50 hi bounds not increasing: ${p50his.toSeq}")
  }

  test("state is <= delta+1 rows after every batch; weights/sums exact") {
    val store = tmp("state")
    val acc = new StreamingTDigest.TDigestAccumulator(spark, store, "v",
      shardCol = None, delta = 16)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      acc.update(b.toDF("v"), i.toLong)
      val d = acc.digest(i.toLong + 1)
      assert(d.count() <= 17, s"state after batch $i exceeds delta+1")
      val n = d.agg(sum("weight")).head().getLong(0)
      assert(n == (i + 1) * 1000L, "merged weight = rows seen so far")
    }
    val s = acc.digest(3L).agg(sum(col("sumv")).cast("double"))
      .head().getDouble(0)
    val want = (b0 ++ b1 ++ b2).sum
    assert(math.abs(s - want) < 1e-6, "sums fold exactly across batches")
  }

  test("sharded batch summarize folds to the same bracket soundness") {
    val store = tmp("shard")
    val batches = Seq(b0, b1).map(b =>
      b.zipWithIndex.map { case (v, i) => (i.toLong % 4, v) }
        .toDF("src", "v"))
    val rows = StreamingTDigest.byBatch(spark, batches, store, "v",
        Seq(0.5), shardCol = Some("src"), delta = 32)
      .select(col("batch_id"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .orderBy("batch_id")
      .as[(Long, Long, Double, Double)].collect()
    val prefixes = Seq(b0, b0 ++ b1)
    rows.foreach { case (bid, r, lo, hi) =>
      val truth = prefixes(bid.toInt).sorted.apply(r.toInt)
      assert(lo <= truth && truth <= hi,
        s"sharded batch $bid: true $truth outside [$lo, $hi]")
    }
  }

  test("retry of a batch id is idempotent; restart recovers the fold") {
    val store = tmp("retry")
    val acc = new StreamingTDigest.TDigestAccumulator(spark, store, "v",
      shardCol = None, delta = 16)
    acc.update(b0.toDF("v"), 0L)
    acc.update(b1.toDF("v"), 1L)
    val once = acc.digest(2L).collect().toSeq
      .sortBy(r => r.getDecimal(2).toString)
    // foreachBatch retry: batch 1 re-delivered — must re-fold from the
    // SAME predecessor state and overwrite with identical rows
    acc.update(b1.toDF("v"), 1L)
    val twice = acc.digest(2L).collect().toSeq
      .sortBy(r => r.getDecimal(2).toString)
    assert(once == twice, "retried batch changed the folded digest")
    // restart: a NEW accumulator on the same path resumes the fold
    val acc2 = new StreamingTDigest.TDigestAccumulator(spark, store, "v",
      shardCol = None, delta = 16)
    acc2.update(b2.toDF("v"), 2L)
    assert(acc2.digest(3L).agg(sum("weight")).head().getLong(0) == 3000L)
  }

  test("grouped byBatch: per-group running brackets contain the truth") {
    // two groups with different scales, shifted per batch — per-group
    // state must stay independent and per-group brackets sound
    def mk(vals: Seq[Double]) = vals.zipWithIndex
      .map { case (v, i) => (s"g${i % 2}", v + (i % 2) * 500.0) }
      .toDF("grp", "v")
    val rows = StreamingTDigest.byBatch(spark,
        Seq(mk(b0), mk(b1)), tmp("grp"), "v", Seq(0.25, 0.75),
        delta = 16, groupCol = Some("grp"))
      .select(col("batch_id"), col("shard"), col("q"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"),
        col("estimate"))
      .as[(Long, String, Double, Long, Double, Double, Double)].collect()
    assert(rows.length == 8, "2 batches x 2 groups x 2 quantiles")
    // group of row i within a batch is g(i%2), its value shifted by
    // (i%2)*500 — mirror mk() exactly, per batch
    def groupVals(batch: Seq[Double], g: String): Seq[Double] =
      batch.zipWithIndex.filter(_._2 % 2 == (if (g == "g0") 0 else 1))
        .map { case (v, i) => v + (i % 2) * 500.0 }
    val batchSeqs = Seq(b0, b1)
    rows.foreach { case (bid, g, q, r, lo, hi, est) =>
      val sorted = (0 to bid.toInt)
        .flatMap(i => groupVals(batchSeqs(i), g)).sorted
      assert(r == math.floor(q * (sorted.size - 1)).toLong,
        s"batch $bid $g q$q rank")
      val truth = sorted(r.toInt)
      assert(lo <= truth && truth <= hi,
        s"batch $bid $g q$q: true $truth outside [$lo, $hi]")
      assert(lo <= est && est <= hi)
    }
    // state bound: <= delta+1 rows PER GROUP after the fold
    val acc2 = new StreamingTDigest.TDigestAccumulator(spark, tmp("grp2"),
      "v", delta = 16, groupCol = Some("grp"))
    acc2.update(mk(b0), 0L)
    acc2.update(mk(b1), 1L)
    val sizes = acc2.digest(2L).groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("weight").as("w"))
      .as[(String, Long, Long)].collect()
    assert(sizes.length == 2 && sizes.forall(_._2 <= 17))
    assert(sizes.forall(_._3 == 1000L), s"500+500 values per group: ${sizes.toSeq}")
    // groupCol and shardCol are exclusive
    intercept[IllegalArgumentException] {
      new StreamingTDigest.TDigestAccumulator(spark, tmp("grp3"), "v",
        shardCol = Some("s"), groupCol = Some("grp"))
    }
  }

  test("batch-id regression fails fast instead of silently discarding") {
    // a store already at digest_upto_2 receiving batch 0 means the
    // stream restarted WITHOUT its checkpoint (ids re-start at 0) or
    // the path is reused: folding through would write digest_upto_1
    // and the newest-first cleanup would delete it immediately while
    // digest() keeps serving the stale version — fail instead
    val store = tmp("regress")
    val acc = new StreamingTDigest.TDigestAccumulator(spark, store, "v",
      shardCol = None, delta = 16)
    acc.update(b0.toDF("v"), 0L)
    acc.update(b1.toDF("v"), 1L)
    val err = intercept[IllegalArgumentException] {
      acc.update(b2.toDF("v"), 0L)
    }
    assert(err.getMessage.contains("checkpointLocation"),
      s"message must point at checkpoint/storePath reuse: ${err.getMessage}")
    // the stored fold is untouched by the rejected update
    assert(acc.digest(2L).agg(sum("weight")).head().getLong(0) == 2000L)
  }

  test("windowed reads expire old batches; brackets contain the " +
      "window's own truth; decay weights the merged multiset") {
    val rows = StreamingTDigest.byBatchWindow(spark,
        Seq(b0.toDF("v"), b1.toDF("v"), b2.toDF("v")),
        tmp("win"), "v", Seq(0.1, 0.5, 0.9), window = 2, delta = 32,
        decayHalfLife = Some(1))
      .select(col("batch_id"), col("kind"), col("q"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"),
        col("estimate"))
      .orderBy("batch_id", "kind", "q")
      .as[(Long, String, Double, Long, Double, Double, Double)].collect()
    // window states: [b0], [b0,b1], [b1,b2] — truth is the WINDOW's
    // multiset, not the whole stream's
    val windows = Seq(b0, b0 ++ b1, b1 ++ b2)
    rows.filter(_._2 == "window").foreach {
      case (bid, _, q, r, lo, hi, est) =>
        val sorted = windows(bid.toInt).sorted
        assert(r == math.floor(q * (sorted.size - 1)).toLong)
        val truth = sorted(r.toInt)
        assert(lo <= truth && truth <= hi,
          s"window $bid q$q: true $truth outside [$lo, $hi]")
        assert(lo <= est && est <= hi)
    }
    // expiry is visible: after batch 2 the window [b1, b2] no longer
    // contains b0's negative values, so even p10 sits above b0's range
    val p10lo = rows.filter(r => r._1 == 2 && r._2 == "window" &&
      r._3 == 0.1).head._5
    assert(p10lo > b0.max,
      s"expired batch still visible in the window read: p10 lo $p10lo")
    // decay: halfLife 1 over 3 batches weights (1, 2, 4) — the decayed
    // multiset is b0 + 2×b1 + 4×b2, and the brackets must contain ITS
    // true quantiles
    val decayed = (b0 ++ b1.flatMap(v => Seq(v, v)) ++
      b2.flatMap(v => Seq(v, v, v, v))).sorted
    rows.filter(_._2 == "decay").foreach {
      case (_, _, q, r, lo, hi, est) =>
        assert(r == math.floor(q * (decayed.size - 1)).toLong)
        val truth = decayed(r.toInt)
        assert(lo <= truth && truth <= hi,
          s"decay q$q: true $truth outside [$lo, $hi]")
        assert(lo <= est && est <= hi)
    }
    // decay pulls the median toward the newest (largest) batch: the
    // decayed p50 bracket sits above the un-decayed full-stream p50
    val full = (b0 ++ b1 ++ b2).sorted
    val decayP50lo = rows.filter(r => r._2 == "decay" && r._3 == 0.5)
      .head._5
    assert(decayP50lo > full(full.size / 2),
      "decay must shift p50 toward recent batches")
  }

  test("grouped windowed reads: each group's window answers its own " +
      "multiset; grouped decay weights within the group") {
    // two groups with disjoint value ranges so a cross-group leak is
    // immediately visible in the brackets
    def gb(b: Seq[Double]) = b.zipWithIndex.map { case (v, i) =>
      if (i % 2 == 0) ("lo", v) else ("hi", v + 100000.0)
    }
    val batches = Seq(gb(b0), gb(b1), gb(b2))
    val rows = StreamingTDigest.byBatchWindow(spark,
        batches.map(_.toDF("grp", "v")),
        tmp("gwin"), "v", Seq(0.5), window = 2, delta = 32,
        decayHalfLife = Some(1), groupCol = Some("grp"))
      .select(col("batch_id"), col("kind"), col("shard"), col("q"),
        col("target_rank"), col("vmin").cast("double"),
        col("vmax").cast("double"), col("estimate"))
      .as[(Long, String, String, Double, Long, Double, Double, Double)]
      .collect()
    // per (state, group): rank + bracket answer the GROUP's own window
    val windows = Seq(batches(0), batches(0) ++ batches(1),
      batches(1) ++ batches(2))
    rows.filter(_._2 == "window").foreach {
      case (bid, _, g, q, r, lo, hi, est) =>
        val vs = windows(bid.toInt).filter(_._1 == g).map(_._2).sorted
        assert(r == math.floor(q * (vs.size - 1)).toLong,
          s"group $g state $bid rank")
        val truth = vs(r.toInt)
        assert(lo <= truth && truth <= hi,
          s"group $g state $bid q$q: true $truth outside [$lo, $hi]")
        assert(lo <= est && est <= hi)
    }
    // group isolation: the hi group's brackets never dip into the lo
    // group's value range
    assert(rows.filter(_._3 == "hi").forall(_._6 >= 100000.0 - 2000.0))
    // grouped decay: per group, multiset = b0 + 2·b1 + 4·b2 of that
    // group's own values
    rows.filter(_._2 == "decay").foreach {
      case (_, _, g, q, r, lo, hi, _) =>
        val all = batches(0) ++ batches(1).flatMap(x => Seq(x, x)) ++
          batches(2).flatMap(x => Seq(x, x, x, x))
        val vs = all.filter(_._1 == g).map(_._2).sorted
        assert(r == math.floor(q * (vs.size - 1)).toLong)
        val truth = vs(r.toInt)
        assert(lo <= truth && truth <= hi,
          s"group $g decay q$q: true $truth outside [$lo, $hi]")
    }
  }

  test("windowed reads refuse silent under-coverage") {
    val store = tmp("guard")
    // keepBatches = 2: after 3 updates batch 0's digest is gone
    val acc = new StreamingTDigest.TDigestAccumulator(spark, store, "v",
      delta = 16, keepBatches = 2)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      acc.update(b.toDF("v"), i.toLong)
    }
    // the retained window answers
    assert(StreamingTDigest.byBatchWindow(spark, Seq(b0.toDF("v")),
      tmp("ok"), "v", Seq(0.5), window = 1).count() == 1L)
    assert(acc.quantilesWindow(Seq(0.5), 3L, fromBatch = 1L).count() == 1L)
    // a window reaching into the evicted batch fails loud
    val e = intercept[IllegalArgumentException] {
      acc.quantilesWindow(Seq(0.5), 3L, fromBatch = 0L)
    }
    assert(e.getMessage.contains("keepBatches"))
    // an accumulator without retention refuses windowed reads entirely
    val acc2 = new StreamingTDigest.TDigestAccumulator(spark,
      tmp("none"), "v", delta = 16)
    acc2.update(b0.toDF("v"), 0L)
    val e2 = intercept[IllegalArgumentException] {
      acc2.quantilesWindow(Seq(0.5), 1L)
    }
    assert(e2.getMessage.contains("keepBatches > 0"))
    // decay span cap fails loud, not by silent overflow
    val e3 = intercept[IllegalArgumentException] {
      acc.quantilesDecayed(Seq(0.5), 30L, halfLifeBatches = 1,
        fromBatch = 1L)
    }
    assert(e3.getMessage.contains("decay span"))
  }

  test("live stream: foreachBatch accumulates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val store = tmp("live")
    val (query, acc) = StreamingTDigest.start(
      input.toDF().withColumnRenamed("value", "v"), store, "v",
      delta = 16, queryName = "stdg-spec")
    try {
      input.addData(b0: _*)
      query.processAllAvailable()
      input.addData(b1: _*)
      query.processAllAvailable()
      val d = acc.digest(Long.MaxValue)
      assert(d.agg(sum("weight")).head().getLong(0) == 2000L)
      assert(d.count() <= 17)
    } finally query.stop()
  }

  // the r15 replay-read optimization: ALL per-batch window states (and
  // the decayed read) answered by ONE group-keyed chain must equal the
  // per-state reads bit-for-bit
  test("batched all-states reads == per-state reads, bit for bit") {
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toSeq.map(v => if (v == null) "<null>" else v.toString)
        .mkString("|")).toSet

    // grouped windowed + decayed
    val s2 = tmp("allst-win")
    val gb = Seq(b0, b1, b2).map(vs =>
      vs.toDF("v").select(
        concat(lit("g"), (monotonically_increasing_id() % 2).cast("string"))
          .as("grp"), col("v")))
    val acc2 = new StreamingTDigest.TDigestAccumulator(spark, s2, "v",
      delta = 16, keepVersions = 4, groupCol = Some("grp"),
      keepBatches = 4, keepCumulative = false)
    gb.zipWithIndex.foreach { case (b, i) => acc2.update(b, i.toLong) }
    val batched2 = acc2.quantilesWindowAllStates(Seq(0.5, 0.9), 3L,
      window = 2, decayHalfLife = Some(1))
    val single2 = (1L to 3L).map(u =>
      acc2.quantilesWindow(Seq(0.5, 0.9), u, math.max(0L, u - 2))
        .withColumn("state", lit(u - 1))).reduce(_ unionByName _)
      .unionByName(acc2.quantilesDecayed(Seq(0.5, 0.9), 3L, 1)
        .withColumn("state", lit(-1L)))
    val cols = Seq("state", "shard", "qi", "q", "n", "target_rank",
      "weight", "vmin", "vmax", "estimate")
    assert(rows(batched2.select(cols.head, cols.tail: _*)) ==
      rows(single2.select(cols.head, cols.tail: _*)))
  }
}
