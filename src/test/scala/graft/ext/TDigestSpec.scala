package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TDigestSpec extends SparkTestBase {
  import spark.implicits._

  test("tdigestSummarize: hand-computed k0 clusters on 1..8") {
    val df = (1 to 8).map(v => ("s1", v.toDouble)).toDF("shard", "v")
    val got = TDigest.tdigestSummarize(df, "v", "shard", delta = 4)
      .select(col("cluster"), col("weight"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // before-ranks 0..7, cluster = floor(before*4/8): pairs
    assert(got.toSeq == Seq((0L, 2L, 1.0, 2.0), (1L, 2L, 3.0, 4.0),
      (2L, 2L, 5.0, 6.0), (3L, 2L, 7.0, 8.0)))
  }

  test("a heavy duplicate value stays one centroid; <= delta+1 rows") {
    val rows = Seq.fill(5)(1.0) ++ Seq(2.0) ++ Seq.fill(2)(3.0)
    val df = rows.map(("s", _)).toDF("shard", "v")
    val got = TDigest.tdigestSummarize(df, "v", "shard", delta = 4)
      .select(col("cluster"), col("weight"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // distinct values: (1, w5, before 0 -> c0), (2, w1, before 5 ->
    // floor(20/8)=2), (3, w2, before 6 -> c3)
    assert(got.toSeq == Seq((0L, 5L, 1.0, 1.0), (2L, 1L, 2.0, 2.0),
      (3L, 2L, 3.0, 3.0)))
    assert(got.length <= 5)
  }

  test("merge + quantiles: brackets contain the true quantiles") {
    val rnd = new scala.util.Random(11)
    val vals = (0 until 3000).map(_ => math.floor(rnd.nextGaussian() * 1e4) / 100.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (s"sh${i % 3}", v) }.toDF("shard", "v")
    val delta = 32
    val perShard = (0 until 3).map(i =>
      TDigest.tdigestSummarize(df.filter(col("shard") === s"sh$i"),
        "v", "shard", delta))
    val digest = TDigest.tdigestMerge(perShard, delta)
    assert(digest.count() <= delta + 1)
    val qs = Seq(0.01, 0.1, 0.5, 0.9, 0.99)
    val got = TDigest.tdigestQuantiles(digest, qs)
      .select(col("qi"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"),
        col("estimate"))
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.length == qs.size, "each q answered by exactly one centroid")
    val sorted = vals.sorted
    got.foreach { case (qi, r, lo, hi, est) =>
      assert(r == math.floor(qs(qi.toInt) * (vals.size - 1)).toLong)
      val truth = sorted(r.toInt)
      assert(lo <= truth && truth <= hi,
        s"q=${qs(qi.toInt)}: true $truth outside [$lo, $hi]")
      assert(lo <= est && est <= hi, "estimate inside its own bracket")
    }
  }

  test("merge is exact on weights/sums and widens brackets soundly") {
    val a = Seq.tabulate(100)(i => ("a", i.toDouble)).toDF("shard", "v")
    val b = Seq.tabulate(100)(i => ("b", (i + 50).toDouble)).toDF("shard", "v")
    val delta = 8
    val da = TDigest.tdigestSummarize(a, "v", "shard", delta)
    val db = TDigest.tdigestSummarize(b, "v", "shard", delta)
    val m = TDigest.tdigestMerge(Seq(da, db), delta)
    val (w, s) = m.agg(sum(col("weight")), sum(col("sumv")).cast("double"))
      .as[(Long, Double)].head()
    assert(w == 200L, "merged weight = total count")
    assert(s == (0 until 100).sum + (50 until 150).sum, "sums add exactly")
    assert(m.count() <= delta + 1)
    // deterministic: same inputs -> byte-identical digest
    val m2 = TDigest.tdigestMerge(Seq(da, db), delta)
    assert(m.collect().toSeq.sortBy(_.getLong(0)) ==
      m2.collect().toSeq.sortBy(_.getLong(0)))
  }

  test("merge of OVERLAPPING digests keeps brackets sound (adversarial)") {
    // the exact round-11 counterexample: shard A = {0, 100 x9}
    // summarizes at delta=2 to one centroid (w=10, [0,100]); shard
    // B = {50, 60 x9} to (w=10, [50,60]). Merged clusters are
    // c0 = [0,100] (ranks 0-9) and c1 answering ranks 10-19 — whose
    // OWN centroid span [50,60] excludes the true rank-15 value (100).
    // The envelope widening must stretch c1's bracket to cover A.
    val a = (Seq(0.0) ++ Seq.fill(9)(100.0)).map(("A", _)).toDF("shard", "v")
    val b = (Seq(50.0) ++ Seq.fill(9)(60.0)).map(("B", _)).toDF("shard", "v")
    val delta = 2
    val da = TDigest.tdigestSummarize(a, "v", "shard", delta)
    val db = TDigest.tdigestSummarize(b, "v", "shard", delta)
    assert(da.count() == 1 && db.count() == 1, "one centroid per shard")
    val m = TDigest.tdigestMerge(Seq(da, db), delta)
    val truth = (Seq(0.0, 50.0) ++ Seq.fill(9)(60.0) ++
      Seq.fill(9)(100.0)).sorted // the merged multiset, ranks 0..19
    val got = TDigest.tdigestQuantiles(m, Seq(0.0, 0.3, 0.8, 1.0))
      .select(col("q"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .as[(Double, Long, Double, Double)].collect()
    got.foreach { case (q, r, lo, hi) =>
      val t = truth(r.toInt)
      assert(lo <= t && t <= hi,
        s"q=$q rank $r: true $t outside merged bracket [$lo, $hi]")
    }
    // the q=0.8 band (rank 15, true value 100) is the round-11 break
    val r15 = got.find(_._2 == 15L).get
    assert(r15._3 <= 100.0 && 100.0 <= r15._4,
      s"rank-15 bracket [${r15._3}, ${r15._4}] must contain 100")
    // disjointly-skewed shards, many centroids: sweep every rank
    val c = (0 until 200).map(i => ("C", (i % 7) * 10.0)).toDF("shard", "v")
    val d = (0 until 200).map(i => ("D", 25.0 + (i % 11) * 5.0)).toDF("shard", "v")
    val m2 = TDigest.tdigestMerge(Seq(
      TDigest.tdigestSummarize(c, "v", "shard", 4),
      TDigest.tdigestSummarize(d, "v", "shard", 4)), 4)
    val multi = ((0 until 200).map(i => (i % 7) * 10.0) ++
      (0 until 200).map(i => 25.0 + (i % 11) * 5.0)).sorted
    val qs2 = (0 to 20).map(_ / 20.0)
    TDigest.tdigestQuantiles(m2, qs2)
      .select(col("target_rank"), col("vmin").cast("double"),
        col("vmax").cast("double"))
      .as[(Long, Double, Double)].collect()
      .foreach { case (r, lo, hi) =>
        val t = multi(r.toInt)
        assert(lo <= t && t <= hi, s"rank $r: $t outside [$lo, $hi]")
      }
  }

  test("merge of non-overlapping digests keeps the tight brackets") {
    // disjoint value ranges: the envelope collapses to the exact span,
    // so widening must NOT loosen anything — merged brackets equal the
    // pre-widening re-cluster's (assigned-centroid min/max)
    val a = (0 until 64).map(i => ("a", i.toDouble)).toDF("shard", "v")
    val b = (0 until 64).map(i => ("b", 1000.0 + i)).toDF("shard", "v")
    val delta = 8
    val m = TDigest.tdigestMerge(Seq(
      TDigest.tdigestSummarize(a, "v", "shard", delta),
      TDigest.tdigestSummarize(b, "v", "shard", delta)), delta)
      .select(col("cluster"), col("weight"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    // every cluster's bracket stays within ONE input's range — no
    // cross-contamination from the widening
    m.foreach { case (cl, _, lo, hi) =>
      assert((hi <= 63.0) || (lo >= 1000.0),
        s"cluster $cl bracket [$lo, $hi] spans disjoint inputs")
    }
    // and the multiset is fully covered in order
    assert(m.map(_._2).sum == 128L)
  }

  test("per-group quantile brackets contain each group's true quantile") {
    val rnd = new scala.util.Random(7)
    // dyadic values (x/16): exactly representable BOTH as doubles and
    // at the DECIMAL(28,8) carrier scale, so the scala-side truth and
    // the digest's brackets quantize identically
    val rows = (0 until 2000).map { i =>
      val g = s"g${i % 4}"
      (g, math.floor(rnd.nextGaussian() * 1e3 + (i % 4) * 500) / 16.0)
    }
    val digest = TDigest.tdigestSummarize(rows.toDF("shard", "v"),
      "v", "shard", delta = 16)
    val got = TDigest.tdigestQuantilesByGroup(digest, Seq(0.25, 0.75))
      .select(col("shard"), col("qi"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"),
        col("estimate"))
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 8, "4 groups x 2 quantiles, one row each")
    val byGroup = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    got.foreach { case (g, qi, r, lo, hi, est) =>
      val sorted = byGroup(g)
      val q = Seq(0.25, 0.75)(qi.toInt)
      assert(r == math.floor(q * (sorted.size - 1)).toLong)
      val truth = sorted(r.toInt)
      assert(lo <= truth && truth <= hi,
        s"group $g q$q: true $truth outside [$lo, $hi]")
      assert(lo <= est && est <= hi)
    }
  }

  test("group-wise merge: per-group brackets survive a 2-way day merge") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 1600).map { i =>
      (i % 2, s"g${i % 4}",
        math.floor(rnd.nextGaussian() * 800 + (i % 4) * 100) / 16.0)
    }
    val delta = 16
    val perDay = (0 to 1).map(d =>
      TDigest.tdigestSummarize(
        rows.filter(_._1 == d).map(r => (r._2, r._3)).toDF("shard", "v"),
        "v", "shard", delta))
    val merged = TDigest.tdigestMergeByGroup(perDay, delta)
    // <= delta+1 rows per group, weights add per group
    val sizes = merged.groupBy("shard")
      .agg(count(lit(1)).as("rows"), sum("weight").as("w"))
      .as[(String, Long, Long)].collect()
    assert(sizes.forall(_._2 <= delta + 1))
    assert(sizes.forall(_._3 == 400L), "each group carries 400 values")
    val got = TDigest.tdigestQuantilesByGroup(merged, Seq(0.5))
      .select(col("shard"), col("target_rank"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .as[(String, Long, Double, Double)].collect()
    val byGroup = rows.groupBy(_._2).view.mapValues(_.map(_._3).sorted)
    got.foreach { case (g, r, lo, hi) =>
      val truth = byGroup(g)(r.toInt)
      assert(lo <= truth && truth <= hi,
        s"group $g after merge: true $truth outside [$lo, $hi]")
    }
  }

  test("weighted digest equals the expanded-multiset digest; w<=0 drops") {
    val weighted = Seq(("s", 1.0, 3L), ("s", 2.0, 1L), ("s", 5.0, 2L),
      ("s", 9.0, 0L), ("s", 7.0, -2L)).toDF("shard", "v", "wt")
    val expanded = (Seq.fill(3)(1.0) ++ Seq(2.0) ++ Seq.fill(2)(5.0))
      .map(("s", _)).toDF("shard", "v")
    val dw = TDigest.tdigestSummarize(weighted, "v", "shard", delta = 4,
        weightCol = Some("wt"))
      .select(col("cluster"), col("weight"), col("sumv").cast("double"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .collect().toSeq.sortBy(_.getLong(0))
    val de = TDigest.tdigestSummarize(expanded, "v", "shard", delta = 4)
      .select(col("cluster"), col("weight"), col("sumv").cast("double"),
        col("vmin").cast("double"), col("vmax").cast("double"))
      .collect().toSeq.sortBy(_.getLong(0))
    assert(dw == de,
      "a weight-w row must digest exactly like w copies of the value " +
        "(and zero/negative weights like absence)")
  }

  test("NULLs drop; invalid delta/quantiles rejected") {
    val df = Seq(("s", Some(1.0)), ("s", None), ("s", Some(3.0)))
      .toDF("shard", "v")
    val d = TDigest.tdigestSummarize(df, "v", "shard", delta = 4)
    assert(d.agg(sum("weight")).head().getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      TDigest.tdigestSummarize(df, "v", "shard", delta = 0)
    }
    intercept[IllegalArgumentException] {
      TDigest.tdigestQuantiles(d, Seq(1.5))
    }
  }
}
