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

  // ------------------------------------------------------------------ HLL

  /** Scala reference of the register derivation — same md5 hex slices,
    * same bucket/rho arithmetic, computed independently of Spark.
    */
  private def refRegisters(items: Seq[String], p: Int): Map[Int, Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    items.map { s =>
      val hx = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val wa = java.lang.Long.parseLong(hx.substring(0, 8), 16)
      val wb = java.lang.Long.parseLong(hx.substring(8, 16), 16)
      val bucket = (wa >> (32 - p)).toInt
      val rho =
        if (wb == 0L) 33
        else java.lang.Long.numberOfLeadingZeros(wb) - 32 + 1
      (bucket, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
  }

  test("hllSketch registers equal an independent Scala md5 derivation") {
    val items = (0 until 500).map(i => s"item-$i")
    val got = FreqSketch.hllSketch(items.toDF("word"), "word", p = 8)
      .as[(Int, Int)].collect().toMap
    assert(got == refRegisters(items, 8))
  }

  test("hllMerge of split corpora equals the single-corpus sketch") {
    val items = (0 until 2000).map(i => s"w-$i")
    val (l, r) = items.splitAt(700)
    val whole = FreqSketch.hllSketch(items.toDF("word"), "word")
      .as[(Int, Int)].collect().toSet
    val merged = FreqSketch.hllMerge(Seq(
        FreqSketch.hllSketch(l.toDF("word"), "word"),
        FreqSketch.hllSketch(r.toDF("word"), "word")))
      .as[(Int, Int)].collect().toSet
    assert(whole == merged)
  }

  test("hllEstimate: raw estimator lands near the true distinct count") {
    // n = 10000 >> 2.5·m = 640: the raw regime; p=8 std error is
    // 1.04/sqrt(256) ≈ 6.5% — assert a 3-sigma band
    val items = (0 until 10000).map(i => s"distinct-$i")
    val est = FreqSketch.hllEstimate(
        FreqSketch.hllSketch(items.toDF("word"), "word", p = 8), p = 8)
      .select("estimate").as[Double].collect().head
    assert(math.abs(est - 10000.0) / 10000.0 < 0.20,
      s"estimate $est off by more than 20% from 10000")
    // duplicates must not move the registers (distinctness property)
    val dup = items ++ items ++ items.take(5000)
    val est2 = FreqSketch.hllEstimate(
        FreqSketch.hllSketch(dup.toDF("word"), "word", p = 8), p = 8)
      .select("estimate").as[Double].collect().head
    assert(est2 == est)
  }

  // ------------------------------------------------------- HDR histogram

  /** Scala reference of the HDR bucket mapping. */
  private def refBucket(v: Long, b: Int): Long =
    if (v < (1L << b)) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      (e - b).toLong * (1L << b) + (v >> (e - b))
    }

  test("hdrHistogram buckets equal the Scala reference mapping") {
    val vals = Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 65L, 127L, 128L,
      1000L, 65535L, 1234567890L, (1L << 62) + 7L)
    val got = FreqSketch.hdrHistogram(vals.toDF("v"), "v", subBits = 5)
      .as[(Long, Long)].collect().toMap
    val expected = vals.groupBy(refBucket(_, 5))
      .map { case (bkt, vs) => bkt -> vs.size.toLong }
    assert(got == expected)
  }

  test("hdrMerge of split corpora equals the single-corpus histogram") {
    val vals = (0L until 5000L).map(i => i * i % 999983L)
    val (l, r) = vals.splitAt(1700)
    val whole = FreqSketch.hdrHistogram(vals.toDF("v"), "v")
      .as[(Long, Long)].collect().toSet
    val merged = FreqSketch.hdrMerge(Seq(
        FreqSketch.hdrHistogram(l.toDF("v"), "v"),
        FreqSketch.hdrHistogram(r.toDF("v"), "v")))
      .as[(Long, Long)].collect().toSet
    assert(whole == merged)
  }

  test("hdrQuantiles: true quantile lies in [lo, hi]; small values exact") {
    val vals = (0L until 10000L).toSeq
    val hist = FreqSketch.hdrHistogram(vals.toDF("v"), "v", subBits = 5)
    val out = FreqSketch.hdrQuantiles(hist, Seq(0.5, 0.9, 0.99), subBits = 5)
      .as[(Double, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    for ((q, (_, rank, _, lo, hi)) <- out) {
      val truth = vals.sorted.apply((rank - 1).toInt) // rank-th smallest
      assert(lo <= truth && truth <= hi,
        s"q=$q: true $truth outside [$lo, $hi]")
      assert(hi - lo <= math.max(1L, lo / 32),
        s"q=$q: bound width ${hi - lo} exceeds the 2^-5 relative error")
    }
    // all-small domain: buckets are exact, so lo == hi == the quantile
    val small = (0L until 30L).toSeq
    val sHist = FreqSketch.hdrHistogram(small.toDF("v"), "v", subBits = 5)
    val s = FreqSketch.hdrQuantiles(sHist, Seq(0.5), subBits = 5)
      .as[(Double, Long, Long, Long, Long)].collect().head
    assert(s._4 == s._5 && s._4 == small.sorted.apply((s._2 - 1).toInt))
  }

  test("hdrHistogram raises on negative values") {
    val e = intercept[Exception](
      FreqSketch.hdrHistogram(Seq(-1L).toDF("v"), "v").collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("negative value"))
  }

  test("hllEstimate: closed-form on a handcrafted register table") {
    val m = 256
    // every register present with rho = 1 → S = m·2^39;
    // estimate = (alphaE6·m²/1e6)·2^40 / (m·2^39) = (alphaE6/1e6)·2m
    val regs = (0 until m).map(b => (b, 1)).toDF("bucket", "rho")
    val row = FreqSketch.hllEstimate(regs, p = 8)
      .as[(Long, Long, Double)].collect().head
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val expected = (alphaE6 * m.toLong * m).toDouble / 1000000.0 *
      1099511627776.0 / (m.toLong << 39).toDouble
    assert(row == ((256L, m.toLong << 39, expected)))
  }

  test("amsSketch counters equal an independent Scala md5 derivation") {
    val df = words.toDF("word")
    val got = FreqSketch.amsSketch(df, "word")
      .as[(Int, Long)].collect().toMap
    def sign(s: String, j: Int): Long = {
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hx.substring(j * 4, j * 4 + 4), 16) % 2 * 2 - 1
    }
    val want = (0 until FreqSketch.AmsDepth).map(j =>
      j -> words.map(sign(_, j)).sum).toMap
    assert(got == want)
  }

  test("amsMerge linearity: sketch of concat equals sum of sketches") {
    val (l, r) = words.splitAt(2000)
    val whole = FreqSketch.amsSketch(words.toDF("word"), "word")
      .as[(Int, Long)].collect().toSet
    val merged = FreqSketch.amsMerge(Seq(
        FreqSketch.amsSketch(l.toDF("word"), "word"),
        FreqSketch.amsSketch(r.toDF("word"), "word")))
      .as[(Int, Long)].collect().toSet
    assert(whole == merged)
  }

  test("amsF2 and amsInnerProduct land near the exact moments") {
    val cnt = exact
    val f2True = cnt.values.map(n => n.toDouble * n).sum
    val f2Est = FreqSketch.amsF2(FreqSketch.amsSketch(words.toDF("word"),
        "word")).as[Double].head()
    // single-median estimator on a zipf corpus: generous 3x band — the
    // point pinned here is the estimator shape, exactness is the gate's
    assert(f2Est > f2True / 3 && f2Est < f2True * 3,
      s"F2 est $f2Est vs true $f2True")

    // inner product of a corpus with itself IS F2 — and both medians
    // must agree exactly (same estimator values)
    val sk = FreqSketch.amsSketch(words.toDF("word"), "word")
    val ip = FreqSketch.amsInnerProduct(sk, sk).as[Double].head()
    assert(ip == f2Est)
  }

  test("amsSketch weighted: weight w equals w repeats of the item") {
    val weighted = Seq(("a", 3L), ("b", 2L)).toDF("word", "w")
    val repeated = Seq("a", "a", "a", "b", "b").toDF("word")
    val x = FreqSketch.amsSketch(weighted, "word", weightCol = Some("w"))
      .as[(Int, Long)].collect().toSet
    val y = FreqSketch.amsSketch(repeated, "word")
      .as[(Int, Long)].collect().toSet
    assert(x == y)
  }

  test("hdrHistogramBy/hdrQuantilesBy: per-group picks bound the truth") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 6000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      // different scale per group so the quantiles must differ
      val v = (rnd.nextInt(1000) + 1).toLong * (g.last - '0' + 1)
      (g, v)
    }
    val df = rows.toDF("g", "v")
    // per-group histogram equals the global histogram of each group
    val by = FreqSketch.hdrHistogramBy(df, "g", "v")
      .as[(String, Long, Long)].collect().toSet
    val want = (0 until 3).flatMap { g =>
      FreqSketch.hdrHistogram(
          rows.filter(_._1 == s"g$g").map(_._2).toDF("v"), "v")
        .as[(Long, Long)].collect().map { case (b, c) => (s"g$g", b, c) }
    }.toSet
    assert(by == want)
    // merged halves reproduce the one-shot table
    val halves = Seq(0, 1).map(i => FreqSketch.hdrHistogramBy(
      rows.zipWithIndex.filter(_._2 % 2 == i).map(_._1).toDF("g", "v"),
      "g", "v"))
    assert(FreqSketch.hdrMergeBy(halves)
      .as[(String, Long, Long)].collect().toSet == by)
    // per-group quantile bounds contain the per-group truth
    val picks = FreqSketch.hdrQuantilesBy(
        FreqSketch.hdrHistogramBy(df, "g", "v"), Seq(0.5, 0.9))
      .as[(String, Double, Long, Long, Long, Long)].collect()
    assert(picks.length == 6)
    picks.foreach { case (g, q, rank, _, lo, hi) =>
      val sorted = rows.filter(_._1 == g).map(_._2).sorted
      assert(rank == math.max(1L, math.ceil(q * sorted.size).toLong))
      val truth = sorted((rank - 1).toInt)
      assert(truth >= lo && truth <= hi, s"$g q$q: $truth not in [$lo,$hi]")
    }
  }

  test("countSketch counters equal an independent Scala md5 derivation") {
    val df = words.toDF("word")
    val width = 64
    val got = FreqSketch.countSketch(df, "word", width = width)
      .as[(Int, Long, Long)].collect()
      .map { case (j, b, s) => (j, b) -> s }.toMap
    def hx(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bkt(s: String, j: Int): Long =
      java.lang.Long.parseLong(hx(s).substring(j * 5, j * 5 + 5), 16) % width
    def sgn(s: String, j: Int): Long =
      java.lang.Long.parseLong(hx(s).substring(25 + j, 26 + j), 16) % 2 * 2 - 1
    val want = words
      .flatMap(w => (0 until FreqSketch.CsDepth).map(j => (j, bkt(w, j)) -> sgn(w, j)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      .filter(_._2 != 0L) // zero-sum cells still appear in the relation
    // every Scala-derived nonzero cell matches; Spark may also carry
    // exact-zero cells (sum of +1/-1 collisions) — they estimate as 0
    want.foreach { case (k, s) => assert(got(k) == s, s"cell $k") }
    got.foreach { case (k, s) => assert(want.getOrElse(k, 0L) == s) }
  }

  test("csMerge linearity and sketch difference") {
    val (l, r) = words.splitAt(2000)
    val whole = FreqSketch.countSketch(words.toDF("word"), "word")
      .as[(Int, Long, Long)].collect().toSet
    val merged = FreqSketch.csMerge(Seq(
        FreqSketch.countSketch(l.toDF("word"), "word"),
        FreqSketch.countSketch(r.toDF("word"), "word")))
      .as[(Int, Long, Long)].collect().toSet
    assert(whole.filter(_._3 != 0L) == merged.filter(_._3 != 0L))
    // difference: whole minus left = right (negate-and-merge)
    val negL = FreqSketch.countSketch(l.toDF("word"), "word")
      .select(col("j"), col("bucket"), (-col("s")).as("s"))
    val diff = FreqSketch.csMerge(Seq(
        FreqSketch.countSketch(words.toDF("word"), "word"), negL))
      .as[(Int, Long, Long)].collect().filter(_._3 != 0L).toSet
    val rightSk = FreqSketch.countSketch(r.toDF("word"), "word")
      .as[(Int, Long, Long)].collect().filter(_._3 != 0L).toSet
    assert(diff == rightSk)
  }

  test("csEstimate is exact without collisions and symmetric with them") {
    val df = words.toDF("word")
    val probes = exact.keys.toSeq.toDF("word")
    // wide sketch: 200 items in 5x2^20-cell slices — collision-free in
    // the median, so every estimate is exact
    val wide = FreqSketch.csEstimate(
        FreqSketch.countSketch(df, "word", width = 1 << 20), probes,
        "word", 1 << 20)
      .as[(String, Long)].collect().toMap
    assert(wide == exact)
    // narrow sketch: collisions certain, but signed cancellation keeps
    // the median NEAR truth (CMS at this width over-counts wildly);
    // errors must go BOTH ways — that is the unbiasedness
    val narrow = FreqSketch.csEstimate(
        FreqSketch.countSketch(df, "word", width = 64), probes, "word", 64)
      .as[(String, Long)].collect().toMap
    val errs = exact.map { case (w, n) => narrow(w) - n }
    assert(errs.exists(_ > 0) && errs.exists(_ < 0),
      "signed collisions must err in both directions")
    val n = words.size.toDouble
    val mae = errs.map(e => math.abs(e.toDouble)).sum / errs.size
    assert(mae < n / 8, s"median-of-5 at width 64 should stay tight, mae=$mae")
  }

  test("hllSketchBy: per-group registers equal the per-group global sketch") {
    val rows = words.zipWithIndex
      .map { case (w, i) => (s"g${i % 3}", w) }
    val df = rows.toDF("g", "w")
    val byGroup = FreqSketch.hllSketchBy(df, "g", "w")
      .as[(String, Int, Int)].collect().toSet
    val want = (0 until 3).flatMap { g =>
      FreqSketch.hllSketch(
          rows.filter(_._1 == s"g$g").map(_._2).toDF("w"), "w")
        .as[(Int, Int)].collect().map { case (b, r) => (s"g$g", b, r) }
    }.toSet
    assert(byGroup == want)
    // merging half-sketches reproduces the one-shot table
    val halves = Seq(0, 1).map(i => FreqSketch.hllSketchBy(
      rows.zipWithIndex.filter(_._2 % 2 == i).map(_._1).toDF("g", "w"),
      "g", "w"))
    assert(FreqSketch.hllMergeBy(halves)
      .as[(String, Int, Int)].collect().toSet == byGroup)
    // estimates land near the per-group truth (raw estimator, zipf corpus)
    val est = FreqSketch.hllEstimateBy(FreqSketch.hllSketchBy(df, "g", "w"))
      .select("grp", "estimate").as[(String, Double)].collect().toMap
    (0 until 3).foreach { g =>
      val truth = rows.filter(_._1 == s"g$g").map(_._2).distinct.size
      val e = est(s"g$g")
      assert(e > truth / 2.0 && e < truth * 2.0, s"g$g: $e vs $truth")
    }
  }

  test("mgSummarize: hand-computed theta and floors") {
    // one shard: counts a=5, b=3, c=2, d=1; k=2 -> theta = 3rd largest
    // = 2; survivors a (lo 3) and b (lo 1); c ties AT theta and drops
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("d")
    val df = rows.map(("s1", _)).toDF("shard", "item")
    val got = FreqSketch.mgSummarize(df, "item", "shard", k = 2)
      .select("item", "lo", "theta")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 3L, 2L), ("b", 1L, 2L)))
    // k >= distinct items: theta 0, summary IS the exact count
    val all = FreqSketch.mgSummarize(df, "item", "shard", k = 10)
      .select("item", "lo", "theta")
      .as[(String, Long, Long)].collect().toSet
    assert(all == Set(("a", 5L, 0L), ("b", 3L, 0L), ("c", 2L, 0L),
      ("d", 1L, 0L)))
  }

  test("mgMerge: bounds hold and items above theta always survive") {
    val rnd = new scala.util.Random(7)
    // zipf-ish over 60 items, spread across 3 shards
    val rows = (0 until 6000).map { _ =>
      val item = s"i${math.min((math.pow(rnd.nextDouble(), 3) * 60).toInt, 59)}"
      (s"sh${rnd.nextInt(3)}", item)
    }
    val df = rows.toDF("shard", "item")
    val truth = rows.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    val k = 8
    val perShard = (0 until 3).map(i =>
      FreqSketch.mgSummarize(df.filter(col("shard") === s"sh$i"),
        "item", "shard", k))
    val merged = FreqSketch.mgMerge(perShard, k)
      .as[(String, Long, Long)].collect()
    assert(merged.nonEmpty && merged.length <= k)
    val theta = merged.head._3
    assert(merged.forall(_._3 == theta), "theta is summary-constant")
    merged.foreach { case (item, lo, th) =>
      val t = truth(item)
      assert(lo <= t && t <= lo + th, s"$item: $lo <= $t <= ${lo + th}")
    }
    // completeness: anything the merged summary dropped has true <= theta
    val kept = merged.map(_._1).toSet
    truth.foreach { case (item, t) =>
      if (!kept(item)) assert(t <= theta,
        s"$item (true $t) missing from summary with theta $theta")
    }
  }

  test("mgMerge: a fully-tied shard's theta is carried via the sentinel") {
    // shard shA: 5 items each x3 — more than k=2 items, ALL counts tied
    // at theta_k, so the compress sheds every row; before the sentinel
    // fix its theta vanished and the merged bound broke for items with
    // mass in shA. shard shB: x=10, y=1 (no shedding).
    val rows =
      (for (i <- 0 until 5; _ <- 0 until 3) yield ("shA", s"t$i")) ++
        Seq.fill(10)(("shB", "x")) ++ Seq(("shB", "y"))
    val df = rows.toDF("shard", "item")
    val k = 2
    val perShard = Seq("shA", "shB").map(sh =>
      FreqSketch.mgSummarize(df.filter(col("shard") === sh),
        "item", "shard", k))
    // shA's summary is exactly one item-NULL sentinel carrying theta=3
    val shA = perShard(0).select("item", "lo", "theta").collect()
    assert(shA.length == 1 && shA(0).isNullAt(0))
    assert(shA(0).getLong(1) == 0L && shA(0).getLong(2) == 3L)
    val merged = FreqSketch.mgMerge(perShard, k)
      .filter(col("item").isNotNull)
      .select("item", "lo", "theta")
      .as[(String, Long, Long)].collect()
    val truth = rows.groupBy(_._2).map { case (i, xs) => i -> xs.size.toLong }
    assert(merged.nonEmpty)
    val theta = merged.head._3
    assert(theta == 3L, s"merged theta must include shA's 3, got $theta")
    merged.foreach { case (item, lo, th) =>
      val t = truth(item)
      assert(lo <= t && t <= lo + th, s"$item: $lo <= $t <= ${lo + th}")
    }
    // the no-false-negative screen survives: every dropped item
    // (the five t-items, true count 3) is within the merged theta
    val keptItems = merged.map(_._1).toSet
    truth.foreach { case (item, t) =>
      if (!keptItems(item)) assert(t <= theta,
        s"$item (true $t) missing from summary with theta $theta")
    }
    // merge-of-merges totality: a merge whose ONLY input is the
    // sentinel summary is itself sentinel-only — theta still rides
    val lvl1 = FreqSketch.mgMerge(Seq(perShard(0)), k)
    val l1 = lvl1.select("item", "lo", "theta").collect()
    assert(l1.length == 1 && l1(0).isNullAt(0) && l1(0).getLong(2) == 3L)
    val lvl2 = FreqSketch.mgMerge(
        Seq(lvl1.withColumn("shard", lit("m0")), perShard(1)), k)
      .filter(col("item").isNotNull)
      .select("item", "lo", "theta")
      .as[(String, Long, Long)].collect().toSet
    assert(lvl2 == Set(("x", 10L, 3L), ("y", 1L, 3L)),
      "two-level merge must reproduce the one-level bounds")
  }

  test("mgMerge: equal (shard, theta) across inputs still sums theta") {
    // two DAYS of the same shard, each with the same skew: both
    // summaries carry (shard=d, theta=2). A bare (shard, theta)
    // distinct would collapse them to one 2 and under-state the merged
    // bound; inputs must be tagged so theta sums to 4.
    def day(items: Seq[String]) =
      FreqSketch.mgSummarize(items.map(("d", _)).toDF("shard", "item"),
        "item", "shard", k = 2)
    val rows = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("e") // theta_k = 2 (3rd largest)
    val merged = FreqSketch.mgMerge(Seq(day(rows), day(rows)), k = 2)
      .filter(col("item").isNotNull)
      .select("item", "lo", "theta")
      .as[(String, Long, Long)].collect().toSet
    // per day: a -> lo 3, b -> lo 1, theta 2. Merged counts a=6, b=2
    // over theta_in = 4; merge-level theta_k = 0 (2 items <= k)
    assert(merged == Set(("a", 6L, 4L), ("b", 2L, 4L)),
      s"theta must sum across same-(shard,theta) inputs, got $merged")
    // the bound holds against truth (a=10, b=6, c=4, e=2): survivors
    // satisfy lo <= true <= lo + theta, dropped items are <= theta
    val truth = Map("a" -> 10L, "b" -> 6L, "c" -> 4L, "e" -> 2L)
    merged.foreach { case (item, lo, th) =>
      assert(lo <= truth(item) && truth(item) <= lo + th, item)
    }
    (truth.keySet -- merged.map(_._1)).foreach(i =>
      assert(truth(i) <= 4L, s"dropped $i exceeds merged theta"))
  }

  test("cmsJoinSize never under-estimates; exact when collision-free") {
    // side A: key k appears k times; side B: every key once + key 3
    // five times -> true join size = sum(k * cntB(k))
    val a = (1 to 40).flatMap(k => Seq.fill(k)(s"k$k")).toDF("k")
    val b = ((1 to 40).map(k => s"k$k") ++ Seq.fill(4)("k3")).toDF("k")
    val truth = (1 to 40).map(k => k.toLong * (if (k == 3) 5 else 1)).sum
    // narrow sketch: collisions certain, estimate still an upper bound
    val est256 = FreqSketch.cmsJoinSize(
        FreqSketch.cmsSketch(a, "k", 256), FreqSketch.cmsSketch(b, "k", 256))
      .select("join_size_est").distinct().as[Long].head()
    assert(est256 >= truth, s"narrow est $est256 under-estimates $truth")
    // wide sketch: 40 keys in 4x65536 cells — min over 4 independent
    // slices recovers the exact join size
    val estWide = FreqSketch.cmsJoinSize(
        FreqSketch.cmsSketch(a, "k", 65536),
        FreqSketch.cmsSketch(b, "k", 65536))
      .select("join_size_est").distinct().as[Long].head()
    assert(estWide == truth, s"wide est $estWide != exact $truth")
    // disjoint key spaces at wide width: estimate 0 (no phantom joins)
    val c = (1 to 40).map(k => s"m$k").toDF("k")
    val estDisjoint = FreqSketch.cmsJoinSize(
        FreqSketch.cmsSketch(a, "k", 65536),
        FreqSketch.cmsSketch(c, "k", 65536))
      .select("join_size_est").distinct().as[Long].collect()
    assert(estDisjoint.toSeq == Seq(0L),
      "disjoint sides must estimate 0 — an absent slice is a zero dot")
  }
  test("hllPairwiseOverlap: union law exact, jaccard tracks truth") {
    // A = 0..2999, B = 1500..4499 (J = 1/3), C disjoint
    val rows =
      (0 until 3000).map(i => ("a", s"x$i")) ++
      (1500 until 4500).map(i => ("b", s"x$i")) ++
      (0 until 3000).map(i => ("c", s"y$i"))
    val sk = FreqSketch.hllSketchBy(rows.toDF("g", "it"), "g", "it", p = 8)
    val out = FreqSketch.hllPairwiseOverlap(sk, p = 8)
      .as[(String, String, Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // union law: the pair's est_union IS the estimate of the sketch of
    // the concatenation (register max ≡ sketch of the union) — exact
    val abU = FreqSketch.hllEstimateBy(
        FreqSketch.hllSketchBy(
          rows.filter(r => r._1 != "c").map(r => ("u", r._2)).toDF("g", "it"),
          "g", "it", p = 8), p = 8)
      .select("estimate").as[Double].head()
    assert(out(("a", "b"))._5 == abU,
      s"est_union ${out(("a", "b"))._5} must equal merged-sketch estimate $abU")
    // accuracy: overlapping pair tracks J = 1/3; disjoint pairs near 0
    val jab = out(("a", "b"))._6
    assert(math.abs(jab - 1.0 / 3.0) < 0.2, s"est_jaccard $jab vs 1/3")
    Seq(("a", "c"), ("b", "c")).foreach { k =>
      val j = out(k)._6
      assert(j >= 0.0 && j < 0.12, s"disjoint pair $k est_jaccard $j")
      assert(jab > j + 0.1, "overlap ordering must hold")
    }
  }

  test("q22 shadow: builtin approx_count_distinct tracks the gated HLL") {
    // the gate (q22) runs the library HLL (oracle-replayable); Spark's
    // own HLL++ form it replaced stays pinned here: both estimators
    // must land near the exact per-group distinct count
    val rnd = new scala.util.Random(7)
    val ev = (0 until 20000).map { _ =>
      val g = s"t${rnd.nextInt(4)}"
      (g, (rnd.nextInt(2000) + 1).toLong)
    }.toDF("event_type", "user_id")
    val exactM = ev.distinct().groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val builtin = ev.groupBy("event_type")
      .agg(org.apache.spark.sql.functions
        .approx_count_distinct("user_id", 0.01).as("e"))
      .as[(String, Long)].collect().toMap
    val gated = FreqSketch.hllEstimateBy(
        FreqSketch.hllSketchBy(ev, "event_type", "user_id", p = 5), p = 5)
      .select("grp", "estimate").as[(String, Double)].collect().toMap
    exactM.foreach { case (g, n) =>
      assert(math.abs(builtin(g) - n).toDouble / n < 0.05,
        s"builtin $g: ${builtin(g)} vs $n")
      // p=5 raw estimator: rsd ~ 1.04/sqrt(32) ~ 18%; allow 2.5 sigma
      assert(math.abs(gated(g) - n) / n < 0.45,
        s"gated $g: ${gated(g)} vs $n")
    }
  }

  test("q39 shadow: MinHash-union overlap tracks exact jaccard and the gated HLL") {
    // the gate (q39) runs the HLL inclusion-exclusion overlap
    // (oracle-replayable); the xxh64 MinHash-union form it replaced
    // stays pinned here against the exact shingle-set jaccard
    def text(from: Int, until: Int): String =
      (from until until).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      ("a", text(0, 1500)), ("a", text(1500, 3000)),
      ("b", text(1200, 2700)), ("b", text(2700, 4200)),
      ("c", text(9000, 12000))).toDF("source", "text")
    // exact jaccard of the per-source shingle UNION sets
    val sets = docs
      .select($"source", org.apache.spark.sql.functions.explode(
        Dedup.shingles($"text")).as("sh"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    def jac(x: Set[String], y: Set[String]): Double =
      (x & y).size.toDouble / (x | y).size.toDouble
    val jTrue = jac(sets("a"), sets("b"))
    // minhash-union estimate (the old q39 body)
    val sigs = docs
      .select($"source",
        Dedup.minhashSignature(Dedup.shingles($"text"), 128).as("sig"))
      .groupBy("source")
      .agg(graft.functions.MinHashUnionAgg.column($"sig").as("gsig"))
    val aSig = sigs.select($"source".as("src_a"), $"gsig".as("sig_a"))
    val bSig = sigs.select($"source".as("src_b"), $"gsig".as("sig_b"))
    val mh = aSig.join(bSig, $"src_a" < $"src_b")
      .select($"src_a", $"src_b",
        Dedup.minhashEstimate($"sig_a", $"sig_b").as("est"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(mh(("a", "b")) - jTrue) < 0.15,
      s"minhash ${mh(("a", "b"))} vs exact $jTrue")
    assert(mh(("a", "c")) < 0.05 && mh(("b", "c")) < 0.05)
    // gated HLL overlap on the same corpus agrees with both
    val sh = docs.select($"source", org.apache.spark.sql.functions.explode(
      Dedup.shingles($"text")).as("shingle"))
    val hll = FreqSketch.hllPairwiseOverlap(
        FreqSketch.hllSketchBy(sh, "source", "shingle", p = 8), p = 8)
      .select("src_a", "src_b", "est_jaccard")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(hll(("a", "b")) - jTrue) < 0.2,
      s"hll ${hll(("a", "b"))} vs exact $jTrue")
    assert(hll(("a", "c")) < 0.12 && hll(("b", "c")) < 0.12)
  }
}
