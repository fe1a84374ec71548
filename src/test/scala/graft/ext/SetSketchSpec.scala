package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SetSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val members = (0 until 800).map(i => s"m$i")
  private val absent = (0 until 800).map(i => s"x$i")

  // ------------------------------------------------------------- Bloom

  test("bloom bits equal an independent Scala md5 derivation") {
    val df = Seq("alpha", "bravo", "charlie").toDF("it")
    val got = SetSketch.bloomSketch(df, "it", mBits = 512)
      .as[Long].collect().toSet
    val want = Seq("alpha", "bravo", "charlie").flatMap { s =>
      val hx = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val a = java.lang.Long.parseLong(hx.substring(0, 8), 16)
      val b = java.lang.Long.parseLong(hx.substring(8, 16), 16)
      (0 until SetSketch.BloomK).map(i => math.floorMod(a + i * b, 512L))
    }.toSet
    assert(got == want)
  }

  test("bloomContains has no false negatives; absence is proof") {
    val sk = SetSketch.bloomSketch(members.toDF("it"), "it", mBits = 8192)
    val ct = SetSketch.bloomContains(sk, (members ++ absent).toDF("it"), "it",
        mBits = 8192)
      .select(col("item"), col("maybe")).as[(String, Boolean)]
      .collect().toMap
    members.foreach(m => assert(ct(m), s"member $m reported absent"))
    // 800 items into 8192 bits: FPR ~ (1-e^(-4*800/8192))^4 ~ 1% — the
    // screen must actually screen, not degenerate to all-maybe
    val fp = absent.count(ct(_))
    assert(fp < 80, s"$fp/800 false positives — filter degenerated")
  }

  test("bloomMerge of split member sets equals the single-shot sketch") {
    val (l, r) = members.splitAt(300)
    val whole = SetSketch.bloomSketch(members.toDF("it"), "it", mBits = 4096)
      .as[Long].collect().toSet
    val merged = SetSketch.bloomMerge(Seq(
        SetSketch.bloomSketch(l.toDF("it"), "it", mBits = 4096),
        SetSketch.bloomSketch(r.toDF("it"), "it", mBits = 4096)))
      .as[Long].collect().toSet
    assert(whole == merged)
  }

  test("bloom relation is bounded by mBits and drops nulls") {
    val big = spark.range(200000)
      .select(when(col("id") % 1000 =!= 0L, col("id").cast("string")).as("it"))
    val n = SetSketch.bloomSketch(big, "it", mBits = 256).count()
    assert(n <= 256, s"sketch has $n rows > mBits")
  }

  // --------------------------------------------------------------- KMV

  test("kmvSketch is the k smallest distinct hashes; exact regime under k") {
    val df = members.toDF("it")
    val all = df.select(SetSketch.hash48(col("it")).as("h"))
      .distinct().as[Long].collect().sorted
    val sk = SetSketch.kmvSketch(df, "it", k = 64).as[Long].collect().sorted
    assert(sk.toSeq == all.take(64).toSeq)
    // fewer distincts than k → the sketch IS the set and the estimate
    // is exactly the distinct count
    val tiny = Seq("a", "b", "c", "a").toDF("it")
    val est = SetSketch.kmvEstimate(
        SetSketch.kmvSketch(tiny, "it", k = 64), k = 64)
      .select("estimate").as[Double].head()
    assert(est == 3.0)
  }

  test("kmvEstimate lands near the true distinct count") {
    val n = 20000
    val df = spark.range(n).select(concat(lit("v"), col("id")).as("it"))
    val est = SetSketch.kmvEstimate(
        SetSketch.kmvSketch(df, "it", k = 256), k = 256)
      .select("estimate").as[Double].head()
    // k=256 → relative error ~ 1/sqrt(k) ~ 6%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"est $est vs true $n")
  }

  test("kmvMerge closure: bottom-k of bottom-k's equals bottom-k of union") {
    val a = (0 until 5000).map(i => s"a$i")
    val b = (2500 until 7500).map(i => s"a$i") // overlaps a
    val direct = SetSketch.kmvSketch((a ++ b).toDF("it"), "it", k = 128)
      .as[Long].collect().sorted.toSeq
    val merged = SetSketch.kmvMerge(Seq(
        SetSketch.kmvSketch(a.toDF("it"), "it", k = 128),
        SetSketch.kmvSketch(b.toDF("it"), "it", k = 128)), k = 128)
      .as[Long].collect().sorted.toSeq
    assert(direct == merged)
  }

  test("kmvIntersectEstimate tracks the true overlap") {
    val a = (0 until 6000).map(i => s"s$i")
    val b = (3000 until 9000).map(i => s"s$i") // |A∩B| = 3000, |A∪B| = 9000
    val ska = SetSketch.kmvSketch(a.toDF("it"), "it", k = 256)
    val skb = SetSketch.kmvSketch(b.toDF("it"), "it", k = 256)
    val r = SetSketch.kmvIntersectEstimate(ska, skb, k = 256)
      .select("union_est", "intersect_est").as[(Double, Double)].head()
    assert(math.abs(r._1 - 9000) / 9000 < 0.25, s"union est ${r._1}")
    assert(math.abs(r._2 - 3000) / 3000 < 0.35, s"intersect est ${r._2}")
  }

  test("kmvIntersectEstimate: disjoint sets estimate ~zero overlap") {
    val ska = SetSketch.kmvSketch(
      (0 until 4000).map(i => s"p$i").toDF("it"), "it", k = 128)
    val skb = SetSketch.kmvSketch(
      (0 until 4000).map(i => s"q$i").toDF("it"), "it", k = 128)
    val r = SetSketch.kmvIntersectEstimate(ska, skb, k = 128)
      .select("n_both", "intersect_est").as[(Long, Double)].head()
    // 48-bit hashes: a shared survivor requires a cross-set collision
    assert(r._1 == 0L && r._2 == 0.0, s"phantom overlap: $r")
  }

  test("kmvSetEstimates: identical sets give zero diffs and jaccard 1") {
    val sk = SetSketch.kmvSketch(
      (0 until 4000).map(i => s"x$i").toDF("it"), "it", k = 128)
    val r = SetSketch.kmvSetEstimates(sk, sk, k = 128)
      .select("n_only_a", "n_only_b", "diff_a_est", "diff_b_est",
        "jaccard_est")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r == ((0L, 0L, 0.0, 0.0, 1.0)))
  }

  test("kmvSetEstimates tracks true differences and jaccard") {
    val a = (0 until 6000).map(i => s"s$i")
    val b = (3000 until 9000).map(i => s"s$i")
    // |A\B| = |B\A| = 3000, J = 3000/9000 = 1/3
    val r = SetSketch.kmvSetEstimates(
        SetSketch.kmvSketch(a.toDF("it"), "it", k = 256),
        SetSketch.kmvSketch(b.toDF("it"), "it", k = 256), k = 256)
      .select("diff_a_est", "diff_b_est", "jaccard_est")
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 3000) / 3000 < 0.35, s"diff_a ${r._1}")
    assert(math.abs(r._2 - 3000) / 3000 < 0.35, s"diff_b ${r._2}")
    assert(math.abs(r._3 - 1.0 / 3) < 0.12, s"jaccard ${r._3}")
  }
}
