package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private def anon(ips: Seq[String], key: String = "k1"): Seq[Option[String]] =
    ips.zipWithIndex.map { case (ip, i) => (i, ip) }.toDF("i", "ip")
      .select($"i", Privacy.anonymizeIpv4($"ip", key).as("a"))
      .orderBy("i").as[(Int, Option[String])].collect().map(_._2).toSeq

  test("anonymizeIpv4: prefix preservation to the shared depth") {
    val Seq(a, b, c, d) = anon(Seq(
      "10.1.2.3", "10.1.2.99", "10.1.77.3", "192.1.2.3")).map(_.get)
    def octs(s: String) = s.split("\\.").toSeq
    // shared /24 → first three anon octets equal, last differs
    assert(octs(a).take(3) == octs(b).take(3) && octs(a)(3) != octs(b)(3))
    // shared /16 → first two equal, third differs
    assert(octs(a).take(2) == octs(c).take(2) && octs(a)(2) != octs(c)(2))
    // different /8 → first octet differs
    assert(octs(a).head != octs(d).head)
    // outputs are valid octets
    (octs(a) ++ octs(d)).foreach { o =>
      val v = o.toInt
      assert(v >= 0 && v <= 255)
    }
  }

  test("anonymizeIpv4: keyed and deterministic") {
    val once = anon(Seq("172.16.0.1", "8.8.8.8"))
    assert(anon(Seq("172.16.0.1", "8.8.8.8")) == once)
    val other = anon(Seq("172.16.0.1", "8.8.8.8"), key = "k2")
    assert(other != once, "a different key must produce a different mapping")
    // pseudonym is not the identity
    assert(!once.contains(Some("8.8.8.8")))
  }

  test("anonymizeIpv4: malformed inputs null out") {
    val got = anon(Seq("-", "999.1.2.3", "1.2.3", "1.2.3.4.5",
      "a.b.c.d", null, "256.0.0.1", "0.0.0.0"))
    assert(got.take(7).forall(_.isEmpty), s"expected nulls, got $got")
    assert(got(7).isDefined, "0.0.0.0 is a valid address")
    intercept[IllegalArgumentException] {
      Privacy.anonymizeIpv4(lit("1.2.3.4"), "")
    }
  }

  // (zip, age) quasi-identifiers over a toy release: group A has 3 rows
  // but ONE diagnosis (k passes, l fails); group B has 2 rows, 2
  // diagnoses (k fails at k=3); group C passes both.
  private def release = Seq(
    ("02139", 34, "flu"), ("02139", 34, "flu"), ("02139", 34, "flu"),
    ("02139", 61, "cold"), ("02139", 61, "flu"),
    ("94110", 29, "flu"), ("94110", 29, "cold"), ("94110", 29, "covid")
  ).toDF("zip", "age", "diagnosis")

  test("kAnonymity: closed-form group sizes, l-diversity, at_risk flags") {
    val out = Privacy.kAnonymity(release, Seq("zip", "age"),
        Some("diagnosis"), k = 3, l = 2)
      .as[(String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("02139", 34, 3L, Some(1L), true),   // k ok, l fails
      ("02139", 61, 2L, Some(2L), true),   // l ok, k fails
      ("94110", 29, 3L, Some(3L), false))) // both pass
  }

  test("kAnonymity without a sensitive column: l_distinct NULL, only k applies") {
    val out = Privacy.kAnonymity(release, Seq("zip", "age"), None, k = 3)
      .as[(String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.forall(_._4.isEmpty))
    assert(out.map(_._5).toSeq == Seq(false, true, false))
  }

  test("kAnonymity: NULL quasi-identifier values form their own group") {
    val withNull = release.union(
      Seq((null: String, 34, "flu"), (null: String, 34, "cold"))
        .toDF("zip", "age", "diagnosis"))
    val out = Privacy.kAnonymity(withNull, Seq("zip", "age"),
        Some("diagnosis"), k = 2, l = 2)
      .as[(String, Int, Long, Option[Long], Boolean)].collect()
    val nullGroup = out.find(r => r._1 == null && r._2 == 34).get
    assert(nullGroup._3 == 2L && nullGroup._4.contains(2L) && !nullGroup._5)
    intercept[IllegalArgumentException] {
      Privacy.kAnonymity(release, Seq(), Some("diagnosis"), k = 2)
    }
  }

  test("dpThresholds: a valid monotone CDF ladder with mass at zero") {
    val (b, th) = Privacy.dpThresholds(0.5)
    assert(th.length == 2 * b)
    assert(th.zip(th.tail).forall { case (a, c) => a <= c }, "monotone")
    assert(th.head >= 0L && th.last <= (1L << 48))
    // P(Z = 0) = (1-p)/(1+p): the jump between F(-1) and F(0)
    val p = math.exp(-0.5)
    val pz0 = (th(b) - th(b - 1)).toDouble / math.pow(2.0, 48)
    assert(math.abs(pz0 - (1 - p) / (1 + p)) < 1e-9)
    // tighter epsilon -> wider support
    assert(Privacy.dpThresholds(0.1)._1 > b)
    intercept[IllegalArgumentException](Privacy.dpThresholds(0.0))
  }

  test("discreteLaplaceNoise: deterministic, salt-sensitive, zero-centered") {
    val keys = (0 until 4000).map(i => s"group-$i").toDF("k")
    val noise = keys.select(
        Privacy.discreteLaplaceNoise(col("k"), epsilon = 0.5).as("z"))
      .as[Long].collect()
    val again = keys.select(
        Privacy.discreteLaplaceNoise(col("k"), epsilon = 0.5).as("z"))
      .as[Long].collect()
    assert(noise.toSeq == again.toSeq, "same key + salt -> same draw")
    val salted = keys.select(
        Privacy.discreteLaplaceNoise(col("k"), 0.5, salt = "other").as("z"))
      .as[Long].collect()
    assert(noise.toSeq != salted.toSeq, "salt changes the draw")
    // distribution sanity on 4000 draws: mean ~0, sd ~ sqrt(2p)/(1-p)
    val mean = noise.sum.toDouble / noise.length
    assert(math.abs(mean) < 0.25, s"mean $mean")
    val p = math.exp(-0.5)
    val sdTrue = math.sqrt(2 * p) / (1 - p)
    val sd = math.sqrt(noise.map(z => z * z.toDouble).sum / noise.length)
    assert(sd > sdTrue * 0.8 && sd < sdTrue * 1.2, s"sd $sd vs $sdTrue")
    assert(noise.exists(_ > 0) && noise.exists(_ < 0))
  }

  test("dpCounts: noisy counts stay within the clamp radius") {
    val rows = (0 until 900).map(i => s"t${i % 3}").toDF("t")
    val out = Privacy.dpCounts(rows, Seq("t"), epsilon = 1.0)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val b = Privacy.dpThresholds(1.0)._1
    assert(out.length == 3)
    out.foreach { case (_, noisy, bound) =>
      assert(bound == b.toLong)
      assert(math.abs(noisy - 300L) <= b, s"noisy $noisy")
    }
  }

  test("dpCounts: multi-column noise keys are injective over tuples") {
    // the groups ("ab","c") / ("a","bc") and ("a",NULL) / (NULL,"a")
    // are distinct key tuples and must draw INDEPENDENT noise — a bare
    // concat (or concat_ws's NULL-skipping) folds each pair to one
    // string and correlates the draws. Same true count (100) per
    // group, so identical draws would be visible as equal n_noisy.
    val shapes = Seq(
      ("ab", "c"), ("a", "bc"),
      ("a", null.asInstanceOf[String]), (null.asInstanceOf[String], "a"))
    val rows = shapes.flatMap(s => Seq.fill(100)(s)).toDF("k1", "k2")
    // grouping keeps NULL keys as their own groups (Spark groupBy
    // semantics), so 4 output rows. Small epsilon → wide noise spread,
    // so independent (deterministic, md5-keyed) draws land apart;
    // colliding keys would still produce EXACTLY equal draws.
    val out = Privacy.dpCounts(rows, Seq("k1", "k2"), epsilon = 0.05)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        r.getLong(2)).toMap
    assert(out.size == 4)
    val draws = out.values.toSeq
    assert(draws.distinct.size > 1,
      s"colliding noise keys: all four groups drew the same noise $draws")
    // the specific historic collisions: each pair must now differ
    assert(out((Some("ab"), Some("c"))) != out((Some("a"), Some("bc"))),
      "separator collision")
    assert(out((Some("a"), None)) != out((None, Some("a"))),
      "NULL-skip collision")
  }

  test("dpSums: clipping bounds one entity's pull on the release") {
    // entity u9 carries 1000 rows of value 7; every other entity one
    // row of value 2. Unclipped, u9 would move the sum by 7000;
    // clipped to [0, 5] its total contribution is 5.
    val rows = (Seq.fill(1000)(("g", 9L, 7L)) ++
      (0L until 20L).map(u => ("g", u + 100L, 2L))).toDF("k", "u", "v")
    val out = Privacy.dpSums(rows, Seq("k"), "u", "v",
      clipLo = 0L, clipHi = 5L, epsilonSum = 1.0, epsilonCount = 0.5)
      .collect().head
    val snapped = out.getAs[Long]("sum_snapped")
    val bound = out.getAs[Long]("noise_bound_sum")
    // true clipped sum = 5 + 20*2 = 45; snap to grid 5 keeps 45
    assert(snapped == 45L, s"snapped clipped sum $snapped != 45")
    assert(math.abs(out.getAs[Long]("sum_noisy") - snapped) <= bound)
    assert(out.getAs[Long]("sensitivity") == 5L)
  }

  test("dpSums: negative sums snap on the floor-division grid") {
    // all entities total -7 (clip floor -10): group sum = -21,
    // snap to grid 10: floor((-42+10)/20)*10 = floor(-1.6)*10 = -20
    val rows = (0L until 3L).map(u => ("g", u, -7L)).toDF("k", "u", "v")
    val out = Privacy.dpSums(rows, Seq("k"), "u", "v",
      clipLo = -10L, clipHi = 10L, epsilonSum = 2.0, epsilonCount = 0.5)
      .collect().head
    assert(out.getAs[Long]("sum_snapped") == -20L,
      s"negative snap ${out.getAs[Long]("sum_snapped")} != -20 " +
        "(floor division, not truncation)")
  }

  test("dpSums: deterministic, mean is post-processing, guards hold") {
    val rows = (0L until 50L).map(u => (s"t${u % 3}", u, u % 4))
      .toDF("k", "u", "v")
    val a = Privacy.dpSums(rows, Seq("k"), "u", "v", 0L, 3L, 1.0, 0.5)
      .orderBy("k").collect().toSeq
    val b = Privacy.dpSums(rows, Seq("k"), "u", "v", 0L, 3L, 1.0, 0.5)
      .orderBy("k").collect().toSeq
    assert(a == b, "release is not retry-stable")
    a.foreach { r =>
      val m = r.getAs[Double]("mean_noisy")
      val want = r.getAs[Long]("sum_noisy").toDouble /
        math.max(r.getAs[Long]("n_noisy"), 1L).toDouble
      assert(m == want, "mean is not pure post-processing of the pair")
    }
    intercept[IllegalArgumentException] {
      Privacy.dpSums(rows, Seq("k"), "u", "v", 5L, 3L, 1.0, 0.5)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpSums(rows, Seq("k"), "u", "v", 0L, 0L, 1.0, 0.5)
    }
    intercept[IllegalArgumentException] {
      val dbl = rows.withColumn("v", col("v").cast("double"))
      Privacy.dpSums(dbl, Seq("k"), "u", "v", 0L, 3L, 1.0, 0.5)
    }
  }

  test("dpSums: all-NULL-value entities still count toward n") {
    val rows = Seq(("g", 1L, Some(3L)), ("g", 2L, None), ("g", 2L, None))
      .toDF("k", "u", "v")
    val out = Privacy.dpSums(rows, Seq("k"), "u", "v", 0L, 5L, 1.0, 0.5)
      .collect().head
    // entity 2 contributes clip(coalesce(NULL, 0)) = 0 to the sum but
    // is present: snapped sum from {3, 0}, n from 2 entities
    assert(out.getAs[Long]("sum_snapped") == 5L) // snap(3) on grid 5
    assert(math.abs(out.getAs[Long]("n_noisy") - 2L) <=
      out.getAs[Long]("noise_bound_n"),
      "entity 2 (all-NULL values) must still count toward n")
  }
}
