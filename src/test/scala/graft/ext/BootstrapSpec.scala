package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BootstrapSpec extends SparkTestBase {
  import spark.implicits._

  test("PoissonThresholds is a valid CDF ladder with e^-1 mass at zero") {
    val th = Bootstrap.PoissonThresholds
    assert(th.length == 13)
    assert(th.zip(th.tail).forall { case (a, b) => a <= b }, "monotone")
    val scale = math.pow(2.0, 48)
    assert(math.abs(th(0) / scale - math.exp(-1.0)) < 1e-9)
    assert(th.last == (1L << 48),
      "last entry must clamp the scale so multiplicity is bounded at 12")
  }

  test("multiplicity draws have Poisson(1) mean and variance") {
    val n = 20000
    val m = spark.range(n)
      .select(Bootstrap.multiplicity(col("id"), lit(0), "boot-v1").as("m"))
      .as[Long].collect()
    val mean = m.sum.toDouble / n
    val varr = m.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean - 1.0) < 0.05, s"mean $mean")
    assert(math.abs(varr - 1.0) < 0.1, s"var $varr")
    assert(m.count(_ == 0L).toDouble / n > 0.3, "e^-1 of rows drop out")
    assert(m.max >= 3L, "multiplicities above 2 must occur")
  }

  test("replicateTotals: deterministic, n_eff near n, exact BIGINT sums") {
    val rows = spark.range(4000).select(col("id"), (col("id") % 7).as("v"))
    val a = Bootstrap.replicateTotals(rows, "id", "v", replicates = 16)
      .orderBy("b").as[(Int, Long, Long, Double)].collect()
    val b = Bootstrap.replicateTotals(rows, "id", "v", replicates = 16)
      .orderBy("b").as[(Int, Long, Long, Double)].collect()
    assert(a.toSeq == b.toSeq, "keyed draws must be retry-stable")
    assert(a.length == 16)
    a.foreach { case (_, nEff, total, mean) =>
      assert(math.abs(nEff - 4000.0) < 400, s"n_eff $nEff")
      assert(mean == total.toDouble / nEff)
    }
    // a different salt moves the draws
    val c = Bootstrap.replicateTotals(rows, "id", "v", 16, salt = "other")
      .orderBy("b").as[(Int, Long, Long, Double)].collect()
    assert(c.toSeq != a.toSeq)
  }

  test("replicateTotalsBy: per-group totals sum to the pooled totals") {
    val rows = spark.range(6000)
      .select(col("id"), concat(lit("g"), col("id") % 2).as("g"),
        (col("id") % 13).as("v"))
    val by = Bootstrap.replicateTotalsBy(rows, "g", "id", "v",
        replicates = 16)
      .select("b", "n_eff", "total")
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.map(_._3).sum)).toMap
    val pooled = Bootstrap.replicateTotals(rows, "id", "v", 16)
      .select("b", "n_eff", "total").as[(Int, Long, Long)].collect()
    // the draw keys on (b, id) only, so grouping never changes it
    pooled.foreach { case (b, n, t) => assert(by(b) == ((n, t)), s"b=$b") }
  }

  test("pairedDiffCI detects a real shift and not a null one") {
    // g1 = g0 + 5 exactly (same id skeleton, shifted values)
    val rows = spark.range(8000)
      .select(col("id"), concat(lit("g"), col("id") % 2).as("g"),
        (col("id") % 9 + (col("id") % 2) * 5).as("v"))
    val reps = Bootstrap.replicateTotalsBy(rows, "g", "id", "v",
      replicates = 64)
    val shifted = Bootstrap.pairedDiffCI(reps, "g0", "g1")
      .as[(Double, Double, Double, Boolean)].head()
    assert(shifted._4, s"a +5 shift must be significant: $shifted")
    assert(shifted._1 < 5.1 && shifted._3 > 4.9,
      s"CI $shifted should bracket ~5")
    // null case: identical distributions -> not significant
    val nullRows = spark.range(8000)
      .select(col("id"), concat(lit("g"), col("id") % 2).as("g"),
        ((col("id") / 2) % 9).as("v"))
    val nullCi = Bootstrap.pairedDiffCI(
        Bootstrap.replicateTotalsBy(nullRows, "g", "id", "v", 64),
        "g0", "g1")
      .as[(Double, Double, Double, Boolean)].head()
    assert(!nullCi._4, s"identical groups must not be significant: $nullCi")
  }

  test("confidenceInterval brackets the true mean and is ordered") {
    // values 0..6 uniform -> true mean 3.0
    val rows = spark.range(20000).select(col("id"), (col("id") % 7).as("v"))
    val ci = Bootstrap.confidenceInterval(
        Bootstrap.replicateTotals(rows, "id", "v", replicates = 64))
      .as[(Double, Double, Double)].head()
    assert(ci._1 <= ci._2 && ci._2 <= ci._3, s"unordered CI $ci")
    assert(ci._1 < 3.0 && 3.0 < ci._3, s"CI $ci must bracket 3.0")
    // bracket should be tight-ish: sd of the mean ~ 2/sqrt(20000) ~ 0.014
    assert(ci._3 - ci._1 < 0.2, s"CI too wide: $ci")
    intercept[IllegalArgumentException](
      Bootstrap.confidenceInterval(rows.toDF("b", "mean"), qLo = 0.6))
  }
}
