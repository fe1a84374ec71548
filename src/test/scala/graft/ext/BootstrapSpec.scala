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
