package graft

import org.apache.spark.sql.functions._

/** The built-in second-moment aggregates (stddev_samp, var_samp, corr,
  * covar_samp/pop, regr_slope, regr_intercept) — exercised here with a
  * relative tolerance because their single-pass co-moment merges are
  * partition-order-dependent at the ulp level; the oracle-gated
  * q64_stat_moments derives the same statistics from order-independent
  * decimal power sums instead.
  */
class StatMomentsSpec extends SparkTestBase {
  import spark.implicits._

  private def relEq(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(math.max(math.abs(a), math.abs(b)), 1.0)

  test("built-in moment aggregates agree with exact decimal-sum derivation") {
    val xs = (1 to 2000).map(i => (i % 7, (i % 50).toDouble + 1, (i % 50) * 1000.0 + i % 13))
    val df = xs.toDF("g", "x", "y").repartition(8)

    val builtins = df.groupBy("g").agg(
      stddev_samp(col("x")).as("sd"),
      var_samp(col("y")).as("vr"),
      corr(col("x"), col("y")).as("co"),
      covar_samp(col("x"), col("y")).as("cv"),
      covar_pop(col("x"), col("y")).as("cvp"),
      regr_slope(col("y"), col("x")).as("sl"),
      regr_intercept(col("y"), col("x")).as("ic"))
      .collect().map(r => r.getInt(0) -> r).toMap

    val exact = xs.groupBy(_._1).map { case (g, rows) =>
      val n = rows.size.toDouble
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val syy = rows.map(r => r._3 * r._3).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val mxx = sxx - sx * sx / n; val myy = syy - sy * sy / n
      val mxy = sxy - sx * sy / n
      g -> (math.sqrt(mxx / (n - 1)), myy / (n - 1),
        mxy / (math.sqrt(mxx) * math.sqrt(myy)), mxy / (n - 1), mxy / n,
        mxy / mxx, (sy - (mxy / mxx) * sx) / n)
    }

    exact.foreach { case (g, (sd, vr, co, cv, cvp, sl, ic)) =>
      val r = builtins(g)
      assert(relEq(r.getAs[Double]("sd"), sd), s"g=$g stddev")
      assert(relEq(r.getAs[Double]("vr"), vr), s"g=$g var")
      assert(relEq(r.getAs[Double]("co"), co), s"g=$g corr")
      assert(relEq(r.getAs[Double]("cv"), cv), s"g=$g covar_samp")
      assert(relEq(r.getAs[Double]("cvp"), cvp), s"g=$g covar_pop")
      assert(relEq(r.getAs[Double]("sl"), sl), s"g=$g slope")
      assert(relEq(r.getAs[Double]("ic"), ic), s"g=$g intercept")
    }
  }
}
