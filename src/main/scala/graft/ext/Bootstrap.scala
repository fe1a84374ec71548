package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson bootstrap: error bars for pipeline metrics in ONE pass.
  *
  * The classical bootstrap (resample n rows with replacement, B times)
  * cannot run on a 100 TB table — each replicate is a full shuffle of
  * the corpus. The Poisson bootstrap replaces the multinomial
  * row-multiplicity vector with independent per-(row, replicate)
  * Poisson(1) draws (the n→∞ limit of Binomial(n, 1/n)): every row
  * decides its own multiplicity in every replicate locally, so ALL B
  * replicates ride the ONE corpus scan as a B-way map-side explode
  * whose partial aggregate collapses each task to B rows. This is the
  * standard massive-data CI technique (Chamandy et al. 2012,
  * "Estimating uncertainty for massive data streams").
  *
  * Replay stance: the Poisson(1) draw is an inverse-CDF walk over
  * INTEGER thresholds computed once in driver Scala and inlined as
  * literals into both engines (the [[Privacy.dpThresholds]] trick),
  * keyed by `md5(salt|replicate|rowId)` — deterministic, retry-stable
  * and bit-replayable; per-replicate sums are BIGINTs when the metric
  * column is integral, so the only floating steps are the final
  * per-replicate divisions.
  */
object Bootstrap {

  /** Cumulative Poisson(1) thresholds on the 2^48 scale:
    * entry k = floor(P(X ≤ k) · 2^48), k = 0..12, with the LAST entry
    * clamped to 2^48 so the multiplicity is hard-bounded at 12 (the
    * clipped tail holds ~1e−10 of the mass — the [[Privacy]] clamp
    * stance). A draw is `#{thresholds ≤ u}` — 0 with probability
    * e^−1, etc.
    */
  val PoissonThresholds: Array[Long] = {
    val e1 = math.exp(-1.0)
    val scale = math.pow(2.0, 48)
    val pmf = Iterator.iterate((0, e1)) { case (k, p) =>
      (k + 1, p / (k + 1)) }.take(13).map(_._2).toArray
    val th = pmf.scanLeft(0.0)(_ + _).tail
      .map(c => math.min(scale - 1, math.floor(c * scale)).toLong)
    th(th.length - 1) = 1L << 48
    th
  }

  /** Poisson(1) multiplicity of row `id` in replicate `b` — a pure
    * codegen'd filter over a 13-literal constant array.
    */
  private[ext] def multiplicity(id: Column, b: Column,
                                salt: String): Column = {
    val u = conv(substring(md5(concat(lit(salt), lit("|"),
      b.cast("string"), lit("|"), id.cast("string"))), 1, 12), 16, 10)
      .cast("long")
    IntLadder.countBelow(PoissonThresholds, u).cast("long")
  }

  /** Per-replicate totals of `valueCol` under Poisson(1) resampling:
    * `replicates` rows `(b, n_eff, total, mean)` from ONE scan — the
    * explode emits `replicates` entries per input row (each carrying
    * `(m, m·x)` so no second pass is needed), map-side combine
    * collapses every task to ≤ `replicates` rows before the shuffle
    * (the sketch-family shape). `idCol` must uniquely identify rows
    * (it keys the draw); `valueCol` is cast to BIGINT so sums are
    * order-independent and oracle-exact.
    */
  def replicateTotals(df: DataFrame, idCol: String, valueCol: String,
                      replicates: Int = 64,
                      salt: String = "boot-v1"): DataFrame = {
    require(replicates >= 8 && replicates <= 512,
      s"replicates must be in [8, 512], got $replicates")
    require(salt.nonEmpty, "salt must not be empty")
    val id = col(idCol)
    val v = col(valueCol).cast("long")
    // explode the replicate IDS (a tiny literal array), then draw the
    // multiplicity ONCE per (row, replicate) with the replicate as a
    // column — inlining `replicates` md5 chains into one projection
    // instead overflows Janino's 64 KB method limit at B = 64
    df.filter(id.isNotNull && v.isNotNull)
      .select(id.as("__id"), v.as("__v"),
        explode(typedlit((0 until replicates).toList)).as("b"))
      .select(col("b"), col("__v"),
        multiplicity(col("__id"), col("b"), salt).as("__m"))
      .groupBy(col("b"))
      .agg(sum(col("__m")).as("n_eff"),
        sum(col("__m") * col("__v")).as("total"))
      .withColumn("mean",
        when(col("n_eff") > 0L,
          col("total").cast("double") / col("n_eff").cast("double")))
  }

  /** Per-group replicate totals — the A/B-testing shape: one row
    * `(grp, b, n_eff, total, mean)` per (group, replicate), still ONE
    * scan (the explode carries the group column through). The draw is
    * keyed by (replicate, row id) ALONE — not the group — so the same
    * underlying rows resample identically regardless of grouping,
    * which is what makes [[pairedDiffCI]]'s per-replicate differences
    * a PAIRED bootstrap.
    */
  def replicateTotalsBy(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String, replicates: Int = 64,
                        salt: String = "boot-v1"): DataFrame = {
    require(replicates >= 8 && replicates <= 512,
      s"replicates must be in [8, 512], got $replicates")
    require(salt.nonEmpty, "salt must not be empty")
    val id = col(idCol)
    val v = col(valueCol).cast("long")
    df.filter(id.isNotNull && v.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), id.as("__id"), v.as("__v"),
        explode(typedlit((0 until replicates).toList)).as("b"))
      .select(col("grp"), col("b"), col("__v"),
        multiplicity(col("__id"), col("b"), salt).as("__m"))
      .groupBy(col("grp"), col("b"))
      .agg(sum(col("__m")).as("n_eff"),
        sum(col("__m") * col("__v")).as("total"))
      .withColumn("mean",
        when(col("n_eff") > 0L,
          col("total").cast("double") / col("n_eff").cast("double")))
  }

  /** Paired-bootstrap CI for the difference of means between two
    * groups: replicate `b`'s difference is `mean_B(b) − mean_A(b)`
    * (the SAME Poisson draw resamples both sides — replicate-level
    * pairing, the variance-correct way to bootstrap a contrast), then
    * the percentile bracket of the B differences plus
    * `significant` = the CI excludes zero. All frames are
    * replicate-count-sized.
    */
  def pairedDiffCI(reps: DataFrame, grpA: String, grpB: String,
                   qLo: Double = 0.025, qHi: Double = 0.975): DataFrame = {
    val a = reps.filter(col("grp") === grpA)
      .select(col("b"), col("mean").as("__ma"))
    val bb = reps.filter(col("grp") === grpB)
      .select(col("b"), col("mean").as("__mb"))
    val diffs = a.join(bb, Seq("b"))
      .select(col("b"), (col("__mb") - col("__ma")).as("mean"))
    confidenceInterval(diffs, qLo, qHi)
      .withColumn("significant", col("lo") > 0.0 || col("hi") < 0.0)
  }

  /** Percentile bracket of the replicate means: one row
    * `(lo, mid, hi)` — ranks are `ceil(q·B)` picks under `(mean, b)`
    * order over the B-row replicate frame (B is a literal bound, the
    * window declares it with the partition key of the replicate id's
    * constant hash — B rows total, never data-sized).
    */
  def confidenceInterval(reps: DataFrame, qLo: Double = 0.025,
                         qHi: Double = 0.975): DataFrame = {
    require(qLo > 0.0 && qLo < 0.5 && qHi > 0.5 && qHi < 1.0,
      s"need 0 < qLo < 0.5 < qHi < 1, got ($qLo, $qHi)")
    val b = reps.agg(count(lit(1)).as("__nb"))
    val ranked = reps
      .withColumn("__rk", row_number().over(
        Window.partitionBy(SingleTask.key(col("b")))
          .orderBy(col("mean"), col("b"))))
    ranked.join(broadcast(b))
      .agg(
        max(when(col("__rk") === greatest(lit(1L),
          ceil(lit(qLo) * col("__nb")).cast("long")), col("mean")))
          .as("lo"),
        max(when(col("__rk") === greatest(lit(1L),
          ceil(lit(0.5) * col("__nb")).cast("long")), col("mean")))
          .as("mid"),
        max(when(col("__rk") === greatest(lit(1L),
          ceil(lit(qHi) * col("__nb")).cast("long")), col("mean")))
          .as("hi"))
  }
}
