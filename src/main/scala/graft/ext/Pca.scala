package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** PCA over an embedding column — the dimensionality-reduction /
  * whitening step an embedding-heavy curation pipeline runs before
  * clustering, dedup, or ANN indexing (half the cosine work at k=32
  * from d=64, for a few percent of recall).
  *
  * The split follows how PCA actually scales: the DATA-sized work — the
  * d×d second-moment matrix — is one distributed pass with map-side
  * combine (a per-partition `long[d(d+1)/2]` accumulator, then a skinny
  * (i, j) hash aggregate of at most `partitions · d²/2` rows, payload
  * vectors never shuffle); the d×d EIGENSOLVE is driver-side Jacobi —
  * at any corpus size the matrix stays 64×64, so distributing it would
  * be theater. Projection broadcasts the (k×d) component matrix into a
  * codegen'd mat-vec ([[graft.functions.VectorFunctions.matVec]]):
  * C(x−μ) computed as Cx − Cμ with the constant Cμ folded driver-side,
  * so the scan stays one WholeStageCodegen span with no per-row
  * centering array allocation.
  *
  * Determinism stance (the gate contract): moment terms are FLOORED to
  * e12 per (i,j) product BEFORE summation — floor(xi·xj·1e12) with
  * float→double widening exact and the double product correctly rounded
  * — so the sums are order-free BIGINTs an external engine replays
  * bit-for-bit (the CharEntropy/q170 idiom). The eigensolve consumes
  * the same integers, so `fit` is deterministic end-to-end; only the
  * eigensolver itself is engine-specific (gate q179 is rows-only, the
  * numerics are spec-pinned against a dense reference).
  */
object Pca {

  /** Trained model: row-major components (k×d, orthonormal), their
    * eigenvalues (descending), and the training mean.
    */
  final case class Model(components: Array[Array[Double]],
                         eigenvalues: Array[Double],
                         mean: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** Upper-triangle exact-integer second moments: one row per i ≤ j with
    * n (corpus rows) and s2_e12 = Σ_rows floor(x_i·x_j·1e12). Null
    * vectors are skipped; ragged dimensions fail loudly.
    */
  def momentMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<float>")).as[Array[Float]]
      .filter((v: Array[Float]) => v != null)
    val partials = vecs.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val d = first.length
        val acc = new Array[Long](d * (d + 1) / 2)
        var n = 0L
        def add(v: Array[Float]): Unit = {
          require(v.length == d,
            s"ragged embedding: expected dim $d, got ${v.length}")
          // magnitude tripwire: |xi·xj·1e12| must fit a Long, so each
          // coordinate must stay ≤ 3.0e3 (3e3² · 1e12 = 9e18 < 2⁶³).
          // Embeddings are unit-scale; anything past this is corrupt
          // input and must fail loudly, not wrap (the LinkGraph totalW
          // stance). O(d) per row vs the O(d²) accumulation below.
          var m = 0
          while (m < d) {
            require(math.abs(v(m)) <= 3.0e3f,
              s"embedding coordinate ${v(m)} exceeds ±3e3 — moment " +
                "terms would overflow the e12 Long accumulator")
            m += 1
          }
          var i = 0
          var t = 0
          while (i < d) {
            val xi = v(i).toDouble
            var j = i
            while (j < d) {
              // addExact: a partition accumulating past ±9.2e18 (≈9.2M
              // unit-scale rows per partition per cell) throws instead
              // of silently wrapping into a wrong covariance
              acc(t) = Math.addExact(acc(t),
                math.floor(xi * v(j).toDouble * 1e12).toLong)
              j += 1; t += 1
            }
            i += 1
          }
          n += 1
        }
        add(first)
        it.foreach(add)
        // flatten the partition accumulator to skinny triples — at most
        // d(d+1)/2 rows per PARTITION, not per input row
        val out = Iterator.tabulate(d) { i => i }.flatMap { i =>
          Iterator.range(i, d).map { j =>
            val t = i * d - i * (i - 1) / 2 + (j - i)
            (i, j, n, acc(t))
          }
        }
        out
      }
    }.toDF("i", "j", "pn", "ps")
    // cross-partition merge in decimal(38,0) — exact at any corpus size
    // — with a loud Long-range check before narrowing back to the
    // BIGINT the gate schema declares: the non-ANSI long sum would wrap
    // silently right where the per-partition addExact guard ends
    partials.groupBy("i", "j")
      .agg(sum(col("pn")).as("n"),
        sum(col("ps").cast("decimal(38,0)")).as("__sdec"))
      .select(col("i"), col("j"), col("n"),
        when(abs(col("__sdec")) <= lit(Long.MaxValue),
          col("__sdec").cast("long"))
          .otherwise(raise_error(concat(
            lit("PCA moment sum overflows BIGINT at cell ("),
            col("i"), lit(","), col("j"),
            lit("): "), col("__sdec").cast("string"))))
          .as("s2_e12"))
  }

  /** Fit a k-component model from the exact moment matrix plus the
    * decimal-exact mean (one extra skinny aggregate). Driver-side cost
    * is O(d³) on a d×d matrix — independent of corpus size.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val moments = momentMatrix(df, vecCol).collect()
    require(moments.nonEmpty, "cannot fit PCA on an empty corpus")
    val d = moments.map(_.getInt(1)).max + 1
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    // ragged-dimension tripwire for RAGGEDNESS ACROSS PARTITIONS (within
    // a partition the accumulator already failed loudly): partitions
    // with different dims contribute to different cell sets, so merged
    // cell counts and per-cell n cannot both line up
    val ns = moments.map(_.getLong(2)).distinct
    require(ns.length == 1 && moments.length == d * (d + 1) / 2,
      s"ragged embedding dimensions across partitions " +
        s"(cells=${moments.length}, expected ${d * (d + 1) / 2}, " +
        s"distinct n=${ns.toSeq.sorted.mkString(",")})")
    val n = moments.head.getLong(2)
    val m2 = Array.ofDim[Double](d, d)
    moments.foreach { r =>
      val v = r.getLong(3) / 1e12
      m2(r.getInt(0))(r.getInt(1)) = v
      m2(r.getInt(1))(r.getInt(0)) = v
    }
    val spark = df.sparkSession
    import spark.implicits._
    // the SAME array<float> widening momentMatrix applies, so mean and
    // second moments see identical coordinate values — mixing a
    // float-truncated E[xx] with a double-exact μ can yield a slightly
    // non-PSD covariance for array<double> input
    val mean = df
      .select(posexplode(col(vecCol).cast("array<float>")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg((sum(col("x").cast("double").cast("decimal(28,8)")).cast("double") /
        count(lit(1))).as("m"))
      .orderBy("pos").select("m").as[Double].collect()
    require(mean.length == d, s"mean dim ${mean.length} != moment dim $d")
    // covariance: E[xixj] − μiμj (population form; the eigenvectors are
    // identical under the n/(n−1) rescale, so the simpler form wins)
    val cov = Array.tabulate(d, d) { (i, j) =>
      m2(i)(j) / n - mean(i) * mean(j)
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => -values(i)).take(k)
    Model(
      components = order.map(c => Array.tabulate(d)(r => vectors(r)(c))).toArray,
      eigenvalues = order.map(values).toArray,
      mean = mean)
  }

  /** Project onto the model: (idCol, projection array<double>). */
  def project(df: DataFrame, idCol: String, vecCol: String,
              model: Model): DataFrame = {
    val comp: Seq[Seq[Double]] = model.components.map(_.toSeq).toSeq
    // Cμ folded on the driver: C(x−μ) = Cx − Cμ
    val cMu = model.components.map { row =>
      var s = 0.0
      var i = 0
      while (i < row.length) { s += row(i) * model.mean(i); i += 1 }
      s
    }
    df.select(col(idCol),
      zip_with(
        VectorFunctions.matVec(col(vecCol), comp),
        lit(cMu),
        (cx, cm) => cx - cm).as("projection"))
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Deterministic sweep
    * order; converges quadratically — a 64×64 covariance needs a
    * handful of sweeps.
    */
  private[ext] def jacobiEigen(mIn: Array[Array[Double]],
                               maxSweeps: Int = 64,
                               tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = mIn.length
    val a = Array.tabulate(d, d)((i, j) => mIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    val scale = math.max(frobenius(a), java.lang.Double.MIN_NORMAL)
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
