package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  /** Correlated synthetic corpus: dominant direction along (1,1,0,…)
    * with noise — PCA must find it.
    */
  private def corpus(n: Int, d: Int, seed: Long): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val t = rnd.nextGaussian() * 3.0
      Array.tabulate(d) { i =>
        val base = if (i == 0 || i == 1) t else 0.0
        (base + rnd.nextGaussian() * 0.1 + 0.5).toFloat
      }
    }
  }

  test("momentMatrix equals the in-memory floor-then-sum reference") {
    val vs = corpus(40, 5, 1L)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = Pca.momentMatrix(df, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    for (i <- 0 until 5; j <- i until 5) {
      val s = vs.map(v => math.floor(v(i).toDouble * v(j).toDouble * 1e12).toLong).sum
      assert(got((i, j)) == ((40L, s)), s"cell ($i,$j)")
    }
    assert(got.size == 15)
  }

  test("momentMatrix: partition count does not change the sums") {
    val vs = corpus(60, 4, 2L)
    val df1 = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding").repartition(1)
    val df7 = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding").repartition(7)
    val a = Pca.momentMatrix(df1, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
    val b = Pca.momentMatrix(df7, "embedding").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).sortBy(x => (x._1, x._2)).toSeq
    assert(a == b)
  }

  test("fit: orthonormal components, descending eigenvalues, eigen-residual") {
    val d = 8
    val vs = corpus(300, d, 3L)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 4)
    assert(m.k == 4 && m.d == d)
    // eigenvalues strictly ordered and the top one dominant (the planted
    // (1,1,0,…) direction has variance ≈ 2·9 vs noise 0.01)
    assert(m.eigenvalues.toSeq == m.eigenvalues.sortBy(-_).toSeq)
    assert(m.eigenvalues(0) > 10.0 && m.eigenvalues(1) < 1.0)
    // orthonormality: CᵀC = I
    for (a <- 0 until 4; b <- 0 until 4) {
      val dot = (0 until d).map(i => m.components(a)(i) * m.components(b)(i)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-8, s"C${a}-dot-C$b = $dot")
    }
    // top component is the planted direction (up to sign)
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.05)
    assert(math.abs(math.abs(c0(1)) - math.sqrt(0.5)) < 0.05)
    // eigen-residual against the dense covariance rebuilt in memory
    val n = vs.size
    val mean = Array.tabulate(d)(i => vs.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    for (c <- 0 until 4) {
      val comp = m.components(c)
      val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * comp(j)).sum)
      val resid = math.sqrt((0 until d).map(i =>
        math.pow(cv(i) - m.eigenvalues(c) * comp(i), 2)).sum)
      assert(resid < 1e-6, s"component $c residual $resid")
    }
  }

  test("project agrees with the in-memory reference C(x−μ)") {
    val d = 6
    val vs = corpus(80, d, 4L)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val m = Pca.fit(df, "embedding", k = 3)
    val got = Pca.project(df, "vec_id", "embedding", m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val mean = m.mean
    vs.zipWithIndex.foreach { case (v, i) =>
      val expect = m.components.map { comp =>
        (0 until d).map(x => comp(x) * (v(x).toDouble - mean(x))).sum
      }
      val g = got(i.toLong)
      (0 until 3).foreach { c =>
        assert(math.abs(g(c) - expect(c)) < 1e-9, s"row $i comp $c")
      }
    }
  }

  test("fit: ragged dimensions and empty corpus fail loudly") {
    // within one partition: the accumulator trips
    val ragged = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding").repartition(1)
    val e = intercept[org.apache.spark.SparkException] {
      Pca.momentMatrix(ragged, "embedding").collect()
    }
    assert(e.getMessage.contains("ragged")
      || Option(e.getCause).exists(_.getMessage.contains("ragged")))
    // across partitions: fit()'s cell-consistency tripwire catches what
    // the row-wise check cannot (each partition self-consistent). AQE
    // may coalesce the tiny union back into one partition and trip the
    // row-wise check instead — either way the contract is FAIL LOUDLY,
    // never a silently merged mixed-dimension matrix.
    val crossRagged = Seq((1L, Array(1f, 2f)))
      .toDF("vec_id", "embedding").repartition(1)
      .union(Seq((2L, Array(1f, 2f, 3f)))
        .toDF("vec_id", "embedding").repartition(1))
    val e2 = intercept[Exception] {
      Pca.fit(crossRagged, "embedding", 2)
    }
    assert(e2.isInstanceOf[IllegalArgumentException]
      || e2.isInstanceOf[org.apache.spark.SparkException])
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e2).exists(_.contains("ragged")))
    intercept[IllegalArgumentException] {
      Pca.fit(Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"),
        "embedding", 2)
    }
  }
}
