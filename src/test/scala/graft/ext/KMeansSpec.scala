package graft.ext

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain-Scala replica of the whole fit: md5-rank donors, argmax of
    * dot − |c|²/2 with lowest-index ties, decimal(28,8)-exact means —
    * every double op in the same order as the engine, so assignments
    * must agree EXACTLY, not approximately.
    */
  private def referenceFit(rows: Seq[(Long, Array[Float])], k: Int,
                           iters: Int): Map[Long, Int] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val donors = rows.sortBy { case (id, _) => (md5hex(id.toString), id) }
      .take(k).sortBy(_._1).map(_._2.map(_.toDouble))
    var cents: Seq[Array[Double]] = donors
    def assignAll(): Map[Long, Int] = rows.map { case (id, v) =>
      var bestJ = 0
      var best = Double.NegativeInfinity
      for (j <- cents.indices) {
        var dot = 0.0
        var nrm = 0.0
        for (d <- v.indices) {
          dot += v(d).toDouble * cents(j)(d)
        }
        for (d <- cents(j).indices) nrm += cents(j)(d) * cents(j)(d)
        val s = dot - nrm / 2
        if (s > best) { best = s; bestJ = j }
      }
      id -> bestJ
    }.toMap
    for (_ <- 0 until iters) {
      val a = assignAll()
      val byCluster = rows.groupBy { case (id, _) => a(id) }
      cents = cents.indices.map { j =>
        byCluster.get(j) match {
          case None => cents(j)
          case Some(members) =>
            val dim = members.head._2.length
            Array.tabulate(dim) { d =>
              val sum = members.map { case (_, v) =>
                new JBigDecimal(v(d).toDouble).setScale(8, RoundingMode.HALF_UP)
              }.reduce(_.add(_))
              sum.doubleValue() / members.size
            }
        }
      }
    }
    assignAll()
  }

  private def data(n: Int, dim: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong * 7 + 3, Array.fill(dim)(rnd.nextFloat() * 4 - 2)))
  }

  test("fit/assign agree exactly with a plain-Scala Lloyd reference") {
    val rows = data(60, 4, 17L)
    val df = rows.toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 2)
    val got = KMeans.assign(df, "vec_id", "embedding", model)
      .as[(Long, Int)].collect().toMap
    val want = referenceFit(rows, k = 3, iters = 2)
    assert(got == want)
    assert(got.values.toSet.size > 1, "degenerate: everything in one cluster")
  }

  test("well-separated clusters are recovered; empty clusters keep centroids") {
    // two tight groups 100 apart; k=2, enough iters to converge from any
    // donor pair
    val rnd = new scala.util.Random(5)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 100.0f
      (i.toLong, Array.fill(3)(base + rnd.nextFloat()))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 4)
    val got = KMeans.assign(df, "vec_id", "embedding", model)
      .as[(Long, Int)].collect().toMap
    val lowCluster = got(0L)
    assert(rows.forall { case (id, v) =>
      got(id) == (if (v(0) < 50) lowCluster else 1 - lowCluster) },
      "groups not separated")
    // iters = 0 → model is exactly the donor sample; assign still total
    val m0 = KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 0)
    assert(m0.centroids.length == 2)
    assert(KMeans.assign(df, "vec_id", "embedding", m0).count() == 40L)
  }

  test("silhouette: separated clusters score near 1; bounds hold") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 100.0f
      (i.toLong, Array.fill(3)(base + rnd.nextFloat() * 0.1f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 4)
    val sil = KMeans.silhouette(df, "vec_id", "embedding", model)
      .as[(Int, Long, Long)].collect()
    assert(sil.map(_._2).sum == 40L)
    assert(sil.forall { case (_, _, s) => s > 990000L && s <= 1000000L },
      s"tight separated clusters must score ~1e6, got ${sil.toSeq}")
    intercept[IllegalArgumentException](
      KMeans.silhouette(df, "vec_id", "embedding",
        KMeans.Model(Array(Array(0.0, 0.0, 0.0)), 0)))
  }

  test("clusterProfile: sizes sum to corpus, one row per nonempty cluster") {
    val rows = data(50, 3, 9L)
    val df = rows.toDF("vec_id", "embedding")
    val model = KMeans.fit(df, "vec_id", "embedding", k = 4, iters = 2)
    val prof = KMeans.clusterProfile(df, "vec_id", "embedding", model)
      .as[(Int, Long, Seq[Double])].collect()
    assert(prof.map(_._2).sum == 50L)
    assert(prof.forall(_._3.length == 3))
  }
}
