package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference model with the SAME integer-floor semantics —
    * the spec's oracle for arbitrary small graphs.
    */
  private def refRank(edges: Seq[(Long, Long)], iters: Int,
                      damping: Double = 0.85,
                      teleportE12: Long = 150000000000L): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outdeg = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val base = math.floor(teleportE12.toDouble / n).toLong
    var r = nodes.map(_ -> math.floor(1e12 / n).toLong).toMap
    (1 to iters).foreach { _ =>
      val in = es.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) =>
          math.floor(damping * r(s) / outdeg(s)).toLong
        }.sum
      }
      r = nodes.map(v => v -> (base + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("star: one round concentrates rank on the hub") {
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
    val got = run(edges, 1)
    val base = math.floor(150000000000.0 / 5).toLong
    val contrib = math.floor(0.85 * math.floor(1e12 / 5).toLong / 1).toLong
    assert(got(0L) == base + 4 * contrib)
    Seq(1L, 2L, 3L, 4L).foreach(v => assert(got(v) == base))
  }

  test("matches the reference model on a mixed graph, 5 rounds") {
    // cycle + chord + dangling sink + self-loop + multi-edge (collapses)
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (2L, 3L),
      (4L, 4L), (1L, 3L), (0L, 1L))
    assert(run(edges, 5) == refRank(edges, 5))
  }

  test("rank floor and drift bounds: every node >= base, total <= 1e12") {
    val edges = (0L until 20L).map(i => (i, (i * 7 + 3) % 20))
    val got = run(edges, 5)
    val base = math.floor(150000000000.0 / got.size).toLong
    assert(got.values.forall(_ >= base))
    // floors only lose mass; no redistribution ever adds it
    assert(got.values.sum <= 1000000000000L)
  }

  test("deterministic across partitionings") {
    val edges = (0L until 50L).map(i => (i % 11, (i * i + 1) % 11))
    val a = run(edges, 4)
    val b = LinkGraph.pageRank(
        edges.toDF("src", "dst").repartition(13), iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("empty edge list yields an empty frame, not a crash") {
    val out = LinkGraph.pageRank(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(out.count() == 0)
  }
}
