package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LinkGraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference model with the SAME integer-floor semantics —
    * the spec's oracle for arbitrary small graphs.
    */
  private def refRank(edges: Seq[(Long, Long)], iters: Int,
                      dampingNum: Long = 85L, dampingDen: Long = 100L,
                      teleportE12: Long = 150000000000L,
                      redistributeDangling: Boolean = false): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outdeg = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val base = teleportE12 / n
    var r = nodes.map(_ -> 1000000000000L / n).toMap
    (1 to iters).foreach { _ =>
      val dangling =
        if (!redistributeDangling) 0L
        else nodes.filterNot(outdeg.contains).map(r).sum
      val share = (dangling * dampingNum) / (dampingDen * n)
      val in = es.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) =>
          (r(s) * dampingNum) / (outdeg(s) * dampingDen)
        }.sum
      }
      r = nodes.map(v => v -> (base + share + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("star: one round concentrates rank on the hub") {
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
    val got = run(edges, 1)
    val base = 150000000000L / 5
    val contrib = ((1000000000000L / 5) * 85L) / 100L
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

  test("dangling redistribution matches the reference and conserves more mass") {
    // node 3 and 4's sink mass is lost without redistribution
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (2L, 3L), (1L, 4L))
    val got = LinkGraph.pageRank(edges.toDF("src", "dst"), iterations = 4,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(got == refRank(edges, 4, redistributeDangling = true))
    val plain = run(edges, 4)
    assert(got.values.sum > plain.values.sum)
    assert(got.values.sum <= 1000000000000L)
  }

  test("dangling-free graph: redistribution is a no-op") {
    val edges = (0L until 30L).map(i => (i % 7, (i * 3 + 1) % 7))
    val a = run(edges, 5)
    val b = LinkGraph.pageRank(edges.toDF("src", "dst"), iterations = 5,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  /** Driver-side reference for the personalized variant, same integer
    * normalization (wN e6-scaled, dangling mass per the prior).
    */
  private def refPersonalized(edges: Seq[(Long, Long)], w: Map[Long, Long],
                              iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val totalW = nodes.map(v => math.max(w.getOrElse(v, 0L), 0L)).sum
    val wn = nodes.map(v =>
      v -> (math.max(w.getOrElse(v, 0L), 0L) * 1000000L) / totalW).toMap
    var r = nodes.map(v => v -> (1000000000000L * wn(v)) / 1000000L).toMap
    (1 to iters).foreach { _ =>
      val d = nodes.filterNot(outdeg.contains).map(r).sum
      val m = (d * 85L) / 100L
      val in = es.groupBy(_._2).map { case (dst, xs) =>
        dst -> xs.map { case (s, _) => (r(s) * 85L) / (outdeg(s) * 100L) }.sum
      }
      r = nodes.map(v => v -> ((150000000000L * wn(v)) / 1000000L
        + in.getOrElse(v, 0L) + (m * wn(v)) / 1000000L)).toMap
    }
    r
  }

  test("personalized: matches reference; zero-prior node gets no teleport") {
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 1L), (4L, 0L))
    val w = Map(0L -> 600000L, 1L -> 300000L, 2L -> 100000L)
    val got = LinkGraph.personalizedPageRank(
        edges.toDF("src", "dst"), w.toSeq.toDF("id", "weight"),
        iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == refPersonalized(edges, w, 4))
    // node 4 has prior 0 and no in-edges: rank stays exactly 0
    assert(got(4L) == 0L)
    // the boosted node outranks the unweighted conduit
    assert(got(0L) > got(3L))
  }

  test("personalized: uniform prior tracks plain pageRank with dangling") {
    val edges = (0L until 40L).map(i => (i % 9, (i * i + 2) % 9))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val uni = nodes.map(v => (v, 1000L)).toDF("id", "weight")
    val got = LinkGraph.personalizedPageRank(
        edges.toDF("src", "dst"), uni, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val plain = LinkGraph.pageRank(edges.toDF("src", "dst"), iterations = 3,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    // wN floors can differ by one unit of 1e6-scale per node; ranks agree
    // within n * (teleport+init+mass)/1e6 ≈ tiny relative bound
    got.foreach { case (v, r) =>
      assert(math.abs(r - plain(v)) <= plain(v) / 1000 + 9,
        s"node $v: personalized $r vs plain ${plain(v)}")
    }
  }

  test("personalized: empty prior weight rejected") {
    val edges = Seq((0L, 1L))
    intercept[IllegalArgumentException] {
      LinkGraph.personalizedPageRank(edges.toDF("src", "dst"),
        Seq((5L, 3L)).toDF("id", "weight"))
    }
  }

  test("personalized: duplicate prior ids sum, never fan out node rows") {
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 1L), (4L, 0L))
    // prior for node 0 split across three rows (one negative, clamped);
    // must behave exactly like the pre-summed equivalent
    val dup = Seq((0L, 400000L), (0L, 200000L), (0L, -50L),
      (1L, 300000L), (2L, 100000L)).toDF("id", "weight")
    val summed = Seq((0L, 600000L), (1L, 300000L), (2L, 100000L))
      .toDF("id", "weight")
    val a = LinkGraph.personalizedPageRank(
      edges.toDF("src", "dst"), dup, iterations = 4)
    val rowsA = a.as[(Long, Long)].collect()
    val b = LinkGraph.personalizedPageRank(
        edges.toDF("src", "dst"), summed, iterations = 4)
      .as[(Long, Long)].collect()
    assert(rowsA.length == rowsA.map(_._1).distinct.length,
      "one output row per node even with a duplicated prior")
    assert(rowsA.toMap == b.toMap)
  }

  test("personalized: oversized prior weight mass rejected by name") {
    val edges = Seq((0L, 1L))
    val ex = intercept[IllegalArgumentException] {
      LinkGraph.personalizedPageRank(edges.toDF("src", "dst"),
        Seq((0L, 9000000000000L), (1L, 300000000000L)).toDF("id", "weight"))
    }
    assert(ex.getMessage.contains("9.2e12"))
  }

  // ------------------------------------------------------------- HITS

  /** Driver-side HITS reference with the same integer-floor semantics,
    * including the dual-branch normalization.
    */
  private def refHits(edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Long, Long)] = {
    def norm(x: Long, tot: Long): Long =
      if (tot > 0 && tot <= 9200000000000L) x * 1000000L / tot
      else x / math.max(tot / 1000000L, 1L)
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var h = nodes.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val aRaw = nodes.map(v =>
        v -> es.filter(_._2 == v).map(e => h(e._1)).sum).toMap
      val aTot = aRaw.values.sum
      a = aRaw.map { case (v, x) => v -> norm(x, aTot) }
      val hRaw = nodes.map(v =>
        v -> es.filter(_._1 == v).map(e => a(e._2)).sum).toMap
      val hTot = hRaw.values.sum
      h = hRaw.map { case (v, x) => v -> norm(x, hTot) }
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  test("hits: hub/authority split on a bipartite graph") {
    // 0,1 cite {10,11,12}: pure hubs (auth 0), pure authorities (hub 0)
    val edges = Seq((0L, 10L), (0L, 11L), (0L, 12L),
      (1L, 10L), (1L, 11L), (1L, 12L))
    val got = LinkGraph.hits(edges.toDF("src", "dst"), iterations = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    Seq(0L, 1L).foreach { v =>
      assert(got(v)._2 == 0L, s"citer $v must have zero authority")
      assert(got(v)._1 > 0L, s"citer $v must have positive hub score")
    }
    Seq(10L, 11L, 12L).foreach { v =>
      assert(got(v)._1 == 0L, s"cited $v must have zero hub score")
      assert(got(v)._2 > 0L, s"cited $v must have positive authority")
    }
    // symmetric structure ⇒ identical scores within each side
    assert(got(0L) == got(1L) && got(10L) == got(11L))
  }

  test("hits: matches the integer reference model on a mixed graph") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L),
      (3L, 2L), (3L, 1L), (4L, 3L), (2L, 4L))
    val got = LinkGraph.hits(edges.toDF("src", "dst"), iterations = 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == refHits(edges, 4))
  }

  test("hits: scores are e6-normalized distributions (sum ~ 1e6)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L))
    val rows = LinkGraph.hits(edges.toDF("src", "dst"), iterations = 3)
      .as[(Long, Long, Long)].collect()
    val hubSum = rows.map(_._2).sum
    val authSum = rows.map(_._3).sum
    // floor loss only: within one unit per node below 1e6
    assert(hubSum <= 1000000L && hubSum > 1000000L - rows.length)
    assert(authSum <= 1000000L && authSum > 1000000L - rows.length)
  }

  // ------------------------------------------------------- co-citation

  test("cocitation: counts distinct common citers, ordered pairs") {
    // 10 and 11 co-cited by 0,1,2; 10 and 12 only by 0
    val edges = Seq((0L, 10L), (0L, 11L), (0L, 12L),
      (1L, 10L), (1L, 11L), (2L, 11L), (2L, 10L))
    val got = LinkGraph.cocitation(edges.toDF("src", "dst"),
        minCocitations = 1L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((10L, 11L)) == 3L)
    assert(got((10L, 12L)) == 1L)
    assert(got((11L, 12L)) == 1L)
    assert(!got.contains((11L, 10L)), "pairs are (lo, hi) ordered")
  }

  test("cocitation: multi-edges count once; self-loops ignored") {
    val edges = Seq((0L, 10L), (0L, 10L), (0L, 11L), (0L, 0L), (1L, 10L),
      (1L, 11L))
    val got = LinkGraph.cocitation(edges.toDF("src", "dst"),
        minCocitations = 1L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((10L, 11L) -> 2L))
  }

  test("cocitation: link-farm citers past the out-degree cap are cut") {
    val farm = (0L until 20L).map(d => (99L, 100L + d))
    val honest = Seq((0L, 100L), (0L, 101L), (1L, 100L), (1L, 101L))
    val got = LinkGraph.cocitation((farm ++ honest).toDF("src", "dst"),
        maxOutDeg = 12, minCocitations = 1L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // the farm's 190 pairs vanish; the honest co-citation survives
    assert(got == Map((100L, 101L) -> 2L))
  }

  // ------------------------------------------------- label propagation

  private def runLp(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
                    iters: Int): Map[Long, Option[Long]] =
    LinkGraph.labelPropagation(edges.toDF("src", "dst"),
        seeds.toDF("id", "label"), iterations = iters)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("labelPropagation: labels spread hop by hop; unreached stay null") {
    // path 0→1→2→3, plus isolated pair 8→9
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L))
    val seeds = Seq((0L, 7L))
    val r1 = runLp(edges, seeds, 1)
    assert(r1(1L) == Some(7L) && r1(2L) == None && r1(9L) == None)
    val r3 = runLp(edges, seeds, 3)
    assert(r3(1L) == Some(7L) && r3(2L) == Some(7L) && r3(3L) == Some(7L))
    assert(r3(8L) == None && r3(9L) == None, "unseeded island stays null")
  }

  test("labelPropagation: majority wins, ties to min label, seeds clamp") {
    // node 5 hears label 1 from two neighbors, label 2 from one
    val edges = Seq((0L, 5L), (1L, 5L), (2L, 5L),
      // node 6 hears 1 and 2 once each → tie → min label 1
      (0L, 6L), (2L, 6L),
      // seeded node 2 has in-edges from label-1 nodes but must keep 2
      (0L, 2L), (1L, 2L))
    val seeds = Seq((0L, 1L), (1L, 1L), (2L, 2L))
    val got = runLp(edges, seeds, 2)
    assert(got(5L) == Some(1L), "majority label")
    assert(got(6L) == Some(1L), "tie breaks to min label")
    assert(got(2L) == Some(2L), "seeds are clamped")
  }

  test("labelPropagation: duplicate seed rows collapse to min label") {
    val edges = Seq((0L, 1L))
    val got = runLp(edges, Seq((0L, 5L), (0L, 3L)), 1)
    assert(got(0L) == Some(3L) && got(1L) == Some(3L))
  }

  // ------------------------------------------------------ hop distance

  test("hopDistance: multi-source BFS, min over seeds, budget cutoff") {
    // two chains from seeds 0 and 100: 0→1→2→3→4→5, 100→3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (100L, 3L))
    val got = LinkGraph.hopDistance(edges.toDF("src", "dst"),
        Seq(0L, 100L).toDF("id"), maxHops = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(0L) == Some(0L) && got(100L) == Some(0L))
    assert(got(1L) == Some(1L) && got(2L) == Some(2L))
    assert(got(3L) == Some(1L), "min over both seeds: 100→3 beats 0→…→3")
    assert(got(4L) == Some(2L) && got(5L) == Some(3L))
  }

  test("hopDistance: unreached within budget stays null") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L))
    val got = LinkGraph.hopDistance(edges.toDF("src", "dst"),
        Seq(0L).toDF("id"), maxHops = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(2L) == Some(2L))
    assert(got(3L) == None, "3 is 3 hops away, budget is 2")
    assert(got(8L) == None && got(9L) == None)
  }

  // --------------------------------------------------------- triangles

  test("triangles: enumerated once, ordered, direction-insensitive") {
    // triangle {1,2,3} given with mixed directions + a dangling edge
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 3L), (3L, 4L))
    val got = LinkGraph.triangles(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L)))
  }

  test("triangles: two sharing an edge; apex past the degree cap cut") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L))
    val got = LinkGraph.triangles(base.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 3L), (1L, 3L, 4L)))
    // fan node 1 out past the cap: its apex wedges vanish, but the
    // {2,3,x} family would survive (none exists here)
    val fan = (10L until 30L).map(d => (1L, d))
    val capped = LinkGraph.triangles((base ++ fan).toDF("src", "dst"),
        maxDeg = 12)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.isEmpty, "apex 1 over the oriented-degree cap")
  }

  // ------------------------------------------------------- anchor text

  test("anchorTopTerms: counts, rank order, k cutoff, case folding") {
    val anchors = Seq(
      (10L, "Spark Engine"), (10L, "spark docs"), (10L, "fast spark"),
      (10L, "engine"), (11L, "one two")).toDF("dst", "anchor_text")
    val got = LinkGraph.anchorTopTerms(anchors, "dst", "anchor_text", k = 2)
      .as[(Long, String, Long, Int)].collect().toSet
    // dst 10: spark:3, engine:2, docs:1, fast:1 → top-2 spark, engine
    assert(got == Set((10L, "spark", 3L, 1), (10L, "engine", 2L, 2),
      (11L, "one", 1L, 1), (11L, "two", 1L, 2)))
  }

  /** In-memory peel-to-fixpoint reference for kCore. */
  private def refKCore(edges: Set[(Long, Long)], k: Int,
                       rounds: Int = Int.MaxValue): Map[Long, Long] = {
    var e = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    var r = 0
    var changed = true
    while (r < rounds && changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val ne = e.filter(p => keep(p._1) && keep(p._2))
      changed = ne != e
      e = ne
      r += 1
    }
    e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .view.mapValues(_.size.toLong).filter(_._2 >= k).toMap
  }

  test("kCore: planted clique survives, chain-and-tail periphery cascades off") {
    // 6-clique + a pendant path 100-101-102 hanging off node 0
    val clique = for (a <- 0L until 6L; b <- (a + 1) until 6L) yield (a, b)
    val path = Seq((0L, 100L), (100L, 101L), (101L, 102L))
    val edges = (clique ++ path).toDF("src", "dst")
    val got = LinkGraph.kCore(edges, k = 3, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == refKCore((clique ++ path).toSet, 3))
    assert(got.keySet == (0L until 6L).toSet, "only the clique survives k=3")
    assert(got.values.toSet == Set(5L), "clique-internal degrees")
  }

  test("kCore: randomized graph equals reference; enough rounds reach fixpoint") {
    val rnd = new scala.util.Random(31)
    val edges = (0 until 260).map(_ =>
      (rnd.nextInt(48).toLong, rnd.nextInt(48).toLong)).toSet
    val df = edges.toSeq.toDF("src", "dst")
    for (k <- Seq(2, 4, 6)) {
      val got = LinkGraph.kCore(df, k = k, rounds = 12)
        .as[(Long, Long)].collect().toMap
      assert(got == refKCore(edges, k), s"k=$k")
    }
    // fixed-round truncation is the documented semantics: 1 round on a
    // cascading structure differs from fixpoint, and matches the
    // reference truncated to the same round count
    val cascade = (Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)) ++
      (for (a <- 10L until 14L; b <- (a + 1) until 14L) yield (a, b))).toSet
    val one = LinkGraph.kCore(cascade.toSeq.toDF("src", "dst"), k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(one == refKCore(cascade, 2, rounds = 1))
  }
}
