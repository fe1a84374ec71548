package graft.ext

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  /** raise_error surfaces as SparkRuntimeException from a single task,
    * wrapped in SparkException when the failure crosses a stage — match
    * the message through the cause chain instead of pinning the class.
    */
  private def failureMessage(body: => Unit): String = {
    val t = intercept[Exception](body)
    Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }

  private val Scale = 1000000000000L
  private def term(rank: Int, kRrf: Int = 60): Long = Scale / (kRrf + rank)

  test("rrf matches a hand-computed fusion of two runs") {
    // q1: doc 10 is rank 1 in both runs; doc 11 rank 2 in A only;
    //     doc 12 rank 2 in B / rank 3 in A.
    val runs = Seq(
      (1L, 10L, 1, "a"), (1L, 11L, 2, "a"), (1L, 12L, 3, "a"),
      (1L, 10L, 1, "b"), (1L, 12L, 2, "b")
    ).toDF("q", "d", "r", "run")
    val out = Retrieval.rrf(runs, "q", "d", "r", "run", k = 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    val expected = Seq(
      (1L, 10L, term(1) + term(1), 1),
      (1L, 12L, term(3) + term(2), 2),
      (1L, 11L, term(2), 3))
    assert(out.toSeq == expected)
  }

  test("rrf breaks score ties by doc id ascending and truncates at k") {
    // docs 20 and 21 get identical single-run evidence at rank 1
    val runs = Seq(
      (7L, 21L, 1, "a"), (7L, 20L, 1, "b"), (7L, 22L, 2, "a"),
      (7L, 23L, 2, "b")
    ).toDF("q", "d", "r", "run")
    val out = Retrieval.rrf(runs, "q", "d", "r", "run", k = 3)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(20L, 21L, 22L)) // tie → id asc; k cuts 23
    assert(out(0)._3 == out(1)._3)
  }

  test("rrf raises on a (query, doc) retrieved twice under one run tag") {
    val runs = Seq(
      (1L, 10L, 1, "a"), (1L, 10L, 5, "a")
    ).toDF("q", "d", "r", "run")
    val msg = failureMessage(
      Retrieval.rrf(runs, "q", "d", "r", "run", k = 3).collect())
    assert(msg.contains("run tag"))
  }

  test("rrf raises on NULL and non-positive ranks instead of dropping them") {
    val nullRank = Seq((Some(1L), Some(10L), None: Option[Int], "a"))
      .toDF("q", "d", "r", "run")
    assert(failureMessage(
      Retrieval.rrf(nullRank, "q", "d", "r", "run", k = 3).collect())
      .contains("positive 1-based"))
    val zeroRank = Seq((1L, 10L, 0, "a")).toDF("q", "d", "r", "run")
    assert(failureMessage(
      Retrieval.rrf(zeroRank, "q", "d", "r", "run", k = 3).collect())
      .contains("positive 1-based"))
  }

  test("discountsE9 starts at 1e9 and strictly decreases") {
    val d = Retrieval.discountsE9(100)
    assert(d(0) == 1000000000L)
    assert(d.sliding(2).forall { case Array(a, b) => a > b })
    val p = Retrieval.idcgPrefixE9(100)
    assert(p(0) == d(0) && p(99) == d.sum)
  }

  test("rankEval matches closed-form metrics (hits, dcg, ndcg, k cut)") {
    val k = 3
    val disc = Retrieval.discountsE9(k)
    // q1: retrieved (10,11,12) at ranks 1..3 plus rank-4 row that k cuts;
    //     relevant = {10, 12, 99} → hits 2, dcg = disc(1)+disc(3),
    //     idcg = disc(1)+disc(2)+disc(3) (3 relevant, k=3)
    val retrieved = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 99L, 4)
    ).toDF("q", "d", "r")
    val judgments = Seq((1L, 10L), (1L, 12L), (1L, 99L)).toDF("q", "d")
    val row = Retrieval.rankEval(retrieved, judgments, "q", "d", "r", k)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    val dcg = disc(0) + disc(2)
    val idcg = disc.sum
    assert(row == ((1L, 3L, 3L, 2L, dcg, Some(idcg),
      Some(2L * 1000000L / 3L), Some(dcg * 1000000L / idcg))))
  }

  test("rankEval: empty judgment set → recall/ndcg NULL, not zero") {
    val retrieved = Seq((5L, 10L, 1)).toDF("q", "d", "r")
    val judgments = Seq((6L, 10L)).toDF("q", "d") // none for q5
    val rows = Retrieval.rankEval(retrieved, judgments, "q", "d", "r", 3)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    val q5 = rows.find(_._1 == 5L).get
    assert(q5._2 == 1L && q5._3 == 0L && q5._4 == 0L)
    assert(q5._6.isEmpty && q5._7.isEmpty && q5._8.isEmpty)
  }

  test("rankEval: judgment-only query surfaces as recall 0, not a vanished row") {
    val retrieved = Seq((1L, 10L, 1)).toDF("q", "d", "r")
    val judgments = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("q", "d")
    val rows = Retrieval.rankEval(retrieved, judgments, "q", "d", "r", 3)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    val q2 = rows(1)
    // nothing retrieved: 0 hits over 2 relevant → recall 0, ndcg 0
    assert(q2._2 == 0L && q2._3 == 2L && q2._4 == 0L && q2._5 == 0L)
    assert(q2._6.contains(Retrieval.idcgPrefixE9(3)(1)))
    assert(q2._7.contains(0L) && q2._8.contains(0L))
  }

  test("rankEval raises on a doc retrieved at two ranks for one query") {
    val retrieved = Seq((1L, 10L, 1), (1L, 10L, 2)).toDF("q", "d", "r")
    val judgments = Seq((1L, 10L)).toDF("q", "d")
    assert(failureMessage(
      Retrieval.rankEval(retrieved, judgments, "q", "d", "r", 3).collect())
      .contains("duplicate (query, doc)"))
  }

  test("rankEvalGraded matches closed-form graded dcg/idcg/ndcg") {
    val k = 3
    val d = Retrieval.discountsE6(k)
    // retrieved 10,11,12 at ranks 1..3; grades: 10→2, 12→1, 99→3
    // gains: 10→3, 12→1, 99→7 (99 unretrieved, 11 unjudged)
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("q", "d", "r")
    val judgments = Seq((1L, 10L, 2), (1L, 12L, 1), (1L, 99L, 3))
      .toDF("q", "d", "rel")
    val row = Retrieval.rankEvalGraded(retrieved, judgments,
        "q", "d", "r", "rel", k)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().head
    val dcg = 3L * d(0) + 1L * d(2)
    val idcg = 7L * d(0) + 3L * d(1) + 1L * d(2) // ideal: 99, 10, 12
    assert(row == ((1L, 3L, 3L, dcg, Some(idcg),
      Some(dcg * 1000000L / idcg))))
  }

  test("rankEvalGraded: rel=0 judgments neither gain nor occupy ideal ranks") {
    val k = 2
    val d = Retrieval.discountsE6(k)
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "d", "r")
    // the rel-0 row must NOT push doc 11 out of ideal rank 1
    val judgments = Seq((1L, 10L, 0), (1L, 11L, 1)).toDF("q", "d", "rel")
    val row = Retrieval.rankEvalGraded(retrieved, judgments,
        "q", "d", "r", "rel", k)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().head
    assert(row._3 == 1L)                 // n_relevant counts rel>=1 only
    assert(row._4 == 1L * d(1))          // doc 11 hit at rank 2
    assert(row._5.contains(1L * d(0)))   // ideal: the one graded doc at rank 1
  }

  test("rankEvalGraded guards: rel > maxRel, duplicate judgment, duplicate retrieved") {
    val retrieved = Seq((1L, 10L, 1)).toDF("q", "d", "r")
    assert(failureMessage(
      Retrieval.rankEvalGraded(retrieved,
        Seq((1L, 10L, 11)).toDF("q", "d", "rel"),
        "q", "d", "r", "rel", 3).collect())
      .contains("exceeds maxRel"))
    assert(failureMessage(
      Retrieval.rankEvalGraded(retrieved,
        Seq((1L, 10L, 1), (1L, 10L, 2)).toDF("q", "d", "rel"),
        "q", "d", "r", "rel", 3).collect())
      .contains("duplicate judgment"))
    assert(failureMessage(
      Retrieval.rankEvalGraded(
        Seq((1L, 10L, 1), (1L, 10L, 2)).toDF("q", "d", "r"),
        Seq((1L, 10L, 1)).toDF("q", "d", "rel"),
        "q", "d", "r", "rel", 3).collect())
      .contains("duplicate (query, doc)"))
  }

  test("rankEvalGraded: unjudged query → NULL ndcg; judgment-only query → 0") {
    val retrieved = Seq((1L, 10L, 1)).toDF("q", "d", "r")
    val judgments = Seq((2L, 20L, 1), (2L, 21L, 2)).toDF("q", "d", "rel")
    val rows = Retrieval.rankEvalGraded(retrieved, judgments,
        "q", "d", "r", "rel", 3)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L))
    assert(rows(0)._5.isEmpty && rows(0)._6.isEmpty) // no judgments for q1
    assert(rows(1)._2 == 0L && rows(1)._4 == 0L &&
      rows(1)._6.contains(0L)) // judged, nothing retrieved → ndcg 0
  }

  test("rankEvalRanks matches closed-form MRR and truncated MAP") {
    // hits at ranks 2 and 4 of 4 retrieved; 3 relevant total
    val retrieved = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
      .toDF("q", "d", "r")
    val judgments = Seq((1L, 11L), (1L, 13L), (1L, 99L)).toDF("q", "d")
    val row = Retrieval.rankEvalRanks(retrieved, judgments, "q", "d", "r", 10)
      .as[(Long, Option[Int], Long, Option[Long], Option[Long])]
      .collect().head
    // P@2 = 1/2 → 500000000; P@4 = 2/4 → 500000000; AP = 1e9/(3·1000)
    assert(row == ((1L, Some(2), 3L, Some(1000000L / 2),
      Some(1000000000L / 3000L))))
  }

  test("rankEvalRanks edges: no hits → 0s; unjudged → NULLs; judgment-only row") {
    val retrieved = Seq((1L, 10L, 1), (3L, 30L, 1)).toDF("q", "d", "r")
    val judgments = Seq((1L, 99L), (2L, 20L)).toDF("q", "d")
    val rows = Retrieval.rankEvalRanks(retrieved, judgments, "q", "d", "r", 10)
      .as[(Long, Option[Int], Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0) == ((1L, None, 1L, Some(0L), Some(0L)))) // judged, missed
    assert(rows(1) == ((2L, None, 1L, Some(0L), Some(0L)))) // judgment-only
    assert(rows(2) == ((3L, None, 0L, None, None)))         // unjudged
  }

  test("rankEvalRanks raises on duplicate retrieved docs") {
    assert(failureMessage(
      Retrieval.rankEvalRanks(
        Seq((1L, 10L, 1), (1L, 10L, 2)).toDF("q", "d", "r"),
        Seq((1L, 10L)).toDF("q", "d"), "q", "d", "r", 10).collect())
      .contains("duplicate (query, doc)"))
  }

  // A ≡ B in vector space (sim 1), C orthogonal to both; rels 0.9/0.8/0.5.
  // Pure relevance order would be A, B, C — MMR must demote the near-dup B.
  private def mmrPool = Seq(
    (1L, 10L, 0.9, Array(1.0f, 0.0f)),   // A
    (1L, 11L, 0.8, Array(1.0f, 0.0f)),   // B — duplicate direction of A
    (1L, 12L, 0.5, Array(0.0f, 1.0f))    // C — orthogonal
  ).toDF("q", "d", "rel", "v")

  test("mmrRerank demotes near-duplicate candidates (closed form)") {
    val out = Retrieval.mmrRerank(mmrPool, "q", "d", "rel", "v", k = 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // round 1: A (top rel). round 2: B scores .75·.8 − .25·1 = .35,
    // C scores .75·.5 − 0 = .375 → C. round 3: B (last remaining).
    assert(out.map(_._2).toSeq == Seq(10L, 12L, 11L))
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
  }

  test("mmrRerank with lambda=1 is pure relevance ranking; k caps output") {
    val out = Retrieval.mmrRerank(mmrPool, "q", "d", "rel", "v", k = 2,
        lambda = 1.0)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(10L, 11L)) // rel desc, no diversity
  }

  test("mmrRerank: k beyond the pool returns the whole pool, ranks contiguous") {
    val two = mmrPool.filter($"d" =!= 11L)
    val out = Retrieval.mmrRerank(two, "q", "d", "rel", "v", k = 5)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._4).toSeq == Seq(1, 2) && out.length == 2)
  }

  test("mmrRerank treats queries independently") {
    val twoQ = mmrPool.union(
      Seq((2L, 20L, 0.4, Array(0.5f, 0.5f)),
        (2L, 21L, 0.9, Array(0.1f, 0.9f))).toDF("q", "d", "rel", "v"))
    val out = Retrieval.mmrRerank(twoQ, "q", "d", "rel", "v", k = 1)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 10L), (2L, 21L)))
  }

  test("mmrRerank guards: duplicate candidate and pool bound raise") {
    val dup = Seq((1L, 10L, 0.9, Array(1.0f)), (1L, 10L, 0.8, Array(1.0f)))
      .toDF("q", "d", "rel", "v")
    assert(failureMessage(
      Retrieval.mmrRerank(dup, "q", "d", "rel", "v", k = 2).collect())
      .contains("duplicate candidate"))
    assert(failureMessage(
      Retrieval.mmrRerank(mmrPool, "q", "d", "rel", "v", k = 2,
        maxPool = 2).collect())
      .contains("exceeds maxPool"))
  }

  // d1 ("a b a", w=2.0) and d2 ("b c", w=1.0) feed one query's expansion:
  // a → floor(2/3·2·1e9) = 1333333333 (1 doc)
  // b → floor(1/3·2·1e9) + floor(1/2·1·1e9) = 1166666666 (2 docs)
  // c → floor(1/2·1·1e9) = 500000000 (1 doc)
  private def rm3Fp = Seq(("q1", 1L, 2.0), ("q1", 2L, 1.0))
    .toDF("query", "doc_id", "w")
  private def rm3Docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "zzz unused"))
    .toDF("doc_id", "text")

  test("rm3Expansion matches closed-form floored contributions") {
    val out = Retrieval.rm3Expansion(rm3Fp, rm3Docs, "query", "doc_id",
        "w", "text", m = 3, minDocs = 1)
      .as[(String, String, Long, Long, Int)].collect().sortBy(_._5)
    assert(out.toSeq == Seq(
      ("q1", "a", 1333333333L, 1L, 1),
      ("q1", "b", 1166666666L, 2L, 2),
      ("q1", "c", 500000000L, 1L, 3)))
  }

  test("rm3Expansion: minDocs cuts single-doc terms; m truncates") {
    val only = Retrieval.rm3Expansion(rm3Fp, rm3Docs, "query", "doc_id",
        "w", "text", m = 5, minDocs = 2)
      .as[(String, String, Long, Long, Int)].collect()
    assert(only.map(_._2).toSeq == Seq("b") && only.head._5 == 1)
    val cut = Retrieval.rm3Expansion(rm3Fp, rm3Docs, "query", "doc_id",
        "w", "text", m = 2, minDocs = 1)
      .as[(String, String, Long, Long, Int)].collect()
    assert(cut.map(_._2).sorted.toSeq == Seq("a", "b")) // c cut at m=2
  }

  test("rm3Expansion: docs outside the feedback set contribute nothing") {
    val out = Retrieval.rm3Expansion(rm3Fp, rm3Docs, "query", "doc_id",
        "w", "text", m = 10, minDocs = 1)
      .as[(String, String, Long, Long, Int)].collect()
    assert(!out.exists(_._2 == "zzz"))
  }

  test("rankEval ignores duplicate judgments (defensive distinct)") {
    val retrieved = Seq((1L, 10L, 1)).toDF("q", "d", "r")
    val judgments = Seq((1L, 10L), (1L, 10L)).toDF("q", "d")
    val row = Retrieval.rankEval(retrieved, judgments, "q", "d", "r", 3)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().head
    assert(row._3 == 1L && row._4 == 1L && row._7.contains(1000000L))
  }

  private def draft(runA: Seq[(String, Long, Long)],
                    runB: Seq[(String, Long, Long)],
                    rounds: Int): Seq[(String, Long, Int, String)] =
    Retrieval.teamDraftInterleave(runA.toDF("q", "d", "r"),
        runB.toDF("q", "d", "r"), "q", "d", "r", rounds)
      .orderBy("query", "pos")
      .as[(String, Long, Int, String)].collect().toSeq

  test("teamDraftInterleave: draft invariants on a hand-built pair of runs") {
    val runA = Seq(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L))
    val runB = Seq(("q1", 3L, 1L), ("q1", 4L, 2L), ("q1", 5L, 3L))
    val out = draft(runA, runB, 6)
    // 5 distinct docs across both runs -> 5 positions filled, then stop
    assert(out.map(_._2).distinct.size == out.size)
    assert(out.size == 5)
    assert(out.map(_._3) == (1 to 5))
    // team balance: pick counts never differ by more than one at any prefix
    val teams = out.map(_._4)
    teams.indices.foreach { i =>
      val (na, nb) = (teams.take(i + 1).count(_ == "A"),
        teams.take(i + 1).count(_ == "B"))
      assert(math.abs(na - nb) <= 1, s"unbalanced after ${i + 1}: $na/$nb")
    }
    // each team's picks appear in ITS run's rank order
    def picksOf(t: String) = out.filter(_._4 == t).map(_._2)
    val rankA = runA.map(x => x._2 -> x._3).toMap
    val rankB = runB.map(x => x._2 -> x._3).toMap
    val pa = picksOf("A").flatMap(rankA.get)
    assert(pa == pa.sorted, s"A picks out of rank order: $pa")
    val pb = picksOf("B").flatMap(rankB.get)
    assert(pb == pb.sorted, s"B picks out of rank order: $pb")
  }

  test("teamDraftInterleave: exhausted team cedes; determinism; dup guard") {
    // A has a single doc: after A's pick, B must supply the rest
    val runA = Seq(("q1", 1L, 1L))
    val runB = Seq(("q1", 10L, 1L), ("q1", 11L, 2L), ("q1", 12L, 3L))
    val out = draft(runA, runB, 6)
    assert(out.size == 4)
    assert(out.count(_._4 == "A") == 1 && out.count(_._4 == "B") == 3)
    // rerunning gives the identical draft (keyed coin, no RNG)
    assert(draft(runA, runB, 6) == out)
    // duplicate doc within one run raises in-plan
    val ex = intercept[Exception] {
      draft(Seq(("q1", 1L, 1L), ("q1", 1L, 2L)), runB, 2)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage)
        .exists(_.contains("duplicate doc in run A"))))
  }

  test("annRecall: closed-form recall/order-fidelity vs an exact list") {
    import spark.implicits._
    // exact top-3 for q1: docs 10, 20, 30; the index finds 10 and 30
    // but misses 20 and pads a spurious 99 at rank 2 -> recall 2/3 AND
    // ndcg < 1 (a true neighbor displaced below a spurious one). For
    // q2 the index returns the exact SET in a different order: binary
    // relevance is order-blind among true neighbors, so recall 1 and
    // ndcg exactly 1.
    val exact = Seq(("q1", 10L, 1), ("q1", 20L, 2), ("q1", 30L, 3),
      ("q2", 1L, 1), ("q2", 2L, 2), ("q2", 3L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(("q1", 10L, 1), ("q1", 99L, 2), ("q1", 30L, 3),
      ("q2", 3L, 1), ("q2", 2L, 2), ("q2", 1L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.annRecall(approx, exact, "query_id",
        "neighbor_id", "rank", k = 3)
      .orderBy("query")
      .select("query", "hits", "n_relevant", "recall_e6", "ndcg_e6")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq(("q1", 2L, 3L), ("q2", 3L, 3L)))
    assert(out(0)._4 == 666666L, "recall@3 = 2/3 at 1e6 scale, floored")
    assert(out(0)._5 < 1000000L,
      "true neighbor below a spurious one: nDCG < 1")
    assert(out(1)._4 == 1000000L, "full recall")
    assert(out(1)._5 == 1000000L,
      "binary relevance is order-blind among true neighbors: nDCG = 1")
  }
}
