package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup (1 word)
    (4L, "completely different content about spark engines"),
    (5L, "THE  QUICK   brown fox jumps over the lazy dog") // ws/case variant
  ).toDF("doc_id", "text")

  test("exactGroups: identical text → one digest group, min id kept") {
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    val dupGroup = g.find(_.getLong(1) == 2).get
    assert(dupGroup.getLong(2) == 1L) // keep_id = min(1,2)
    assert(g.length == 4)             // 1&2 merge; 3,4,5 distinct raw
  }

  test("exactGroups canonicalized: case/whitespace variants merge") {
    val g = Dedup.exactGroups(docs, "doc_id", "text", canonical = true).collect()
    assert(g.length == 3) // {1,2,5} merge, 3, 4
    assert(g.map(_.getLong(1)).max == 3)
  }

  test("exact: survivors are min-id representatives") {
    val kept = Dedup.exact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L, 5L)))
  }

  test("shingles: n-gram windows, distinct, short-text degenerates to one") {
    val sh = Seq(("a b c d", 1), ("a b", 2)).toDF("text", "id")
      .select(Dedup.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("a b")) // fewer tokens than n → whole text
  }

  test("jaccard: exact set similarity") {
    val j = docs.filter($"doc_id".isin(1, 3))
      .agg(collect_list("text")).as[Seq[String]].collect()(0)
    val df = Seq((j(0), j(1))).toDF("a", "b")
      .select(Dedup.jaccard(Dedup.shingles(col("a")), Dedup.shingles(col("b"))))
      .as[Double].collect()(0)
    // 9 tokens → 7 shingles each; last 2 differ (dog vs cat in final 2 windows)
    assert(df > 0.5 && df < 1.0)
  }

  test("minhash estimate correlates with true jaccard") {
    val withSh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
      .withColumn("sig", Dedup.minhashSignature($"sh", numHashes = 256))
    val rows = withSh.collect().map(r => r.getLong(0) ->
      (r.getSeq[String](1).toSet, r.getSeq[Long](2))).toMap
    def est(a: Long, b: Long): Double =
      rows(a)._2.zip(rows(b)._2).count { case (x, y) => x == y } / 256.0
    def truth(a: Long, b: Long): Double = {
      val (sa, sb) = (rows(a)._1, rows(b)._1)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    assert(est(1L, 2L) == 1.0)                       // identical
    assert(math.abs(est(1L, 3L) - truth(1L, 3L)) < 0.15)
    assert(est(1L, 4L) < 0.15)                       // unrelated
  }

  test("minhashDuplicates recovers near-dup pairs via LSH banding") {
    val pairs = Dedup.minhashDuplicates(docs, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // exact dup always found
    assert(pairs.contains((1L, 3L))) // near dup, true jaccard 6/8 = 0.75
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhashDedup: drops the larger id of each near-dup pair, keeps chain head") {
    val kept = Dedup.minhashDedup(docs, "doc_id", "text", bands = 32, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    // shingles canonicalize case/whitespace, so 5 ≡ 1; near-dups 2, 3, 5
    // all pair with head 1 and are dropped; unrelated 4 survives
    assert(kept.sameElements(Array(1L, 4L)))
  }

  test("simhash: identical text → distance 0; near text → small distance") {
    val sk = docs.select($"doc_id", Dedup.simhash($"text").as("sk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sk(1L) == sk(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sk(a) ^ sk(b))
    assert(ham(1L, 3L) < ham(1L, 4L))
  }

  test("simhashDuplicates: finds identical pair, excludes unrelated") {
    val pairs = Dedup.simhashDuplicates(docs, "doc_id", "text", maxDistance = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngramJaccardPairs: exact pairs above threshold via prefix filtering") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("ngramJaccardPairs: asymmetric-size pair with reversed ids survives") {
    // larger doc has the SMALLER id: orientation handling must not rely
    // on the probe side's id ordering
    val docs2 = Seq(
      (9L, "a b c d e f g h"),
      (3L, "a b c d e f g h i j k l m")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs2, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 9L)))
  }

  test("ngramJaccardPairs: prefix filtering loses NO pair vs brute force") {
    // randomized corpus with planted near-dups across varied lengths;
    // fixed seed so the property is deterministic
    val rnd = new scala.util.Random(42)
    val vocab = ('a' to 'z').map(_.toString)
    def doc(len: Int) = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = (0 until 40).map(i => (i.toLong, doc(5 + rnd.nextInt(30))))
    val mutated = bases.collect { case (i, t) if i % 3 == 0 =>
      // light edit: drop the last word or append one
      (i + 1000L, if (rnd.nextBoolean()) t.split(" ").dropRight(1).mkString(" ")
                  else t + " " + vocab(rnd.nextInt(vocab.size)))
    }
    val corpus = (bases ++ mutated).toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val fast = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", threshold = t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sh = corpus.select(col("doc_id"),
        array_distinct(Dedup.shingles(col("text"))).as("sh"))
      val brute = sh.as("a").join(sh.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
        .filter(col("j") >= t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(fast == brute, s"threshold $t: fast ${fast.size} vs brute ${brute.size}")
    }
  }

  test("hammingPairs: banded pairing equals brute force on random hashes") {
    val rnd = new scala.util.Random(11)
    // clusters of near-identical hashes + uniform noise, full 64-bit range
    val base = (0 until 12).map(_ => rnd.nextLong())
    val hs = (0 until 120).map { i =>
      val h = if (i < 60) {
        var v = base(i % 12)
        (0 until rnd.nextInt(5)).foreach(_ => v ^= 1L << rnd.nextInt(64))
        v
      } else rnd.nextLong()
      (i.toLong, h)
    }
    val df = hs.toDF("id", "h")
    for (d <- Seq(0, 3, 6)) {
      val fast = Dedup.hammingPairs(df, "id", "h", maxDistance = d)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val brute = (for {
        (ia, ha) <- hs; (ib, hb) <- hs
        if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= d
      } yield (ia, ib)).toSet
      assert(fast == brute,
        s"d=$d missing=${brute -- fast} extra=${fast -- brute}")
    }
  }

  test("hammingPairs: a heavy identical-sketch group is pure output") {
    // 30 copies of one sketch + 5 near variants: the collapse path must
    // emit all C(30,2) hamming-0 pairs plus the cross pairs, exactly
    val hs = (0L until 30L).map(i => (i, 0x0123456789abcdefL)) ++
      (30L until 35L).map(i => (i, 0x0123456789abcdefL ^ (1L << (i - 30))))
    val df = hs.toDF("id", "h")
    val got = Dedup.hammingPairs(df, "id", "h", maxDistance = 2)
      .as[(Long, Long, Int)].collect()
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(got.toSet == brute)
    assert(got.length == brute.size, "no duplicate pair rows")
    assert(got.count(_._3 == 0) == 30 * 29 / 2)
  }

  test("simhashDuplicates: maxDistance=0 finds exact sketch matches only") {
    val pairs = Dedup.simhashDuplicates(docs, "doc_id", "text", maxDistance = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))     // identical text, distance 0
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embeddingDuplicates: scaled copies detected, orthogonal not") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 2.0f)),
      (2L, Array(2.0f, 0.0f, 4.0f)),  // 2× scale of 1 → cosine 1
      (3L, Array(0.0f, 5.0f, 0.0f))   // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDuplicates(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embeddingDuplicates: all-pairs guard fails loudly past maxRows") {
    val vecs = (0 until 40).map(i => (i.toLong, Array(i.toFloat, 1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException](
      Dedup.embeddingDuplicates(vecs, "vec_id", "embedding", 0.99,
        maxRows = 10L).count())
    assert(ex.getMessage.contains("all-pairs"), ex.getMessage)
    // disabled guard runs; generous guard runs
    assert(Dedup.embeddingDuplicates(vecs, "vec_id", "embedding", 0.999999,
      maxRows = 0L).count() >= 0L)
  }
  test("leakageSafeSplit: near-dup twins always land on the SAME side") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // twin of 1
      (3L, "completely different words about spark engines here"),
      (4L, "completely different words about spark engines here"), // twin of 3
      (5L, "a loner document with no duplicate anywhere at all")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.leakageSafeSplit(docs, "doc_id", "text", pairs, testFraction = 0.5)
      .select("doc_id", "split_key", "split")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L) == out(2L), "twins 1/2 must share key and side")
    assert(out(3L) == out(4L), "twins 3/4 must share key and side")
    assert(out(1L)._1 == 1L && out(3L)._1 == 3L, "component = min id")
    assert(out(5L)._1 == 5L, "singleton keys by its own id")
    assert(out.values.map(_._2).forall(s => s == "train" || s == "test"))
  }

  test("kFoldSplitFromLabels: clusters never straddle folds; folds cover 0..k-1") {
    val ids = (1L to 400L)
    val docs = ids.map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // pair consecutive even/odd ids: 200 two-member clusters
    val pairs = ids.filter(_ % 2 == 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.kFoldSplitFromLabels(docs, "doc_id",
        Dedup.connectedComponents(pairs), k = 5)
      .select("doc_id", "split_key", "fold")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    ids.filter(_ % 2 == 1).foreach { i =>
      assert(out(i) == out(i + 1), s"twins $i/${i + 1} must share a fold")
    }
    val folds = out.values.map(_._2).toSet
    assert(folds == Set(0, 1, 2, 3, 4), s"all 5 folds populated: $folds")
    // ±1/65536 uniformity is statistical; at 200 clusters just require
    // no fold hoards a majority
    val sizes = out.values.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.max < 200, s"fold sizes: ${sizes.toMap}")
    intercept[IllegalArgumentException](
      Dedup.kFoldSplitFromLabels(docs, "doc_id",
        Dedup.connectedComponents(pairs), k = 1))
  }

  test("ngramOverlapAcross flags planted benchmark quotes only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated content about spark execution engines"),
      (3L, "quick brown fox jumps over")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, "the quick brown fox jumps"),
      (11L, "entirely different benchmark prompt")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramOverlapAcross(corpus, bench, "doc_id", "text",
        n = 3, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 contains all 3 of bench-10's trigrams; doc 3 contains 2; doc 2
    // shares nothing; bench 11 is hit by nobody
    assert(got == Set((1L, 3L, 1L), (3L, 2L, 1L)))
  }

  test("connectedComponents: min reachable id labels every node") {
    // two chains and one isolated edge: {1-2-3-4}, {10-11}, {20-21-22}
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (21L, 20L), (21L, 22L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponentsIncremental: equals full recompute, labels stable") {
    // prior components: {1,2,3}, {10,11}, {20,21}, {40,41}
    val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (40L, 41L))
      .toDF("id_a", "id_b")
    val prior = Dedup.connectedComponents(b1)
    // batch 2: merges {1..3} with {10,11}; a fresh chain {30,31}; a
    // FRESH node 0 linking into {20,21} — the new min comes from the
    // fresh side, relabeling the old component; {40,41} untouched
    val b2 = Seq((3L, 10L), (30L, 31L), (0L, 20L)).toDF("id_a", "id_b")
    val inc = Dedup.connectedComponentsIncremental(prior, b2)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(b1.unionByName(b2))
      .as[(Long, Long)].collect().toMap
    assert(inc == full)
    assert(inc(11L) == 1L && inc(20L) == 0L && inc(21L) == 0L)
    assert(inc(40L) == 40L && inc(41L) == 40L, "untouched component moved")
    // chained increments stay equivalent to the one-shot recompute
    val b3 = Seq((31L, 41L)).toDF("id_a", "id_b")
    val inc2 = Dedup.connectedComponentsIncremental(
        Dedup.connectedComponentsIncremental(prior, b2), b3)
      .as[(Long, Long)].collect().toMap
    val full2 = Dedup.connectedComponents(
        b1.unionByName(b2).unionByName(b3))
      .as[(Long, Long)].collect().toMap
    assert(inc2 == full2)
    // an empty batch is the identity
    val none = Dedup.connectedComponentsIncremental(prior,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(none.as[(Long, Long)].collect().toMap ==
      prior.as[(Long, Long)].collect().toMap)
  }

  test("connectedComponents: long path converges past one round") {
    // a 12-node path needs ~diameter rounds, not one
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges).as[(Long, Long)].collect()
    assert(comps.length == 12 && comps.forall(_._2 == 0L))
  }

  test("connectedComponents: deep chain converges in O(log d) rounds") {
    // pointer compression doubles covered distance per round: a 400-edge
    // chain (diameter 400) must converge within maxIter = 16 ≈ log2(400)
    // + detection slack — pure min-propagation would need ~400 rounds and
    // throw here instead
    val edges = (0L until 400L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges, maxIter = 16)
      .as[(Long, Long)].collect()
    assert(comps.length == 401 && comps.forall(_._2 == 0L))
  }

  test("connectedComponents equals union-find on randomized graphs") {
    // the pointer-compression rewrite must not change the fixpoint on ANY
    // graph shape — compare against an in-memory union-find reference
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(30)
      val edges = Seq.fill(5 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(v => v -> find(v.toInt).toLong).toMap
        val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        assert(got == expect, s"trial $trial (n=$n, ${edges.size} edges)")
      }
    }
  }

  test("connectedComponents: full-range 64-bit surrogate ids converge exactly") {
    // the decimal(38,0) convergence sum cannot wrap: ids near ±2^63 (the
    // xxhash64-surrogate shape the docstring recommends) must still reach
    // the min-reachable-id fixpoint
    val big = Long.MaxValue
    val edges = Seq(
      (big, big - 1), (big - 1, -big), // one component spanning the range
      (42L, 43L)
    ).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(comps(big) == -big && comps(big - 1) == -big && comps(-big) == -big)
    assert(comps(42L) == 42L && comps(43L) == 42L)
  }
  test("minhashDedupIncremental: corpus suppresses, within-batch greedy") {
    val mk = (id: Long, t: String) => (id, t)
    val corpus = Seq(mk(1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      mk(10L, "alpha beta gamma delta epsilon zeta eta theta"),  // = corpus -> drop
      mk(11L, "completely different words about spark engines here"),
      mk(12L, "completely different words about spark engines here"), // = 11 -> drop
      mk(13L, "unrelated third document with its own content entirely")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashDedupIncremental(fresh, corpus, "doc_id", "text",
        numHashes = 64, bands = 32, threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 13L),
      "corpus match drops 10, smaller-id within-batch match drops 12")
  }

  test("containmentPairs finds the embedded page Jaccard misses") {
    val page = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val wrapped = s"header menu nav $page footer copyright contact about terms privacy"
    val docs = Seq((1L, page), (2L, wrapped),
      (3L, "entirely different content about other things")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.keySet == Set((1L, 2L))) // page contained in wrapped, one direction
    assert(pairs((1L, 2L)) == 1.0)
    // and symmetric Jaccard at the same bar does NOT see it (union is large)
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1, threshold = 0.9)
    assert(jac.count() == 0L)
  }

  test("containmentPairs keeps pairs at EXACTLY the threshold (prefix boundary)") {
    // A has 10 distinct words, 9 shared with B: containment = 0.9 exactly.
    // ceil(0.9*10) computes over doubles as ceil(9.000000000000002) = 10,
    // so a non-conservative prefix/size prune drops exactly these pairs
    // while the verify's 9/10 >= 0.9 comparison keeps them.
    val shared = (1 to 9).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared onlya"),
      (2L, s"$shared onlyb extra1 extra2 extra3")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.contains((1L, 2L)), s"boundary pair dropped: $got")
    assert(got((1L, 2L)) == 0.9)
  }

  test("containmentPairs equals brute force on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (0 until 36).map { i =>
      val base = rnd.shuffle(vocab).take(6 + rnd.nextInt(12))
      (i.toLong, base.mkString(" "))
    }
    // planted: the first 8 docs get a ~92%-prefix clone (contained subset)
    val planted = (0 until 8).map { i =>
      val ws = docs(i)._2.split(" ")
      (100L + i, ws.take(math.max(3, (ws.length * 0.92).toInt)).mkString(" "))
    }
    val all = (docs ++ planted).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(all, "doc_id", "text", threshold = 0.85)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force in memory with the same tokenization
    val toks = (docs ++ planted).map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet
    }
    val expect = (for {
      (ia, ta) <- toks; (ib, tb) <- toks
      if ia != ib && ta.nonEmpty &&
        ta.intersect(tb).size.toDouble / ta.size >= 0.85
    } yield (ia, ib)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("exactDedupStream: content dups dropped across batches within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = Dedup.exactDedupStream(docs, "text", "ts", watermark = "1 hour")
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2024-01-01 10:10:00")
      mem.addData((1L, "alpha beta", t0), (2L, "ALPHA   beta", t0)) // canonical dup
      q.processAllAvailable()
      mem.addData((3L, "alpha beta", t1), (4L, "fresh content", t1)) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 4L),
        "2 (same-batch canonical dup) and 3 (cross-batch dup) must be dropped")
    } finally q.stop()
  }

  test("connectedComponents refuses non-integral ids instead of mislabeling") {
    // string ids would null-cast inside the sum-based convergence check
    // and silently report every node as a singleton component
    val edges = Seq(("a", "b")).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edges)
    }
    assert(e.getMessage.contains("integral ids"))
  }

  test("connectedComponents: empty edge list yields an empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(edges).count() == 0L)
    // the downstream policy layer must also survive a clean corpus
    val docs = Seq((1L, "unique one"), (2L, "unique two")).toDF("doc_id", "text")
    assert(Dedup.clusterSurvivors(docs, "doc_id", "text", edges).count() == 0L)
  }

  test("clusterSurvivors: longest text wins, ties to min id, sizes correct") {
    val docs = Seq(
      (1L, "short"), (2L, "longer text"), (3L, "longer text"), // cluster {1,2,3}
      (7L, "aaa"), (8L, "bbb"),                                // cluster {7,8}
      (9L, "solo")                                             // no duplicate: unlabeled
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = Dedup.clusterSurvivors(docs, "doc_id", "text", pairs)
      .orderBy("component").as[(Long, Long, Long, Long)].collect().toSeq
    // {1,2,3}: 2 and 3 tie on length 11 -> min id 2; {7,8}: tie -> 7
    assert(out == Seq((1L, 2L, 3L, 11L), (7L, 7L, 2L, 3L)))
  }

  /** Plain-Scala reference of [[Dedup.paragraphDedup]]: split (keeping
    * trailing empties, like Spark's split), normalize, global
    * first-occurrence by (id, idx), reassemble in index order.
    */
  private def refParagraphDedup(in: Seq[(Long, String)],
                                sep: String = "\n"): Map[Long, (String, Long, Long)] = {
    val paras = in.flatMap { case (id, t) =>
      t.split(java.util.regex.Pattern.quote(sep), -1).zipWithIndex.map {
        case (p, i) => (id, i, p, p.toLowerCase.replaceAll("\\s+", " ").trim)
      }
    }
    val first = paras.filter(_._4.nonEmpty).groupBy(_._4)
      .map { case (n, ps) => n -> ps.map(p => (p._1, p._2)).min }
    val kept = paras.filter(p => p._4.isEmpty || first(p._4) == ((p._1, p._2)))
    val total = in.map { case (id, t) =>
      id -> t.split(java.util.regex.Pattern.quote(sep), -1).length.toLong }.toMap
    kept.groupBy(_._1).map { case (id, ps) =>
      id -> (ps.sortBy(_._2).map(_._3).mkString(sep), total(id), ps.size.toLong)
    }
  }

  test("paragraphDedup: boilerplate survives once, order and counts exact") {
    val in = Seq(
      (10L, "intro one\nSubscribe now!\nbody alpha"),
      (11L, "intro two\nsubscribe   NOW!\nbody beta"), // normalized dup dropped
      (12L, "Subscribe now!\nbody alpha\nbody gamma")  // both first paras seen
    )
    val out = Dedup.paragraphDedup(in.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out == refParagraphDedup(in))
    // the boilerplate lives exactly once, in the earliest position
    assert(out(10L)._1 == "intro one\nSubscribe now!\nbody alpha")
    assert(out(11L)._1 == "intro two\nbody beta")
    assert(out(12L)._1 == "body gamma" && out(12L)._2 == 3L && out(12L)._3 == 1L)
  }

  test("paragraphDedup: fully-duplicated doc vanishes; empty paras always kept") {
    val in = Seq(
      (1L, "same para\nother para"),
      (2L, "same para\nother para"), // every paragraph seen -> no output row
      (3L, "\n\n"),                  // all-empty paragraphs: kept verbatim
      (4L, "same para\n\nfresh para"))
    val out = Dedup.paragraphDedup(in.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out == refParagraphDedup(in))
    assert(!out.contains(2L))
    assert(out(3L) == (("\n\n", 3L, 3L)))
    assert(out(4L) == (("\nfresh para", 3L, 2L)))
  }

  test("paragraphDedupIncremental: corpus paragraphs drop, batch dedups within") {
    val corpus = Seq(
      (100L, "old news\nSubscribe now!"),
      (101L, "other  SUBSCRIBE now!\nolder news")) // normalized match too
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "fresh intro\nSubscribe now!\nfresh body"), // boilerplate in corpus
      (2L, "fresh intro\n\nfresh tail"),   // 'fresh intro' seen in doc 1
      (3L, "old news\nolder news"))        // fully absorbed by the corpus
      .toDF("doc_id", "text")
    val out = Dedup.paragraphDedupIncremental(batch, corpus, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (("fresh intro\nfresh body", 3L, 2L)))
    assert(out(2L) == (("\nfresh tail", 3L, 2L))) // empty para survives
    assert(!out.contains(3L))
    // within-batch first occurrence also respects the min (id, idx) rule
    val again = Dedup.paragraphDedupIncremental(
      batch.repartition(5), corpus.repartition(3), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(again == out)
  }

  test("paragraphDedup: deterministic under repartitioning on a mixed corpus") {
    val in = (0L until 120L).map { i =>
      val shared = s"shared block ${i % 7}"
      val unique = s"unique ${i} content"
      (i, if (i % 3 == 0) s"$shared\n$unique" else s"$unique\n$shared\ntail ${i % 5}")
    }
    val df = in.toDF("doc_id", "text")
    val a = Dedup.paragraphDedup(df, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Dedup.paragraphDedup(df.repartition(13), "doc_id", "text")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(r => r._1 -> (r._2, r._3, r._4)).toMap == refParagraphDedup(in))
  }
}
