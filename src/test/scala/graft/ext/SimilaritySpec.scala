package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: known vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f), 1.0 / math.sqrt(2)),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f), 0.0) // zero-norm guard
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosine($"a", $"b").as("c"), $"expected")
      .as[(Double, Double)].collect()
    got.foreach { case (c, e) => assert(math.abs(c - e) < 1e-12) }
  }

  test("bruteForceTopK: self is rank 1, ranks deterministic") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => math.sin((i * 31 + d * 7).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", "query_id", k = 5)
    val r1 = top.filter($"rank" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    r1.foreach { case (q, n) => assert(q == n) } // cosine(v,v)=1 tops
    assert(top.count() == 15)
  }

  test("lshTopKJoin: agrees with lshTopK when the left side is query-sized") {
    val vecs = (0L until 80L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 17 + d * 5).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val leftT = vecs.filter($"vec_id" % 10 === 0)
    val rightT = vecs.filter($"vec_id" % 10 =!= 0)
    val joined = Similarity.lshTopKJoin(leftT, rightT, "vec_id", "vec_id",
        "embedding", k = 4, bits = 6, dim = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val viaTopK = Similarity.lshTopK(rightT,
        leftT.select($"vec_id".as("query_id"), $"embedding"),
        "vec_id", "embedding", "query_id", k = 4, bits = 6, dim = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(joined == viaTopK && joined.nonEmpty)
  }

  test("nearestCentroids kernel: slot 0 equals nearestCentroid; probes distinct and ordered") {
    import graft.functions.VectorFunctions
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(-1.0, 0.0), Seq(0.7, 0.7))
    val vecs = (0 until 40).map { i =>
      Tuple1(Array(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat))
    }.toDF("v")
    val rows = vecs.select(
      VectorFunctions.nearestCentroid($"v", cents).as("one"),
      VectorFunctions.nearestCentroids($"v", cents, 3).as("three"))
      .as[(Int, Seq[Int])].collect()
    rows.foreach { case (one, three) =>
      assert(three.head == one)
      assert(three.distinct.size == 3)
    }
  }

  test("ivf/pq donor sampling is id-distribution-free: sparse skewed ids " +
      "get full centroid/codebook sets and exact recall at full probe") {
    // ids with NO small multiples and a hole-ridden, clustered layout —
    // the regime where stride sampling (id % stride == 0) found zero or
    // degenerate donors. md5-rank donors must not care.
    val sparseIds = (0 until 80).map(i =>
      1000003L + i.toLong * 9999991L + (if (i % 3 == 0) 7L else 0L))
    val vecs = sparseIds.map { id =>
      (id, Array.tabulate(16)(d => math.sin((id % 977 + d * 3).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val leftT = vecs.limit(8).select($"vec_id".as("query_id"), $"embedding")
    // full probe + IVF: candidate set is the whole corpus → must equal
    // brute force exactly; proves the donor sample is well-formed
    val ivf = Similarity.ivfTopK(vecs, leftT, "vec_id", "embedding",
        "query_id", k = 4, numCells = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(vecs, leftT, "vec_id",
        "embedding", "query_id", k = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == brute && ivf.nonEmpty)
    // PQ path: codebook donors exist and every query gets k ranked rows
    val pq = Similarity.pqTopK(vecs, leftT, "vec_id", "embedding",
        "query_id", k = 3, numSubspaces = 4, codebookSize = 8,
        rerankFactor = 8, dim = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    assert(pq.groupBy(_._1).size == 8)
    pq.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)) }
  }

  test("numCellsAuto: k = clamp(ceil(sqrt(n)), 16, 65536) from a count") {
    val small = (0L until 50L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.numCellsAuto(small, "vec_id") == 16) // floor holds
    val mid = (0L until 400L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.numCellsAuto(mid, "vec_id") == 20) // ceil(sqrt(400))
    val off = (0L until 401L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.numCellsAuto(off, "vec_id") == 21) // ceil rounds up
  }

  test("bitsAuto: bits = clamp(ceil(log2(n/target)), 4, 30) from a count") {
    val tiny = (0L until 10L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.bitsAuto(tiny, "vec_id") == 4) // floor holds
    val mid = (0L until 8192L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    assert(Similarity.bitsAuto(mid, "vec_id") == 7)  // 8192/64 = 2^7
    assert(Similarity.bitsAuto(mid, "vec_id", targetBucketRows = 32) == 8)
  }

  test("lshTopK with bits=0 (auto) equals the explicit auto-sized call") {
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 31 + d * 7).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val auto = Similarity.lshTopK(vecs, qs, "vec_id", "embedding",
        "query_id", k = 5, dim = 16) // default bits = 0 = auto
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val explicit = Similarity.lshTopK(vecs, qs, "vec_id", "embedding",
        "query_id", k = 5, bits = 4, dim = 16) // = bitsAuto(200): clamp floor
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(auto == explicit && auto.nonEmpty)
  }

  test("ivfTopK with numCells=0 (auto) equals the explicit auto-sized call") {
    val vecs = (0L until 400L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 13 + d * 5).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val auto = Similarity.ivfTopK(vecs, qs, "vec_id", "embedding",
        "query_id", k = 4, nprobe = 2) // default numCells = 0 = auto
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val explicit = Similarity.ivfTopK(vecs, qs, "vec_id", "embedding",
        "query_id", k = 4, numCells = 20, nprobe = 2) // = numCellsAuto(400)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(auto == explicit && auto.nonEmpty)
  }

  test("incremental IVF: append equals bulk assign; search equals ivfTopK") {
    val vecs = (0L until 300L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 13 + d * 5).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val initial = vecs.filter($"vec_id" % 3 =!= 0)
    val batch = vecs.filter($"vec_id" % 3 === 0)
    val cents = Similarity.ivfCentroids(initial, "vec_id", "embedding",
      numCells = 16)
    // frozen quantizer => assignment is a pure per-row function: two
    // appends equal one bulk assign of their union, byte for byte
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"cell", $"neighbor_id").as[(Long, Long)].collect().toSet
    val appended = rows(
      Similarity.ivfAssign(initial, "vec_id", "embedding", cents)
        .unionByName(Similarity.ivfAssign(batch, "vec_id", "embedding", cents)))
    val bulk = rows(Similarity.ivfAssign(vecs, "vec_id", "embedding", cents))
    assert(appended == bulk && appended.size == 300)
    // searching postings over the INITIAL corpus with the initial-corpus
    // centroids must equal ivfTopK on that corpus (same quantizer)
    val qs = vecs.filter($"vec_id" % 60 === 1)
      .select($"vec_id".as("query_id"), $"embedding")
    val viaPostings = Similarity.ivfSearchPostings(
        Similarity.ivfAssign(initial, "vec_id", "embedding", cents),
        qs, "query_id", "embedding", cents, k = 4, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val viaTopK = Similarity.ivfTopK(initial, qs, "vec_id", "embedding",
        "query_id", k = 4, numCells = 16, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaPostings == viaTopK && viaPostings.nonEmpty)
  }

  test("incremental IVF: appended vectors are searchable; stats signal") {
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 7 + d * 3).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(vecs, "vec_id", "embedding",
      numCells = 8)
    // the appended batch plants an exact copy of vector 42 at id 9000:
    // it must come back rank 1 (ties by lowest id put the original
    // first; the copy is the immediate next at cosine 1.0)
    val copy = vecs.filter($"vec_id" === 42)
      .select(lit(9000L).as("vec_id"), $"embedding")
    val postings = Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
      .unionByName(Similarity.ivfAssign(copy, "vec_id", "embedding", cents))
    val q = vecs.filter($"vec_id" === 42)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.ivfSearchPostings(postings, q, "query_id",
        "embedding", cents, k = 3, nprobe = 2)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(top.take(2) == Seq(42L, 9000L),
      s"appended exact copy must be searchable at the top: $top")
    // stats: occupancy ratios are consistent and the imbalance signal
    // rides every row (the rebuild trigger)
    val st = Similarity.ivfCellStats(postings, numCells = 8)
      .select($"n", $"n_total", $"occupancy_ratio", $"imbalance")
      .as[(Long, Long, Double, Double)].collect()
    assert(st.map(_._1).sum == 201L && st.forall(_._2 == 201L))
    val imb = st.head._4
    assert(st.forall(r => math.abs(r._4 - imb) < 1e-12))
    assert(imb >= st.map(_._3).max - 1e-12)
    intercept[IllegalArgumentException] {
      Similarity.ivfCellStats(postings, numCells = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfAssign(vecs, "vec_id", "embedding", Nil)
    }
  }

  test("ivfTopKJoin: agrees with ivfTopK when the left side is query-sized") {
    val vecs = (0L until 96L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 11 + d * 3).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    // left takes residue 5 so the right side keeps the multiples of the
    // centroid stride (12) — the sample must come from the RIGHT table
    val leftT = vecs.filter($"vec_id" % 12 === 5)
    val rightT = vecs.filter($"vec_id" % 12 =!= 5)
    val joined = Similarity.ivfTopKJoin(leftT, rightT, "vec_id", "vec_id",
        "embedding", k = 4, numCells = 8, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val viaTopK = Similarity.ivfTopK(rightT,
        leftT.select($"vec_id".as("query_id"), $"embedding"),
        "vec_id", "embedding", "query_id", k = 4, numCells = 8, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(joined == viaTopK && joined.nonEmpty)
  }

  test("ivfPqTopKJoin: all cells probed + wide re-rank equals the exact join ranking") {
    val vecs = (0L until 96L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 11 + d * 3).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val leftT = vecs.filter($"vec_id" % 12 === 5)
    val rightT = vecs.filter($"vec_id" % 12 =!= 5)
    // probing every cell makes the candidate set the whole corpus; a
    // pool of k·rerank ≥ corpus lets the EXACT re-rank see everything —
    // so the PQ path must reproduce the brute-force ranking exactly,
    // proving ADC error can cost only pool-boundary recall, never rank
    val pq = Similarity.ivfPqTopKJoin(leftT, rightT, "vec_id", "vec_id",
        "embedding", k = 4, numCells = 8, nprobe = 8,
        numSubspaces = 4, codebookSize = 8, rerankFactor = 32,
        dim = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val brute = Similarity.bruteForceTopK(rightT,
        leftT.select($"vec_id".as("query_id"), $"embedding"),
        "vec_id", "embedding", "query_id", k = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(pq == brute && pq.nonEmpty)
  }

  test("ivfPqTopKJoin: narrow pool still returns k well-formed rows per query") {
    val vecs = (0L until 96L).map { i =>
      (i, Array.tabulate(16)(d => math.cos((i * 7 + d * 5).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val leftT = vecs.filter($"vec_id" % 12 === 5)
    val rightT = vecs.filter($"vec_id" % 12 =!= 5)
    val out = Similarity.ivfPqTopKJoin(leftT, rightT, "vec_id", "vec_id",
        "embedding", k = 3, numCells = 8, nprobe = 2,
        numSubspaces = 4, codebookSize = 8, rerankFactor = 2,
        dim = 16)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val perQuery = out.groupBy(_._1)
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (_, rows) =>
      assert(rows.length <= 3)
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      assert(rows.map(_._2).distinct.length == rows.length)
    }
  }

  test("hot-bucket salting: identical results, per-task pair work bounded") {
    // clustered corpus — the realistic case the uniform testdata hides:
    // 90% of vectors are tiny perturbations of one direction, so ONE LSH
    // bucket (and one IVF cell) holds almost everything
    val dim = 8
    val vecs = (0L until 400L).map { i =>
      val v =
        if (i % 10 != 0) Array.tabulate(dim)(d =>
          (1.0 + 0.001 * math.sin((i * 13 + d).toDouble)).toFloat *
            (if (d == 0) 1.0f else 0.01f))
        else Array.tabulate(dim)(d => math.cos((i * 7 + d * 5).toDouble).toFloat)
      (i, v)
    }.toDF("vec_id", "embedding")
    val leftT = vecs.filter($"vec_id" % 4 === 1)
    val rightT = vecs.filter($"vec_id" % 4 =!= 1)
    val s = 8

    def results(salt: Int) = Similarity.lshTopKJoin(leftT, rightT,
        "vec_id", "vec_id", "embedding", k = 5, bits = 6, dim = dim,
        saltBuckets = salt)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet

    // the salted join is the SAME operator: the per-query heap merges
    // across salts to the identical ranking
    val plain = results(1)
    assert(results(s) == plain && plain.nonEmpty)

    // the mechanism: per-(join key) corpus rows bound the pairwise work
    // one task can be handed (task time is proportional to it, so this
    // is the deterministic form of a task-time-ratio assertion). The hot
    // bucket must spread across salts.
    val planes = Similarity.hyperplanes(dim, bits = 6, seed = 42L)
    val bucketed = rightT
      .select($"vec_id", Similarity.lshBucket($"embedding", planes).as("bucket"))
    val hotBefore = bucketed.groupBy("bucket").count()
      .agg(max("count")).as[Long].head()
    val hotAfter = bucketed
      .withColumn("salt", pmod(xxhash64($"vec_id"), lit(s.toLong)))
      .groupBy("bucket", "salt").count()
      .agg(max("count")).as[Long].head()
    assert(hotBefore >= 250, s"corpus not skewed enough for the test: $hotBefore")
    assert(hotAfter * 2 <= hotBefore / (s / 4),
      s"hot bucket not spread: $hotBefore before vs $hotAfter per salt with $s salts")

    // IVF form: same contract under the same skew
    val ivfPlain = Similarity.ivfTopKJoin(leftT, rightT, "vec_id", "vec_id",
        "embedding", k = 5, numCells = 8, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val ivfSalted = Similarity.ivfTopKJoin(leftT, rightT, "vec_id", "vec_id",
        "embedding", k = 5, numCells = 8, nprobe = 2,
        saltBuckets = s)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivfSalted == ivfPlain && ivfPlain.nonEmpty)
  }

  test("lshTopKJoin: non-integral right ids fail loudly, not empty or truncated") {
    val strVecs = Seq(("a", Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.lshTopKJoin(strVecs, strVecs, "vec_id", "vec_id", "embedding",
        k = 1, bits = 2, dim = 2)
    }
    assert(e.getMessage.contains("integral right id"))
    // fractional ids would truncate through the heap into nonexistent ids
    val dblVecs = Seq((2.5, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.ivfTopKJoin(dblVecs, dblVecs, "vec_id", "vec_id", "embedding",
        k = 1, numCells = 1, nprobe = 1)
    }
  }

  test("lshTopKJoin: a pair never meets twice (no duplicate neighbors per query)") {
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => math.cos((i * 13 + d * 3).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val out = Similarity.lshTopKJoin(vecs, vecs, "vec_id", "vec_id",
      "embedding", k = 60, bits = 4, dim = 8)
    val dupPairs = out.groupBy("query_id", "neighbor_id")
      .count().filter($"count" > 1).count()
    assert(dupPairs == 0)
  }

  test("lshTopK: recall vs brute force is high with multi-probe") {
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d => math.sin((i * 31 + d * 7).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", "query_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(vecs, qs, "vec_id", "embedding", "query_id",
        k = 5, bits = 8, dim = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall") // sub-linear path trades recall
    // self-match always survives (query's own bucket is probed)
    (0L until 5L).foreach(q => assert(approx.contains((q, q))))
  }

  test("ivfTopK: clustered data — high recall vs brute force, self found") {
    // 4 tight clusters of 50 vectors each around orthogonal-ish centers
    val vecs = (0L until 200L).map { i =>
      val c = (i % 4).toInt
      val base = Array.tabulate(16)(d => if (d % 4 == c) 5.0f else 0.0f)
      (i, base.zipWithIndex.map { case (v, d) =>
        v + math.sin((i * 13 + d).toDouble).toFloat * 0.3f })
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", "query_id", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, qs, "vec_id", "embedding", "query_id",
        k = 5, numCells = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall")
    (0L until 4L).foreach(q => assert(ivf.contains((q, q))))
  }

  test("pqTopK: high recall vs brute force, exact re-rank keeps rank order") {
    val dim = 16
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin((i * 31 + d * 7).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(vecs, qs, "vec_id", "embedding", "query_id", k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val pq = Similarity.pqTopK(vecs, qs, "vec_id", "embedding", "query_id",
        k = 5, numSubspaces = 4, codebookSize = 16, rerankFactor = 8,
        dim = dim)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val pqSet = pq.map(t => (t._1, t._2)).toSet
    val recall = (exactSet & pqSet).size.toDouble / exactSet.size
    assert(recall >= 0.9, s"PQ recall $recall below 0.9")
    // the exact re-rank property: any neighbor PQ returns that IS in the
    // exact top-k carries the same rank there (re-ranking is by the true
    // cosine, so order among shared neighbors must agree)
    val exactRank = exact.map(t => (t._1, t._2) -> t._3).toMap
    val agree = pq.filter(t => exactSet.contains((t._1, t._2)))
    val perQueryShared = agree.groupBy(_._1)
    perQueryShared.foreach { case (q, rows) =>
      val pqOrder = rows.sortBy(_._3).map(_._2).toSeq
      val exOrder = rows.map(t => (t._2, exactRank((q, t._2))))
        .sortBy(_._2).map(_._1).toSeq
      assert(pqOrder == exOrder, s"query $q: shared-neighbor order diverged")
    }
    // self-match: a vector is its own nearest neighbor and PQ's candidate
    // pool is 40 deep — self must survive the pool and re-rank to 1
    (0L until 5L).foreach(q => assert(pqSet.contains((q, q))))
  }

  test("randomProject: deterministic, norm-preserving in expectation") {
    val dim = 32
    val vecs = (0L until 100L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin((i * 31 + d * 7).toDouble).toFloat))
    }.toDF("vec_id", "embedding")
    val proj = vecs.select($"vec_id",
      Similarity.randomProject($"embedding", dim, 8).as("p"))
    val rows = proj.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.values.forall(_.length == 8))
    // deterministic: a second evaluation is identical
    val again = vecs.select($"vec_id",
      Similarity.randomProject($"embedding", dim, 8).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows == again)
    // JL, in aggregate: mean projected/original norm ratio near 1
    val ratios = vecs.collect().map { r =>
      val orig = math.sqrt(r.getSeq[Float](1).map(x => x.toDouble * x).sum)
      val p = rows(r.getLong(0))
      math.sqrt(p.map(x => x * x).sum) / orig
    }
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean far from 1")
  }

  test("lshCandidatePairs: bucketed pairs carry exact cosine") {
    val vecs = Seq(
      (1L, Array.fill(16)(1.0f)),
      (2L, Array.fill(16)(2.0f)),   // same direction as 1
      (3L, Array.tabulate(16)(d => if (d % 2 == 0) 1.0f else -1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.lshCandidatePairs(vecs, "vec_id", "embedding",
        bits = 6, dim = 16)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    val p12 = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(p12.isDefined && math.abs(p12.get._3 - 1.0) < 1e-12)
  }
  test("quantizeInt8: max slot hits 127, zero vector degrades to zeros") {
    val df = Seq(
      (1L, Array(1.0f, -2.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "embedding")
      .select("vec_id", "scale", "qvec")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    assert(out(1L)._1 == 127.0 / 4.0)
    assert(out(1L)._2 == Seq(32, -64, 127), "half-up rounding away from zero")
    assert(out(2L) == ((0.0, Seq(0, 0, 0))))
  }

  test("semanticDecontaminate: drops near-ref rows, keeps orthogonal and null") {
    val refs = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("ref_id", "embedding")
    val corpus = Seq(
      (1L, Array(2.0f, 0.0f, 0.0f)),   // scaled copy of ref 100: cos 1.0
      (2L, Array(0.0f, 0.0f, 5.0f)),   // orthogonal to both: cos 0.0
      (3L, Array(1.0f, 1.0f, 0.0f)),   // cos 1/sqrt(2) ≈ .707 vs both
      (4L, null.asInstanceOf[Array[Float]]) // unknown: kept
    ).toDF("doc_id", "embedding")
    val strict = Similarity.semanticDecontaminate(
        corpus, refs, "embedding", "embedding", tau = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(2L, 3L, 4L))
    val loose = Similarity.semanticDecontaminate(
        corpus, refs, "embedding", "embedding", tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(loose == Set(2L, 4L), "0.707 exceeds tau=0.5")
    // evidence column carries the exact max cosine
    val ev = Similarity.semanticDecontaminate(
        corpus, refs, "embedding", "embedding", tau = 0.9)
      .select("doc_id", "max_ref_cosine").as[(Long, Double)].collect().toMap
    assert(ev(2L) == 0.0 && math.abs(ev(3L) - 1.0 / math.sqrt(2.0)) < 1e-15)
  }

  test("semanticDecontaminate: corpus-sized reference rejected by name") {
    val refs = Seq(
      (100L, Array(1.0f, 0.0f)), (101L, Array(0.0f, 1.0f)),
      (102L, Array(1.0f, 1.0f))
    ).toDF("ref_id", "embedding")
    val corpus = Seq((1L, Array(1.0f, 0.0f))).toDF("doc_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(
        corpus, refs, "embedding", "embedding", tau = 0.9,
        maxRefVectors = 2L)
    }
    assert(ex.getMessage.contains("maxRefVectors"))
    // at the bound it still runs
    val ok = Similarity.semanticDecontaminate(
      corpus, refs, "embedding", "embedding", tau = 2.0, maxRefVectors = 3L)
    assert(ok.count() == 1L)
  }

  test("maxCosine kernel matches a brute-force fold, NaN propagates") {
    import graft.functions.VectorFunctions
    val refs = Seq(Seq(0.5, -1.0, 2.0), Seq(-3.0, 0.25, 1.0), Seq(0.0, 0.0, 0.0))
    val vecs = Seq(
      Array(1.0f, 2.0f, -0.5f), Array(-1.0f, -1.0f, -1.0f),
      Array(0.0f, 0.0f, 0.0f), Array(Float.NaN, 1.0f, 0.0f))
    val out = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
      .select(col("id"), VectorFunctions.maxCosine(col("vec"), refs).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def cos(a: Array[Float], b: Seq[Double]): Double = {
      val dot = a.indices.map(i => a(i).toDouble * b(i)).sum
      val d = math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x * x).sum)
      if (d > 0) dot / d else 0.0
    }
    for (i <- 0 to 2) {
      val expected = refs.map(r => cos(vecs(i), r)).max
      assert(out(i.toLong) == expected, s"vec $i")
    }
    // a NaN element poisons the vector's norm, so the denom > 0 gate
    // maps every cosine to the 0.0 convention (same as a zero vector)
    assert(out(3L) == 0.0)
  }

  test("groupCentroids: element-wise means per group, dim order kept") {
    val df = Seq(
      (0, Array(1.0f, 2.0f, 3.0f)),
      (0, Array(3.0f, 4.0f, 5.0f)),
      (1, Array(10.0f, 0.0f, -2.0f))
    ).toDF("label", "embedding")
    val out = Similarity.groupCentroids(df, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 3.0, 4.0))
    assert(out(1) == Seq(10.0, 0.0, -2.0))
  }

  test("hardNegatives equals label-filtered brute force; never same-label") {
    val rnd = new scala.util.Random(29)
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat), i % 4)
    }
    val df = vecs.toDF("vec_id", "embedding", "label")
    val anchors = df.filter($"vec_id" < 5)
    val got = Similarity.hardNegatives(df, anchors,
        "vec_id", "embedding", "label", "vec_id", k = 7)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until 8).map(i => a(i).toDouble * b(i).toDouble).sum
      val na = math.sqrt((0 until 8).map(i => a(i).toDouble * a(i)).sum)
      val nb = math.sqrt((0 until 8).map(i => b(i).toDouble * b(i)).sum)
      if (na > 0 && nb > 0) dot / (na * nb) else 0.0
    }
    val byId = vecs.map(v => v._1 -> v).toMap
    vecs.filter(_._1 < 5).foreach { case (qid, qv, ql) =>
      val expect = vecs.filter(_._3 != ql)
        .map(v => (v._1, cos(qv, v._2)))
        .sortBy { case (id, c) => (-c, id) }
        .take(7).map(_._1).toSeq
      assert(got(qid) == expect, s"anchor $qid")
      got(qid).foreach(n => assert(byId(n)._3 != ql, s"same-label $n"))
    }
  }
}
