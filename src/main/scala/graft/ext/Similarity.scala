package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). North-star extension (SURVEY.md §2 extensions).
  *
  * Two paths, same exact scoring predicate:
  *  - bruteForceTopK — broadcast the (small) query set against the (huge)
  *    corpus: one corpus scan, no shuffle of vectors, a partial top-k per
  *    partition then a final top-k (window over ≤ k·partitions rows).
  *    Exact; the baseline every ANN variant is measured against.
  *  - LSH (random hyperplanes) — per-row bit signature (no shuffle) →
  *    bucket equi-join, scoring only within buckets. Sub-linear candidate
  *    sets at 100 TB; recall tunable via bits/tables (multi-probe
  *    included: probe all single-bit-flip neighbors of the query bucket).
  *
  * All vector math is `zip_with`/`aggregate` over the native array — stays
  * in Tungsten, no UDF serialization; floats are upcast to double once so
  * accumulation error does not depend on partitioning (determinism).
  */
object Similarity {

  /** Native codegen'd kernels (graft.functions.VectorDot) — the HOF
    * formulation (`aggregate(zip_with(...))`) is CodegenFallback and
    * interprets per element, which dominates n²-pair similarity joins.
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = VectorFunctions.vecNorm(a)

  def cosine(a: Column, b: Column): Column = VectorFunctions.vecCosine(a, b)

  /** Cosine from a precomputed-norm pair — use on the inner side of pair
    * joins so each pair costs ONE dot instead of three.
    */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Exact top-k by cosine for each query vector.
    *
    * @param corpus  (idCol, vecCol) — the big side; scanned once.
    * @param queries (queryIdCol, vecCol) — the small side; broadcast.
    * @return (query_id, neighbor_id, cosine, rank), rank 1..k per query,
    *         ties broken by neighbor id (deterministic).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, queryIdCol: String,
                     k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm"))
      .join(q) // broadcast nested-loop: corpus never shuffles
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact top-k by RAW INNER PRODUCT for each query vector — the
    * un-normalized sibling of [[bruteForceTopK]] (maximum-inner-product
    * search; rankings differ from cosine exactly where corpus norms
    * vary, which is why retrieval stacks fuse the two — see
    * [[Retrieval.rrf]]). Same sanctioned scale shape: broadcast the
    * small query set, one corpus scan, no vector shuffle, per-query
    * window top-k.
    *
    * @return (query_id, neighbor_id, dot, rank), rank 1..k per query,
    *         ties broken by neighbor id (deterministic).
    */
  def bruteForceTopKDot(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, queryIdCol: String,
                        k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .join(q) // broadcast nested-loop: corpus never shuffles
      .select(col("query_id"), col("neighbor_id"),
        dot(col("q_vec"), col("c_vec")).as("dot"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("dot"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------------------------------------------- random-hyperplane LSH

  /** Deterministic hyperplanes: `bits` rows × dim, seeded Gaussian. */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature of a vector against the hyperplanes, packed into a
    * BIGINT bucket id. Pure per-row math — computed in the scan stage by
    * the native HyperplaneBucket kernel (one plan node; the composed
    * when/shiftleft OR-reduction carried bits × dim literal nodes through
    * the optimizer per use).
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    VectorFunctions.hyperplaneBucket(vec, planes.toSeq.map(_.toSeq))

  /** Production LSH bit sizing: bits = clamp(⌈log2(n /
    * targetBucketRows)⌉, 4, 30) from one column-pruned count — expected
    * bucket occupancy ≈ targetBucketRows, so per-bucket pair work (occ²)
    * stays CONSTANT and total candidate volume stays ∝ n as the corpus
    * grows (a fixed bit count makes it ∝ n²/2^bits — the same fixed-
    * parameter hazard the 10× audit caught for IVF cells). Note the
    * recall side of the dial: more bits at a fixed probe count lowers
    * per-table recall — production tuning raises probes/tables alongside,
    * auto-sizing only pins the COST shape.
    */
  def bitsAuto(corpus: DataFrame, idCol: String,
               targetBucketRows: Int = 64): Int = {
    require(targetBucketRows >= 1,
      s"targetBucketRows must be >= 1, got $targetBucketRows")
    val n = math.max(1L, corpus.select(col(idCol)).count())
    val raw = math.ceil(
      math.log(n.toDouble / targetBucketRows) / math.log(2.0)).toInt
    math.max(4, math.min(30, raw))
  }

  /** `bits = 0` in the LSH entry points means "size automatically" via
    * [[bitsAuto]] — the production default; gates pass explicit bits so
    * oracles replay buckets byte-for-byte (the [[resolveNumCells]]
    * convention).
    */
  private def resolveBits(side: DataFrame, idCol: String, bits: Int,
                          op: String): Int = {
    require(bits >= 0 && bits <= 62,
      s"$op: bits must be in [0, 62] (0 = auto), got $bits")
    if (bits == 0) bitsAuto(side, idCol) else bits
  }

  /** LSH-bucketed ANN top-k: candidates = corpus rows sharing the query's
    * bucket, or (multi-probe) any bucket at hamming distance 1 from it.
    * Exact cosine + window top-k on the candidate set. Recall < 1 by
    * construction; raise `bits` ↓bucket size, raise probes ↑recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int = 10, bits: Int = 0, dim: Int = 64,
              seed: Long = 42L, multiProbe: Boolean = true): DataFrame = {
    val nBits = resolveBits(corpus, idCol, bits, "lshTopK")
    val planes = hyperplanes(dim, nBits, seed)
    val corpusB = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm"))
      .withColumn("bucket", lshBucket(col("c_vec"), planes))

    val qBase = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"))
      .withColumn("q_bucket", lshBucket(col("q_vec"), planes))
    // probe set: own bucket + all single-bit flips (hamming-1 neighbors)
    val probeBuckets =
      if (multiProbe)
        explode(concat(array(col("q_bucket")),
          transform(sequence(lit(0), lit(nBits - 1)),
            i => col("q_bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i)))))
      else col("q_bucket")
    val q = broadcast(qBase.select(col("query_id"), col("q_vec"), col("q_norm"),
      probeBuckets.as("bucket")))

    val scored = corpusB.join(q, "bucket") // hash join on bucket, query side broadcast
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Cross-table semantic join: for EVERY row of `left`, the top-k
    * cosine neighbors in `right`, via shared LSH buckets. The shape
    * [[lshTopK]] cannot serve: there the query set broadcasts, so it must
    * be small; here BOTH sides are large (align two corpora, match
    * captions to images, link near-dup documents across snapshots) and
    * neither fits a broadcast.
    *
    * Scale shape: each side is bucketed per-row (no shuffle), the bucket
    * is a plain EQUI-join key — one hash exchange per side, pairwise work
    * confined to buckets — and per-query top-k is the bounded-heap
    * `TopKAgg` partial aggregate (map-side pre-reduction to k rows per
    * query; the window formulation would re-shuffle every scored pair).
    * No DISTINCT stage is needed: a right row carries ONE bucket and the
    * multi-probe values of a left row are pairwise distinct, so a pair
    * can meet in at most one bucket.
    *
    * Recall follows the LSH operating point (bits/multiProbe — see
    * `tools.AnnRecallBench`): candidates only, exact cosine within
    * buckets, deterministic (fixed seed, total (cosine desc, id asc)
    * order).
    *
    * Contract: `rightIdCol` must be INTEGRAL (it rides the bounded heap
    * as a long; see [[requireIntegralRightId]]) — hash non-integral ids
    * to a surrogate first.
    */
  def lshTopKJoin(left: DataFrame, right: DataFrame,
                  leftIdCol: String, rightIdCol: String, vecCol: String,
                  k: Int = 10, bits: Int = 0, dim: Int = 64,
                  seed: Long = 42L, multiProbe: Boolean = true,
                  saltBuckets: Int = 1): DataFrame = {
    requireIntegralRightId(right, rightIdCol, "lshTopKJoin")
    val nBits = resolveBits(right, rightIdCol, bits, "lshTopKJoin")
    val planes = hyperplanes(dim, nBits, seed)
    val r = right.select(col(rightIdCol).as("neighbor_id"),
        col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
      .withColumn("bucket", lshBucket(col("c_vec"), planes))
    val lBase = left.select(col(leftIdCol).as("query_id"),
        col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
      .withColumn("q_bucket", lshBucket(col("q_vec"), planes))
    val probeBuckets =
      if (multiProbe)
        explode(concat(array(col("q_bucket")),
          transform(sequence(lit(0), lit(nBits - 1)),
            i => col("q_bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i)))))
      else col("q_bucket")
    val l = lBase.select(col("query_id"), col("q_vec"), col("q_norm"),
      probeBuckets.as("bucket"))
    saltedKeyJoin(l, r, "bucket", saltBuckets)
      .transform(heapTopKPerQuery(k))
  }

  /** The bucket/cell equi-join of the semantic-join family, with optional
    * HOT-BUCKET SALTING: clustered embeddings (the realistic corpus — the
    * uniform testdata is the easy case) pile one LSH bucket or IVF cell
    * far above the rest, and that one join partition then carries an
    * n_left·n_right pairwise block that AQE's skew split only fixes when
    * the partition trips its size threshold. `saltBuckets = s` splits
    * every bucket DETERMINISTICALLY: the right side takes salt =
    * xxhash64(id) mod s (each row to exactly one sub-bucket), the left
    * side replicates each probe across all s salts — so a pair still
    * meets exactly once (the heap contract) and the per-query top-k
    * heap, being associative, merges across salts to the IDENTICAL
    * result. Cost: left rows × s through the exchange; right side —
    * the big one — is never replicated. `s = 1` is a plain equi-join
    * (the uniform-corpus default).
    */
  private def saltedKeyJoin(l: DataFrame, r: DataFrame, keyCol: String,
                            saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    if (saltBuckets == 1) l.join(r, keyCol)
    else {
      val rs = r.withColumn("_salt",
        pmod(xxhash64(col("neighbor_id")), lit(saltBuckets.toLong)).cast("int"))
      val ls = l.withColumn("_salt",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
      ls.join(rs, Seq(keyCol, "_salt")).drop("_salt")
    }
  }

  // ------------------------------------------------------------ IVF index

  /** Deterministic, id-distribution-free donor sample for IVF centroids
    * and PQ codebooks: the `n` rows whose `md5(id)` hex ranks smallest
    * (ties by id), returned in ASCENDING ID ORDER — the tie-break
    * convention every downstream kernel and oracle relies on ("lowest
    * index = lowest donor id"). One TakeOrdered top-n pass over the
    * corpus, nothing shuffles.
    *
    * Why md5-rank, not stride: `id % (modulus/k) == 0` assumed a dense
    * 0-based id space — a sparse, hashed, or skewed id space yields few
    * (or zero, or degenerate leading-cluster) donors. The md5 rank is a
    * uniform pseudo-random draw for ANY id distribution, equally
    * replayable in SQL (`ORDER BY md5(CAST(id AS VARCHAR)), id`).
    */
  private[ext] def donorSample(df: DataFrame, idCol: String, vecCol: String,
                          n: Int): Array[(Long, Array[Double])] =
    df.select(col(idCol).cast("long").as("donor_id"), col(vecCol).as("donor_vec"))
      .filter(col("donor_id").isNotNull && col("donor_vec").isNotNull)
      .orderBy(md5(col("donor_id").cast("string")), col("donor_id"))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Any](1).map(v => v.asInstanceOf[Number].doubleValue()).toArray))
      .sortBy(_._1)

  /** Production IVF cell sizing: k = clamp(⌈√n⌉, 16, 65536) from one
    * cheap count of the corpus id column (column-pruned; parquet answers
    * count-star from metadata). The 10× full-gate audit proved the
    * failure mode of a FIXED cell count: per-cell candidate volume is
    * ∝ n²/k, so cells must grow with n — k ∝ √n keeps both the per-cell
    * volume (n/k ≈ √n) and the broadcast centroid table (k ≈ √n) growing
    * with the square root of the corpus, the standard IVF sizing. The
    * floor keeps tiny corpora at the legacy 16; the cap bounds the
    * literal centroid array the assignment kernel carries (65536 × dim
    * doubles ≈ 32 MB at dim 64 — the broadcast-side budget).
    */
  def numCellsAuto(corpus: DataFrame, idCol: String): Int = {
    val n = corpus.select(col(idCol)).count()
    math.max(16, math.min(65536, math.ceil(math.sqrt(n.toDouble)).toInt))
  }

  /** `numCells = 0` in the IVF entry points means "size automatically"
    * via [[numCellsAuto]] — the production default. Gates/benchmarks pass
    * an explicit count so the DuckDB oracle can replay cells byte-for-
    * byte.
    */
  private def resolveNumCells(side: DataFrame, idCol: String,
                              numCells: Int, op: String): Int = {
    require(numCells >= 0, s"$op: numCells must be >= 0 (0 = auto), got $numCells")
    if (numCells == 0) numCellsAuto(side, idCol) else numCells
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around K centroid vectors; a query scores only the cells of its
    * `nprobe` nearest centroids. The second scale path next to LSH —
    * better recall/candidate-count trade-off when the data is clustered
    * (LSH hyperplanes are oblivious to cluster structure).
    *
    * Centroids here are a deterministic [[donorSample]] of the corpus
    * (md5-rank draw — id-distribution-free): one cheap bounded pass
    * instead of Lloyd iterations — at 100 TB the assignment scan
    * dominates and sampled centroids are the standard bootstrap. The
    * assignment is one codegen'd kernel node per row; the corpus never
    * shuffles except the final per-cell grouping.
    *
    * Contract: `idCol` must be NUMERIC (castable to long). For
    * non-numeric ids, pre-derive a numeric surrogate (e.g. xxhash64)
    * before indexing.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, queryIdCol: String,
              k: Int = 10, numCells: Int = 0, nprobe: Int = 3): DataFrame = {
    val cells = resolveNumCells(corpus, idCol, numCells, "ivfTopK")
    // deterministic md5-rank centroid sample, COLLECTED (the IVF "build
    // the index" step, ≤ numCells tiny rows): with centroids as literals
    // the corpus assignment runs as a per-row fold in the scan stage —
    // no join, no window, no shuffle of the corpus (a unique-key window
    // here would exchange every vector).
    val centroidRows: Array[(Long, Array[Double])] =
      donorSample(corpus, idCol, vecCol, cells)
    require(centroidRows.nonEmpty,
      "IVF centroid sample is empty — corpus has no non-null (id, vector) rows")

    // argmax-cosine cell via the native NearestCentroid kernel (one plan
    // node; ties to the lowest index = lowest centroid_id, since indices
    // follow the id-sorted sample) mapped to the centroid ID through a
    // tiny literal id array. The previous array_max-over-structs form was
    // semantically identical but carried numCells × dim literal nodes
    // through the optimizer on every planning.
    def bestCell(vec: Column): Column = {
      val idx = graft.functions.VectorFunctions.nearestCentroid(
        vec, centroidRows.toSeq.map(_._2.toSeq))
      element_at(array(centroidRows.toSeq.map(r => lit(r._1)): _*), idx + 1)
    }

    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm"))
      .withColumn("cell", bestCell(col("c_vec")))

    // query side is tiny: top-nprobe cells via the same kernel node the
    // corpus assignment uses (ties to the lowest centroid id — indices
    // follow the id-sorted sample), no numCells-way cross join + window
    val cellIdArr = array(centroidRows.toSeq.map(r => lit(r._1)): _*)
    val queryCells = broadcast(
      queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("q_vec"),
          norm(col(vecCol)).as("q_norm"))
        .select(col("query_id"), col("q_vec"), col("q_norm"),
          explode(transform(
            graft.functions.VectorFunctions.nearestCentroids(
              col("q_vec"), centroidRows.toSeq.map(_._2.toSeq),
              math.min(nprobe, centroidRows.length)),
            i => element_at(cellIdArr, i + 1))).as("cell")))

    val scored = corpusCells.join(queryCells, "cell")
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  // ------------- incremental IVF index maintenance (frozen quantizer)

  /** Build the IVF coarse quantizer ONCE: the deterministic md5-rank
    * centroid sample of the initial corpus (the [[ivfTopK]] bootstrap),
    * returned as a driver-side value (≤ numCells tiny rows — the
    * documented broadcast budget) so later batches can be assigned
    * WITHOUT re-reading or re-clustering anything. Freezing the
    * quantizer is the standard IVF maintenance contract (FAISS `add`):
    * cell geometry never moves, so stored postings stay valid across
    * any number of appends and an append touches only the new batch.
    * Re-derive centroids (full rebuild) only when [[ivfCellStats]]'
    * imbalance signal says the frozen cells stopped fitting the data.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   numCells: Int = 0): Seq[(Long, Seq[Double])] = {
    val cells = resolveNumCells(corpus, idCol, numCells, "ivfCentroids")
    val rows = donorSample(corpus, idCol, vecCol, cells)
    require(rows.nonEmpty,
      "ivfCentroids: corpus has no non-null (id, vector) rows")
    rows.toSeq.map { case (i, v) => (i, v.toSeq) }
  }

  /** Assign a batch to its frozen-quantizer cells — the IVF APPEND:
    * one codegen'd kernel node per row (no join, no window, no shuffle
    * of the batch), emitting `(cell, neighbor_id, vec, vnorm)` postings
    * to union with (or write next to) the stored index. Cost is one
    * scan of the BATCH; the existing postings never move. Because the
    * quantizer is frozen, assignment is a pure per-row function:
    * appending batches one at a time produces byte-identical postings
    * to assigning their union (SimilaritySpec pins it).
    */
  def ivfAssign(batch: DataFrame, idCol: String, vecCol: String,
                centroids: Seq[(Long, Seq[Double])],
                passthrough: Seq[String] = Nil): DataFrame = {
    require(centroids.nonEmpty, "ivfAssign: empty centroid table")
    val idx = graft.functions.VectorFunctions.nearestCentroid(
      col("vec"), centroids.map(_._2))
    // filter on the CASTED id (the donorSample stance): a non-numeric id
    // would pass a raw-column null check yet cast to NULL under the
    // non-ANSI cast, silently writing a NULL neighbor_id posting
    batch
      .filter(col(idCol).cast("long").isNotNull && col(vecCol).isNotNull)
      .select((Seq(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("vec")) ++ passthrough.map(col)): _*)
      .select((Seq(element_at(array(centroids.map(c => lit(c._1)): _*),
          idx + 1).as("cell"),
        col("neighbor_id"), col("vec"), norm(col("vec")).as("vnorm")) ++
        passthrough.map(col)): _*)
  }

  /** Execute the REBUILD the [[ivfCellStats]] imbalance signal asks
    * for — the third act of the frozen-quantizer lifecycle (build →
    * append → rebuild): re-sample a fresh coarse quantizer and reassign
    * every stored posting under it. The corpus is recovered from the
    * postings themselves (`(neighbor_id, vec)` — vectors are stored in
    * the index, nothing re-reads source data), centroids come from
    * `centroidSource` when given (the RECENCY knob: pass only recent
    * postings so the new cells follow where the stream drifted to) or
    * from the full recovered corpus, and reassignment is the same pure
    * per-row [[ivfAssign]] kernel — so the rebuilt index is
    * byte-identical to a bulk [[ivfAssign]] of the corpus under the new
    * quantizer (the replayability contract every maintenance op here
    * keeps). Cost: one centroid sample (≤ numCells driver rows) + one
    * assignment scan of the postings; `passthrough` columns (a stored
    * batch id) survive the reassignment.
    */
  def ivfRebuild(postings: DataFrame, numCells: Int = 0,
                 centroidSource: Option[DataFrame] = None,
                 passthrough: Seq[String] = Nil)
      : (Seq[(Long, Seq[Double])], DataFrame) = {
    val corpus = postings.select((Seq(col("neighbor_id"), col("vec")) ++
      passthrough.map(col)): _*)
    val sampleFrom = centroidSource.getOrElse(corpus)
    val cents = ivfCentroids(sampleFrom, "neighbor_id", "vec", numCells)
    (cents, ivfAssign(corpus, "neighbor_id", "vec", cents, passthrough))
  }

  /** Query STORED postings (the union of any number of [[ivfAssign]]
    * appends): the [[ivfTopK]] query path — top-`nprobe` cells per
    * query via the same kernel, a broadcast equi-join on `cell`, exact
    * cosine on the probed cells, per-query top-k window. Equal to
    * [[ivfTopK]] on the same corpus and centroids (SimilaritySpec pins
    * it), but the corpus side here is the pre-assigned index — nothing
    * re-derives at query time.
    */
  def ivfSearchPostings(postings: DataFrame, queries: DataFrame,
                        queryIdCol: String, vecCol: String,
                        centroids: Seq[(Long, Seq[Double])],
                        k: Int = 10, nprobe: Int = 3): DataFrame = {
    require(centroids.nonEmpty, "ivfSearchPostings: empty centroid table")
    require(k >= 1 && nprobe >= 1,
      s"ivfSearchPostings: k and nprobe must be >= 1, got k=$k nprobe=$nprobe")
    val cellIdArr = array(centroids.map(c => lit(c._1)): _*)
    val queryCells = broadcast(
      queries.select(col(queryIdCol).as("query_id"),
          col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
        .select(col("query_id"), col("q_vec"), col("q_norm"),
          explode(transform(
            graft.functions.VectorFunctions.nearestCentroids(
              col("q_vec"), centroids.map(_._2),
              math.min(nprobe, centroids.length)),
            i => element_at(cellIdArr, i + 1))).as("cell")))
    val scored = postings.join(queryCells, "cell")
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("q_vec"), col("vec"),
          col("q_norm"), col("vnorm")).as("cosine"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Per-cell occupancy and the REBUILD-TRIGGER signal for a postings
    * index: one map-side-combined aggregate over the postings plus a
    * one-row global ride-along (the sanctioned broadcast shape).
    * `occupancy_ratio` = cell size over the ideal n/numCells;
    * `imbalance` (same on every row) = the HOTTEST cell's ratio — when
    * appended data drifts away from the frozen centroids this climbs,
    * and past a policy threshold (FAISS folklore: ~3–5×) the index
    * earns its rebuild. numCells is passed, not inferred: cells absent
    * from the postings are exactly the empty cells the ratio must
    * account for.
    */
  def ivfCellStats(postings: DataFrame, numCells: Int): DataFrame = {
    require(numCells >= 1, s"numCells must be >= 1, got $numCells")
    val per = postings.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    val tot = per.agg(sum(col("n")).as("n_total"), max(col("n")).as("max_n"))
    per.join(broadcast(tot)) // one-row global aggregate side
      .select(col("cell"), col("n"), col("n_total"),
        (col("n").cast("double") * numCells /
          col("n_total").cast("double")).as("occupancy_ratio"),
        (col("max_n").cast("double") * numCells /
          col("n_total").cast("double")).as("imbalance"))
  }

  /** IVF twin of [[lshTopKJoin]]: cross-table top-k neighbors with BOTH
    * sides large, bucketed by Voronoi cells of centroids sampled from the
    * RIGHT table (the [[ivfTopK]] bootstrap; same numeric-id
    * contract). Better recall/candidate-count than the LSH form when the
    * embedding space is clustered — centroids follow the data where
    * hyperplanes are oblivious to it.
    *
    * Scale shape: the right side takes its single best cell, the left
    * side its `nprobe` best cells, both via one codegen'd kernel node per
    * row (`NearestCentroids` — no numCells-way cross join + window on the
    * large sides); cells meet in a shuffled equi-join and per-query top-k
    * is the bounded-heap `TopKAgg` aggregate. A pair can meet at most
    * once (one cell per right row, distinct probe cells per left row).
    */
  def ivfTopKJoin(left: DataFrame, right: DataFrame,
                  leftIdCol: String, rightIdCol: String, vecCol: String,
                  k: Int = 10, numCells: Int = 0, nprobe: Int = 3,
                  saltBuckets: Int = 1): DataFrame = {
    requireIntegralRightId(right, rightIdCol, "ivfTopKJoin")
    val centroidRows: Array[(Long, Array[Double])] =
      donorSample(right, rightIdCol, vecCol,
        resolveNumCells(right, rightIdCol, numCells, "ivfTopKJoin"))
    require(centroidRows.nonEmpty,
      "IVF centroid sample is empty — right side has no non-null (id, vector) rows")
    val cents = centroidRows.toSeq.map(_._2.toSeq)
    val cellIds = array(centroidRows.toSeq.map(r => lit(r._1)): _*)

    val r = right.select(col(rightIdCol).as("neighbor_id"),
        col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
      .withColumn("cell", element_at(cellIds,
        graft.functions.VectorFunctions.nearestCentroid(col("c_vec"), cents) + 1))
    val l = left.select(col(leftIdCol).as("query_id"),
        col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        explode(transform(
          graft.functions.VectorFunctions.nearestCentroids(
            col("q_vec"), cents, math.min(nprobe, centroidRows.length)),
          i => element_at(cellIds, i + 1))).as("cell"))
    saltedKeyJoin(l, r, "cell", saltBuckets)
      .transform(heapTopKPerQuery(k))
  }

  /** PQ-coded twin of [[ivfTopKJoin]] — the form for corpora whose FLOAT
    * vectors are the bottleneck at 100 TB: the right side rides through
    * the cell join as (id, cell, norm, PQ codes) — numSubspaces small
    * ints instead of dim floats per row (64-dim float ≈ 256 B → ~8 B-ish
    * of codes) — and candidates are scored by ADC lookup against the
    * query's per-subspace LUT, pure column arithmetic on the joined
    * rows. The per-query candidate POOL (k·rerankFactor) comes out of
    * the same bounded-heap `TopKAgg` as [[ivfTopKJoin]]'s top-k (no
    * window over the match stream), and only the pool rows — O(queries ·
    * k · rerankFactor) — ever touch raw vectors again, in the exact
    * cosine re-rank that produces the final ranking. PQ error can
    * therefore cost recall only at the pool boundary, never mis-rank
    * returned neighbors — which also keeps the result exactly
    * oracle-replicable (the q106 gate's DuckDB oracle recomputes cells,
    * codes, LUTs, pool, and re-rank).
    *
    * Centroids AND codebook are deterministic md5-rank [[donorSample]]s
    * of the right table ([[ivfTopK]]'s bootstrap stance; integral-id
    * contract, id-distribution-free).
    */
  def ivfPqTopKJoin(left: DataFrame, right: DataFrame,
                    leftIdCol: String, rightIdCol: String, vecCol: String,
                    k: Int = 10, numCells: Int = 0, nprobe: Int = 3,
                    numSubspaces: Int = 8, codebookSize: Int = 16,
                    rerankFactor: Int = 4, dim: Int = 64,
                    saltBuckets: Int = 1): DataFrame = {
    requireIntegralRightId(right, rightIdCol, "ivfPqTopKJoin")
    require(dim % numSubspaces == 0,
      s"dim $dim must divide into $numSubspaces subspaces")
    require(rerankFactor >= 1, s"rerankFactor must be >= 1, got $rerankFactor")
    val centroidRows: Array[(Long, Array[Double])] =
      donorSample(right, rightIdCol, vecCol,
        resolveNumCells(right, rightIdCol, numCells, "ivfPqTopKJoin"))
    require(centroidRows.nonEmpty,
      "IVF centroid sample is empty — right side has no non-null (id, vector) rows")
    val cents = centroidRows.toSeq.map(_._2.toSeq)
    val cellIds = array(centroidRows.toSeq.map(r => lit(r._1)): _*)
    // codebook donors: the same md5-rank draw at codebookSize; codeword
    // j = j-th donor in id order
    val codebook: Seq[Seq[Double]] =
      donorSample(right.select(col(rightIdCol), col(vecCol)),
        rightIdCol, vecCol, codebookSize).toSeq.map(_._2.toSeq)
    require(codebook.nonEmpty,
      "PQ codebook sample is empty — right side has no non-null (id, vector) rows")

    import graft.functions.PqFunctions
    // right side: codes ride the join, raw vectors stay in the scan
    val r = right.select(col(rightIdCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .select(col("neighbor_id"),
        element_at(cellIds,
          graft.functions.VectorFunctions.nearestCentroid(col("c_vec"), cents) + 1)
          .as("cell"),
        norm(col("c_vec")).as("c_norm"),
        PqFunctions.pqEncode(col("c_vec"), codebook, numSubspaces).as("codes"))
    val l = left.select(col(leftIdCol).as("query_id"), col(vecCol).as("q_vec"))
      .select(col("query_id"), norm(col("q_vec")).as("q_norm"),
        PqFunctions.pqLut(col("q_vec"), codebook, numSubspaces).as("luts"),
        explode(transform(
          graft.functions.VectorFunctions.nearestCentroids(
            col("q_vec"), cents, math.min(nprobe, centroidRows.length)),
          i => element_at(cellIds, i + 1))).as("cell"))

    // ADC approximate cosine on the joined rows (norm-normalized so the
    // pool ranking aligns with the exact re-rank; engine zero-vector rule)
    val adcDot = aggregate(
      zip_with(col("codes"), col("luts"),
        (c, lutRow) => element_at(lutRow, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val approxCos = when(col("q_norm") * col("c_norm") > 0,
      adcDot / (col("q_norm") * col("c_norm"))).otherwise(lit(0.0))
    // a pair meets at most once (one cell per right row, distinct probe
    // cells per left row — and one salt per right row under salting), so
    // the heap needs no pair dedup
    val pool = saltedKeyJoin(l, r, "cell", saltBuckets)
      .select(col("query_id"), approxCos.as("approx_cos"), col("neighbor_id"))
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg.column(k * rerankFactor,
        col("approx_cos"), -col("neighbor_id")).as("top"))
      .select(col("query_id"), explode(col("top")).as("s"))
      .select(col("query_id"), (-col("s.id")).as("neighbor_id"))

    // exact re-rank: only the pool rows pull raw vectors, via equi-joins
    // that broadcast nothing and shuffle only pool-sized frames + the
    // matched slices of the two tables
    val rv = right.select(col(rightIdCol).as("neighbor_id"),
      col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
    val lv = left.select(col(leftIdCol).as("query_id"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))
    pool.join(rv, "neighbor_id").join(lv, "query_id")
      .transform(heapTopKPerQuery(k))
  }

  // ------------------------------------------------- product quantization

  /** PQ (product-quantization) ANN: the 100 TB MEMORY lever next to IVF's
    * candidate-count lever. The vector space is split into `numSubspaces`
    * subspaces; each subspace gets a `codebookSize`-entry codebook, and a
    * corpus vector is stored as one small int code per subspace — a 64-dim
    * float vector (256 B) becomes numSubspaces bytes-ish of codes, and the
    * query scores candidates from a per-query LOOKUP TABLE (ADC:
    * asymmetric distance computation) instead of touching raw vectors.
    * The final top-k is then EXACTLY re-ranked on the true vectors of the
    * (k · rerankFactor) best approximate candidates, so PQ error can only
    * cost recall at the candidate-pool boundary, never mis-rank the
    * returned neighbors.
    *
    * Codebooks are a deterministic md5-rank corpus sample (the IVF
    * bootstrap stance: at 100 TB the encode scan dominates, sampled
    * codewords are the standard bootstrap; same `idCol` contract as
    * [[ivfTopK]]).
    * Codeword j of subspace m is the m-th slice of the j-th sampled
    * vector. Encoding picks, per subspace, the codeword maximizing
    * `dot(x_m, c) − |c|²/2` — the L2-nearest codeword — via the native
    * `PqEncode` kernel (graft.functions): one codegen'd plan node whose
    * codebook rides as a reference object, instead of an argmax tree of
    * subspaces × codewords literal arrays whose ~2k-node plan costs more
    * in the optimizer than the arithmetic costs at runtime. No join, no
    * shuffle of the corpus.
    *
    * Shuffle profile: corpus is scanned once into (id, norm, codes);
    * queries (tiny) are broadcast with their LUTs; ADC scoring is a
    * per-row fold over numSubspaces lookups; one window per query ranks
    * candidates. Raw vectors travel only for the candidate pool
    * (re-rank join by id), O(queries · k · rerankFactor) rows.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, queryIdCol: String,
             k: Int = 10, numSubspaces: Int = 8, codebookSize: Int = 16,
             rerankFactor: Int = 4, dim: Int = 64): DataFrame = {
    require(dim % numSubspaces == 0,
      s"dim $dim must divide into $numSubspaces subspaces")
    // deterministic codeword donors: md5-rank sample, j = id-sorted rank
    val codebook: Seq[Seq[Double]] =
      donorSample(corpus, idCol, vecCol, codebookSize).toSeq.map(_._2.toSeq)
    require(codebook.nonEmpty,
      "PQ codebook sample is empty — corpus has no non-null (id, vector) rows")

    import graft.functions.PqFunctions
    val corpusCodes = corpus.select(
      col(idCol).as("neighbor_id"),
      norm(col(vecCol)).as("c_norm"),
      PqFunctions.pqEncode(col(vecCol), codebook, numSubspaces).as("codes"))

    val q = broadcast(queries.select(
      col(queryIdCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_norm"),
      PqFunctions.pqLut(col(vecCol), codebook, numSubspaces).as("luts")))

    // ADC approximate cosine: sum of LUT entries at each subspace's code,
    // normalized by the EXACT norms (|q| constant per query; |x| stored) —
    // keeps candidate ranking aligned with the exact cosine re-rank
    val adcDot = aggregate(
      zip_with(col("codes"), col("luts"),
        (c, lutRow) => element_at(lutRow, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val approxCos = when(col("q_norm") * col("c_norm") > 0,
      adcDot / (col("q_norm") * col("c_norm"))).otherwise(lit(0.0))

    val pool = k * rerankFactor
    val cw = Window.partitionBy("query_id")
      .orderBy(desc("approx_cos"), asc("neighbor_id"))
    val cands = corpusCodes.join(q.select("query_id", "q_norm", "luts"))
      .select(col("query_id"), col("neighbor_id"), approxCos.as("approx_cos"))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= pool)
      .select("query_id", "neighbor_id")

    // exact re-rank of the candidate pool on true vectors
    val corpusVecs = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("c_vec"), norm(col(vecCol)).as("c_norm"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    cands
      .join(corpusVecs, "neighbor_id")
      .join(broadcast(queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_norm"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosinePrenormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm")).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** LSH near-pair candidates within one table (for Dedup verify stages):
    * rows sharing a bucket. One shuffle on (bucket), pairwise only within
    * buckets.
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, vecCol: String,
                        bits: Int = 0, dim: Int = 64,
                        seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(dim,
      resolveBits(df, idCol, bits, "lshCandidatePairs"), seed)
    val withBucket = df.select(col(idCol), col(vecCol))
      .withColumn("bucket", lshBucket(col(vecCol), planes))
      .withColumn("nrm", norm(col(vecCol)))
    val a = withBucket.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"), col("nrm").as("n_a"))
    val b = withBucket.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"), col("nrm").as("n_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosinePrenormed(col("v_a"), col("v_b"), col("n_a"), col("n_b")).as("cosine"))
      .distinct()
  }
  // -------------------------------------------- embedding transformations

  /** Deterministic Gaussian projection matrix for [[randomProject]]:
    * outDim × inDim, seeded, scaled by 1/√outDim so expected norms (and
    * pairwise distances, per Johnson–Lindenstrauss) are preserved.
    */
  def projectionMatrix(inDim: Int, outDim: Int, seed: Long): Array[Array[Double]] = {
    // same seeded draw order as the LSH planes — ONE RNG convention for
    // every deterministic matrix (the q86 oracle inlines these values);
    // only the 1/sqrt(outDim) JL scale differs
    val scale = 1.0 / math.sqrt(outDim)
    hyperplanes(dim = inDim, bits = outDim, seed).map(_.map(_ * scale))
  }

  /** Random projection of an embedding column to `outDim` dimensions —
    * the dimensionality lever that composes with every ANN path (project
    * 64→16 before LSH/PQ/brute force: 4× less vector IO and arithmetic
    * for a JL-bounded distance distortion). One native MatVec plan node
    * (matrix rides as a reference object); per-row math in the scan
    * stage, no shuffle, deterministic for a fixed seed.
    */
  def randomProject(vec: Column, inDim: Int, outDim: Int,
                    seed: Long = 42L): Column = {
    require(outDim > 0 && inDim > 0, s"dims must be positive: $inDim -> $outDim")
    VectorFunctions.matVec(vec,
      projectionMatrix(inDim, outDim, seed).toSeq.map(_.toSeq))
  }

  /** Per-vector symmetric int8 quantization: scale = 127 / max|x|, slots
    * rounded to [-127, 127]. The memory lever for 100 TB ANN — a 64-dim
    * float vector (256 B) becomes 64 B + one double, and int8 dot products
    * are SIMD-friendly on any hardware. All arithmetic is
    * correctly-rounded IEEE (abs, max, divide, multiply, half-up round),
    * so quantized vectors are bit-identical across engines.
    *
    * Emits `scale` (double) and `qvec` (array<int>); zero vectors get
    * scale 0 and all-zero slots.
    */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   scaleOut: String = "scale", vecOut: String = "qvec"): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    // scale MUST be staged as its own projection before the quantize
    // lambda references it: inlining the array_max tree into the lambda
    // body re-evaluates the max once PER ELEMENT (dim+1 array scans per
    // row instead of one). Because the staged column is consumed twice
    // (output + lambda), CollapseProject keeps the stage separate and the
    // lambda sees a cheap bound reference.
    df.withColumn(scaleOut,
        when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0)))
      .withColumn(vecOut,
        transform(col(vecCol), x => round(x.cast("double") * col(scaleOut)).cast("int")))
  }

  /** Per-group element-wise centroid of an embedding column: posexplode →
    * one (group, dim) hash aggregate → re-assembled in dim order. Sums go
    * through DECIMAL so the result is independent of partition/order
    * (a double sum would drift with parallelism); the mean is one double
    * division at the end. Shuffle profile: rows x dim skinny (group, dim,
    * value) triples — the transpose trick that turns an array mean into a
    * plain aggregate Catalyst already knows how to do at scale.
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(groupCol, "pos")
      // float → double first (exact widening, identical everywhere), THEN
      // decimal: a direct float→decimal cast is repr-dependent — engines
      // that shorten via the float's decimal string can round the 8th
      // place differently than ones that widen through the double
      .agg((sum(col("x").cast("double").cast("decimal(28,8)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(groupCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Shared tail of the cross-table joins: exact cosine on the matched
    * (query, candidate) pairs, then per-query top-k through the bounded
    * `TopKAgg` heap (id negated so the heap's (score, id) DESC order
    * tie-breaks to the SMALLEST neighbor id — the q54 idiom), exploded to
    * (query_id, neighbor_id, cosine, rank).
    */
  /** Hard-negative mining — the batch-construction step of contrastive
    * embedding training (and of retrieval-model distillation): for each
    * anchor, the k corpus vectors MOST similar to it among those with a
    * DIFFERENT label. Random negatives are trivially separable and
    * teach nothing; the near-boundary ones here are where the loss
    * actually moves. The exclusion runs BEFORE ranking, as it must —
    * top-k-then-filter would return fewer than k negatives whenever
    * same-label neighbors crowd the head.
    *
    * Plan shape: anchors (+their labels) broadcast; the corpus is
    * scanned, never shuffled, and ranking is the bounded per-query
    * k-heap (TopKAgg), not a window over scored pairs. The anchor set
    * is the batch being trained — small by construction; an
    * all-vs-all mining pass routes through the IVF join family
    * instead.
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    anchorIdCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = broadcast(anchors
      .filter(col(anchorIdCol).isNotNull && col(vecCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(anchorIdCol).as("query_id"), col(vecCol).as("q_vec"),
        norm(col(vecCol)).as("q_norm"), col(labelCol).as("__q_label")))
    val matched = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_norm"), col(labelCol).as("__c_label"))
      .join(a) // broadcast nested-loop: corpus never shuffles
      .filter(col("__c_label") =!= col("__q_label"))
    heapTopKPerQuery(k)(matched)
  }

  private def heapTopKPerQuery(k: Int)(matched: DataFrame): DataFrame =
    matched
      .select(col("query_id"),
        cosinePrenormed(col("q_vec"), col("c_vec"), col("q_norm"), col("c_norm"))
          .as("cosine"),
        col("neighbor_id"))
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg.column(k, col("cosine"), -col("neighbor_id"))
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("query_id"), (-col("s.id")).as("neighbor_id"),
        col("s.score").as("cosine"), (col("i") + 1).cast("int").as("rank"))

  /** Embedding-space benchmark decontamination — the semantic companion
    * of [[Dedup.benchmarkDecontaminate]]'s n-gram form: drop every corpus
    * row whose embedding has cosine >= `tau` against ANY reference
    * (benchmark / test-set) vector. A paraphrased test question shares no
    * 8-gram with the original but sits beside it in embedding space; this
    * is the published mitigation (surface-form AND semantic overlap
    * filters).
    *
    * EXACT, scan-only: the reference side is benchmark-sized by
    * definition, so its vectors are collected once (driver-bounded the
    * same way the IVF centroid sets are) and fused into the
    * [[graft.functions.MaxCosine]] codegen kernel — the corpus is
    * filtered in place: no join, no shuffle, the corpus never moves, and
    * the kernel short-circuits per reference row only on NaN. Cost is
    * O(|corpus| x |refs| x dim) multiply-adds in the scan — at 100 TB
    * that is the SAME per-row work a broadcast nested-loop join would do,
    * minus the join machinery. For reference sets too large to ship as a
    * kernel constant (not a benchmark any more), use [[ivfTopKJoin]]
    * candidates + an exact `vecCosine` re-check instead.
    *
    * Rows with a null embedding are KEPT (unknown similarity is not
    * evidence of contamination — mirror of the null-text stances).
    * Returns the corpus rows that survive, original schema, plus the
    * max-cosine evidence column `max_ref_cosine`.
    *
    * CONTRACT: `refs` must be driver-sized — at most `maxRefVectors`
    * non-null vectors (default 1,000,000: ~1 GB of driver heap at
    * dim=128 doubles, far above any benchmark suite). The guard counts
    * BEFORE collecting, so a caller that points this at a corpus-sized
    * "reference" fails with a named error instead of an OOM; such
    * callers should use [[ivfTopKJoin]] / [[lshTopKJoin]] candidates
    * plus an exact `vecCosine` re-check.
    */
  def semanticDecontaminate(corpus: DataFrame, refs: DataFrame,
                            vecCol: String, refVecCol: String,
                            tau: Double,
                            maxRefVectors: Long = 1000000L): DataFrame = {
    require(tau > 0.0, s"tau must be positive, got $tau")
    val nRefs = refs.filter(col(refVecCol).isNotNull).count()
    require(nRefs <= maxRefVectors,
      s"semanticDecontaminate collects the reference side to the driver; " +
        s"$nRefs non-null reference vectors exceed maxRefVectors=" +
        s"$maxRefVectors. A reference this large is not a benchmark — " +
        "use ivfTopKJoin/lshTopKJoin + exact vecCosine re-check instead")
    val refVecs: Seq[Seq[Double]] = refs
      .filter(col(refVecCol).isNotNull).select(col(refVecCol)).collect()
      .map(_.getSeq[Any](0).map(v =>
        if (v == null) 0.0 else v.asInstanceOf[Number].doubleValue()).toSeq)
      .toSeq
    require(refVecs.nonEmpty, "reference set has no non-null vectors")
    corpus
      .withColumn("max_ref_cosine",
        when(col(vecCol).isNotNull,
          VectorFunctions.maxCosine(col(vecCol), refVecs))
          .otherwise(lit(Double.NegativeInfinity)))
      .filter(col("max_ref_cosine") < tau)
  }

  /** The cross-table joins ride neighbor ids through the bounded heap as
    * LONGs: a fractional or decimal id would be silently truncated into a
    * nonexistent id (2.1 and 2.9 collapse to 2), so only integral right
    * ids are accepted — hash non-integral ids to a surrogate first.
    */
  private def requireIntegralRightId(right: DataFrame, rightIdCol: String,
                                     op: String): Unit = {
    import org.apache.spark.sql.types._
    val ok = right.schema(rightIdCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"$op requires an integral right id; '$rightIdCol' is " +
      s"${right.schema(rightIdCol).dataType} — hash non-integral ids to a " +
      "surrogate (e.g. xxhash64) first")
  }
}
