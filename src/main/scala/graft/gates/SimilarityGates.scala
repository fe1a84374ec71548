package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — embedding/ANN family: brute-force, LSH, IVF, PQ, semantic joins, PCA/spectral, k-means and cluster diagnostics.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object SimilarityGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext similarity — exact brute-force cosine top-k (ANN baseline).
    "q15_ann_bruteforce" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.bruteForceTopK(em, qs, "vec_id", "embedding", "query_id", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // ext similarity — LSH-bucketed ANN (scale path). Oracle-checked: the
    // generated LshAnnOracle inlines the hyperplane constants and
    // replicates buckets, multi-probe, and ranking.
    "q16_ann_lsh" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      Similarity.lshTopK(em, qs, "vec_id", "embedding", "query_id",
          k = 10, bits = 10, dim = 64)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // ext similarity — IVF (inverted-file) ANN scale path. Oracle-checked:
    // the generated IvfAnnOracle replicates centroid sampling, Voronoi
    // assignment, and nprobe ranking; recall vs brute force in ScalaTest.
    "q28_ann_ivf" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      ext.Similarity.ivfTopK(em, qs, "vec_id", "embedding", "query_id",
          k = 10, numCells = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // ext similarity — INCREMENTAL IVF index maintenance (the streaming
    // sibling of the semantic-join family): the coarse quantizer is
    // built ONCE from the initial corpus and FROZEN; a new batch appends
    // by per-row assignment only (no rebuild, existing postings never
    // move); search probes the unioned postings and must surface the
    // appended vectors. `from_append` marks batch-sourced neighbors —
    // the searchability evidence. The oracle replays the q28 chain with
    // centroids drawn from the INITIAL corpus only (the semantic
    // difference from a rebuild, which would re-sample from the union).
    "q268_ivf_incremental" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val initial = em.filter(col("vec_id") % 3 =!= 0)
      val batch = em.filter(col("vec_id") % 3 === 0)
      val cents = ext.Similarity.ivfCentroids(initial, "vec_id",
        "embedding", numCells = 16)
      val postings = ext.Similarity
        .ivfAssign(initial, "vec_id", "embedding", cents)
        .unionByName(
          ext.Similarity.ivfAssign(batch, "vec_id", "embedding", cents))
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      ext.Similarity.ivfSearchPostings(postings, qs, "query_id",
          "embedding", cents, k = 10, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (col("neighbor_id") % 3 === 0).as("from_append"))
        .orderBy("query_id", "rank")
    }),

    // ext similarity — drift-triggered IVF REBUILD, the third act of the
    // frozen-quantizer lifecycle (q268 append / q269 stream are the
    // second): the hottest-cell imbalance over the drifted index is the
    // SIGNAL (ivfCellStats ride-along), ivfRebuild re-samples the
    // quantizer from the union and reassigns every posting in one scan,
    // and recall@10 vs brute-force ground truth (the q263 harness) is
    // computed for BOTH indexes — non-regression shipped as data. The
    // oracle replays everything: old centroids from the initial corpus,
    // new centroids re-sampled from the full table (rebuild ≡ bulk
    // build on the union — assignment is a pure per-row function), both
    // recall chains, and the imbalance arithmetic.
    "q272_ivf_rebuild" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val initial = em.filter(col("vec_id") % 3 =!= 0)
      val batch = em.filter(col("vec_id") % 3 === 0)
      val centsOld = ext.Similarity.ivfCentroids(initial, "vec_id",
        "embedding", numCells = 16)
      val postingsOld = ext.Similarity
        .ivfAssign(initial, "vec_id", "embedding", centsOld)
        .unionByName(
          ext.Similarity.ivfAssign(batch, "vec_id", "embedding", centsOld))
      val imb = ext.Similarity.ivfCellStats(postingsOld, 16)
        .agg(max(col("imbalance")).as("imbalance_before"))
      val (centsNew, postingsNew) =
        ext.Similarity.ivfRebuild(postingsOld, numCells = 16)
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val exact = ext.Similarity.bruteForceTopK(em, qs, "vec_id",
        "embedding", "query_id", k = 10)
      val retOld = ext.Similarity.ivfSearchPostings(postingsOld, qs,
        "query_id", "embedding", centsOld, k = 10, nprobe = 2)
      val retNew = ext.Similarity.ivfSearchPostings(postingsNew, qs,
        "query_id", "embedding", centsNew, k = 10, nprobe = 2)
      val perOld = ext.Retrieval.annRecall(retOld, exact, "query_id",
        "neighbor_id", "rank", k = 10)
        .select(col("query"), col("recall_e6").as("recall_old_e6"))
      val perNew = ext.Retrieval.annRecall(retNew, exact, "query_id",
        "neighbor_id", "rank", k = 10)
        .select(col("query"), col("recall_e6").as("recall_new_e6"))
      val per = perOld.join(perNew, Seq("query"))
      val macros = per.agg(
        (sum(col("recall_old_e6")).cast("double") /
          (count(lit(1)) * 1000000L).cast("double")).as("macro_recall_old"),
        (sum(col("recall_new_e6")).cast("double") /
          (count(lit(1)) * 1000000L).cast("double")).as("macro_recall_new"))
      per.crossJoin(broadcast(macros)).crossJoin(broadcast(imb))
        .select(col("query"), col("recall_old_e6"), col("recall_new_e6"),
          col("macro_recall_old"), col("macro_recall_new"),
          col("imbalance_before"),
          (col("macro_recall_new") >= col("macro_recall_old"))
            .as("recall_non_regressed"))
        .orderBy("query")
    }),

    // ext similarity — PQ (product-quantization) ANN: per-subspace codes +
    // ADC lookup-table scoring, exact re-rank of the candidate pool.
    // Oracle-checked: the generated PqAnnOracle derives the SAME
    // md5-rank-sampled codebook from the table and replicates encoding, LUT
    // scoring, candidate pool, and re-rank; recall vs brute force in
    // ScalaTest.
    "q80_ann_pq" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      ext.Similarity.pqTopK(em, qs, "vec_id", "embedding", "query_id",
          k = 10, numSubspaces = 8, codebookSize = 16, rerankFactor = 4,
          dim = 64)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // ext similarity+retrieval — ANN recall@k harness: the IVF index at
    // nprobe=2 evaluated against the brute-force exact top-10 as ground
    // truth (rankEval composition — recall_e6 is the dial the index's
    // nprobe/numCells are tuned by; ndcg_e6 additionally scores order
    // fidelity). Macro recall rides along from the integer-scaled
    // per-query recalls: an exact BIGINT sum over queries, one final
    // double division — order-free and bit-replayable.
    "q263_ann_recall" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val exact = Similarity.bruteForceTopK(em, qs, "vec_id",
        "embedding", "query_id", k = 10)
      val approx = Similarity.ivfTopK(em, qs, "vec_id", "embedding",
        "query_id", k = 10, numCells = 16, nprobe = 2)
      val per = Retrieval.annRecall(approx, exact, "query_id",
        "neighbor_id", "rank", k = 10)
      val macroAvg = per.agg(sum(col("recall_e6")).as("__s"),
          count(lit(1)).as("__n"))
        .select((col("__s").cast("double") /
          (col("__n") * 1000000L).cast("double")).as("macro_recall"))
      per.crossJoin(broadcast(macroAvg))
        .select(col("query"), col("n_retrieved"), col("n_relevant"),
          col("hits"), col("recall_e6"), col("ndcg_e6"),
          col("macro_recall"))
        .orderBy("query")
    }),

    // ext similarity — int8 embedding quantization (the 4x memory lever
    // for ANN at scale); all arithmetic correctly-rounded IEEE, so
    // quantized vectors are bit-identical across engines.
    "q52_embed_quantize" -> ((s, dir) => {
      ext.Similarity.quantizeInt8(tbl(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("scale"),
          // CSV-serialized for the comparator (pandas can't sort array
          // cells); the int8 codes themselves are what's being gated
          array_join(col("qvec").cast("array<string>"), ",").as("qvec"))
        .orderBy("vec_id")
    }),

    // ext similarity — per-label element-wise centroids via the transpose
    // trick (posexplode → skinny hash aggregate → reassemble), decimal
    // sums for order-independence. Output is re-exploded to (label, pos, m)
    // scalars for the comparator; the centroid assembly is still exercised.
    "q53_embed_centroids" -> ((s, dir) => {
      ext.Similarity.groupCentroids(tbl(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"), posexplode(col("centroid")).as(Seq("pos", "m")))
        .select(col("label"), (col("pos") + 1).cast("long").as("pos"), col("m"))
        .orderBy("label", "pos")
    }),

    // ext similarity — IVF twin of q99: the clustered-space form of the
    // cross-table join, cells from a deterministic right-side centroid
    // sample, per-row kernel assignment on BOTH large sides.
    "q102_ivf_semantic_join" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      ext.Similarity.ivfTopKJoin(
          emb.filter(col("vec_id") % 7 === 2),
          emb.filter(col("vec_id") % 7 =!= 2),
          "vec_id", "vec_id", "embedding",
          k = 5, numCells = 16, nprobe = 3)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ext similarity — PQ-coded IVF semantic join: the right side rides
    // the cell join as (cell, norm, PQ codes) — no raw vectors — with
    // ADC lookup scoring and a bounded-heap candidate pool; only the
    // pool re-ranks on true vectors, so the oracle (cells + codes +
    // LUTs + pool + exact re-rank in SQL) is exact.
    "q106_ivf_pq_semantic_join" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      ext.Similarity.ivfPqTopKJoin(
          emb.filter(col("vec_id") % 7 === 2),
          emb.filter(col("vec_id") % 7 =!= 2),
          "vec_id", "vec_id", "embedding",
          k = 5, numCells = 16, nprobe = 3,
          numSubspaces = 8, codebookSize = 8, rerankFactor = 4,
          dim = 64)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ext similarity — cross-table semantic join: BOTH sides large (no
    // broadcastable query set), bucket equi-join + bounded-heap top-k per
    // query; oracle replicates the hyperplane buckets, probes, cosine,
    // and rank in SQL (deterministic: fixed seed, total order).
    "q99_semantic_join" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      ext.Similarity.lshTopKJoin(
          emb.filter(col("vec_id") % 5 === 1),
          emb.filter(col("vec_id") % 5 =!= 1),
          "vec_id", "vec_id", "embedding",
          k = 5, bits = 10, dim = 64, seed = 42L)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // ext similarity — deterministic random projection (JL): 64 → 16 dims
    // through one native mat_vec node; exploded to scalar rows so the
    // oracle compares raw doubles (the generated oracle inlines the same
    // seeded matrix at full double precision).
    "q86_random_projection" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      em.select(col("vec_id"),
          posexplode(ext.Similarity.randomProject(col("embedding"), 64, 16))
            .as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    }),

    // ext text — hashing-trick featurization in the sparse (id, dim, n)
    // form; the gate swaps the production xxhash64 bucketing for a
    // portable arithmetic hash (length/ascii math) both engines compute
    // identically — same plan, same shuffle, replayable buckets.
    "q169_feature_hashing" -> ((s, dir) => {
      val portable = (t: Column) =>
        ((length(t) * 7 + ascii(substring(t, 1, 1)) * 31
          + ascii(substring(concat(t, lit("_")), 2, 1))) % 32).cast("int")
      ext.TextStats.hashedTermCounts(
          tbl(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", dims = 32, hashDim = Some(portable))
        .orderBy("doc_id", "dim")
    }),

    // ext pca — the distributed half of PCA: exact-integer d×d second
    // moments in ONE pass with map-side combine (per-partition long
    // accumulator; vectors never shuffle — only ≤ partitions·d²/2 skinny
    // triples do). Terms are floored to e12 BEFORE summing, so the
    // BIGINT sums are order-free and the oracle replays them exactly.
    "q178_embed_moments" -> ((s, dir) => {
      ext.Pca.momentMatrix(tbl(s, dir, "embeddings"), "embedding")
        .orderBy("i", "j")
    }),

    // ext pca — full fit + project through a CLOSED-FORM fixture (the
    // q107 DC-only-JPEG pattern): vectors live on single coordinate
    // axes in exact ± pairs, so the mean is exactly 0, the covariance
    // is exactly diagonal with strictly-descending per-axis variance
    // (magnitude 8−axis; ≥62 pairs per axis at every sf), Jacobi
    // converges with ZERO rotations to the identity eigenbasis, and the
    // k=4 projection is exactly the first 4 coordinates — every number
    // the oracle can replay in closed form. The whole distributed path
    // (moment matrix, decimal mean, eigensolve, Cx−Cμ scan) executes
    // for real; general-input numerics stay pinned by PcaSpec.
    "q179_pca_project" -> ((s, dir) => {
      val d = 8
      val fix = tbl(s, dir, "embeddings")
        .filter(col("vec_id").isNotNull)
        .select(col("vec_id"), explode(array(lit(1), lit(-1))).as("sgn"))
        .withColumn("__axis", pmod(col("vec_id"), lit(d.toLong)).cast("int"))
        .withColumn("embedding",
          transform(sequence(lit(0), lit(d - 1)), i =>
            when(i === col("__axis"),
              col("sgn").cast("double") * (lit(d) - col("__axis")))
              .otherwise(lit(0.0))))
      val model = ext.Pca.fit(fix, "embedding", k = 4)
      val withRowId = fix.withColumn("row_id",
        col("vec_id") * 2L + when(col("sgn") === 1, 1L).otherwise(0L))
      ext.Pca.project(withRowId, "row_id", "embedding", model)
        .select(col("row_id"),
          array_join(transform(col("projection"),
            x => round(x * 1000).cast("long")), ",").as("proj_e3"))
        .orderBy("row_id")
    }),

    // ext spectral — frame-wise FFT magnitude features over REAL PCM WAV
    // bytes (in-repo radix-2 Cooley–Tukey inside the decoder batch
    // walk), driven through a CLOSED-FORM two-tone fixture (the q107
    // pattern): x_n = M + A·cos(πn/2) + B·(−1)^n is exactly integer-
    // valued (bins N/4 and N/2 are the only ones whose sampled cosines
    // are), so |X16| = 32A, |X32| = 64B, every other non-DC bin is 0 —
    // peak bin, the e6 centroid floor(1e6·(16A+64B)/(A+2B)) and the
    // time-domain energy all have exact closed forms the oracle
    // replays. (A,B) pairs keep A+2B = 13 with 13 ∤ the e6 numerator,
    // so the exact value sits ≥ 1/13 from any floor boundary — 10
    // orders of magnitude beyond FFT double noise. A ≠ 2B avoids
    // peak-bin ties; pair (5,4) puts the peak at the Nyquist bin.
    // General-input numerics stay pinned by SpectralSpec (naive DFT ≡,
    // Parseval, known square waves).
    "q185_spectral" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val ab = Array((7, 3), (9, 2), (5, 4), (11, 1))
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val (a, b) = ab((id % 4).toInt)
          val m = (id % 5).toInt
          val pcm = Array.tabulate(256) { n =>
            val cosTerm = (n % 4) match {
              case 0 => a; case 2 => -a; case _ => 0
            }
            val nyq = if (n % 2 == 0) b else -b
            m + cosTerm + nyq
          }
          ext.Multimodal.Asset(id, "audio",
            ext.Multimodal.makeWavFromPcm(pcm))
        }
      ext.Spectral.wavSpectral(assets, frameSamples = 64).toDF()
        .select(col("asset_id").as("doc_id"), col("frame_idx"),
          col("n_in_frame"), col("energy"), col("peak_bin"),
          col("centroid_e6"))
        .orderBy("doc_id", "frame_idx")
    }),

    // ext similarity — hard-negative mining for contrastive training:
    // per anchor the k most-similar DIFFERENT-label vectors, exclusion
    // before ranking, broadcast anchors + bounded k-heaps (the corpus
    // never shuffles). The oracle replays the label-filtered cosine
    // ranking over the cross product.
    "q195_hard_negatives" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val anchors = em.filter(col("vec_id") < 8)
      ext.Similarity.hardNegatives(em, anchors,
          "vec_id", "embedding", "label", "vec_id", k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),

    // ext clustering — distributed Lloyd k-means, FULLY oracle-replayed
    // (no fixture needed): md5-rank donors in id order, exact-L2
    // assignment via the one-subspace PqEncode kernel (dot − |c|²/2,
    // ties to the lowest index), decimal-exact per-(cluster, dim) mean
    // updates — every number in both Lloyd rounds is a pure
    // deterministic function of the table, so the oracle re-runs the
    // whole fit in nested CTEs.
    "q213_kmeans" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val model = ext.KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      ext.KMeans.assign(emb, "vec_id", "embedding", model)
        .orderBy("vec_id")
    }),

    // ext capstone — diversity-balanced mixture: k-means clusters the
    // embedding space, then each CLUSTER gets the same exact char
    // budget (the q108 two-phase fill keyed by cluster instead of
    // language) — the "don't let one topic dominate the mix" sampler.
    // Chained oracle: the full Lloyd replay feeds the budget window.
    "q214_cluster_balanced_mix" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val model = ext.KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      val assigned = ext.KMeans.assign(emb, "vec_id", "embedding", model)
      val joined = assigned
        .join(tbl(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          assigned("vec_id") === col("doc_id"))
        .select(col("doc_id"), col("cluster"), col("n_chars"))
      ext.Sampling.tokenBudgetPerGroup(joined, "doc_id", "cluster",
          "n_chars", budget = 8000L)
        .select("doc_id", "cluster", "n_chars")
        .orderBy("doc_id")
    }),

    // ext clustering — simplified silhouette over the q213 fit: per
    // point, own-centroid vs nearest-other-centroid L2 in one fixed
    // shape, e6-floored, per-cluster integer means. Chained oracle:
    // the Lloyd CTEs feed the distance audit.
    "q219_kmeans_silhouette" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val model = ext.KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      ext.KMeans.silhouette(emb, "vec_id", "embedding", model)
        .orderBy("cluster")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q16_ann_lsh" -> LshAnnOracle,

    "q28_ann_ivf" -> IvfAnnOracle,

    "q268_ivf_incremental" -> IvfIncrementalOracle,

    "q272_ivf_rebuild" -> IvfRebuildOracle,

    "q263_ann_recall" -> AnnRecallOracle,

    "q80_ann_pq" -> PqAnnOracle,

    "q86_random_projection" -> RandomProjectionOracle,

    "q99_semantic_join" -> SemanticJoinOracle,

    "q102_ivf_semantic_join" -> IvfSemanticJoinOracle,

    "q106_ivf_pq_semantic_join" -> IvfPqSemanticJoinOracle,

    "q15_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.qv, e.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM q CROSS JOIN embeddings e)
        |SELECT query_id, neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 10""".stripMargin,

    "q52_embed_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale
        |  FROM m)
        |SELECT vec_id, scale,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * scale) AS INT)), ',') AS qvec
        |FROM s
        |ORDER BY vec_id""".stripMargin,

    "q53_embed_centroids" ->
      """SELECT label, CAST(pos AS BIGINT) AS pos,
        |  CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,8))) AS DOUBLE) / count(*) AS m
        |FROM (
        |  SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS x
        |  FROM embeddings)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    // the same portable bucketing over exploded terms
    "q169_feature_hashing" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |SELECT doc_id,
        |  CAST((length(term) * 7 + ascii(substr(term, 1, 1)) * 31
        |    + ascii(substr(term || '_', 2, 1))) % 32 AS INT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE term <> ''
        |GROUP BY doc_id, dim
        |ORDER BY doc_id, dim""".stripMargin,

    // the floor-then-sum moment replay: float→double widening and the
    // (xi·xj)·1e12 product association mirror the engine exactly
    "q178_embed_moments" ->
      """WITH v AS (
        |  SELECT embedding AS e FROM embeddings WHERE embedding IS NOT NULL),
        |t AS (
        |  SELECT CAST(u.i AS INT) AS i, CAST(w.j AS INT) AS j,
        |    CAST(floor((e[u.i + 1]::DOUBLE * e[w.j + 1]::DOUBLE)
        |      * 1000000000000.0) AS BIGINT) AS term
        |  FROM v,
        |    unnest(generate_series(0, 63)) AS u(i),
        |    unnest(generate_series(0, 63)) AS w(j)
        |  WHERE w.j >= u.i)
        |SELECT i, j, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(term) AS BIGINT) AS s2_e12
        |FROM t GROUP BY i, j
        |ORDER BY i, j""".stripMargin,

    // closed-form fixture replay: axis = vec_id % 8, magnitude 8−axis,
    // ± pairs → identity eigenbasis, projection = first 4 coordinates
    "q179_pca_project" ->
      """WITH ids AS (
        |  SELECT vec_id, vec_id % 8 AS axis
        |  FROM embeddings WHERE vec_id IS NOT NULL),
        |r AS (
        |  SELECT vec_id, axis, s.sgn
        |  FROM ids, (VALUES (1), (-1)) AS s(sgn))
        |SELECT CAST(vec_id * 2 + CASE WHEN sgn = 1 THEN 1 ELSE 0 END
        |    AS BIGINT) AS row_id,
        |  CAST(CASE WHEN axis = 0 THEN sgn * 8000 ELSE 0 END AS VARCHAR)
        |  || ',' ||
        |  CAST(CASE WHEN axis = 1 THEN sgn * 7000 ELSE 0 END AS VARCHAR)
        |  || ',' ||
        |  CAST(CASE WHEN axis = 2 THEN sgn * 6000 ELSE 0 END AS VARCHAR)
        |  || ',' ||
        |  CAST(CASE WHEN axis = 3 THEN sgn * 5000 ELSE 0 END AS VARCHAR)
        |    AS proj_e3
        |FROM r
        |ORDER BY row_id""".stripMargin,

    // closed-form two-tone replay: |X16| = 32A, |X32| = 64B, centroid
    // = (16A+64B)/(A+2B) exactly; energy is the time-domain Σs² of the
    // period-4 sample pattern
    "q185_spectral" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4 WHEN 0 THEN 7 WHEN 1 THEN 9 WHEN 2 THEN 5
        |      ELSE 11 END AS a,
        |    CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 4
        |      ELSE 1 END AS b,
        |    doc_id % 5 AS m
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id, CAST(f.i AS INT) AS frame_idx,
        |  CAST(64 AS INT) AS n_in_frame,
        |  CAST(16 * ((m+a+b)*(m+a+b) + 2*(m-b)*(m-b) + (m-a+b)*(m-a+b))
        |    AS BIGINT) AS energy,
        |  CAST(CASE WHEN 32*a > 64*b THEN 16 ELSE 32 END AS INT) AS peak_bin,
        |  CAST(((16*a + 64*b) * 1000000) // (a + 2*b) AS BIGINT)
        |    AS centroid_e6
        |FROM d, unnest(generate_series(0, 3)) AS f(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    // q15's cosine replay with the different-label cut applied BEFORE
    // the rank window — exactly the engine's exclusion-then-rank order
    "q195_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv, label AS ql
        |  FROM embeddings WHERE vec_id < 8 AND label IS NOT NULL),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.qv, e.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM q CROSS JOIN embeddings e
        |  WHERE e.label IS NOT NULL AND e.label <> q.ql)
        |SELECT query_id, neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 10
        |ORDER BY query_id, rank""".stripMargin,

    // both Lloyd rounds replayed: donors → assign → decimal means →
    // assign → decimal means → final assignment
    "q213_kmeans" ->
      s"""WITH $KMeansLloydCtes
         |SELECT vec_id, CAST(cl AS INT) AS cluster
         |FROM af
         |ORDER BY vec_id""".stripMargin,

    // chained oracle (the q191 pattern): the q213 Lloyd CTEs feed the
    // q108 budget-fill window partitioned by cluster
    "q214_cluster_balanced_mix" ->
      s"""WITH $KMeansLloydCtes
         |SELECT doc_id, cluster, n_chars FROM (
         |  SELECT d.doc_id, CAST(af.cl AS INT) AS cluster, d.n_chars,
         |    sum(d.n_chars) OVER (PARTITION BY af.cl
         |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM af JOIN documents d ON d.doc_id = af.vec_id
         |  WHERE d.n_chars IS NOT NULL AND d.n_chars >= 0)
         |WHERE cum <= 8000
         |ORDER BY doc_id""".stripMargin,

    // Lloyd CTEs feed the distance audit: dist_j = sqrt(max(|x|² −
    // 2·x·c_j + |c_j|², 0)) in the engine's exact shape, e6 floors,
    // floored integer means
    "q219_kmeans_silhouette" ->
      s"""WITH $KMeansLloydCtes,
         |dists AS (
         |  SELECT e.vec_id, c.j,
         |    sqrt(greatest(
         |      list_sum(list_transform(e.embedding,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
         |      - 2 * list_sum(list_transform(list_zip(e.embedding, c.c),
         |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |      + list_sum(list_transform(c.c,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0)) AS dd
         |  FROM e, c2 c),
         |ab AS (
         |  SELECT d.vec_id, af.cl,
         |    max(CASE WHEN d.j = af.cl THEN d.dd END) AS a,
         |    min(CASE WHEN d.j <> af.cl THEN d.dd END) AS b
         |  FROM dists d JOIN af USING (vec_id)
         |  GROUP BY d.vec_id, af.cl),
         |s6 AS (
         |  SELECT cl,
         |    CAST(floor((CASE WHEN greatest(a, b) > 0
         |      THEN (b - a) / greatest(a, b) ELSE 0.0 END) * 1e6) AS BIGINT)
         |      AS s6
         |  FROM ab)
         |SELECT CAST(cl AS INT) AS cluster,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(floor(CAST(sum(s6) AS DOUBLE) / count(*)) AS BIGINT)
         |    AS mean_sil_e6
         |FROM s6 GROUP BY cl
         |ORDER BY cluster""".stripMargin,
  )
}
