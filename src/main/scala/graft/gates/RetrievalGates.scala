package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — retrieval & eval: fusion (RRF/hybrid), rank metrics (nDCG/MRR/MAP/AUC/kappa), MMR, PRF/RM3, interleaving.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object RetrievalGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext eval — exact tie-aware ROC AUC of the quality score against
    // the lang=='en' label, computed over the score VOCABULARY (the
    // distinct quality values), never a corpus-wide rank. Ties get the
    // Mann-Whitney half credit; auc_e6 is an exact integer.
    "q170_auc" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(ext.TextStats.qualityScore(col("text")).as("score"),
          (col("lang") === "en").as("label"))
      ext.TextStats.aucExact(d, "score", "label")
    }),

    // ext eval — Cohen's kappa between the marker langId heuristic and
    // the table's lang column: exact confusion-mass integers and one
    // final double division. The oracle replays the full langId argmax.
    "q171_kappa" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(ext.TextStats.langId(col("text")).as("lang_pred"),
          col("lang"))
      ext.TextStats.cohensKappa(d, "lang_pred", "lang")
    }),

    // ext eval — calibration reliability bins for the quality score
    // against the lang=='en' label: equal-width bins, exact-integer
    // positive rate and floor-e6 mean score per bin.
    "q172_calibration" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(ext.TextStats.qualityScore(col("text")).as("score"),
          (col("lang") === "en").as("label"))
      ext.TextStats.calibrationBins(d, "score", "label", bins = 10)
        .orderBy("bin")
    }),

    // ext retrieval — reciprocal-rank fusion of two retriever runs over
    // the same corpus: length-normalized (cosine) vs raw inner-product
    // ranking, the classic pair that disagrees exactly where vector
    // norms vary. RRF contributions are pre-scaled integer `div`s, so
    // fused scores are exact BIGINT sums in both engines.
    "q227_rrf_fusion" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val runCos = Similarity.bruteForceTopK(em, qs, "vec_id", "embedding",
          "query_id", k = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          lit("cosine").as("run"))
      val runDot = Similarity.bruteForceTopKDot(em, qs, "vec_id",
          "embedding", "query_id", k = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          lit("dot").as("run"))
      Retrieval.rrf(runCos.union(runDot), "query_id", "neighbor_id",
          "rank", "run", k = 10)
        .orderBy("query", "rank")
    }),

    // ext retrieval — ranking-quality eval (recall@k, binary-gain
    // nDCG@k) of the exact cosine retriever against label-match
    // judgments. The log2 discounts are integers precomputed ONCE
    // (`Retrieval.discountsE9`) and inlined into both engines, so DCG
    // sums and the final `div`-scaled metrics are bit-exact.
    "q228_rank_eval" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
      val retrieved = Similarity.bruteForceTopK(em,
        qs.select("query_id", "embedding"), "vec_id", "embedding",
        "query_id", k = 10)
      val judgments = qs.select(col("query_id"), col("label"))
        .join(em.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("label"))
        .select("query_id", "neighbor_id")
      Retrieval.rankEval(retrieved, judgments, "query_id", "neighbor_id",
          "rank", k = 10)
        .orderBy("query")
    }),

    // ext retrieval — GRADED nDCG@k (exponential gains 2^rel − 1): the
    // judgment grades are deterministic from the data (2 for a
    // same-parity label match, 1 otherwise), discount constants are
    // 1e6-scaled integers inlined into both engines, and the ideal
    // ranking is a per-query sort of the judgment set — every sum an
    // exact BIGINT.
    "q229_graded_ndcg" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
      val retrieved = Similarity.bruteForceTopK(em,
        qs.select("query_id", "embedding"), "vec_id", "embedding",
        "query_id", k = 10)
      val judgments = qs.select(col("query_id"), col("label"))
        .join(em.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("label"))
        .select(col("query_id"), col("neighbor_id"),
          when(col("neighbor_id") % 2 === col("query_id") % 2, lit(2))
            .otherwise(lit(1)).as("rel"))
      Retrieval.rankEvalGraded(retrieved, judgments, "query_id",
          "neighbor_id", "rank", "rel", k = 10)
        .orderBy("query")
    }),

    // ext retrieval — MRR + truncated MAP@k of the exact cosine
    // retriever against label-match judgments: first-hit ranks and
    // 1e9-pre-scaled precision terms make both metrics pure BIGINT
    // arithmetic, replayed by the oracle with the same floors.
    "q230_mrr_map" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
      val retrieved = Similarity.bruteForceTopK(em,
        qs.select("query_id", "embedding"), "vec_id", "embedding",
        "query_id", k = 10)
      val judgments = qs.select(col("query_id"), col("label"))
        .join(em.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("label"))
        .select("query_id", "neighbor_id")
      Retrieval.rankEvalRanks(retrieved, judgments, "query_id",
          "neighbor_id", "rank", k = 10)
        .orderBy("query")
    }),

    // ext retrieval — HYBRID lexical fusion: per query term, a BM25
    // ranking (length-normalized) and a raw term-frequency ranking (the
    // lexical twin of q227's cosine-vs-dot pair — the two disagree
    // exactly where document length varies), RRF-fused. Pure
    // composition of gated operators: TextStats.bm25PerTerm supplies
    // both scores in one pass, Retrieval.rrf fuses; the oracle replays
    // q68's BM25 CTEs plus the integer fusion.
    "q231_hybrid_retrieval" -> ((s, dir) => {
      val bm = TextStats.bm25PerTerm(tbl(s, dir, "documents"), "doc_id",
        "text", Seq("hash", "merge", "scan"))
      val wS = Window.partitionBy("term").orderBy(desc("score"), asc("doc_id"))
      val runBm = bm.withColumn("rank", row_number().over(wS))
        .filter(col("rank") <= 20)
        .select(col("term"), col("doc_id"), col("rank"),
          lit("bm25").as("run"))
      val wT = Window.partitionBy("term").orderBy(desc("tf"), asc("doc_id"))
      val runTf = bm.withColumn("rank", row_number().over(wT))
        .filter(col("rank") <= 20)
        .select(col("term"), col("doc_id"), col("rank"), lit("tf").as("run"))
      Retrieval.rrf(runBm.union(runTf), "term", "doc_id", "rank", "run",
          k = 10)
        .orderBy("query", "rank")
    }),

    // ext retrieval — MMR diversified re-rank of the exact cosine
    // pool: five greedy rounds (fixed-iteration, the q213 stance) of
    // argmax λ·rel − (1−λ)·max-sim-to-selected with λ = 0.75 (dyadic,
    // so 1−λ is the exact double 0.25 in BOTH engines); pool pair sims
    // are the proven-exact cosine kernel, so every score comparison
    // replays bit-for-bit in the oracle's unrolled rounds.
    "q232_mmr_rerank" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val qs = em.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val cand = Similarity.bruteForceTopK(em, qs, "vec_id", "embedding",
          "query_id", k = 20)
        .join(em.select(col("vec_id").as("neighbor_id"), col("embedding")),
          Seq("neighbor_id"))
      Retrieval.mmrRerank(cand, "query_id", "neighbor_id", "cosine",
          "embedding", k = 5)
        .orderBy("query", "mmr_rank")
    }),

    // ext retrieval — RM3 pseudo-relevance-feedback expansion: each
    // term-query's BM25 top-10 docs vote expansion terms with weight
    // Σ floor((tf/dl)·score·1e9) — per-contribution floors make the
    // sums exact BIGINTs, so the expansion list replays bit-for-bit.
    "q234_prf_expansion" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val bm = TextStats.bm25PerTerm(docs, "doc_id", "text",
        Seq("hash", "merge", "scan"))
      val wS = Window.partitionBy("term").orderBy(desc("score"), asc("doc_id"))
      val fp = bm.withColumn("r", row_number().over(wS))
        .filter(col("r") <= 10)
        .select(col("term").as("query"), col("doc_id"), col("score"))
      Retrieval.rm3Expansion(fp, docs.select("doc_id", "text"),
          "query", "doc_id", "score", "text", m = 15, minDocs = 2)
        .orderBy("query", "rank")
    }),

    // ext retrieval — team-draft interleaving: two rankers (length vs
    // recency) draft a merged list per query, clicks (a keyed hash
    // stand-in) credit the drafting team — the ONLINE ranker A/B eval.
    // Runs come from TopKAgg bounded heaps (never a corpus sort); the
    // six draft rounds unroll into the oracle exactly like q232's MMR
    // chain.
    "q253_interleaving" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
        .select(concat(lit("g"), (col("doc_id") % 3L).cast("string"))
          .as("query"), col("doc_id").as("doc"), col("n_chars"))
      // ranker A: longest-first; TopKAgg orders (score desc, id desc),
      // so negate the doc id to break length ties doc-ASC
      val runA = d.groupBy(col("query"))
        .agg(graft.functions.TopKAgg.column(6, col("n_chars").cast("double"),
          -col("doc")).as("__l"))
        .select(col("query"), posexplode(col("__l")).as(Seq("__i", "__s")))
        .select(col("query"), (-col("__s.id")).as("doc"),
          (col("__i") + 1).cast("long").as("rank"))
      // ranker B: newest-first (doc id descending)
      val runB = d.groupBy(col("query"))
        .agg(graft.functions.TopKAgg.column(6, col("doc").cast("double"),
          col("doc")).as("__l"))
        .select(col("query"), posexplode(col("__l")).as(Seq("__i", "__s")))
        .select(col("query"), col("__s.id").as("doc"),
          (col("__i") + 1).cast("long").as("rank"))
      ext.Retrieval.teamDraftInterleave(runA, runB, "query", "doc",
          "rank", rounds = 6)
        .withColumn("clicked",
          conv(substring(md5(concat(lit("click|"),
            col("doc").cast("string"))), 1, 1), 16, 10)
            .cast("long") % 2L === 0L)
        .orderBy("query", "pos")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // per-distinct-score counts, negatives-below running sum, then the
    // exact integer Mann-Whitney form
    "q170_auc" -> {
      s"""WITH d AS (
         |  SELECT ${qualityScoreSql("text")} AS s,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
         |ps AS (
         |  SELECT s, CAST(sum(y) AS BIGINT) AS np,
         |    CAST(sum(1 - y) AS BIGINT) AS nn
         |  FROM d GROUP BY s),
         |r AS (
         |  SELECT np, nn, CAST(coalesce(sum(nn) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS nb
         |  FROM ps)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
         |  CAST(sum(nn) AS BIGINT) AS n_neg,
         |  CAST(CASE WHEN sum(np) > 0 AND sum(nn) > 0
         |    THEN (CAST(sum(np * (2 * nb + nn)) AS BIGINT) * 1000000)
         |      // (2 * CAST(sum(np) AS BIGINT) * CAST(sum(nn) AS BIGINT))
         |    ELSE NULL END AS BIGINT) AS auc_e6
         |FROM r""".stripMargin
    },

    // the langId argmax replay feeding exact confusion-mass integers
    "q171_kappa" -> {
      s"""WITH pred AS ($LangIdOracle),
         |cells AS (
         |  SELECT lang_pred AS a, lang AS b, CAST(count(*) AS BIGINT) AS c
         |  FROM pred WHERE lang IS NOT NULL AND lang_pred IS NOT NULL
         |  GROUP BY 1, 2),
         |rt AS (SELECT a AS k, CAST(sum(c) AS BIGINT) AS rt FROM cells GROUP BY 1),
         |ct AS (SELECT b AS k, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY 1),
         |s AS (SELECT CAST(coalesce(sum(rt.rt * ct.ct), 0) AS BIGINT)
         |        AS chance_mass
         |      FROM rt JOIN ct USING (k)),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_total,
         |        CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
         |          AS n_agree
         |      FROM cells)
         |SELECT t.n_total, t.n_agree, s.chance_mass,
         |  CASE WHEN t.n_total * t.n_total <> s.chance_mass
         |    THEN CAST(t.n_agree * t.n_total - s.chance_mass AS DOUBLE)
         |      / CAST(t.n_total * t.n_total - s.chance_mass AS DOUBLE)
         |    ELSE NULL END AS kappa
         |FROM t, s""".stripMargin
    },

    // equal-width bins with the same floor-e6 integer arithmetic
    "q172_calibration" -> {
      s"""WITH d AS (
         |  SELECT ${qualityScoreSql("text")} AS s,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL),
         |b AS (
         |  SELECT CAST(least(floor(s * 10), 9) AS INT) AS bin, y,
         |    CAST(floor(s * 1000000) AS BIGINT) AS s6
         |  FROM d)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(y) AS BIGINT) AS n_pos,
         |  CAST((CAST(sum(y) AS BIGINT) * 1000000) // count(*) AS BIGINT)
         |    AS pos_rate_e6,
         |  CAST(CAST(sum(s6) AS BIGINT) // count(*) AS BIGINT)
         |    AS mean_score_e6
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin
    },

    // RRF replay: both retriever runs re-ranked in SQL (the q15 cosine
    // formula, plus its un-normalized dot sibling), then the fusion is
    // pure BIGINT arithmetic — `//` is DuckDB's integral div, matching
    // Spark's `div` exactly on the positive operands here.
    "q227_rrf_fusion" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.qv, e.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot,
        |    list_sum(list_transform(list_zip(q.qv, e.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM q CROSS JOIN embeddings e),
        |run_cos AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM scored QUALIFY rnk <= 20),
        |run_dot AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rnk
        |  FROM scored QUALIFY rnk <= 20),
        |fused AS (
        |  SELECT query_id AS query, neighbor_id AS doc,
        |    CAST(sum(1000000000000 // (60 + rnk)) AS BIGINT) AS rrf_score
        |  FROM (SELECT * FROM run_cos UNION ALL SELECT * FROM run_dot)
        |  GROUP BY 1, 2)
        |SELECT query, doc, rrf_score,
        |  CAST(row_number() OVER (PARTITION BY query ORDER BY rrf_score DESC, doc) AS INT) AS rank
        |FROM fused
        |QUALIFY rank <= 10
        |ORDER BY query, rank""".stripMargin,

    "q228_rank_eval" -> RankEvalOracle,

    "q229_graded_ndcg" -> GradedNdcgOracle,

    // MRR/MAP replay: same retrieved list as q228; cumulative hits via
    // a framed window, P@i pre-scaled to 1e9 with `//` so both engines
    // floor identically, AP = floor(Σ terms / (n_relevant · 1000)).
    "q230_mrr_map" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.qv, e.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM q CROSS JOIN embeddings e),
        |retrieved AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM scored QUALIFY rnk <= 10),
        |judge AS (
        |  SELECT DISTINCT q.query_id, e.vec_id AS neighbor_id
        |  FROM q JOIN embeddings e ON q.label = e.label),
        |relc AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant FROM judge GROUP BY 1),
        |s AS (
        |  SELECT r.query_id, r.rnk,
        |    CASE WHEN j.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel,
        |    sum(CASE WHEN j.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY r.query_id ORDER BY r.rnk ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM retrieved r LEFT JOIN judge j
        |    ON r.query_id = j.query_id AND r.neighbor_id = j.neighbor_id),
        |h AS (
        |  SELECT query_id,
        |    CAST(min(CASE WHEN rel = 1 THEN rnk END) AS INT) AS first_hit_rank,
        |    CAST(coalesce(sum(CASE WHEN rel = 1 THEN (cum * 1000000000) // rnk END), 0) AS BIGINT) AS psum
        |  FROM s GROUP BY 1),
        |base AS (
        |  SELECT coalesce(h.query_id, relc.query_id) AS query,
        |    h.first_hit_rank,
        |    CAST(coalesce(relc.n_relevant, 0) AS BIGINT) AS n_relevant,
        |    CAST(coalesce(h.psum, 0) AS BIGINT) AS psum
        |  FROM h FULL OUTER JOIN relc ON h.query_id = relc.query_id)
        |SELECT query, first_hit_rank, n_relevant,
        |  CASE WHEN n_relevant >= 1
        |    THEN CAST(coalesce(1000000 // first_hit_rank, 0) AS BIGINT) END AS rr_e6,
        |  CASE WHEN n_relevant >= 1
        |    THEN CAST(psum // (n_relevant * 1000) AS BIGINT) END AS ap_e6
        |FROM base
        |ORDER BY query""".stripMargin,

    // q68's BM25 CTEs verbatim, then two per-term rankings (BM25 score
    // vs raw tf, doc_id tiebreak both) and the q227 integer RRF block.
    "q231_hybrid_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
        |  FROM toks),
        |t AS (
        |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, term, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM t WHERE term IN ('hash', 'merge', 'scan') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term, tf,
        |    ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |      * ((tf * CAST(2.2 AS DOUBLE))
        |        / (tf + CAST(1.2 AS DOUBLE)
        |          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl)))) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
        |run_bm AS (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
        |  FROM sc QUALIFY rnk <= 20),
        |run_tf AS (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rnk
        |  FROM sc QUALIFY rnk <= 20),
        |fused AS (
        |  SELECT term AS query, doc_id AS doc,
        |    CAST(sum(1000000000000 // (60 + rnk)) AS BIGINT) AS rrf_score
        |  FROM (SELECT * FROM run_bm UNION ALL SELECT * FROM run_tf)
        |  GROUP BY 1, 2)
        |SELECT query, doc, rrf_score,
        |  CAST(row_number() OVER (PARTITION BY query ORDER BY rrf_score DESC, doc) AS INT) AS rank
        |FROM fused
        |QUALIFY rank <= 10
        |ORDER BY query, rank""".stripMargin,

    "q232_mmr_rerank" -> MmrOracle,

    // RM3 replay: q68's BM25 CTEs produce the first-pass ranking; the
    // unfiltered token frame `t` supplies per-doc term stats; each
    // contribution floors the identical double product before the
    // BIGINT sum (order-free in both engines).
    "q234_prf_expansion" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
        |  FROM toks),
        |t AS (
        |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, term, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM t WHERE term IN ('hash', 'merge', 'scan') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
        |sc AS (
        |  SELECT doc_id, term,
        |    ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |      * ((tf * CAST(2.2 AS DOUBLE))
        |        / (tf + CAST(1.2 AS DOUBLE)
        |          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl)))) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
        |fp AS (
        |  SELECT term AS query, doc_id, score,
        |    row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS rnk
        |  FROM sc QUALIFY rnk <= 10),
        |dtf AS (
        |  SELECT doc_id, term, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM t GROUP BY 1, 2, 3),
        |contrib AS (
        |  SELECT fp.query, fp.doc_id, d.term,
        |    CAST(floor(d.tf / d.dl * fp.score * 1000000000.0) AS BIGINT) AS c
        |  FROM fp JOIN dtf d ON d.doc_id = fp.doc_id),
        |w AS (
        |  SELECT query, term, CAST(sum(c) AS BIGINT) AS weight_e9,
        |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |  FROM contrib GROUP BY 1, 2
        |  HAVING count(DISTINCT doc_id) >= 2)
        |SELECT query, term, weight_e9, n_docs,
        |  CAST(row_number() OVER (PARTITION BY query ORDER BY weight_e9 DESC, term) AS INT) AS rank
        |FROM w
        |QUALIFY rank <= 15
        |ORDER BY query, rank""".stripMargin,

    "q253_interleaving" -> InterleavingOracle,
  )
}
