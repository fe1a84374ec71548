package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-system composition and evaluation: rank fusion across
  * retriever runs and ranking-quality metrics against relevance
  * judgments. The missing piece between the ANN/BM25 retrievers
  * ([[Similarity]], [[TextStats.bm25PerTerm]]) and a production search
  * or RAG data pipeline: real deployments run SEVERAL retrievers and
  * fuse, and nothing ships without recall/nDCG numbers.
  *
  * Everything here is integer-exact by construction (the repo's oracle
  * discipline): RRF contributions and nDCG discount constants are
  * pre-scaled integers, so sums are order-independent BIGINTs, never
  * floating-point accumulations — the same numbers fall out of the
  * DuckDB replay bit-for-bit (gates q227/q228).
  *
  * Scale shape: fusion is one groupBy on (query, doc) over the
  * concatenated runs (linear in total run size) + one per-query window
  * over ≤ Σ k_run rows; metrics are one join of the retrieved lists
  * (|Q| × k rows — evaluation-sized) against judgments keyed by
  * (query, doc). Nothing here touches the corpus.
  *
  * Input-contract guards (duplicate run evidence, NULL/non-positive
  * ranks, duplicate retrieved docs) are FUSED into the output plan as
  * `raise_error` branches — no eager driver-side action per call (the
  * `WebUrl.allocateBudget` idiom); a violation fails the job loudly at
  * the first offending row instead of silently skewing scores.
  */
object Retrieval {

  // NOTE on arithmetic: every division in this module is the SQL
  // integral `div` (DuckDB `//`) over BIGINTs — `/` on longs silently
  // promotes to double in Spark, and DuckDB CAST(double AS BIGINT)
  // ROUNDS where Spark's cast truncates, so double paths are oracle
  // hazards (verified empirically in this repo).

  /** Reciprocal-rank fusion (Cormack & Clarke, SIGIR 2009) over the
    * union of retriever runs.
    *
    * @param runs  (queryCol, idCol, rankCol, runCol) — one row per
    *              (query, candidate, run); `rankCol` is that run's
    *              1-based rank. A candidate absent from a run simply
    *              contributes nothing (standard RRF).
    * @param k     fused list depth per query.
    * @param kRrf  the smoothing constant (60 in the published form).
    * @return (query, doc, rrf_score, rank): `rrf_score` =
    *         Σ_runs floor(scale / (kRrf + rank_run)) as an exact BIGINT;
    *         rank 1..k by score desc, doc id asc (deterministic ties).
    *
    * Guarded in-plan, loudly: a NULL or non-positive rank (which would
    * otherwise NULL the term and silently drop that run's evidence) and
    * a run tag appearing twice for the same (query, doc) (double-counted
    * evidence) both `raise_error` when the job runs.
    */
  def rrf(runs: DataFrame, queryCol: String, idCol: String,
          rankCol: String, runCol: String, k: Int, kRrf: Int = 60,
          scale: Long = 1000000000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    require(scale >= 1000000L, s"scale must be >= 1e6, got $scale")
    val rank = col(rankCol).cast("long")
    val fused = runs
      .select(col(queryCol).as("query"), col(idCol).as("doc"),
        // NULL/non-positive ranks fail loudly instead of NULLing the
        // term (a NULL term would vanish from sum() = silently dropped
        // run evidence). NULL rank takes the otherwise branch too: the
        // when-condition is NULL, not true.
        when(rank >= 1L, rank)
          .otherwise(raise_error(concat(
            lit("rrf: rank must be a positive 1-based integer, got '"),
            coalesce(col(rankCol).cast("string"), lit("NULL")),
            lit(s"' in run column '$runCol'")))).as("__rank"),
        col(runCol).as("__run"))
      .withColumn("__term", expr(s"${scale}L div ($kRrf + __rank)"))
      .groupBy(col("query"), col("doc"))
      .agg(sum(col("__term")).as("__score"),
        count(lit(1)).as("__n"),
        count_distinct(col("__run")).as("__nruns"))
      // same aggregate pass carries the duplicate-evidence guard: a
      // (query, doc) with more rows than distinct run tags was retrieved
      // twice under one tag (or with a NULL tag) — caller bug, fail loud
      .select(col("query"), col("doc"),
        when(col("__n") === col("__nruns"), col("__score"))
          .otherwise(raise_error(concat(
            lit("rrf: (query="), col("query").cast("string"),
            lit(", doc="), col("doc").cast("string"),
            lit(") appears more than once within a single run tag — "),
            lit("each (query, doc, run) must be unique and run tags "),
            lit("non-null, or evidence double-counts"))))
          .as("rrf_score"))
    val w = Window.partitionBy("query")
      .orderBy(desc("rrf_score"), asc("doc"))
    fused
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Integer discount constants for binary-gain nDCG: `gainE9(i)` =
    * floor(1e9 / log2(i + 1)) for 1-based rank i. Computed ONCE here and
    * inlined into both the Spark plan and the SQL oracle, so neither
    * engine evaluates log2 at query time — DCG sums are exact BIGINTs.
    */
  def discountsE9(k: Int): Array[Long] = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    (1 to k).map(i => (1e9 / (math.log(i + 1.0) / math.log(2.0))).toLong)
      .toArray
  }

  /** Ideal-DCG prefix sums of [[discountsE9]]: `idcgE9(r)` = best
    * possible DCG when r docs are relevant (the top-min(r,k) ranks all
    * hit). Inlined into both engines like the discounts themselves.
    */
  def idcgPrefixE9(k: Int): Array[Long] =
    discountsE9(k).scanLeft(0L)(_ + _).tail

  /** Ranking-quality metrics per query against binary relevance
    * judgments — the eval gate a retriever change must pass before it
    * ships.
    *
    * @param retrieved  (queryCol, idCol, rankCol) — one retriever's
    *                   ranked list, rank 1-based, ≤ k rows per query
    *                   used (deeper rows are ignored). A (query, doc)
    *                   retrieved twice raises in-plan (it would
    *                   double-count hits and dcg).
    * @param judgments  (queryCol, idCol) — the relevant set per query;
    *                   distinct'd defensively.
    * @return one row per query appearing in EITHER input (full outer —
    *         a query with judgments but an empty retrieved list is a
    *         recall-0 failure, not a vanished row):
    *         - `n_retrieved`   rows at rank ≤ k (0 if none)
    *         - `n_relevant`    judgment-set size (0 if none)
    *         - `hits`          relevant rows at rank ≤ k
    *         - `recall_e6`     floor(hits · 1e6 / n_relevant)
    *         - `dcg_e9`        Σ_{hits} floor(1e9 / log2(rank+1))
    *         - `idcg_e9`       Σ_{i ≤ min(k, n_relevant)} same constants
    *         - `ndcg_e6`       floor(dcg_e9 · 1e6 / idcg_e9)
    *
    * All integers; queries with an empty judgment set get recall/ndcg
    * NULL (0/0 is undefined, not zero).
    */
  def rankEval(retrieved: DataFrame, judgments: DataFrame,
               queryCol: String, idCol: String, rankCol: String,
               k: Int): DataFrame = {
    val discCol = array(discountsE9(k).toIndexedSeq.map(lit): _*)
    val idcgCol = array(idcgPrefixE9(k).toIndexedSeq.map(lit): _*)
    val ret = retrieved.select(col(queryCol).as("query"),
        col(idCol).as("doc"), col(rankCol).cast("int").as("rank"))
      .filter(col("rank") <= k)
    val judge = judgments
      .select(col(queryCol).as("query"), col(idCol).as("doc")).distinct()
    val relCounts = judge.groupBy("query")
      .agg(count(lit(1)).as("n_relevant"))
    val hits = ret.join(judge.withColumn("__rel", lit(1L)),
        Seq("query", "doc"), "left")
      .groupBy("query")
      .agg(count(lit(1)).as("__nret"),
        count_distinct(col("doc")).as("__ndocs"),
        coalesce(sum(col("__rel")), lit(0L)).as("hits"),
        // DCG: each relevant retrieved row contributes its rank's
        // pre-scaled discount — element_at is 1-based, exactly our rank
        coalesce(sum(when(col("__rel") === 1L,
          element_at(discCol, col("rank")))), lit(0L)).as("dcg_e9"))
      // duplicate-retrieval guard rides the same aggregate: a doc at
      // two ranks for one query double-counts hits and dcg — fail loud
      .select(col("query"),
        when(col("__nret") === col("__ndocs"), col("__nret"))
          .otherwise(raise_error(concat(
            lit("rankEval: duplicate (query, doc) in retrieved for "),
            lit("query "), col("query").cast("string"),
            lit(" — a doc retrieved at two ranks double-counts hits "),
            lit("and dcg_e9")))).as("n_retrieved"),
        col("hits"), col("dcg_e9"))
    // FULL outer: judgment-only queries (nothing retrieved at rank ≤ k)
    // must surface as recall 0, not vanish from the eval
    hits.join(relCounts, Seq("query"), "full")
      .select(col("query"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(col("dcg_e9"), lit(0L)).as("dcg_e9"))
      .withColumn("idcg_e9",
        when(col("n_relevant") >= 1L,
          element_at(idcgCol, least(col("n_relevant"), lit(k.toLong))
            .cast("int"))))
      .withColumn("recall_e6",
        expr("CASE WHEN n_relevant >= 1 " +
          "THEN (hits * 1000000) div n_relevant END"))
      .withColumn("ndcg_e6",
        expr("CASE WHEN idcg_e9 >= 1 " +
          "THEN (dcg_e9 * 1000000) div idcg_e9 END"))
  }

  /** ANN recall@k — the evaluation harness for the approximate
    * neighbor operators ([[Similarity.lshTopK]], [[Similarity.ivfTopK]],
    * PQ): [[rankEval]] with the EXACT top-k (from
    * [[Similarity.bruteForceTopK]], usually on a sampled query set) as
    * the judgment set. `recall_e6` is then recall@k against exact
    * ground truth — the number an index's `nprobe`/`bits`/`numCells`
    * dials are tuned by — and `ndcg_e6` additionally penalizes POSITION
    * damage: a true neighbor ranked below a spurious candidate lowers
    * nDCG beyond what the miss alone costs (binary relevance is
    * order-blind among true neighbors themselves). Integer-exact like every
    * metric in this file; per-query rows, evaluation-sized frames only
    * (the expensive parts — the exact and approximate top-k — are the
    * inputs, priced by their own operators).
    */
  def annRecall(approx: DataFrame, exactTopK: DataFrame,
                queryCol: String, idCol: String, rankCol: String,
                k: Int): DataFrame =
    rankEval(approx, exactTopK.filter(col(rankCol).cast("int") <= k),
      queryCol, idCol, rankCol, k)

  /** Discount constants at 1e6 scale for GRADED nDCG: the graded form
    * multiplies each discount by a gain up to 2^maxRel − 1, so the
    * pre-scale drops from 1e9 to 1e6 to keep the worst case —
    * (2^10 − 1) · 1e6 · 1000 ranks · 1e6 final scale ≈ 1.0e18 — inside
    * BIGINT. Same inlined-constant discipline as [[discountsE9]].
    */
  def discountsE6(k: Int): Array[Long] = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    (1 to k).map(i => (1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong)
      .toArray
  }

  /** Graded-relevance nDCG@k (Järvelin & Kekäläinen, TOIS 2002 —
    * exponential gains): gain(rel) = 2^rel − 1, DCG = Σ gain · disc(rank)
    * with [[discountsE6]] constants, ideal DCG from the judgment set
    * sorted by rel desc (doc asc on ties — deterministic in both
    * engines).
    *
    * @param judgments (queryCol, idCol, relCol) — graded relevance,
    *                  integer 0..maxRel; rel ≤ 0 rows are dropped (they
    *                  contribute no gain and must not occupy ideal
    *                  ranks). Duplicate (query, doc) judgments raise
    *                  in-plan (two grades for one doc is a labeling
    *                  bug, and MAX-merging would hide it).
    * @param maxRel    loud upper bound on rel (default 10): caps the
    *                  gain at 1023 so every sum stays overflow-free.
    * @return one row per query appearing in either input:
    *         (query, n_retrieved, n_relevant, dcg_e6, idcg_e6, ndcg_e6)
    *         — ndcg NULL when the judgment set is empty.
    */
  def rankEvalGraded(retrieved: DataFrame, judgments: DataFrame,
                     queryCol: String, idCol: String, rankCol: String,
                     relCol: String, k: Int, maxRel: Int = 10): DataFrame = {
    require(maxRel >= 1 && maxRel <= 20,
      s"maxRel must be in [1, 20], got $maxRel")
    val discCol = array(discountsE6(k).toIndexedSeq.map(lit): _*)
    val ret = retrieved.select(col(queryCol).as("query"),
        col(idCol).as("doc"), col(rankCol).cast("int").as("rank"))
      .filter(col("rank") <= k)
    val rel = col(relCol).cast("long")
    val judge = judgments
      .select(col(queryCol).as("query"), col(idCol).as("doc"),
        when(rel <= maxRel, rel)
          .otherwise(raise_error(concat(
            lit(s"rankEvalGraded: rel exceeds maxRel=$maxRel for (query="),
            col(queryCol).cast("string"), lit(", doc="),
            col(idCol).cast("string"),
            lit(") — raise maxRel knowingly (gains are 2^rel)"))))
          .as("rel"))
      .filter(col("rel") >= 1L)
      .groupBy(col("query"), col("doc"))
      .agg(max(col("rel")).as("rel"), count(lit(1)).as("__nj"))
      .select(col("query"), col("doc"),
        when(col("__nj") === 1L, col("rel"))
          .otherwise(raise_error(concat(
            lit("rankEvalGraded: duplicate judgment for (query="),
            col("query").cast("string"), lit(", doc="),
            col("doc").cast("string"),
            lit(") — one grade per (query, doc)")))).as("rel"))
      // gains are exact BIGINTs (rel ≤ 20 bounded above); expr form
      // because functions.shiftleft only takes a literal bit count
      .withColumn("gain",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(rel AS INT)) - 1"))
    // ideal ranks: judgment set ordered by gain desc (doc asc ties),
    // top-k rows carry their rank's discount
    val wIdeal = Window.partitionBy("query")
      .orderBy(desc("gain"), asc("doc"))
    val ideal = judge
      .withColumn("__irank", row_number().over(wIdeal))
      .groupBy("query")
      .agg(count(lit(1)).as("n_relevant"),
        sum(when(col("__irank") <= k,
          col("gain") * element_at(discCol, col("__irank"))))
          .as("idcg_e6"))
    val hits = ret.join(judge, Seq("query", "doc"), "left")
      .groupBy("query")
      .agg(count(lit(1)).as("__nret"),
        count_distinct(col("doc")).as("__ndocs"),
        coalesce(sum(col("gain") * element_at(discCol, col("rank"))),
          lit(0L)).as("dcg_e6"))
      .select(col("query"),
        when(col("__nret") === col("__ndocs"), col("__nret"))
          .otherwise(raise_error(concat(
            lit("rankEvalGraded: duplicate (query, doc) in retrieved "),
            lit("for query "), col("query").cast("string"))))
          .as("n_retrieved"),
        col("dcg_e6"))
    hits.join(ideal, Seq("query"), "full")
      .select(col("query"),
        coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("dcg_e6"), lit(0L)).as("dcg_e6"),
        col("idcg_e6"))
      .withColumn("ndcg_e6",
        expr("CASE WHEN idcg_e6 >= 1 " +
          "THEN (dcg_e6 * 1000000) div idcg_e6 END"))
  }

  /** Rank-position metrics per query: MRR and (truncated, TREC-style)
    * MAP — the other two numbers every retrieval eval reports next to
    * recall/nDCG. Binary judgments, same contracts as [[rankEval]]
    * (full outer per-query output, in-plan duplicate guard, integer-
    * exact arithmetic).
    *
    * @return one row per query appearing in either input:
    *         - `first_hit_rank` rank of the first relevant doc ≤ k
    *           (NULL if none)
    *         - `rr_e6`          floor(1e6 / first_hit_rank); 0 when
    *           judged but nothing hit; NULL when no judgments
    *         - `ap_e6`          floor(Σ_{hits i} floor(cumHits_i · 1e9
    *           / i) / (n_relevant · 1000)) — average precision with
    *           P@i pre-scaled to 1e9 so both engines floor identically;
    *           NULL when no judgments
    */
  def rankEvalRanks(retrieved: DataFrame, judgments: DataFrame,
                    queryCol: String, idCol: String, rankCol: String,
                    k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val ret = retrieved.select(col(queryCol).as("query"),
        col(idCol).as("doc"), col(rankCol).cast("int").as("rank"))
      .filter(col("rank") <= k)
    val judge = judgments
      .select(col(queryCol).as("query"), col(idCol).as("doc")).distinct()
    val relCounts = judge.groupBy("query")
      .agg(count(lit(1)).as("n_relevant"))
    val wCum = Window.partitionBy("query").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = ret.join(judge.withColumn("__rel", lit(1L)),
        Seq("query", "doc"), "left")
      .withColumn("__cum", sum(coalesce(col("__rel"), lit(0L))).over(wCum))
      .withColumn("__pterm",
        when(col("__rel") === 1L, expr("(__cum * 1000000000) div rank")))
    val hits = scored.groupBy("query")
      .agg(count(lit(1)).as("__nret"),
        count_distinct(col("doc")).as("__ndocs"),
        min(when(col("__rel") === 1L, col("rank"))).as("first_hit_rank"),
        coalesce(sum(col("__pterm")), lit(0L)).as("__psum"))
      .select(col("query"),
        when(col("__nret") === col("__ndocs"), col("first_hit_rank"))
          .otherwise(raise_error(concat(
            lit("rankEvalRanks: duplicate (query, doc) in retrieved "),
            lit("for query "), col("query").cast("string"))))
          .as("first_hit_rank"),
        col("__psum"))
    hits.join(relCounts, Seq("query"), "full")
      .select(col("query"), col("first_hit_rank"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("__psum"), lit(0L)).as("__psum"))
      .withColumn("rr_e6",
        expr("CASE WHEN n_relevant >= 1 THEN " +
          "coalesce(1000000 div first_hit_rank, 0) END"))
      .withColumn("ap_e6",
        expr("CASE WHEN n_relevant >= 1 " +
          "THEN __psum div (n_relevant * 1000) END"))
      .drop("__psum")
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998): greedy diversified selection from each query's candidate
    * pool — round i picks argmax over the unselected pool of
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` (round 1: pure
    * relevance), ties to the lowest doc id. The standard last stage of
    * a RAG retrieval stack: near-duplicate candidates stop crowding
    * the context window.
    *
    * Scale shape: the pool is EVALUATION-sized by contract (≤ maxPool
    * rows per query, guarded in-plan with `raise_error`) — pairwise
    * sims are computed ONCE as a query-keyed equi-join (pool² per
    * query), and the k greedy rounds are k bounded plan stages over
    * the pool frame (the q213 fixed-iteration stance: deterministic
    * and oracle-replayable round by round; each round's pick is
    * lineage-cut so plan depth stays linear in k). Nothing touches the
    * corpus.
    *
    * λ defaults to 0.75 — a DYADIC double, so `1 − λ` is exact and the
    * SQL oracle's literal mirrors the Spark constant bit-for-bit (an
    * 0.7 default would make 1−λ = 0.30000000000000004 and invite
    * near-tie argmax divergence between engines).
    *
    * @param candidates (queryCol, idCol, relCol, vecCol) — one row per
    *                   (query, candidate); docs unique per query
    *                   (duplicates raise).
    * @return (query, doc, rel, mmr_rank) — mmr_rank 1..min(k, pool).
    */
  def mmrRerank(candidates: DataFrame, queryCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambda: Double = 0.75, maxPool: Int = 256): DataFrame = {
    require(k >= 1 && k <= 20,
      s"k must be in [1, 20] (k greedy plan stages), got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1], got $lambda")
    require(maxPool >= 1, s"maxPool must be >= 1, got $maxPool")
    val wPool = Window.partitionBy("query").orderBy(asc("doc"))
    val pool0 = candidates.select(col(queryCol).as("query"),
        col(idCol).as("doc"), col(relCol).cast("double").as("rel"),
        col(vecCol).as("__vec"))
      .withColumn("__n", row_number().over(wPool))
      // pool bound + uniqueness guard ride one tiny window: pair sims
      // are pool² per query, so an unbounded pool is the quadratic
      // blowup this operator must refuse loudly
      .withColumn("__n",
        when(col("__n") <= maxPool, col("__n"))
          .otherwise(raise_error(concat(
            lit(s"mmrRerank: candidate pool exceeds maxPool=$maxPool "),
            lit("for query "), col("query").cast("string"),
            lit(" — pair sims are pool² per query; pre-truncate the "),
            lit("pool or raise maxPool knowingly")))))
      .withColumn("__dup", count(lit(1))
        .over(Window.partitionBy("query", "doc")))
      .select(col("query"),
        when(col("__dup") === 1, col("doc"))
          .otherwise(raise_error(concat(
            lit("mmrRerank: duplicate candidate doc for query "),
            col("query").cast("string")))).as("doc"),
        col("rel"), col("__vec"), col("__n"))
    val pool = graft.plans.PlanCapture.cut(
      pool0.withColumn("__nrm", Similarity.norm(col("__vec"))))
    val sims = graft.plans.PlanCapture.cut(
      pool.select(col("query"), col("doc").as("id_a"),
          col("__vec").as("v_a"), col("__nrm").as("n_a"))
        .join(pool.select(col("query"), col("doc").as("id_b"),
          col("__vec").as("v_b"), col("__nrm").as("n_b")), Seq("query"))
        .filter(col("id_a") =!= col("id_b"))
        .select(col("query"), col("id_a"), col("id_b"),
          Similarity.cosinePrenormed(col("v_a"), col("v_b"),
            col("n_a"), col("n_b")).as("sim")))
    val slim = pool.select("query", "doc", "rel")
    val wPick = Window.partitionBy("query")
      .orderBy(desc("__score"), asc("doc"))
    // round 1: pure relevance
    var selected = graft.plans.PlanCapture.cut(
      slim.withColumn("__score", col("rel"))
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(col("query"), col("doc"), col("rel"),
          lit(1).as("mmr_rank")))
    for (round <- 2 to k) {
      val remaining = slim.join(
        selected.select(col("query"), col("doc")), Seq("query", "doc"),
        "left_anti")
      val maxSim = sims
        .join(selected.select(col("query"), col("doc").as("id_b")),
          Seq("query", "id_b"))
        .groupBy("query", "id_a")
        .agg(max(col("sim")).as("__ms"))
        .withColumnRenamed("id_a", "doc")
      val pick = remaining
        .join(maxSim, Seq("query", "doc"), "left")
        .withColumn("__score",
          lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("__ms"), lit(0.0)))
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") === 1)
        .select(col("query"), col("doc"), col("rel"),
          lit(round).as("mmr_rank"))
      selected = graft.plans.PlanCapture.cut(selected.union(pick))
    }
    selected
  }

  /** Pseudo-relevance-feedback query expansion (the RM3 relevance-model
    * estimate — Lavrenko & Croft, SIGIR 2001; Abdul-Jaleel et al.,
    * TREC 2004): for each query, weight every term of its top-k
    * first-pass documents by `Σ_d P(t|d) · w(d)` (P(t|d) = tf/dl, w =
    * the first-pass score) and emit the top-m expansion terms — the
    * recall lever a lexical retriever pulls when the original query is
    * too sparse.
    *
    * Integer-exact across engines: each (query, doc, term)
    * contribution is `floor((tf/dl) · w · 1e9)` — ONE identical IEEE
    * double sequence in both engines, floored to a BIGINT — so the
    * per-(query, term) SUM is order-independent (a raw double sum
    * would depend on partition order).
    *
    * Scale shape: the feedback set is |Q|·k doc ids; joining it to the
    * corpus FIRST means only feedback documents tokenize and explode —
    * one equi-join + two hash aggregates + a per-query window over the
    * (query, term) weight frame. Nothing corpus-sized shuffles.
    *
    * @param firstPass (queryCol, idCol, weightCol) — the top-k docs per
    *                  query with their first-pass scores.
    * @param docs      (idCol, textCol) — the corpus.
    * @param m         expansion terms per query.
    * @param minDocs   a term must occur in ≥ minDocs distinct feedback
    *                  docs (cuts single-doc noise terms; RM3 practice).
    * @return (query, term, weight_e9, n_docs, rank), rank 1..m per
    *         query by weight desc, term asc.
    */
  def rm3Expansion(firstPass: DataFrame, docs: DataFrame,
                   queryCol: String, idCol: String, weightCol: String,
                   textCol: String, m: Int,
                   minDocs: Int = 2): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val fp = firstPass.select(col(queryCol).as("query"),
      col(idCol).as("__id"), col(weightCol).cast("double").as("__w"))
    val toks = docs.select(col(idCol).as("__id"),
      TextStats.canonicalTokens(col(textCol)).as("__toks"))
    // join BEFORE tokenizing work is consumed: only the |Q|·k feedback
    // docs explode into term rows
    val exploded = fp.join(toks, Seq("__id"))
      .select(col("query"), col("__id"), col("__w"),
        size(col("__toks")).cast("double").as("__dl"),
        explode(col("__toks")).as("term"))
    val contrib = exploded
      .groupBy("query", "__id", "term")
      .agg(count(lit(1)).cast("double").as("__tf"),
        max(col("__w")).as("__w2"), max(col("__dl")).as("__dl2"))
      .withColumn("__c",
        floor(col("__tf") / col("__dl2") * col("__w2") * lit(1e9))
          .cast("long"))
    val weights = contrib.groupBy("query", "term")
      .agg(sum(col("__c")).as("weight_e9"),
        count_distinct(col("__id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    val w = Window.partitionBy("query")
      .orderBy(desc("weight_e9"), asc("term"))
    weights.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= m)
  }

  // ------------------------------------ team-draft interleaving (online eval)

  /** Team-draft interleaving (Radlinski, Kurup & Joachims 2008): the
    * ONLINE counterpart of [[rankEval]] — to compare two rankers in
    * production, serve one merged list built by alternating "draft
    * picks" and credit clicks to the team whose pick drew them. Per
    * query and position: the team with fewer picks so far drafts its
    * highest-ranked not-yet-picked doc; ties draft by a deterministic
    * keyed coin (`md5(salt|query|round)` parity — replayable, and
    * unbiased across queries exactly as the randomized original); a
    * team with nothing left cedes the pick. Output: one row
    * `(query, pos, doc, team)` per drafted position.
    *
    * Same replay stance as [[mmrRerank]]: `rounds` is a bounded number
    * of greedy plan stages over run-sized frames (each pick = one
    * anti-join + one min-struct aggregate per query — never
    * corpus-sized), checkpoint-cut per round, and the whole draft
    * chain unrolls into the DuckDB oracle. Duplicate docs within a run
    * corrupt the draft, so the guard raises in-plan.
    */
  def teamDraftInterleave(runA: DataFrame, runB: DataFrame,
                          queryCol: String, docCol: String,
                          rankCol: String, rounds: Int,
                          salt: String = "tdi-v1"): DataFrame = {
    require(rounds >= 1 && rounds <= 20,
      s"rounds must be in [1, 20] (rounds greedy plan stages), got $rounds")
    require(salt.nonEmpty, "salt must not be empty")
    def prep(run: DataFrame, tag: String): DataFrame = run
      .select(col(queryCol).as("query"), col(docCol).as("doc"),
        col(rankCol).cast("long").as("rank"))
      .filter(col("query").isNotNull && col("doc").isNotNull &&
        col("rank").isNotNull)
      .withColumn("__dup", count(lit(1))
        .over(Window.partitionBy(col("query"), col("doc"))))
      .select(col("query"),
        when(col("__dup") === 1, col("doc"))
          .otherwise(raise_error(concat(
            lit(s"teamDraftInterleave: duplicate doc in run $tag for "),
            lit("query "), col("query").cast("string")))).as("doc"),
        col("rank"))
    val a = graft.plans.PlanCapture.cut(prep(runA, "A"))
    val b = graft.plans.PlanCapture.cut(prep(runB, "B"))
    val queries = a.select("query").unionByName(b.select("query")).distinct()
    def coin(r: Int) =
      conv(substring(md5(concat(lit(salt), lit("|"),
        col("query").cast("string"), lit("|"), lit(r.toString))), 1, 1),
        16, 10).cast("long") % 2L
    val empty = queries.sparkSession.createDataFrame(
      queries.sparkSession.sparkContext
        .emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query",
          queries.schema("query").dataType),
        org.apache.spark.sql.types.StructField("doc",
          a.schema("doc").dataType),
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("team",
          org.apache.spark.sql.types.StringType))))
    var selected = empty
    for (r <- 1 to rounds) {
      val counts = queries
        .join(selected.groupBy(col("query"))
          .agg(sum(when(col("team") === "A", 1L).otherwise(0L)).as("__na"),
            sum(when(col("team") === "B", 1L).otherwise(0L)).as("__nb")),
          Seq("query"), "left")
        .select(col("query"),
          coalesce(col("__na"), lit(0L)).as("__na"),
          coalesce(col("__nb"), lit(0L)).as("__nb"))
      def best(run: DataFrame, out: String) = run
        .join(selected.select("query", "doc"), Seq("query", "doc"),
          "left_anti")
        .groupBy(col("query"))
        .agg(min(struct(col("rank"), col("doc"))).as("__s"))
        .select(col("query"), col("__s").getField("doc").as(out))
      val pick = counts
        .join(best(a, "__da"), Seq("query"), "left")
        .join(best(b, "__db"), Seq("query"), "left")
        .withColumn("__chooseA",
          when(col("__na") < col("__nb"), lit(true))
            .when(col("__na") > col("__nb"), lit(false))
            .otherwise(coin(r) === 0L))
        .withColumn("doc",
          when(col("__chooseA"), coalesce(col("__da"), col("__db")))
            .otherwise(coalesce(col("__db"), col("__da"))))
        .filter(col("doc").isNotNull)
        .withColumn("team",
          when(col("__chooseA") && col("__da").isNotNull, lit("A"))
            .when(col("__chooseA"), lit("B"))
            .when(col("__db").isNotNull, lit("B"))
            .otherwise(lit("A")))
        .select(col("query"), col("doc"), lit(r).as("pos"), col("team"))
      selected = graft.plans.PlanCapture.cut(
        selected.unionByName(pick))
    }
    selected
  }
}
