package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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
  * DuckDB replay bit-for-bit.
  *
  * Scale shape: fusion is one groupBy on (query, doc) over the
  * concatenated runs (linear in total run size) + one per-query window
  * over ≤ Σ k_run rows; metrics are one join of the retrieved lists
  * (|Q| × k rows — evaluation-sized) against judgments keyed by
  * (query, doc). Nothing here touches the corpus.
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
    * A run tag appearing twice for the same (query, doc) is a caller
    * bug (double-counted evidence) — guarded with a loud error.
    */
  def rrf(runs: DataFrame, queryCol: String, idCol: String,
          rankCol: String, runCol: String, k: Int, kRrf: Int = 60,
          scale: Long = 1000000000000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    require(scale >= 1000000L, s"scale must be >= 1e6, got $scale")
    val q = col(queryCol); val d = col(idCol)
    val fused = runs
      .select(q.as("query"), d.as("doc"),
        col(rankCol).cast("long").as("__rank"),
        col(runCol).as("__run"))
      .withColumn("__term", expr(s"${scale}L div ($kRrf + __rank)"))
      .groupBy(col("query"), col("doc"))
      .agg(sum(col("__term")).as("rrf_score"),
        count(lit(1)).as("__n"),
        count_distinct(col("__run")).as("__nruns"))
    val dup = fused.filter(col("__n") =!= col("__nruns")).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"rrf: (query=${dup(0).get(0)}, doc=${dup(0).get(1)}) appears " +
          "more than once within a single run tag — each (query, doc, " +
          "run) must be unique or its evidence double-counts")
    val w = Window.partitionBy("query")
      .orderBy(desc("rrf_score"), asc("doc"))
    fused
      .select(col("query"), col("doc"), col("rrf_score"))
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

  /** Ranking-quality metrics per query against binary relevance
    * judgments — the eval gate a retriever change must pass before it
    * ships.
    *
    * @param retrieved  (queryCol, idCol, rankCol) — one retriever's
    *                   ranked list, rank 1-based, ≤ k rows per query
    *                   used (deeper rows are ignored).
    * @param judgments  (queryCol, idCol) — the relevant set per query;
    *                   distinct'd defensively.
    * @return one row per query:
    *         - `n_retrieved`   rows at rank ≤ k
    *         - `n_relevant`    judgment-set size
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
    val disc = discountsE9(k)
    // idcgE9(r) = Σ_{i=1..min(r,k)} disc(i) — prefix sums, also inlined
    val idcgPrefix = disc.scanLeft(0L)(_ + _).tail
    val discCol = array(disc.map(lit): _*)
    val idcgCol = array(idcgPrefix.map(lit): _*)
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
      .agg(count(lit(1)).as("n_retrieved"),
        coalesce(sum(col("__rel")), lit(0L)).as("hits"),
        // DCG: each relevant retrieved row contributes its rank's
        // pre-scaled discount — element_at is 1-based, exactly our rank
        coalesce(sum(when(col("__rel") === 1L,
          element_at(discCol, col("rank")))), lit(0L)).as("dcg_e9"))
    hits.join(relCounts, Seq("query"), "left")
      .select(col("query"), col("n_retrieved"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        col("hits"), col("dcg_e9"))
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
}
