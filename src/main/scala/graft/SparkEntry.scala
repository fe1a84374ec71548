package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser

/** Driver contract (SURVEY.md §7): one `queries` entry per implemented
  * operator, with a DuckDB-runnable ANSI oracle in `oracleSql` wherever the
  * operator is SQL-expressible. Column names and types are aligned
  * pair-by-pair (the driver hash-compares after sorting columns by name).
  *
  * Dialect-parity rules used throughout (SURVEY.md §5.4):
  *  - counts are BIGINT on both sides (DuckDB count/sum(int) → HUGEINT is
  *    always CAST AS BIGINT in the oracle);
  *  - sums over doubles go through DECIMAL(18,2) (exact, order-independent)
  *    and back to DOUBLE, so Spark's partition-order-dependent double
  *    addition can never flip a bit vs DuckDB;
  *  - timestamps are micros on both sides (events' TIMESTAMP_NS is
  *    truncated identically by `Tables.load` and `CAST(ts AS TIMESTAMP)`);
  *  - ratios are int/int divisions in DOUBLE — bit-identical IEEE on both.
  */
object SparkEntry {

  // ------------------------------------------------------------------ util

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q70 and q88 are two POLICY layers (survivor choice; leakage-safe
    * split) over the SAME synthesized near-dup corpus — and in a real
    * curation pipeline pairs+labels are computed once and fanned out to
    * every consumer, not recomputed per policy. The gates share that one
    * stage: pairs and component labels are built once per (session, sf
    * dir) and memoized as localCheckpointed frames (tiny — only
    * documents that HAVE a near-dup appear), so the second consumer pays
    * one small join, not a second AllPairs + CC fixpoint (~37 s of the
    * r4 bench was this exact duplication). `PlanCapture.cut` keeps the
    * pre-checkpoint pair-stage plan visible to PlanGuardSpec.
    */
  private val nearDupGraphCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame, DataFrame)]

  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id", "text")
    val near = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zzz end")).as("text"))
    docs.union(near)
  }

  /** (pairs, labels) of the shared near-dup graph — memoized per
    * (session, dir); entries die with their session's block manager.
    * The cached session rides along and is compared by REFERENCE (an
    * identity-hash key alone could collide with a stopped session's
    * entry and hand out dead checkpointed frames — compute() re-checks
    * and replaces atomically).
    */
  private def nearDupGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // sweep entries owned by stopped sessions: without this, a dead
    // session (and its two checkpointed frames) is pinned for the JVM
    // lifetime unless a later session collides on the same identity hash
    nearDupGraphCache.entrySet()
      .removeIf(e => e.getValue._1.sparkContext.isStopped)
    val entry = nearDupGraphCache.compute(
      System.identityHashCode(s) + "@" + dir, (_, cached) =>
        if (cached != null && (cached._1 eq s)) cached
        else {
          val pairs = plans.PlanCapture.cut(
            Dedup.ngramJaccardPairs(nearDupCorpus(s, dir), "doc_id", "text",
              n = 3, threshold = 0.8).select("id_a", "id_b"))
          val labels = Dedup.connectedComponents(pairs)
          (s, pairs, labels)
        })
    (entry._2, entry._3)
  }

  /** q112 and q119 share ONE BPE learn: greedy merge learning is
    * sequential, so the 10-rule list q119 tokenizes with IS the first 10
    * rows of q112's 25-rule vocabulary on the same corpus and
    * minPairCount (BpeSpec pins the prefix property). Learned rules are
    * a driver-side Seq with no session-bound resources, so the memo keys
    * on the data dir alone and never needs eviction. This ASSUMES the dir
    * is immutable for the JVM's lifetime (true of the driver's testdata
    * contract, TESTDATA.md): regenerating a documents table in place
    * would serve a stale vocabulary while the oracle recomputes fresh.
    */
  private val bpeMergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[ext.Bpe.Merge]]

  private def bpeMerges25(s: SparkSession, dir: String): Seq[ext.Bpe.Merge] =
    bpeMergeCache.computeIfAbsent(dir, _ =>
      ext.Bpe.learn(tbl(s, dir, "documents"), "text",
        numMerges = 25, minPairCount = 2L))

  /** q186/q187 share one unigram-LM vocabulary per data dir — the
    * q112/q119 shared-learn lesson applied from day one. Same
    * immutable-dir assumption as [[bpeMergeCache]].
    */
  private val unigramVocabCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[ext.UnigramLm.Piece]]

  private def unigramVocab200(s: SparkSession, dir: String): Seq[ext.UnigramLm.Piece] =
    unigramVocabCache.computeIfAbsent(dir, _ =>
      ext.UnigramLm.learn(tbl(s, dir, "documents"), "text",
        vocabSize = 200, maxPieceLen = 4, minCount = 2L))

  /** DuckDB expression mirroring `TextStats.qualityScore(text)`. */
  private def qualityScoreSql(t: String): String = {
    val stop = TextStats.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""CAST((CASE WHEN length($t) BETWEEN 20 AND 100000 THEN 3 ELSE 0 END)
       |    + (CASE WHEN CAST(len(regexp_extract_all($t, '[.,!?;:''"()\\[\\]{}_-]')) AS DOUBLE) / greatest(length($t), 1) < 0.3 THEN 2 ELSE 0 END)
       |    + (CASE WHEN CAST(len(list_filter(regexp_split_to_array(trim(lower($t)), '\\s+'),
       |          x -> list_contains($stop, x))) AS DOUBLE)
       |          / greatest(len(regexp_split_to_array(trim(lower($t)), '\\s+')), 1) > 0.05 THEN 3 ELSE 0 END)
       |    + (CASE WHEN CAST(list_sum(list_transform(regexp_split_to_array(trim($t), '\\s+'), x -> length(x))) AS DOUBLE)
       |          / greatest(len(regexp_split_to_array(trim($t), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 2 ELSE 0 END) AS DOUBLE) / 10""".stripMargin
  }

  /** DuckDB prelude normalizing events.ts (TIMESTAMP_NS → micros), matching
    * `Tables.load`.
    */
  private val EventsCte =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events"

  /** q198 closed-form CDC fixture blocks: ASCII strings searched offline
    * (seeded SplitMix64 gear table, min 64 / avg 256 / max 1024) so the
    * FIRST qualifying gear-hash cut falls exactly at the block end — a
    * payload of n repeats chunks into n copies of the block plus the
    * sub-minSize tail, with constant sha-256 digests the oracle states
    * literally. Lengths 179 / 177 / 17 bytes (pure ASCII, so char length
    * == byte length through `encode(..., 'UTF-8')`).
    */
  private val CdcBlockEven =
    "m8w3d6nos5nv2eqmkf28xm4upz1ne13tnhvrzyo1ez0a3n8gwbxxaq jc1lrejzx 4k56tl7afec w82h3ilm92ifjtvyed99w3dmrufrjq3n1h7upgrlaaz3 cvpr4m98uvbiswxzzdo7enjhjvhxb2mx69ni389uttqp1n3tcpdv22dr9"
  private val CdcBlockOdd =
    "y40mmzd122c7ump57mzu4i13c7pq245rclgcyqalnmhwiom1ptwmtsv3pwdmyz7 ww0kp9wwhmuaf6y ugskq5ti9l93i2dalw23ib5gm kadf5yaxm7fn03c8q15po4leo34of9nbc0du66yz 5xtjpmg98925y89hqpt59hrox03jd9"
  private val CdcTail = "cpmf q 7zk04fq78c"
  private val CdcDigestEven =
    "31ea1d12aca63fcc8e7edd4fb57d051755b6139b21ea747b08cf424e074ab5f0"
  private val CdcDigestOdd =
    "8945e6d0e85e8472ccf2bc92c8458ca7d83e6a2b7fc6d880562cd4c061082c42"
  private val CdcDigestTail =
    "27d1a6bee4768f109abf48dbfb5d5a73ae4df37c3ee8b847a95597aee503d908"

  // -------------------------------------------------- synthetic log corpus

  /** Deterministic AWS-S3-access-log lines derived from `events` — the
    * bridge between the driver's testdata and the reference's data model.
    * Every field round-trips through `LogLineParser` (SURVEY.md §1.3);
    * event_id % 101 == 0 rows are corrupt (PERMISSIVE error_line path);
    * event_id % 13 == 0 rows carry the '-' sentinel in bytes_sent.
    */
  def syntheticLogLines(events: DataFrame): DataFrame = {
    val id = col("event_id"); val uid = col("user_id")
    val status = when(col("event_type") === "error", lit(404)).otherwise(lit(200))
    val bytes = round(col("value") * 100).cast("long")
    val clean = concat(
      lit("own"), pmod(uid, lit(5L)),
      lit(" logbucket ["),
      date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] 10.0.0."),
      pmod(uid, lit(250L)),
      lit(" arn:aws:sts::123456789012:assumed-role/svc"), pmod(uid, lit(7L)),
      lit("/i-"), id,
      lit(" REQ"), id, lit(" "),
      when(col("value") > 50, lit("REST.GET.OBJECT")).otherwise(lit("REST.PUT.OBJECT")),
      lit(" logs/app"), pmod(uid, lit(3L)), lit("/2023/"),
      lpad((pmod(id, lit(12L)) + 1).cast("string"), 2, "0"), lit("/"),
      lpad((pmod(id, lit(28L)) + 1).cast("string"), 2, "0"),
      lit("/obj"), id,
      lit(" \"GET /obj HTTP/1.1\" "), status, lit(" "),
      when(status === 404, lit("NoSuchKey")).otherwise(lit("-")), lit(" "),
      when(pmod(id, lit(13L)) === 0, lit("-")).otherwise(bytes.cast("string")), lit(" "),
      (bytes * 2).cast("string"), lit(" "),
      pmod(id, lit(1000L)), lit(" - \"-\" \"agent/"),
      pmod(uid, lit(4L)), lit(".0\" "),
      when(pmod(id, lit(10L)) === 0, lit("-"))
        .otherwise(lit("ABCDEFGHI").substr(pmod(id, lit(10L)).cast("int"), lit(1))))
    val line = when(pmod(id, lit(101L)) === 0,
      concat(lit("CORRUPT LINE "), id)).otherwise(clean)
    // events.parquet is one small file → one input split; real ingest reads
    // many log objects in parallel, so spread the synthesis/parse the same
    // way (row→partition placement does not affect any per-row value).
    val parallelism = events.sparkSession.sparkContext.defaultParallelism
    events.repartition(parallelism).select(line.as("value"))
  }

  /** DuckDB oracle: the expected PARSED table, built directly (parse ∘
    * format = identity on clean rows; corrupt rows = 18 nulls + raw line).
    */
  private val ParsedOracle: String =
    s"""WITH e AS ($EventsCte),
       |clean AS (SELECT * FROM e WHERE event_id % 101 <> 0)
       |SELECT
       |  'own' || (user_id % 5) AS bucket_owner,
       |  'logbucket' AS s3_bucket,
       |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS request_time,
       |  '10.0.0.' || (user_id % 250) AS remote_ip,
       |  'arn:aws:sts::123456789012:assumed-role/svc' || (user_id % 7) || '/i-' || event_id AS requester,
       |  'REQ' || event_id AS request_id,
       |  CASE WHEN value > 50 THEN 'REST.GET.OBJECT' ELSE 'REST.PUT.OBJECT' END AS operation,
       |  'logs/app' || (user_id % 3) || '/2023/' || lpad(CAST(1 + event_id % 12 AS VARCHAR), 2, '0')
       |    || '/' || lpad(CAST(1 + event_id % 28 AS VARCHAR), 2, '0') || '/obj' || event_id AS key,
       |  '"GET /obj HTTP/1.1"' AS request,
       |  CAST(CASE WHEN event_type = 'error' THEN 404 ELSE 200 END AS INT) AS http_status,
       |  CASE WHEN event_type = 'error' THEN 'NoSuchKey' ELSE NULL END AS error_code,
       |  CASE WHEN event_id % 13 = 0 THEN NULL ELSE CAST(round(value * 100) AS BIGINT) END AS bytes_sent,
       |  CAST(round(value * 100) AS BIGINT) * 2 AS object_size,
       |  event_id % 1000 AS total_time,
       |  CAST(NULL AS BIGINT) AS turn_around_time,
       |  CAST(NULL AS VARCHAR) AS referrer,
       |  '"agent/' || (user_id % 4) || '.0"' AS user_agent,
       |  CASE WHEN event_id % 10 = 0 THEN NULL
       |       ELSE substr('ABCDEFGHI', CAST(event_id % 10 AS INT), 1) END AS version_id,
       |  CAST(NULL AS VARCHAR) AS error_line
       |FROM clean
       |UNION ALL
       |SELECT NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       |       NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
       |       'CORRUPT LINE ' || event_id
       |FROM e WHERE event_id % 101 = 0""".stripMargin

  // -------------------------------------------------------------- flagship

  /** Flagship: synthesize log lines from sf0.001 events, parse them with
    * the native column-expression parser, run the reference's Days Apart
    * analysis (threshold 60 days). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val events = tbl(spark, "/root/testdata/sf0.001", "events")
    val parsed = LogLineParser.parse(syntheticLogLines(events))
    DaysApart.frame(parsed, threshold = 60)
  }

  // -------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.2/§2.9 — the core operator: regex parse with PERMISSIVE
    // corrupt-record semantics, null sentinels, timestamp munging.
    "q10_parse_logline" -> ((s, dir) => {
      LogLineParser.parse(syntheticLogLines(tbl(s, dir, "events")))
    }),

    // §3.2 — the flagship Days Apart analysis end-to-end over parsed lines:
    // scan → filter → regex/date scalar fns → group agg → global sort.
    "q11_days_apart" -> ((s, dir) => {
      val parsed = LogLineParser.parse(syntheticLogLines(tbl(s, dir, "events")))
      DaysApart.frame(parsed, threshold = 60)
        .orderBy(desc("access_count"), col("requester"), col("log_name"))
    }),

    // §2.4 — hash aggregate, multiple aggs, decimal-exact double sums.
    "q01_agg_pricing" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem")
      val dec = (c: Column) => c.cast("decimal(18,2)")
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // §2.2 — predicate + projection pushdown to the parquet scan.
    "q02_filter_pushdown" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    }),

    // §2.3 — string scalar functions (regexp_extract/replace, concat, case).
    "q03_string_funs" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("head_upper"),
        length(col("text")).cast("long").as("text_len"),
        regexp_extract(col("source"), "src([0-9]+)", 1).as("src_num"),
        concat_ws("|", col("lang"), col("source")).as("tag"),
        size(regexp_extract_all(col("text"), lit("the"), lit(0))).cast("long").as("n_the"))
    }),

    // §2.3 — date/time scalar functions + aggregation by day.
    "q04_dates" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(
          count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchases"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          max(hour(col("ts"))).as("max_hr"))
        .orderBy("day")
    }),

    // §2.5 ext — fact-fact join + datediff + agg + sort (Days Apart shape
    // over the star schema: order date vs ship date).
    "q05_days_apart_join" -> ((s, dir) => {
      val o = tbl(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = tbl(s, dir, "lineitem").select("l_orderkey", "l_shipdate", "l_extendedprice")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("days_apart"),
          col("o_orderpriority"),
          col("l_extendedprice"))
        .filter(col("days_apart") > 60)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy("o_orderpriority")
    }),

    // §2.5 ext — broadcast dimension joins (star schema rollup).
    "q06_join_star" -> ((s, dir) => {
      tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_acctbal"))
        .orderBy("r_name")
    }),

    // §2.6 — global sort + limit (top-k) with deterministic tie-break.
    "q07_topk" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(15)
    }),

    // ext — window ranking: top-3 orders per customer.
    "q08_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // §2.4 ext — distinct aggregation.
    "q09_distinct_agg" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type")
    }),

    // ext dedup — exact duplicate groups by content digest.
    "q12_dedup_exact" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val dups = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      Dedup.exactGroups(docs.union(dups), "doc_id", "text")
    }),

    // ext dedup — MinHash + LSH banding candidates, exact-Jaccard verified.
    "q13_dedup_minhash" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      Dedup.minhashDuplicates(docs.union(near), "doc_id", "text",
          numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
    }),

    // ext dedup — embedding-cosine near-dup pairs (exact predicate).
    "q14_dedup_embedding" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings").select("vec_id", "embedding")
      val copies = em.filter(col("vec_id") % 9 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Dedup.embeddingDuplicates(em.union(copies), "vec_id", "embedding", threshold = 0.9)
        .select("id_a", "id_b")
    }),

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

    // ext text — token counts, ratios, quality score, fingerprint.
    "q17_text_stats" -> ((s, dir) => {
      val t = col("text")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextStats.wordCount(t).cast("long").as("n_tokens"),
        TextStats.bpeishTokenCount(t).cast("long").as("n_bpeish"),
        TextStats.punctRatio(t).as("punct_ratio"),
        TextStats.stopwordRatio(t).as("stopword_ratio"),
        TextStats.meanWordLength(t).as("mean_word_len"),
        TextStats.qualityScore(t).as("quality_score"),
        TextStats.fingerprint(t).as("fingerprint"))
    }),

    // ext text — marker-word language identification.
    "q18_text_langid" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred"))
    }),

    // ext streaming-shape — sessionization via windows (gap > 30 min).
    "q19_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            (unix_micros(col("ts")) - col("prev_us")) > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum("is_new").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id")
        .agg(max("sess_id").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // §2.5 ext — anti join (customers with no large orders).
    "q20_anti_join" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.4 ext — rollup (hierarchical grouping sets), via the SQL entry
    // point (the DataFrame rollup API trips Spark's ambiguous-self-join
    // false positive on join-derived frames, SPARK-??; SQL resolution
    // doesn't carry dataset-id tags and is the idiomatic path anyway).
    "q21_rollup" -> ((s, dir) => {
      tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name")
        .createOrReplaceTempView("q21_joined")
      // Spark ASC default is NULLS FIRST (matches the oracle's explicit
      // NULLS FIRST; DuckDB's default is NULLS LAST).
      s.sql("""SELECT r_name, n_name, count(*) AS n_customers
              |FROM q21_joined
              |GROUP BY ROLLUP (r_name, n_name)
              |ORDER BY r_name, n_name""".stripMargin)
    }),

    // ext sketch — approx_count_distinct (HLL++; rows-only: DuckDB's HLL
    // differs by construction, exactness asserted within rsd in ScalaTest).
    "q22_approx_distinct" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct("user_id", 0.01).as("approx_users"))
        .orderBy("event_type")
    }),

    // ext dedup — SimHash near-dup pairs (rows-only: xxhash64-based sketch
    // has no DuckDB twin; pair-recovery asserted in ScalaTest).
    "q23_dedup_simhash" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val dups = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      Dedup.simhashDuplicates(docs.union(dups), "doc_id", "text", maxDistance = 3)
    }),

    // ext multimodal — binary payloads + batch (mapPartitions) feature
    // extraction through the STUB decoder; plumbing (schema, encoders,
    // batch shape) is real and the stub is arithmetic the oracle mirrors.
    "q24_multimodal_decode" -> ((s, dir) => {
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text")
      ext.Multimodal.imageFeatures(packed)
    }),

    // ext multimodal — video frame sampling (flatMap: 1 row per frame).
    "q25_frame_sample" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text", kind = "video")
      ext.Multimodal.sampleFrames(packed.as[ext.Multimodal.Asset]).toDF()
    }),

    // ext skew — salted equi-join; correctness contract: identical result
    // to the plain join (the oracle runs the plain join).
    "q27_skew_salted_join" -> ((s, dir) => {
      val l = tbl(s, dir, "lineitem").select("l_suppkey", "l_extendedprice")
      val sup = tbl(s, dir, "supplier").select("s_suppkey", "s_name")
        .withColumnRenamed("s_suppkey", "l_suppkey")
      val hot = ext.SkewJoin.hotKeys(l, "l_suppkey", hotThreshold = 50)
      ext.SkewJoin.saltedJoin(l, sup, "l_suppkey", hot, saltBuckets = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy("s_name")
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

    // §2.5 ext — set operations (INTERSECT / EXCEPT).
    "q29_setops" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val high = o.filter(col("o_totalprice") > 250000).select(col("o_custkey").as("custkey"))
      val low = o.filter(col("o_totalprice") < 50000).select(col("o_custkey").as("custkey"))
      high.intersect(low)            // customers with both bands
        .except(low.filter(col("custkey") % 100 === 0)) // minus a carved-out set
        .orderBy("custkey")
    }),

    // §2.4 ext — pivot (wide aggregation by category).
    "q30_pivot" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .orderBy("user_id")
    }),

    // §2.6 — the compaction shape (round-robin repartition + partition-
    // local sort) over the parsed corpus; result SET must equal the plain
    // parse (physical ops must not create/drop/corrupt rows).
    "q31_compact_shape" -> ((s, dir) => {
      LogLineParser.parse(syntheticLogLines(tbl(s, dir, "events")))
        .repartition(10)
        .sortWithinPartitions("request_time")
    }),

    // §2.4 ext — exact percentiles (linear interpolation, same definition
    // as DuckDB quantile_cont).
    "q33_percentiles" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.5)").as("p50_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          expr("percentile(l_quantity, 0.99)").as("p99_qty"))
        .orderBy("l_returnflag")
    }),

    // ext window frames — running (cumulative) revenue per customer in
    // order-date order; decimal-exact accumulation.
    "q34_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("running_total"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // ext sketch-agg — corpus-level MinHash-union sketches per source and
    // the estimated pairwise content overlap between sources (rows-only:
    // xxh64-based sketch; union-equals-union property proven in ScalaTest).
    "q39_group_sketch" -> ((s, dir) => {
      val sigs = tbl(s, dir, "documents")
        .select(col("source"),
          Dedup.minhashSignature(Dedup.shingles(col("text")), 128).as("sig"))
        .groupBy("source")
        .agg(graft.functions.MinHashUnionAgg.column(col("sig")).as("gsig"))
      val a = sigs.select(col("source").as("src_a"), col("gsig").as("sig_a"))
      val b = sigs.select(col("source").as("src_b"), col("gsig").as("sig_b"))
      a.join(b, col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"),
          Dedup.minhashEstimate(col("sig_a"), col("sig_b")).as("est_overlap"))
        .orderBy("src_a", "src_b")
    }),

    // §2.5 ext — correlated scalar subqueries (Catalyst decorrelates them
    // to aggregates + joins; the oracle runs the same SQL). "Above twice
    // the customer's average" is compared multiplied-through
    // (price·n > 2·sum) in DECIMAL: an avg() would round differently per
    // engine (Spark decimal avg → decimal(·,6), DuckDB → double) and could
    // flip boundary rows.
    "q38_correlated_subquery" -> ((s, dir) => {
      tbl(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_v o
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
          |    (SELECT count(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) >
          |  2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
          |       FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // ext text — char-trigram language ID (the n-gram-profile variant).
    "q37_langid_ngram" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextStats.langIdCharNgram(col("text")).as("lang_pred"))
    }),

    // ext fuzzy match — edit-distance entity resolution: nearest of two
    // probe templates per document head (levenshtein is identically
    // defined in Spark and DuckDB).
    "q36_fuzzy_match" -> ((s, dir) => {
      val head = substring(col("text"), 1, 30)
      val d1 = levenshtein(head, lit("the quick brown fox jumps over"))
      val d2 = levenshtein(head, lit("spark query engine data stream"))
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          d1.cast("long").as("dist_prose"),
          d2.cast("long").as("dist_tech"),
          when(d1 <= d2, lit("prose")).otherwise(lit("tech")).as("nearest"))
    }),

    // ext curation — the full pipeline: quality gate → exact dedup →
    // MinHash near-dedup, one deterministic pass (Curation.curate).
    "q35_curate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ext.Curation.curate(docs, "doc_id", "text", minQuality = 0.8)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // §2.3 ext — semi-structured JSON column extraction + aggregation.
    "q32_json_props" -> ((s, dir) => {
      tbl(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("k_bucket")
    }),

    // ext streaming — the streaming daily-counts aggregation executed on a
    // batch frame (EliminateEventTimeWatermark makes the SAME code path
    // valid in both modes; true streaming covered in ScalaTest).
    "q26_stream_daily_counts" -> ((s, dir) => {
      val parsed = LogLineParser.parse(syntheticLogLines(tbl(s, dir, "events")))
      graft.streaming.LogStream.dailyOperationCounts(parsed)
        .select(col("window.start").as("day_start"), col("operation"),
          col("n_requests"), col("total_bytes"))
        .orderBy("day_start", "operation")
    }),

    // ext temporal — as-of join: each event sees the most recent purchase
    // (inclusive) by the same user. One key-shuffle union+window, no
    // nested-loop; oracle is DuckDB's native ASOF LEFT JOIN.
    "q40_asof_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val probe = e.select(col("event_id"), col("ts"), col("user_id"))
      val build = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_event_id"), col("value").as("p_value"))
      ext.TemporalJoins.asofJoin(probe, build, "user_id", "ts", "p_ts",
          Seq("p_ts", "p_event_id", "p_value"), prefix = "")
        .select(col("event_id"),
          col("p_event_id").as("prior_purchase_id"),
          (unix_micros(col("ts")) - unix_micros(col("p_ts")))
            .as("micros_since_purchase"),
          col("p_value").as("prior_purchase_value"))
        .orderBy("event_id")
    }),

    // ext temporal — interval (range) join via day-bucket expansion: promo
    // windows derived from a sample of orders, lineitems matched by
    // ship-date containment; an equi-join on the bucket instead of the
    // BroadcastNestedLoopJoin a raw non-equi condition would produce.
    "q41_range_join" -> ((s, dir) => {
      val promos = tbl(s, dir, "orders")
        .filter(col("o_orderkey") % 500 === 0)
        .select(col("o_orderkey").as("promo_id"),
          col("o_orderdate").as("start_ts"),
          (col("o_orderdate") + expr("INTERVAL 7 DAY")).as("end_ts"))
      val probe = tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"), col("l_extendedprice"))
      ext.TemporalJoins.byTimeBuckets(probe, promos, "l_shipdate",
          "start_ts", "end_ts")
        .groupBy("promo_id")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("total_price"))
        .orderBy("promo_id")
    }),

    // §2.4 ext — GROUPING SETS with grouping() indicators (via SQL for the
    // same join-derived-frame reason as q21_rollup).
    "q42_grouping_sets" -> ((s, dir) => {
      tbl(s, dir, "customer")
        .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "c_mktsegment", "c_acctbal")
        .createOrReplaceTempView("q42_joined")
      s.sql("""SELECT r_name, c_mktsegment,
              |  CAST(grouping(r_name) AS INT) AS g_region,
              |  CAST(grouping(c_mktsegment) AS INT) AS g_segment,
              |  count(*) AS n_customers,
              |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
              |FROM q42_joined
              |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment), ())
              |ORDER BY r_name, c_mktsegment""".stripMargin)
    }),

    // §2.4 ext — array aggregation: deterministic sorted collect, argmax
    // via struct-max (max_by's tie-break is engine-arbitrary; lexicographic
    // struct comparison is not), array slicing. The arrays are serialized
    // to CSV in the output because the gate's comparator sorts rows in
    // pandas, where array cells are unhashable — the aggregation itself is
    // still array-typed end-to-end.
    "q43_array_agg" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .filter(col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
          array_sort(collect_list(col("o_orderkey"))).as("keys_arr"),
          count(lit(1)).as("n_orders"),
          max(struct(col("o_totalprice"), col("o_orderkey")))
            .getField("o_orderkey").as("top_order"))
        .select(col("o_custkey"),
          array_join(col("keys_arr").cast("array<string>"), ",").as("order_keys"),
          array_join(slice(col("keys_arr"), 1, 3).cast("array<string>"), ",").as("first3"),
          col("n_orders"), col("top_order"))
        .orderBy("o_custkey")
    }),

    // §2.4 ext — unpivot / melt (wide metrics → long), the inverse of q30.
    "q44_unpivot" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_discount").cast("decimal(18,2)")).cast("double").as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "val")
        .orderBy("l_returnflag", "metric")
    }),

    // ext sampling — deterministic content-hash sampling (~15.6%): the
    // reproducible alternative to TABLESAMPLE (whose row choice is
    // engine/partitioning-dependent); the same idiom stratifies by any key.
    "q45_sample_hash" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "28")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // §2.4 ext — fixed-width histogram by arithmetic bucketing (the
    // distributed width_bucket: one hash aggregate, no sort of the data).
    "q46_histogram" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
        .orderBy("bucket")
    }),

    // ext text — TF-IDF top terms per document. Linear idf (N/df, one
    // correctly-rounded IEEE division) instead of log-idf: ln() differs in
    // the last ulp across libm implementations, which would make scores —
    // and near-tie rankings — engine-dependent. Shuffles: (doc, term) then
    // term; corpus size joins in via a broadcast 1-row aggregate, not a
    // driver-side count.
    "q47_tfidf_topterms" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").filter(col("doc_id") < 100)
      val toks = docs.select(col("doc_id"),
        explode(split(Dedup.canonicalize(col("text")), " ")).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val score = col("tf") * (col("n_docs").cast("double") / col("df"))
      val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rank"))
        .orderBy("doc_id", "rank")
    }),

    // ext streaming-shape — hopping (sliding) windows: 1-day windows every
    // 12 hours, each event contributing to exactly two windows; the same
    // groupBy(window(...)) works unchanged under readStream.
    "q48_sliding_window" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(window(col("ts"), "1 day", "12 hours"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("w_start", "event_type")
    }),

    // ext dedup — near-duplicate CLUSTERS: the q13 pair graph labeled by
    // connected components (min reachable id), the cluster view that lets
    // survivor policies be content-aware rather than id-ordered.
    // Recall bound (diagnosability note): the engine side is MinHash/LSH
    // while the oracle brute-forces exact Jaccard — with 64 hashes /
    // 32 bands the per-pair miss probability is ~1e-14 on this corpus, so
    // the gate is stable, but a future corpus with a pair barely above
    // 0.8 could in principle flake HERE (not a wrong answer: sketch
    // recall). q70 gates the same clustering on the exact pair path.
    "q49_dedup_components" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      val pairs = Dedup.minhashDuplicates(docs.union(near), "doc_id", "text",
          numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.8)
      Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id")
    }),

    // ext multimodal — audio-kind payloads through the batch decode stub
    // (16-bit mono PCM fiction; real codec swaps in behind the signature).
    "q50_audio_features" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text", kind = "audio")
      ext.Multimodal.audioFeatures(packed.as[ext.Multimodal.Asset]).toDF()
    }),

    // ext multimodal — aspect-preserving resize into a 224x224 box; the
    // dimension math is the real contract, pixels are stubbed.
    "q51_image_resize" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val packed = ext.Multimodal.packAssets(
        tbl(s, dir, "documents"), "doc_id", "text")
      ext.Multimodal.resizeToBox(packed.as[ext.Multimodal.Asset]).toDF()
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

    // ext streaming-shape — native session windows (gap-merged), the
    // declarative twin of q19's lag/cumsum sessionization and of
    // LogStream.sessionize's stateful form; works unchanged under
    // readStream with a watermark.
    "q55_session_window" -> ((s, dir) => {
      tbl(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // ext dedup — incremental ingest dedup: a new batch deduped against an
    // existing corpus WITHOUT re-pairing corpus x corpus (the square that
    // never changes); plus the usual within-batch greedy pass.
    "q56_dedup_incremental" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") < 400)
      val fresh = docs.filter(col("doc_id") >= 400)
      val nearCorpus = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      val withinDup = fresh.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"))
      Dedup.minhashDedupIncremental(
          fresh.union(nearCorpus).union(withinDup), corpus, "doc_id", "text",
          numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.8)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // ext time-series — gap filling + forward fill: each user's sparse
    // daily purchase totals densified over their [first, last] day span
    // (sequence+explode) and forward-filled with last(ignoreNulls).
    // Leading gaps stay null. The resample primitive every time-series
    // pipeline needs; all shuffles are on user_id.
    "q57_gap_fill" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val daily = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      val spans = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val allDays = spans.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      allDays.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"), col("v"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"))
        .orderBy("user_id", "day")
    }),

    // ext time-series — 7-day moving average over the daily revenue
    // series via a RANGE window frame (day-distance, not row-count, so
    // calendar gaps shorten the frame). Decimal window sums: a double
    // sum's association order differs across engines' segment-tree
    // evaluation. A single-task window is fine HERE because the input is
    // already one row per day (~thousands) — never do this on raw rows;
    // the constant partition key states that intent explicitly.
    "q58_moving_avg" -> ((s, dir) => {
      val daily = tbl(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("t"))
      val w = Window.partitionBy(ext.SingleTask.key(col("day")))
        .orderBy(unix_date(to_date(col("day"))))
        .rangeBetween(-6, 0)
      daily.select(col("day"), col("t").cast("double").as("daily_total"),
          (sum(col("t")).over(w).cast("double") / count(col("t")).over(w)).as("ma7"),
          count(col("t")).over(w).as("n_days"))
        .orderBy("day")
    }),

    // ext top-k — the SCALE path for q08's "top 3 per customer": a bounded
    // k-row Aggregator with map-side partial aggregation, so the exchange
    // carries <= k rows per (task, key) instead of the whole table. Same
    // oracle as q08 — identical semantics, different physical shape.
    "q54_topk_per_group" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(graft.functions.TopKAgg.column(3,
          col("o_totalprice"), -col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "s")))
        .select(col("o_custkey"),
          (-col("s.id")).as("o_orderkey"),
          col("s.score").as("o_totalprice"),
          (col("i") + 1).cast("int").as("rn"))
    }),

    // ext dedup — exact all-pairs n-gram Jaccard (no sketching): the
    // verify-stage / small-n member of the dedup family. Size-band
    // blocking bounds the candidate space (a pair at jaccard ≥ t has
    // shingle-count ratio ≤ 1/t, so only same/adjacent log-scale size
    // buckets ever join).
    "q59_dedup_ngram_jaccard" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      Dedup.ngramJaccardPairs(docs.union(near), "doc_id", "text",
          n = 3, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
    }),

    // ext text — canonical-form document fingerprinting: identical content
    // modulo case/whitespace → identical md5 fingerprint; n_same counts
    // each fingerprint's group in the SAME hash-partitioned pass (window
    // over fp — one shuffle, no second scan or self-join). The
    // edit-tolerant rolling-hash variant (TextStats.winnowingFingerprints)
    // is covered in TextStatsSpec: its xxhash64 values are not
    // reproducible in an external SQL engine, so it has no oracle entry.
    "q60_fingerprint" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val spaced = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 30000).as("doc_id"),
          concat(lit("  "), regexp_replace(col("text"), " ", "  ")).as("text"))
      val w = Window.partitionBy("fp")
      docs.union(spaced)
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .withColumn("n_same", count(lit(1)).over(w))
        .orderBy("doc_id")
    }),

    // §2.4 ext — CUBE: all four grouping-set combinations in one pass
    // (Expand feeds a single partial+final hash aggregate; no re-scan per
    // grouping set).
    "q61_cube" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // §2.1 ext — the DataSource V2 `accesslog` provider end-to-end: raw
    // text files on disk → one scan node emitting the typed 19-column
    // frame (parse inside the source, column pruning reaching the regex)
    // → aggregate. The write is part of the measured work on purpose: it
    // is the reference's whole pipeline (text in, typed analytics out).
    "q62_accesslog_source" -> ((s, dir) => {
      val outDir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft-accesslog-" + dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
      syntheticLogLines(tbl(s, dir, "events"))
        .write.mode("overwrite").text(outDir)
      s.read.format("accesslog").load(outDir)
        .groupBy("operation")
        .agg(count(lit(1)).as("n"),
          sum("bytes_sent").as("total_bytes"),
          countDistinct("requester").as("n_requesters"),
          max("request_time").as("max_time"),
          count(col("error_line")).as("n_corrupt"))
        .orderBy(asc_nulls_first("operation"))
    }),

    // ext layout — Z-order (Morton) clustering cells: the deterministic
    // ntile-bucket variant of ext.Layout (the write path's quantile
    // variant is exercised in LayoutSpec; this gates the interleave math
    // and bucket semantics against an independent engine). Each zval cell
    // must hold rows narrow in BOTH dimensions at once.
    "q63_zorder_cells" -> ((s, dir) => {
      val e = tbl(s, dir, "events").select("event_id", "user_id", "value")
      ext.Layout.zvalueByNtile(e, Seq("user_id", "value"), bits = 4,
          tieBreakers = Seq("event_id"))
        .groupBy("zval")
        .agg(count(lit(1)).as("n"),
          min("user_id").as("min_u"), max("user_id").as("max_u"),
          min("value").as("min_v"), max("value").as("max_v"))
        .orderBy("zval")
    }),

    // §2.4 ext — second-moment statistics (stddev/variance/covariance/
    // correlation/regression) in one partial+final hash aggregate. The
    // moments are derived from DECIMAL-exact power sums rather than the
    // built-in stddev/corr aggregates: the built-ins' single-pass
    // co-moment merge is partition-order-dependent at the ulp level
    // (nondeterministic across runs, unmatchable across engines), while
    // decimal sums are order-independent and the final double arithmetic
    // is the same IEEE expression tree in Spark and the oracle. Same
    // shuffle shape either way: one map-side-combined aggregate.
    // (The built-in stddev_samp/corr/regr_* functions are exercised with
    // tolerance in a ScalaTest instead.)
    "q64_stat_moments" -> ((s, dir) => {
      val dx = col("l_quantity").cast("decimal(18,2)")
      val dy = col("l_extendedprice").cast("decimal(18,2)")
      val agg = tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dx).as("sxd"), sum(dy).as("syd"),
          sum(dx * dx).as("sxxd"), sum(dy * dy).as("syyd"),
          sum(dx * dy).as("sxyd"))
      val n = col("n").cast("double")
      val sx = col("sxd").cast("double"); val sy = col("syd").cast("double")
      val sxx = col("sxxd").cast("double"); val syy = col("syyd").cast("double")
      val sxy = col("sxyd").cast("double")
      val mxx = sxx - sx * sx / n   // n * population co-moments
      val myy = syy - sy * sy / n
      val mxy = sxy - sx * sy / n
      agg.select(col("l_returnflag"), col("n"),
          sqrt(mxx / (n - 1)).as("sd_qty"),
          (myy / (n - 1)).as("var_price"),
          (mxy / (sqrt(mxx) * sqrt(myy))).as("corr_qty_price"),
          (mxy / (n - 1)).as("cov_qty_price"),
          (mxy / mxx).as("slope"),
          ((sy - (mxy / mxx) * sx) / n).as("intercept"))
        .orderBy("l_returnflag")
    }),

    // §2.4 ext — full analytic-window surface: offsets (lag/lead), frame
    // endpoints (first/last over a running frame), and rank distributions
    // (percent_rank/cume_dist) in ONE window spec — single sort+shuffle
    // on (custkey, orderdate), every function evaluated in the same pass.
    "q65_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      tbl(s, dir, "orders")
        .filter(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          lag("o_orderdate", 1).over(w).as("prev_date"),
          lead("o_orderdate", 1).over(w).as("next_date"),
          first("o_orderkey").over(w).as("first_key"),
          last("o_orderkey").over(w).as("latest_key"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    // ext profile — per-column QA profile (nulls/cardinality/range) in one
    // aggregation job; the generalization of the reference's in-band parse
    // quality signal (error_line). Status 'O' is nulled to exercise the
    // null accounting on data that ships none.
    "q66_profile" -> ((s, dir) => {
      val src = tbl(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_orderstatus"))
          .as("status"),
        col("o_orderpriority"))
      ext.Profile.columnProfile(src, Seq("o_orderkey", "status", "o_orderpriority"))
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name")
    }),

    // ext merge — CDC upsert without a table format: changed rows replace,
    // new rows append, untouched base passes through one anti join.
    "q67_merge_upsert" -> ((s, dir) => {
      val base = tbl(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val changed = base.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"))
      val inserts = base.filter(col("o_orderkey") % 17 === 0)
        .select((col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"))
      ext.Merge.upsert(base, changed.unionByName(inserts), Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // ext text — BM25 ranked retrieval (term saturation + length
    // normalization over q47's TF-IDF shuffle profile); per-term partial
    // scores, linear idf for cross-engine bit-identity.
    "q68_bm25" -> ((s, dir) => {
      TextStats.bm25PerTerm(tbl(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "merge", "scan"))
        .orderBy("doc_id", "term")
    }),

    // ext text — PII redaction: emails/IPv4/digit-runs scrubbed in one
    // per-row expression chain; counts audit what was removed. PII is
    // synthesized deterministically (the corpus ships none).
    "q69_pii_redact" -> ((s, dir) => {
      val withPii = tbl(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@ex.org from 10.77."),
          pmod(col("doc_id"), lit(256L)), lit(".3 ref 123456789"), col("doc_id"))
          .as("text"))
      val afterIp = regexp_replace(
        regexp_replace(col("text"), TextStats.EmailPattern, "<EMAIL>"),
        TextStats.Ipv4Pattern, "<IP>")
      withPii.select(col("doc_id"),
        TextStats.piiCount(col("text"), TextStats.EmailPattern).as("n_email"),
        TextStats.piiCount(col("text"), TextStats.Ipv4Pattern).as("n_ip"),
        // digit runs are counted on the ip-redacted text, matching the
        // pass order inside redactPii
        size(regexp_extract_all(afterIp, lit(TextStats.DigitRunPattern), lit(0)))
          .cast("long").as("n_num"),
        md5(TextStats.redactPii(col("text"))).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // ext dedup — survivor per near-dup cluster (longest text, ties to
    // min id): the content-aware policy layer over q49's component labels.
    // Pairs come from the EXACT prefix-filtered path (zero false
    // negatives), so the oracle's brute-force Jaccard pair set is equal by
    // construction and the gate cannot flake on sketch recall (ADVICE r3);
    // the MinHash pair path keeps its own direct gate in q13. The pair
    // graph + labels are the SHARED stage with q88 (nearDupGraph) — one
    // AllPairs + CC fixpoint, two policy consumers, like a real pipeline.
    "q70_dedup_survivors" -> ((s, dir) => {
      val (_, labels) = nearDupGraph(s, dir)
      Dedup.clusterSurvivorsFromLabels(nearDupCorpus(s, dir), "doc_id",
          "text", labels)
        .orderBy("component")
    }),

    // ext funnel — ordered-step funnel (view → click → purchase): one
    // shrinking min-aggregate per stage, no window over the event stream.
    "q71_funnel" -> ((s, dir) => {
      ext.Funnel.funnel(tbl(s, dir, "events"), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // ext sampling — stratified deterministic hash sample: per-language
    // rates rebalance the corpus (downsample en, keep the tail), membership
    // a pure function of doc_id — identical rows on every engine/run.
    "q72_stratified_sample" -> ((s, dir) => {
      ext.Sampling.stratified(tbl(s, dir, "documents"), "doc_id", "lang",
          Map("en" -> 0.1, "zh" -> 0.5), defaultRate = 0.25)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // ext profile — per-key skew audit feeding the salting decision
    // (q27's mitigation): folding keys ≥ 50 into one synthesizes the hot
    // key the uniform testdata lacks.
    "q73_skew_audit" -> ((s, dir) => {
      val keyed = tbl(s, dir, "orders")
        .select(least(col("o_custkey"), lit(50L)).as("key"))
      ext.Profile.skewAudit(keyed, "key", ratioThreshold = 2.0)
        .orderBy("key")
    }),

    // ext text — co-occurrence lift (log-free PMI) over per-document
    // distinct terms: integer-exact count products, one double division.
    "q74_cooccurrence" -> ((s, dir) => {
      TextStats.cooccurrenceLift(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text", minPairs = 25L)
        .orderBy("term_a", "term_b")
    }),

    // ext profile — per-group z-score outliers from decimal power sums
    // (q64's determinism idiom applied to row-level filtering).
    "q75_zscore_outliers" -> ((s, dir) => {
      ext.Profile.zscoreOutliers(tbl(s, dir, "events"), "value", "event_type",
          zThreshold = 2.5)
        .select("event_id", "event_type", "value", "z")
        .orderBy("event_id")
    }),

    // ext text — vocabulary coverage curve (terms ranked by frequency,
    // cumulative token share): the tokenizer-vocab sizing query.
    "q76_vocab_coverage" -> ((s, dir) => {
      TextStats.vocabCoverage(tbl(s, dir, "documents"))
        .filter(col("rank") <= 200)
        .orderBy("rank")
    }),

    // ext profile — equal-frequency binning (deterministic ntile):
    // feature bins / range-partition boundaries with per-bin stats.
    "q77_quantile_bins" -> ((s, dir) => {
      ext.Profile.equalFrequencyBins(tbl(s, dir, "orders"),
          "o_totalprice", "o_orderkey", bins = 20)
        .orderBy("bin")
    }),

    // ext dedup — sub-document CONTAINMENT pairs (|A∩B|/|A| ≥ 0.9, the
    // asymmetric dedup Jaccard misses: a page inside a boilerplate-
    // wrapped copy); derived sub-documents are the first 60% of a doc's
    // words, so every one is exactly contained in its source.
    "q79_containment" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val k = greatest(floor(size(words) * 0.6).cast("int"), lit(3))
      val sub = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 30000).as("doc_id"),
          array_join(slice(words, lit(1), k), " ").as("text"))
      // 3-gram shingles: the corpus' word VOCABULARY is tiny, so word-set
      // containment is near-vacuous; shingle order-sensitivity makes
      // containment mean actual sub-document structure
      Dedup.containmentPairs(docs.union(sub), "doc_id", "text",
          threshold = 0.9, shingleSize = 3)
        .orderBy("id_a", "id_b")
    }),

    // §2.5 ext — FULL OUTER join (the reconciliation join: rows surviving
    // on either side, with a side indicator), completing the join-type
    // surface next to q05/q06 (inner), q20 (anti), q65-adjacent semis.
    "q78_full_outer" -> ((s, dir) => {
      val c = tbl(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("k"), col("c_name"))
      val o = tbl(s, dir, "orders").filter(col("o_custkey") % 2 === 0)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
      c.join(o, Seq("k"), "full_outer")
        .select(col("k"), col("c_name"), col("n_orders"),
          when(col("c_name").isNull, "orders_only")
            .when(col("n_orders").isNull, "customer_only")
            .otherwise("both").as("side"))
        .orderBy("k")
    }),

    // ext streaming — the stateful streaming funnel's BATCH REPLAY: the
    // flatMapGroupsWithState fold over ts-sorted events equals the batch
    // funnel recurrence exactly when all events form one batch, so this
    // gates the streaming code path against q71's own oracle; cross-batch
    // incremental state covered in ScalaTest (MemoryStream).
    "q84_stream_funnel" -> ((s, dir) => {
      graft.streaming.StreamingFunnel.batchFunnel(tbl(s, dir, "events"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // ext curation — the CAPSTONE composition: quality + repetition gates
    // → exact dedup → near-dedup (exact pair path) → benchmark
    // decontamination → leakage-safe split (components over the FULL
    // 0.6-threshold pair graph, computed once and reused by dedup) →
    // context-length chunking. Every stage is also independently gated;
    // this query gates the composition itself.
    // ext scale — Bloom-filter runtime join pruning: the probe (lineitem)
    // is pre-filtered by a one-row broadcast bitset of the selective build
    // side's keys BEFORE the join shuffle. No false negatives, so the
    // oracle is simply the plain inner join — identical result, cheaper
    // exchange. 2^17 bits over ~1.5k urgent orders at sf0.01 ≈ the ~1% FP
    // regime the module documents.
    "q96_bloom_prune_join" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val urgent = tbl(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      ext.BloomJoin.prunedJoin(li, urgent, "l_orderkey", "o_orderkey",
          numBits = 1 << 17, numHashes = 5)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .orderBy("o_custkey")
    }),

    // ext dedup — exact duplicated-substring spans (trim repeated passages,
    // keep the document): maximal token ranges whose every 5-token window
    // appears in >= 2 distinct documents, merged gaps-and-islands per doc.
    "q97_duplicate_spans" -> ((s, dir) => {
      ext.Dedup.duplicateSpans(tbl(s, dir, "documents"), "doc_id", "text",
          k = 5, minDocs = 2)
        .orderBy("doc_id", "span_start")
    }),

    // ext sampling — deterministic weighted sample (Efraimidis–Spirakis
    // keys from the md5-derived 52-bit uniform; bounded-heap global
    // top-n, no sort): longer documents weighted heavier here; the
    // oracle recomputes h/u/key digit-by-digit and ranks in SQL.
    "q100_weighted_sample" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
        .withColumn("wt", length(col("text")).cast("double") + 1.0)
      ext.Sampling.weightedSample(docs, "doc_id", "wt", n = 100)
        .select(col("doc_id"), col("wt"))
        .orderBy("doc_id")
    }),

    // ext sampling — per-group weighted draw: best-n-per-language by the
    // same E–S key, selected through a group-keyed bounded heap.
    "q101_weighted_per_group" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
        .withColumn("wt", length(col("text")).cast("double") + 1.0)
      ext.Sampling.weightedSamplePerGroup(docs, "doc_id", "wt", "lang", n = 20)
        .select(col("doc_id"), col("lang"), col("wt"))
        .orderBy("doc_id")
    }),

    // ext sampling — weighted draw to per-stratum TARGET counts: 50 en
    // (capped), 80 de (underfull at sf0.01 → whole stratum), others
    // dropped; one group-keyed heap of size max(targets).
    "q103_weighted_targets" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
        .withColumn("wt", length(col("text")).cast("double") + 1.0)
      ext.Sampling.weightedSampleTargets(docs, "doc_id", "wt", "lang",
          Map("en" -> 50, "de" -> 80))
        .select(col("doc_id"), col("lang"), col("wt"))
        .orderBy("doc_id")
    }),

    // ext bpe — tokenization with the learned vocabulary (rows-only:
    // rank-greedy per-word merge replay is not SQL-expressible; BpeSpec
    // pins losslessness and the rank-greedy order against encodeWord).
    "q119_bpe_tokenize" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val merges = bpeMerges25(s, dir).take(10)
      ext.Bpe.tokenize(
          docs.filter(col("doc_id").isNotNull && col("text").isNotNull),
          "doc_id", "text", merges)
        .select(col("doc_id"), col("n_tokens"),
          array_join(slice(col("tokens"), 1, 5), " ").as("head_tokens"))
        .orderBy("doc_id")
    }),

    // ext functions — Aho–Corasick multi-pattern scan (ONE pass per row
    // whatever the pattern count — the scalable blocklist/marker scan;
    // automaton ships as a codegen reference object): per-pattern
    // occurrence counts over the corpus. The gate's patterns have no
    // self-overlap, so DuckDB's non-overlapping regexp_extract_all
    // counts replay the automaton's all-occurrences semantics exactly.
    "q120_multi_pattern_scan" -> ((s, dir) => {
      val pats = Seq("data", "row", "table", "the")
      val counts = graft.functions.MultiMatchFunctions
        .multiPatternCounts(col("text"), pats)
      tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), counts.as("c"))
        .select(col("doc_id"),
          element_at(col("c"), 1).as("n_data"),
          element_at(col("c"), 2).as("n_row"),
          element_at(col("c"), 3).as("n_table"),
          element_at(col("c"), 4).as("n_the"))
        .withColumn("total",
          col("n_data") + col("n_row") + col("n_table") + col("n_the"))
        .orderBy("doc_id")
    }),

    // ext text — seed-bootstrapped NB quality classifier (the CCNet /
    // GPT-3 crawl-filter stage): token llr trained on a labeled seed
    // slice (label = is-English — any determinate label exercises the
    // same machinery), whole corpus scored. Integer-scaled logs (the
    // q87 stance) make every double bit-replayable by the oracle.
    "q121_nb_quality" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
      TextStats.naiveBayesScore(
          d,
          d.filter(col("doc_id") % 4 === 0)
            .select((col("lang") === "en").as("label"), col("text")),
          "doc_id", "text", "label")
        .orderBy("doc_id")
    }),

    // ext web — URL canonicalization + registrable domain (the keying
    // stage of every per-domain cap / URL-dedup / domain-mixing pass):
    // urls synthesized deterministically from doc_id (uppercase schemes
    // and hosts, default and non-default ports, tracking params,
    // fragments, a co.uk host, an IPv4 literal), then normalized; the
    // per-domain doc count is a partitioned window. Oracle replays the
    // synthesis AND the normalization.
    "q122_url_canonical" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val host = when(col("doc_id") % 5 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 5 === 1, "news.Example.co.uk")
        .when(col("doc_id") % 5 === 2, "Sub.Blog.example.ORG")
        .when(col("doc_id") % 5 === 3, "192.168.10.42")
        .otherwise("example.net")
      val scheme = when(col("doc_id") % 2 === 0, "HTTPS://")
        .otherwise("http://")
      val port = when(col("doc_id") % 4 === 0, ":443")
        .when(col("doc_id") % 4 === 1, ":8080").otherwise("")
      val query = when(col("doc_id") % 3 === 0, "?utm_source=tw&z=9&a=1")
        .when(col("doc_id") % 3 === 1, "?b=2&utm_medium=email")
        .otherwise("")
      val frag = when(col("doc_id") % 2 === 0, "#Sec2").otherwise(lit(""))
      val url = concat(scheme, host, port,
        lit("/Articles/"), col("doc_id").cast("string"), query, frag)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("reg_domain"))
      d.select(col("doc_id"),
          ext.WebUrl.canonicalizeUrl(url).as("url_canon"),
          ext.WebUrl.registrableDomain(ext.WebUrl.hostOf(url))
            .as("reg_domain"))
        .withColumn("domain_docs", count(lit(1)).over(w))
        .orderBy("doc_id")
    }),

    // ext functions — multi-pattern redaction (the masking companion of
    // q120's scan: blocklist scrubbing / literal PII masking in ONE pass
    // whatever the pattern count): leftmost non-overlapping match, ties
    // at one start to list order — regexp_replace alternation semantics
    // for literal patterns, so the oracle replays it verbatim.
    "q125_multi_redact" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.MultiMatchFunctions.multiPatternRedact(
            col("text"), Seq("data", "row", "table", "the"), "[X]")
            .as("clean_text"))
        .withColumn("n_chars_clean", length(col("clean_text")).cast("long"))
        .orderBy("doc_id")
    }),

    // ext text — interpolated bigram LM score (the KenLM-shaped upgrade
    // of q87): mean ln(0.75·p(w2|w1) + 0.25·p(w2)) per transition,
    // self-scored against the corpus; integer-scaled logs replayed by
    // the oracle. Catches common words in gibberish ORDER, which
    // unigrams cannot.
    "q124_bigram_logprob" -> ((s, dir) => {
      TextStats.bigramLogProbScore(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext similarity — embedding-space decontamination (the semantic
    // companion of q82's n-gram form): the benchmark slice (vec_id%23=0)
    // is fused into the MaxCosine scan kernel; corpus rows within
    // cosine 0.92 of ANY benchmark vector drop — including the benchmark
    // rows themselves (cos 1.0). No join in the plan: the corpus never
    // moves. Exact doubles, so the oracle's max-over-refs replays them.
    // (The embeddings table has no zero/NaN vectors, so the kernel's
    // denom>0-else-0 convention and the oracle's raw division agree.)
    "q123_semantic_decontam" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      ext.Similarity.semanticDecontaminate(
          em, em.filter(col("vec_id") % 23 === 0),
          "embedding", "embedding", tau = 0.92)
        .select(col("vec_id"), col("max_ref_cosine"))
        .orderBy("vec_id")
    }),

    // ext streaming — paragraph-level continuous dedup, batch replay
    // form: the corpus thirds arrive as batch 0 (within-batch dedup
    // only), the batch third as batch 1 (probed against batch 0's
    // accumulated paragraph store); oracle replays both folds in SQL.
    "q118_stream_paragraph_dedup" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            array_join(slice(words, 1, 8), " "),
            lit("Subscribe to our newsletter!"),
            array_join(slice(words, 9, 8), " ")).as("text"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q118").toString + "/paras"
      streaming.StreamingParagraphDedup.byBatch(s,
          Seq(shaped.filter(col("doc_id") % 3 =!= 0),
            shaped.filter(col("doc_id") % 3 === 0)),
          store, "doc_id", "text")
        .orderBy("batch_id", "doc_id")
    }),

    // ext dedup — INCREMENTAL paragraph dedup (batch vs corpus, the
    // daily-ingest shape): batch = doc_id % 3 == 0 with the q110
    // construction, corpus = the rest; corpus paragraphs collapse to
    // distinct norms in-scan and anti-join the batch's survivors.
    "q117_paragraph_dedup_incr" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            array_join(slice(words, 1, 8), " "),
            lit("Subscribe to our newsletter!"),
            array_join(slice(words, 9, 8), " ")).as("text"))
      ext.Dedup.paragraphDedupIncremental(
          shaped.filter(col("doc_id") % 3 === 0),
          shaped.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext text — encoding-quality audit (mojibake detection): ids cycle
    // through an injected UTF-8-as-latin1 digraph / replacement char /
    // C1 control / clean; three pure per-row regex counts + ratio, the
    // oracle replays the same \x{hhhh} patterns in RE2.
    "q116_encoding_quality" -> ((s, dir) => {
      val marker = when(col("doc_id") % 4 === 0, lit("\u00c3\u00a9"))
        .when(col("doc_id") % 4 === 1, lit("\ufffd"))
        .when(col("doc_id") % 4 === 2, lit("\u0085\u00c3\u0088"))
        .otherwise(lit(""))
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat(marker, col("text")).as("text"))
      ext.TextStats.encodingQuality(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext capstone — the EXPORT pipeline: token-budget mixture fill
    // (q108's stage) feeding deterministic shuffle-and-shard (q113's
    // stage) — the last two steps before the shard writer, composed;
    // the oracle composes the two stage oracles.
    "q115_export_pipeline" -> ((s, dir) => {
      val selected = ext.Sampling.tokenBudgetPerGroup(tbl(s, dir, "documents"),
        "doc_id", "lang", "n_chars", budget = 15000L)
      ext.Layout.shuffleShards(selected.select("doc_id", "lang", "n_chars"),
          "doc_id", nShards = 4)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("shard"), col("pos"))
        .orderBy("doc_id")
    }),

    // ext functions — Unicode NFC normalization (codegen'd JDK
    // Normalizer expression, the pre-dedup canonicalization pass):
    // even ids get a DECOMPOSED e+combining-acute spliced into their
    // text (NFC joins it, length shrinks by 1), odd ids the precomposed
    // char (NFC no-op); the oracle replays with DuckDB nfc_normalize.
    "q114_unicode_nfc" -> ((s, dir) => {
      val raw = concat(substring(col("text"), 1, 10),
        when(col("doc_id") % 2 === 0, lit("e\u0301")).otherwise(lit("\u00e9")),
        substring(col("text"), 11, 10))
      tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextNormalizeFunctions.unicodeNormalize(raw)
            .as("nfc_text"),
          length(raw).cast("bigint").as("n_raw"),
          length(graft.functions.TextNormalizeFunctions.unicodeNormalize(raw))
            .cast("bigint").as("n_nfc"))
        .orderBy("doc_id")
    }),

    // ext layout — deterministic global shuffle-and-shard for training
    // export: shard = first 4 md5 hex chars mod 8, pos = dense rank by
    // (md5, id) within the shard — computed via the exact two-phase
    // bucket/carry form, never a per-shard window over the corpus.
    "q113_shuffle_shards" -> ((s, dir) => {
      ext.Layout.shuffleShards(tbl(s, dir, "documents").select("doc_id"),
          "doc_id", nShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),

    // ext bpe — BPE vocabulary induction over the corpus (rows-only:
    // iterative merge learning is not SQL-expressible; BpeSpec pins a
    // plain-Scala reference incl. the (count, l, r) argmax tiebreak).
    // Learning never iterates over the corpus: one (word, count)
    // aggregate, then vocab-frame rounds.
    "q112_bpe_vocab" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      bpeMerges25(s, dir)
        .toDF()
        .select(col("rank").cast("int"), col("left"), col("right"),
          col("pair_count").cast("bigint"))
        .orderBy("rank")
    }),

    // ext multimodal — REAL pure-JVM GIF decode end-to-end: deterministic
    // gradient images (every third id runs the real greedy LZW encoder,
    // every other id is interlaced — row order the luma sum never sees),
    // the native decoder walks blocks + LZW-decompresses + palette-maps,
    // and the oracle recomputes exact-integer Rec.601 luma in closed
    // form over the gradient (identity gray palette: luma = index).
    "q111_gif_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image",
          ext.Gif.makeGif(id, 8, 4,
            interlaced = id % 2 == 1, compressed = id % 3 == 0)))
      ext.Multimodal.gifFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext sampling — greedy TOKEN-budget fill per language (unit of
    // account: n_chars), md5-ordered "random" fill; exact two-phase
    // bucket/carry form, never a single-task per-group window.
    "q108_token_budget" -> ((s, dir) => {
      ext.Sampling.tokenBudgetPerGroup(tbl(s, dir, "documents"),
          "doc_id", "lang", "n_chars", budget = 15000L)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // ext sampling — token-budget mixture to per-language TARGETS,
    // longest-document-first (priority fill): the "25k chars en, 10k zh,
    // 8k de" mixture spec; unlisted languages dropped.
    "q109_token_budget_quality" -> ((s, dir) => {
      ext.Sampling.tokenBudgetTargets(tbl(s, dir, "documents"),
          "doc_id", "lang", "n_chars",
          budgets = Map("en" -> 25000L, "zh" -> 10000L, "de" -> 8000L),
          priorityCol = Some("n_chars"))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // ext dedup — corpus-wide exact PARAGRAPH dedup with document
    // reconstruction (the boilerplate killer): every doc gets a shared
    // boilerplate paragraph injected between two 8-word slices of its
    // text; the op keeps only the first occurrence of each normalized
    // paragraph corpus-wide and reassembles docs in order. The oracle
    // replays split/normalize/first-occurrence/reassemble in SQL.
    "q110_paragraph_dedup" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            array_join(slice(words, 1, 8), " "),
            lit("Subscribe to our newsletter!"),
            array_join(slice(words, 9, 8), " ")).as("text"))
      ext.Dedup.paragraphDedup(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext streaming — span-level continuous dedup, batch replay form: the
    // second "day" of documents is probed against the first day's gram
    // store; the oracle replays the same two-batch fold in SQL.
    "q104_stream_span_dedup" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val day1 = docs.filter(col("doc_id") % 3 =!= 0)
      // day-2 docs re-quote a 10-token prefix of a DAY-1 source doc
      // (doc_id ≡ 1 mod 9 ⊂ day1) under fresh ids, plus a unique tail
      val day2 = docs.filter(col("doc_id") % 9 === 1)
        .select((col("doc_id") + 90000).as("doc_id"),
          concat(array_join(slice(words, 1, 10), " "),
            lit(" tail"), col("doc_id").cast("string")).as("text"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q104").toString + "/grams"
      streaming.StreamingSpanDedup.byBatch(s, Seq(day1, day2), store,
          "doc_id", "text", k = 5)
        .orderBy("batch_id", "doc_id", "span_start")
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

    // ext dedup — cross-corpus (incremental) substring spans: a synthetic
    // "daily batch" copies a 12-token prefix from corpus documents and
    // appends a unique tail; the operator localizes exactly the copied
    // prefix as a span, probing batch windows against corpus grams.
    "q98_span_decontaminate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val batch = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 70000).as("doc_id"),
          concat(array_join(slice(words, 1, 12), " "),
            lit(" uniq"), col("doc_id").cast("string")).as("text"))
      ext.Dedup.duplicateSpansAgainst(batch, docs, "doc_id", "text", k = 5)
        .orderBy("doc_id", "span_start")
    }),

    "q95_training_pipeline" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val bench = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 50000).as("doc_id"),
          array_join(slice(words, 1, 8), " ").as("text"))
      ext.Curation.curateForTraining(docs, "doc_id", "text",
          benchmark = Some(bench),
          minQuality = 0.8, maxDup3gramFraction = 0.6,
          spanTrimK = Some(5), spanTrimMinDocs = 2,
          dedupThreshold = 0.8, splitPairThreshold = 0.6,
          decontaminateMinShared = 2L, testFraction = 0.1,
          chunkTokens = 12, overlapTokens = 4)
        .orderBy("doc_id", "chunk_index")
    }),

    // ext multimodal — REAL 24-bit BMP decode end-to-end: deterministic
    // gradient images are byte-built per document, the native byte-level
    // parser extracts dimensions and exact-integer Rec.601 mean luma, and
    // the oracle recomputes the luma in closed form over the pixel grid.
    "q93_bmp_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image", ext.Multimodal.makeBmp(id, 8, 4)))
      ext.Multimodal.bmpFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL 16-bit PCM WAV decode end-to-end: RIFF chunks
    // walked, RMS from an exact integer sum of squares; the oracle
    // recomputes it in closed form over the sample series.
    "q94_wav_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio", ext.Multimodal.makeWav(id, 256)))
      ext.Multimodal.wavFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("n_samples"), col("duration_ms"), col("rms"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL pure-JVM PNG decode end-to-end: deterministic
    // gradient images (alternating RGB/RGBA by id, scanline filters
    // cycling through all five PNG filter types) are zlib-compressed and
    // chunk-wrapped per document, the native decoder inflates + unfilters
    // + CRC-checks, and the oracle recomputes the exact-integer Rec.601
    // luma in closed form over the pixel grid (n_bytes is omitted: the
    // deflate length is not SQL-expressible).
    "q105_png_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image",
          ext.Multimodal.makePng(id, 8, 4, channels = (3 + id % 2).toInt)))
      ext.Multimodal.pngFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL pure-JVM baseline JPEG decode end-to-end:
    // deterministic flat-block images (mode cycles gray / YCbCr 4:4:4 /
    // 4:2:0 by id, every other id carries DRI+restart markers), the
    // native decoder walks markers, Huffman-decodes the entropy stream,
    // dequantizes + IDCTs + upsamples + converts color, and the oracle
    // recomputes the exact-integer Rec.601 luma in closed form (DC-only
    // blocks with an all-8s table decode exactly to their block value;
    // flat chroma 128 makes RGB == Y).
    "q107_jpeg_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val mode = (id % 3) match {
            case 0 => "gray"; case 1 => "444"; case _ => "420"
          }
          ext.Multimodal.Asset(id, "image",
            ext.Jpeg.makeJpeg(id, 4, 2, mode, restartEvery = (id % 2).toInt * 2))
        }
      ext.Multimodal.jpegFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext sampling — deterministic fixed-size cap per group: first 20 of
    // each language by md5-of-key rank (a pure function of the rows, like
    // every sampler here).
    "q91_per_group_sample" -> ((s, dir) => {
      ext.Sampling.perGroupSample(tbl(s, dir, "documents"),
          "doc_id", "lang", k = 20)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ext profile — dataset-version drift report: profile of the current
    // version diffed against the previous (here: full orders vs the
    // even-key half, with one column renamed to exercise added/removed).
    "q92_profile_drift" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val before = ext.Profile.columnProfile(
        orders.filter(col("o_orderkey") % 2 === 0)
          .withColumnRenamed("o_totalprice", "legacy_price"),
        Seq("o_orderkey", "o_orderstatus", "legacy_price"))
      val after = ext.Profile.columnProfile(orders,
        Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
      ext.Profile.diffProfiles(before, after)
        .withColumnRenamed("column", "col_name")
        .orderBy("col_name")
    }),

    // ext chunking — context-length chunking: overlapping token windows
    // (chunk 12, overlap 4 → stride 8), the split-long-documents half of
    // sequence shaping; pure per-row explode.
    "q89_chunk_documents" -> ((s, dir) => {
      ext.Chunking.chunkByTokens(tbl(s, dir, "documents"),
          "doc_id", "text", chunkTokens = 12, overlapTokens = 4)
        .orderBy("doc_id", "chunk_index")
    }),

    // ext chunking — greedy sequence packing: fill 64-token sequences in
    // (shard, id) order, one running-sum window per shard (the shard is
    // the parallelism lever at scale).
    "q90_pack_sequences" -> ((s, dir) => {
      ext.Chunking.packGreedy(
          tbl(s, dir, "documents").withColumn("shard", pmod(col("doc_id"), lit(8L))),
          "doc_id", "text", seqTokens = 64, shardCol = "shard")
        .orderBy("doc_id")
    }),

    // ext dedup — LEAKAGE-SAFE train/test split: the split key is the
    // near-dup component (exact pair path), so a document and its
    // near-twin can never land on opposite sides of the eval boundary;
    // membership is the same deterministic md5-bucket rule as q45/q72.
    // Shares the q70 pair graph + labels (nearDupGraph): the split is a
    // second policy over the same fixpoint, not a second fixpoint.
    "q88_leakage_safe_split" -> ((s, dir) => {
      val (_, labels) = nearDupGraph(s, dir)
      Dedup.leakageSafeSplitFromLabels(nearDupCorpus(s, dir), "doc_id",
          labels, testFraction = 0.25)
        .select("doc_id", "split_key", "split")
        .orderBy("doc_id")
    }),

    // ext text — corpus-unigram LM quality score (the perplexity-style
    // low-tail filter): mean ln p(token) per document, self-scored
    // against the corpus unigram distribution; decimal-summed so the
    // value is partition-order independent.
    "q87_unigram_logprob" -> ((s, dir) => {
      TextStats.unigramLogProbScore(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text")
        .orderBy("doc_id")
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

    // ext text — HTML → visible text extraction (the pre-gate pass of a
    // crawl pipeline): documents wrapped in synthetic boilerplate (style
    // block, comment, script holding fake tags, double-encoded entities)
    // must strip back to deterministic text; md5 keeps the gate compact.
    "q85_html_strip" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>T</title><style type=\"text/css\">p { color: red; }</style></head><body><h1>Doc "),
        col("doc_id"),
        lit("</h1> <p>"), col("text"),
        lit("</p><!-- trailing comment --><script>var x = \"<p>not text</p>\";</script>" +
          "<div>tail &amp;amp; &lt;b&gt;bold&lt;/b&gt;&nbsp;end</div></body></html>"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextStats.stripHtml(html).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // ext dedup — benchmark DECONTAMINATION: corpus documents sharing
    // >= 2 distinct 3-grams with a (derived) benchmark set — the n-gram
    // overlap gate run before training. The benchmark is every 11th
    // document's first 8 words, so contamination is planted by
    // construction; the engine must count shared grams and test docs hit.
    "q82_decontaminate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val bench = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 50000).as("doc_id"),
          array_join(slice(words, 1, 8), " ").as("text"))
      Dedup.ngramOverlapAcross(docs, bench, "doc_id", "text",
          n = 3, minShared = 2L)
        .orderBy("doc_id")
    }),

    // ext text — repetition/quality signals (the Gopher-style curation
    // gate): within-document duplicate 2-/3-gram fractions and top-token
    // dominance, all pure per-row column math over the shared canonical
    // tokenization.
    "q83_text_repetition" -> ((s, dir) => {
      val t = col("text")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextStats.duplicateNgramFraction(t, 2).as("dup_2gram_frac"),
        TextStats.duplicateNgramFraction(t, 3).as("dup_3gram_frac"),
        TextStats.topTokenShare(t).as("top_token_share"))
        .orderBy("doc_id")
    }),

    // ext streaming — cumulative foreachBatch column profile (continuous
    // data-QA), executed as a batch replay of three simulated micro-
    // batches (doc_id % 3): the SAME fold/merge code path the streaming
    // foreachBatch sink runs; true streaming covered in ScalaTest
    // (cross-batch state over MemoryStream).
    "q81_stream_profile" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val batches = (0 to 2).map(b => docs.filter(col("doc_id") % 3 === b))
      graft.streaming.StreamingProfile.cumulativeByBatch(
          batches, Seq("doc_id", "lang", "n_chars"))
        .withColumnRenamed("column", "col_name")
        .orderBy("batch_id", "col_name")
    }),

    // ext quality — Gopher rule filter (Rae et al. 2021 table A1) over
    // line-shaped text: three synthesized tail lines make every rule
    // column take both branches (bullets on mod 3, '#'+ellipsis symbols
    // on mod 5, an ellipsis-terminated line on mod 7, a stopword-dense
    // sentence otherwise); the flag is emitted, not filtered, so the
    // oracle checks every metric on every doc. Pure scan — the whole
    // rule set fuses into the parquet scan under codegen.
    "q126_gopher_rules" -> ((s, dir) => {
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          col("text"),
          when(col("doc_id") % 3 === 0, lit("\u2022 list item"))
            .otherwise(lit(
              "The data have to be of use, and that is that, with care.")),
          when(col("doc_id") % 5 === 0, lit("#x #y #z"))
            .otherwise(lit("a plain tail line")),
          when(col("doc_id") % 7 === 0, lit("to be continued..."))
            .otherwise(lit("a closing line."))).as("text"))
      ext.QualityFilters.withGopherRules(shaped)
        .drop("text")
        .orderBy("doc_id")
    }),

    // ext quality — C4 line-level cleaning (Raffel et al. 2020 §2.2):
    // terminal-punctuation + >=5-word + no-"javascript" line filter,
    // then the document gate (>=3 kept lines, no "{"). Line structure
    // synthesized from word slices so both branches of every predicate
    // occur; order preservation is part of the contract (clean_text is
    // the original minus dropped lines).
    "q127_c4_clean" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          lit("This is a good line with enough words here."),
          array_join(slice(words, 1, 3), " "),
          concat(array_join(slice(words, 4, 9), " "), lit(".")),
          when(col("doc_id") % 4 === 0,
            lit("Click here to enable javascript now."))
            .otherwise(lit("Another decent sentence appears right here.")),
          when(col("doc_id") % 6 === 0, lit("function f() { return 1; }"))
            .otherwise(lit("The last line ends properly."))).as("text"))
      ext.QualityFilters.withC4Clean(shaped)
        .drop("text")
        .orderBy("doc_id")
    }),

    // ext dedup — corpus-frequency boilerplate removal: every occurrence
    // of a line appearing in >= 3 DISTINCT docs goes (the complement of
    // q110's keep-first policy — template chrome has no original worth
    // keeping). A newsletter plug on even ids and a copyright footer on
    // mod 5 are the planted boilerplate; the per-doc unique lines must
    // survive untouched. One distinct-count aggregate + one anti join —
    // nothing pairwise.
    "q128_boilerplate_strip" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          array_join(slice(words, 1, 8), " "),
          when(col("doc_id") % 2 === 0,
            lit("Subscribe to our newsletter!"))
            .otherwise(concat(lit("unique middle "),
              col("doc_id").cast("string"))),
          array_join(slice(words, 9, 8), " "),
          when(col("doc_id") % 5 === 0,
            lit("Copyright 2026 Example Corp"))
            .otherwise(lit("All rights reserved to no one."))).as("text"))
      ext.Dedup.stripBoilerplate(shaped, "doc_id", "text", minDocs = 3)
        .orderBy("doc_id")
    }),

    // functions — character-distribution entropy as a scan-only native
    // expression (the built-in alternative is explode+groupBy: one
    // shuffled row PER CHARACTER of the corpus). Integer-scaled floored
    // terms (the q87 lnScaled stance) make the histogram sum replayable
    // by the oracle in any iteration order; a unicode tail on mod 4
    // pins codepoint (not byte/UTF-16) semantics.
    "q129_char_entropy" -> ((s, dir) => {
      import graft.functions.CharEntropyFunctions._
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" h\u00e9llo w\u00f6rld \u2026")))
            .otherwise(col("text")).as("text"))
      shaped.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          charLnSumScaled(col("text")).as("ln_sum_e9"),
          charEntropyE9(col("text")).as("entropy_e9"))
        .orderBy("doc_id")
    }),

    // ext web — per-domain quality roll-up (q122's keying + q17's score,
    // composed): aggregate-then-join (partial-agg exchange of one row
    // per domain per task, no window sort, no broadcast — a crawl has
    // ~10^8 domains), mean as floor(intSum/count) so one double division
    // is the only float op and the oracle replays it exactly.
    "q130_domain_quality" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val host = when(col("doc_id") % 5 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 5 === 1, "news.Example.co.uk")
        .when(col("doc_id") % 5 === 2, "Sub.Blog.example.ORG")
        .when(col("doc_id") % 5 === 3, "192.168.10.42")
        .otherwise("example.net")
      val url = concat(lit("https://"), host,
        lit("/Articles/"), col("doc_id").cast("string"))
      val scored = d.select(col("doc_id"), url.as("url"),
        floor(ext.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("q_e6"))
      ext.WebUrl.withDomainQuality(scored, "url", "q_e6")
        .select(col("doc_id"), col("reg_domain"), col("domain_docs"),
          col("domain_mean_scaled"),
          (col("domain_mean_scaled") >= 500000L).as("keep_domain"))
        .orderBy("doc_id")
    }),

    // ext graph — fixed-iteration PageRank (the crawl-quality prior) in
    // the integer-scaled engine-replayable form: two modular edge
    // families over a 101-node graph (varied in/out degrees, self-loop
    // collisions possible), 5 damped rounds, every float step a single
    // shared-literal multiply/divide + floor so the oracle replays the
    // fixed point as 5 chained CTEs. Edges partition once; only
    // (id, rank) frames move per round.
    "q131_pagerank" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 101).as("src"),
        ((col("doc_id") * 5 + 2) % 101).as("dst"))
      ext.LinkGraph.pageRank(e1.union(e2), iterations = 5)
        .withColumnRenamed("rank", "rank_e12")
        .orderBy("id")
    }),

    // ext graph — PageRank with the textbook dangling-mass term: sources
    // draw from mod 89 but destinations from mod 101, so nodes 89..100
    // appear only as sinks — their rank mass must be re-spread each round
    // (one scalar aggregate), not silently lost. Same integer-exact
    // replay contract as q131; the oracle adds one share CTE per round.
    "q132_pagerank_dangling" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 89).as("src"),
        ((col("doc_id") * 7 + 5) % 101).as("dst"))
      ext.LinkGraph.pageRank(e1.union(e2), iterations = 5,
          redistributeDangling = true)
        .withColumnRenamed("rank", "rank_e12")
        .orderBy("id")
    }),

    // ext graph — personalized PageRank: teleport mass lands per an
    // integer prior ((id²+3) mod 11 · 1e5 — several nodes get EXACTLY 0
    // and must end with rank 0 unless linked-to), dangling mass re-spread
    // per the same prior. e6-scaled normalization and 4 damped rounds
    // replay as chained CTEs with one dangling-scalar CTE per round.
    "q133_personalized_pagerank" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 89).as("src"),
        ((col("doc_id") * 7 + 5) % 101).as("dst"))
      val edges = e1.union(e2)
      val nodes = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
      val prior = nodes.select(col("id"),
        (((col("id") * col("id") + 3) % 11) * lit(100000L)).as("weight"))
      ext.LinkGraph.personalizedPageRank(edges, prior, iterations = 4)
        .withColumnRenamed("rank", "rank_e12")
        .orderBy("id")
    }),

    // ext multimodal — PROGRESSIVE (SOF2) JPEG decode, q107's closed-form
    // family re-encoded as a real multi-scan script (DC first at Al=1,
    // DC refinement, per-component EOB-run AC scans, interleaved DC for
    // color, restarts on odd ids): the web-crawl JPEG variant baseline
    // decoders reject. DC-only blocks ⇒ decoded pixel == block value
    // exactly, so mean luma keeps q107's closed form.
    "q136_jpeg_progressive" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val mode = if (id % 2 == 0) "gray" else "444"
          ext.Multimodal.Asset(id, "image",
            ext.Jpeg.makeProgressiveJpeg(id, 4, 2, mode,
              restartEvery = (id % 2).toInt * 2))
        }
      ext.Multimodal.jpegFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext dedup — INCREMENTAL connected components (cluster-label
    // maintenance, the daily-ingest shape): labels from the even-doc
    // edge batch fold in the odd-doc batch — fresh nodes, merges, and
    // fresh-side relabels all exercised — and must equal the full
    // recompute over the accumulated edges, which the oracle replays as
    // a recursive transitive closure (the q49 pattern).
    "q147_dedup_components_incr" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val b1 = d.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") % 89).as("id_a"),
          ((col("doc_id") * 3 + 1) % 89).as("id_b"))
      val b2 = d.filter(col("doc_id") % 2 === 1)
        .select(((col("doc_id") * 5) % 141).as("id_a"),
          ((col("doc_id") * 7 + 4) % 141).as("id_b"))
      ext.Dedup.connectedComponentsIncremental(
          ext.Dedup.connectedComponents(b1), b2)
        .withColumnRenamed("comp", "component")
        .orderBy("id")
    }),

    // streaming — CONTINUOUS duplicate-cluster maintenance: three edge
    // batches fold through the versioned label store (incremental CC per
    // batch, touched components only) and the FINAL label state must
    // equal the one-shot fixpoint over every edge seen, which the oracle
    // replays as one recursive closure.
    "q148_stream_components" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val b1 = d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") % 89).as("id_a"),
          ((col("doc_id") * 3 + 1) % 89).as("id_b"))
      val b2 = d.filter(col("doc_id") % 3 === 1)
        .select(((col("doc_id") * 5) % 141).as("id_a"),
          ((col("doc_id") * 7 + 4) % 141).as("id_b"))
      val b3 = d.filter(col("doc_id") % 3 === 2)
        .select(((col("doc_id") * 11 + 7) % 200).as("id_a"),
          ((col("doc_id") * 13 + 2) % 200).as("id_b"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q148").toString + "/labels"
      streaming.StreamingComponents.byBatch(s, Seq(b1, b2, b3), store)
        .withColumnRenamed("comp", "component")
        .orderBy("id")
    }),

    // ext sampling — temperature-flattened mix (α = 0.5): each group
    // capped at max(1, floor(sqrt(n_g))) rows by the deterministic md5
    // rank — head groups shrink toward √n, tail groups keep everything.
    // sqrt is IEEE-correctly-rounded, so the caps replay exactly.
    "q141_temperature_mix" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), (col("doc_id") % 23).as("grp"))
      ext.Sampling.temperatureSample(d, "doc_id", "grp")
        .select("doc_id", "grp")
        .orderBy("doc_id")
    }),

    // ext text — interpolated TRIGRAM LM score (one order above q124):
    // λ₃·p(w₃|w₁w₂) + λ₂·p(w₃|w₂) + λ₁·p(w₃), corpus-MLE conditionals,
    // floor(ln·1e12) BIGINT sums — the oracle replays every probability
    // in the same double-arithmetic shape.
    "q142_trigram_logprob" -> ((s, dir) => {
      // gate on score_e6, the engine-portable column: the raw double
      // mean is one ulp of ln() away from hash-diverging (see the
      // operator's coarsening note)
      ext.TextStats.trigramLogProbScore(
          tbl(s, dir, "documents")
            .filter(col("lang") === "en" && col("text").isNotNull),
          "doc_id", "text")
        .select("doc_id", "n_trigrams", "score_e6")
        .orderBy("doc_id")
    }),

    // ext web — canonical-URL dedup (the recrawl collapse): scheme case,
    // host case, default port, tracking params, and fragments all vary
    // across members of a group, every member canonicalizes to the same
    // url, and only the min-id member survives.
    "q143_url_dedup" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val scheme = when(col("doc_id") % 2 === 0, "HTTPS://")
        .otherwise("https://")
      val host = when(col("doc_id") % 2 === 0, "WWW.Example.COM")
        .otherwise("www.EXAMPLE.com")
      val port = when(col("doc_id") % 2 === 0, ":443").otherwise("")
      val query = when(col("doc_id") % 3 === 0, "?utm_source=x")
        .when(col("doc_id") % 3 === 1, "?gclid=1&utm_medium=y")
        .otherwise("")
      val frag = when(col("doc_id") % 2 === 0, "#top").otherwise(lit(""))
      val url = concat(scheme, host, port, lit("/page/"),
        (col("doc_id") % 50).cast("string"), query, frag)
      ext.WebUrl.dedupByCanonicalUrl(
          d.select(col("doc_id"), url.as("url")), "url", "doc_id")
        .select("doc_id", "url_canon")
        .orderBy("doc_id")
    }),

    // ext web — CRAWL CURATION CAPSTONE (the q95 composition pattern for
    // the web family): recrawl spellings collapse to one canonical URL
    // (min-id survivor) → blocklist audit drops blocked domains and
    // casino-marked paths → per-doc quality → per-domain roll-up with
    // the keep_domain verdict. Each stage is the already-gated operator;
    // the oracle chains the stage oracles.
    "q144_crawl_curation" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val r = col("doc_id") % 140
      val host = when(col("doc_id") % 5 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 5 === 1, "ads.tracker-hub.net")
        .when(col("doc_id") % 5 === 2, "Sub.Blog.example.ORG")
        .when(col("doc_id") % 5 === 3, "192.168.10.42")
        .otherwise("example.net")
      val scheme = when(col("doc_id") % 2 === 0, "HTTPS://")
        .otherwise("https://")
      val port = when(col("doc_id") % 2 === 0, ":443").otherwise("")
      val junk = when(col("doc_id") % 3 === 0, "?utm_source=x")
        .otherwise("")
      val path = concat(lit("/p/"), r.cast("string"),
        when(r < 20, "-casino").otherwise(lit("")))
      val url = concat(scheme, host, port, path, junk)
      val deduped = ext.WebUrl.dedupByCanonicalUrl(
        d.select(col("doc_id"), col("text"), url.as("url")), "url", "doc_id")
      val kept = ext.WebUrl.withBlocklist(deduped, "url",
          Seq("tracker-hub.net", "192.168.10.42"), Seq("casino"))
        .filter(col("keep_url"))
      val scored = kept.select(col("doc_id"), col("url"),
        floor(ext.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("q_e6"))
      ext.WebUrl.withDomainQuality(scored, "url", "q_e6")
        .select(col("doc_id"), col("reg_domain"), col("q_e6"),
          col("domain_docs"), col("domain_mean_scaled"),
          (col("domain_mean_scaled") >= 500000L).as("keep_domain"))
        .orderBy("doc_id")
    }),

    // ext text — Unicode script profile (the multilingual triage pass):
    // per-script codepoint counts over RE2-safe ranges, first-wins
    // dominant script, exact-integer ≥10%-minority mixed flag. Shaping
    // by doc_id mod 4 plants pure-Cyrillic, Latin+CJK-mixed, and
    // Arabic-dominant docs among the English base.
    "q138_script_profile" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val shaped = d.select(col("doc_id"),
        when(col("doc_id") % 4 === 1,
          lit("привет мир" +
            " как дела"))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"),
              lit(" 你好世界" +
                " こんにちは")))
          .when(col("doc_id") % 4 === 3,
            lit("مرحبا" +
              " بالعالم ok"))
          .otherwise(col("text")).as("text"))
      ext.TextStats.scriptProfile(shaped, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext web — crawl blocklist audit: registrable-domain exact matches
    // (subdomains caught via the reg-domain key) + path/query literal
    // substrings through ONE Aho–Corasick DFA pass; flags not filters.
    "q139_url_blocklist" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val host = when(col("doc_id") % 5 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 5 === 1, "ads.tracker-hub.net")
        .when(col("doc_id") % 5 === 2, "Sub.Blog.example.ORG")
        .when(col("doc_id") % 5 === 3, "192.168.10.42")
        .otherwise("example.net")
      val path = when(col("doc_id") % 7 === 0,
        concat(lit("/ads/banner"), col("doc_id").cast("string")))
        .otherwise(concat(lit("/Articles/"), col("doc_id").cast("string")))
      val query = when(col("doc_id") % 11 === 3, lit("?ref=CASINO"))
        .otherwise(lit(""))
      val url = concat(lit("https://"), host, path, query)
      ext.WebUrl.withBlocklist(d.select(col("doc_id"), url.as("url")),
          "url", Seq("tracker-hub.net", "192.168.10.42"),
          Seq("/ads/", "casino"))
        .select("doc_id", "url", "reg_domain", "domain_blocked",
          "n_blocked_hits", "keep_url")
        .orderBy("doc_id")
    }),

    // ext multimodal — G.711 telephony audio (WAV format 7 = μ-law,
    // 6 = A-law): the 8-bit logarithmic expansion is pure integer
    // (shift/mod), so the oracle replays every sample bit-for-bit and
    // the RMS is closed-form — the speech-corpus ingest path MP3/Vorbis
    // can't have without a codec lib.
    "q140_g711_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio",
          ext.Multimodal.makeWavG711(id, 256, mulaw = id % 2 == 0)))
      ext.Multimodal.wavFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("n_samples"), col("duration_ms"), col("rms"))
        .orderBy("doc_id")
    }),

    // ext multimodal — windowed frame energy over PCM audio (the VAD /
    // silence-trim primitive): one row per 100-sample frame, exact
    // BIGINT Σs² plus the derived rms; the last frame is short (56).
    "q146_audio_frames" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio",
          ext.Multimodal.makeWav(id, 256)))
      ext.Multimodal.wavFrameEnergy(assets, frameSamples = 100).toDF()
        .select(col("asset_id").as("doc_id"), col("frame_idx"),
          col("n_in_frame"), col("sum_sq"), col("rms"))
        .orderBy("doc_id", "frame_idx")
    }),

    // ext multimodal — IMA ADPCM (WAV format 17) decode: block headers +
    // adaptive nibble chain, pure integer. ROWS-ONLY by design: the
    // per-sample predictor state is sequential, so no SQL oracle can
    // replay it — MultimodalSpec pins the decode against an independent
    // reference walk of the same public tables instead (the q23 stance).
    "q145_adpcm_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "audio",
          ext.Multimodal.makeWavAdpcm(id, 256 + (id % 3).toInt * 128)))
      ext.Multimodal.wavFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("n_bytes"),
          col("n_samples"), col("duration_ms"), col("rms"))
        .orderBy("doc_id")
    }),

    // ext multimodal — PNG variant surface (the web-crawl forms beyond
    // q105's truecolor): grayscale and palette color types at sub-byte
    // depths, gray+alpha, and Adam7 INTERLACE, every scanline still
    // rotating through all five filters. Closed forms: gray s·255/(2^d−1)
    // with s=(id+x+y) mod 2^d; palette luma (id + idx) mod 256.
    "q137_png_variants" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val bytes = (id % 5) match {
            case 0 => ext.Multimodal.makePngVariant(id, 13, 7, 0, 8)
            case 1 => ext.Multimodal.makePngVariant(id, 13, 7, 0, 4,
              interlaced = true)
            case 2 => ext.Multimodal.makePngVariant(id, 13, 7, 3, 8)
            case 3 => ext.Multimodal.makePngVariant(id, 13, 7, 3, 2,
              interlaced = true)
            case _ => ext.Multimodal.makePngVariant(id, 13, 7, 6, 8,
              interlaced = true)
          }
          ext.Multimodal.Asset(id, "image", bytes)
        }
      ext.Multimodal.pngFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // streaming — CONTINUOUS corpus-frequency boilerplate strip (q128's
    // policy at ingest time, on the countCol sum-merge mode of the
    // KeyedBatchStore): two batches split doc_id mod 3; 'Rare promo
    // banner' lives in exactly docs 0-3, so batch 0 sees 2 < minDocs
    // carriers and keeps it while batch 1's two more carriers cross the
    // cumulative threshold and strip it — the mid-stream crossing, at
    // any scale factor. The mass template lines strip in both batches.
    "q135_stream_boilerplate" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          array_join(slice(words, 1, 8), " "),
          when(col("doc_id") % 2 === 0,
            lit("Subscribe to our newsletter!"))
            .otherwise(concat(lit("unique middle "),
              col("doc_id").cast("string"))),
          when(col("doc_id") < 4, lit("Rare promo banner"))
            .otherwise(lit("All rights reserved to no one."))).as("text"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q135").toString + "/lines"
      streaming.StreamingBoilerplate.byBatch(s,
          Seq(shaped.filter(col("doc_id") % 3 =!= 0),
            shaped.filter(col("doc_id") % 3 === 0)),
          store, "doc_id", "text", minDocs = 3)
        .orderBy("batch_id", "doc_id")
    }),

    // ext web+graph — the crawl-frontier prior END-TO-END (the q95
    // composition pattern): per-domain quality roll-up (q130's operator)
    // feeds personalized PageRank (q133's) over the domain link graph, so
    // a domain's authority is teleport-biased by its content quality —
    // the score a frontier scheduler would sort on. 37 synthetic
    // registrable domains keyed by doc_id mod 37; link u→v when a doc of
    // domain u references domain (7u+3 style). Oracle chains the q130
    // aggregate into the q133 round CTEs.
    "q134_crawl_prior" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val url = concat(lit("https://www.site"),
        (col("doc_id") % 37).cast("string"),
        lit(".com/a/"), col("doc_id").cast("string"))
      val scored = d.select(col("doc_id"),
        (col("doc_id") % 37).as("domain_id"), url.as("url"),
        floor(ext.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("q_e6"))
      val dq = ext.WebUrl.withDomainQuality(scored, "url", "q_e6")
      // one row per domain: reg_domain ↔ domain_id is 1:1 by construction
      val domains = dq.select(col("domain_id"), col("reg_domain"),
        col("domain_mean_scaled")).distinct()
      val prior = domains.select(col("domain_id").as("id"),
        col("domain_mean_scaled").as("weight"))
      val edges = d.select((col("doc_id") % 37).as("src"),
        ((col("doc_id") * 7 + 3) % 37).as("dst"))
      ext.LinkGraph.personalizedPageRank(edges, prior, iterations = 4)
        .join(domains, col("id") === domains("domain_id"))
        .select(col("domain_id"), col("reg_domain"),
          col("domain_mean_scaled").as("quality_e6"),
          col("rank").as("rank_e12"))
        .orderBy("domain_id")
    }),

    // ext graph — fixed-iteration HITS over the q131 edge families:
    // hubs (pages worth crawling FROM) and authorities (pages worth
    // keeping), e6-scaled L1-normalized integer iterates, one driver
    // scalar per half-round. The oracle replays the 3 rounds as chained
    // CTEs with a scalar divisor CTE per normalization.
    "q149_hits" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 101).as("src"),
        ((col("doc_id") * 5 + 2) % 101).as("dst"))
      ext.LinkGraph.hits(e1.union(e2), iterations = 3)
        .orderBy("id")
    }),

    // ext graph — co-citation pair counts (text-free related-page
    // signal): 23 citers with out-degree ≤ 3 BY CONSTRUCTION (each dst
    // is a function of the citer value, so degrees don't grow with the
    // corpus), plus one link-farm hub citing doc_id % 47 — always past
    // the out-degree cap at every sf, so the farm cut is exercised and
    // its pairs must NOT appear. Pairs emit inside the citer's task
    // from the capped out-list — no edge-table self-join.
    "q150_cocitation" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val src = col("doc_id") % 23
      val e1 = d.select(src.as("src"), ((src % 5) * 3).as("dst"))
      val e2 = d.select(src.as("src"), ((src % 7) * 2 + 1).as("dst"))
      val e3 = d.select(src.as("src"), ((src % 4) * 5 + 2).as("dst"))
      val hub = d.select(lit(999L).as("src"), (col("doc_id") % 47).as("dst"))
      ext.LinkGraph.cocitation(e1.union(e2).union(e3).union(hub),
          maxOutDeg = 12, minCocitations = 2L)
        .orderBy("id_a", "id_b")
    }),

    // ext web — robots.txt longest-match evaluation (RFC 9309 / Google
    // semantics: longest matching prefix wins, Allow wins length ties,
    // no match = allowed): 7 synthetic domains × 11 rule shapes incl. a
    // deliberate same-length Allow/Disallow tie on /p0 and deeper
    // overrides both ways. The engine extracts host+path from the URL
    // string; the verdict is ONE integer max (2·len + allow), no window.
    "q151_robots" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val urls = d.select(col("doc_id"),
        concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 3).cast("string")).as("url"))
      val rules = d.select(
        concat(lit("d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("domain"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
          | WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
          | WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
          | WHEN 9 THEN '/p4/x1' ELSE '/p0' END""".stripMargin)
          .as("rule_path"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
          | WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN false
          | WHEN 6 THEN true WHEN 7 THEN true WHEN 8 THEN false
          | WHEN 9 THEN true ELSE true END""".stripMargin).as("allow"))
        .distinct()
      ext.WebUrl.robotsEvaluate(urls, "doc_id", "url", rules)
        .orderBy("doc_id")
    }),

    // ext crawl storage — WARC (ISO 28500) record ROUNDTRIP: spec-shaped
    // response records are byte-built around each document's UTF-8
    // payload, then the byte-level parser re-extracts type/URI/date/
    // Content-Length and a SHA-256 payload digest; the oracle recomputes
    // every field (incl. the digest) from the source text.
    "q152_warc" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val recs = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, ext.Warc.makeRecord(
            s"https://example.com/doc/$id",
            f"2026-01-${id % 28 + 1}%02dT00:00:00Z",
            Option(text).getOrElse("")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.toDF("doc_id", "warc")
      ext.Warc.parseRecords(recs, "doc_id", "warc").toDF()
        .select(col("record_id").as("doc_id"), col("warc_type"),
          col("target_uri"), col("warc_date"), col("content_length"),
          col("payload_sha256"))
        .orderBy("doc_id")
    }),

    // ext text — sentence segmentation stats: boundaries are injected
    // deterministically (the corpus has no punctuation — every
    // table/fast/stream occurrence gains a '.'), then the RE2-safe
    // segmenter splits on [.!?]+ runs and emits exact-integer counts
    // with the floor-scaled mean. Pure in-scan array exprs, no explode.
    "q153_sentences" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          regexp_replace(col("text"), "(table|fast|stream)", "$1.")
            .as("text"))
      ext.TextStats.sentenceStats(d, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext multimodal — magic-byte MIME sniffing (the pre-decode router):
    // seven payload families cycle by doc_id — every in-repo codec plus
    // raw UTF-8 text — and the codegen'd when-chain must route each to
    // its type without attempting a decode.
    "q154_mime_sniff" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val bytes = (id % 7) match {
            case 0 => ext.Multimodal.makeBmp(id, 4, 2)
            case 1 => ext.Multimodal.makePng(id, 4, 2)
            case 2 => ext.Jpeg.makeJpeg(id, 4, 2)
            case 3 => ext.Gif.makeGif(id, 4, 2)
            case 4 => ext.Multimodal.makeWav(id, 16)
            case 5 => ext.Qoi.makeQoi(id, 4, 4)
            case _ => Option(text).getOrElse("")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
          (id, bytes)
        }.toDF("doc_id", "data")
      assets.select(col("doc_id"),
          ext.Multimodal.sniffMime(col("data")).as("mime"))
        .orderBy("doc_id")
    }),

    // ext multimodal — REAL QOI decode end-to-end: the greedy reference
    // encoder compresses a deterministic pixel series built to hit every
    // op (alternating constant rows → RUN + INDEX, unit-step rows →
    // DIFF, (1,2,1)-step rows → LUMA, row seams → RGB escapes; RGB/RGBA
    // alternating by id), the decoder walks the op stream, and the
    // oracle recomputes the exact-integer Rec.601 luma in closed form
    // over the 9×12 grid.
    "q155_qoi_decode" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image", ext.Qoi.makeQoi(id, 9, 12)))
      ext.Multimodal.qoiFeatures(assets).toDF()
        .select(col("asset_id").as("doc_id"),
          col("width"), col("height"), col("channels"), col("mean_luma"))
        .orderBy("doc_id")
    }),

    // ext dedup — leakage-safe K-FOLD assignment (q88's guarantee, k
    // ways): folds key on the shared near-dup component labels, so a
    // cluster of near-copies lands in ONE fold; the fold is k-1 string
    // comparisons of the md5 prefix against range boundaries — no
    // hash-to-int conversion for the oracle to mismatch on.
    "q156_kfold" -> ((s, dir) => {
      val (_, labels) = nearDupGraph(s, dir)
      ext.Dedup.kFoldSplitFromLabels(nearDupCorpus(s, dir), "doc_id",
          labels, k = 5)
        .select("doc_id", "split_key", "fold")
        .orderBy("doc_id")
    }),

    // streaming — CONTINUOUS exact heavy-hitters: three event batches
    // fold per-key partial counts through the counting store, and the
    // final top-20 (count DESC, key ASC — the deterministic tiebreak)
    // must equal the one-shot group-count top-k over everything seen,
    // which the oracle computes directly.
    "q157_stream_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .select(concat(col("event_type"), lit("#"),
          (col("user_id") % 50).cast("string")).as("key"), col("event_id"))
      val batches = (0 to 2).map(i =>
        e.filter(col("event_id") % 3 === i).select("key"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q157").toString + "/counts"
      streaming.StreamingTopK.byBatch(s, batches, store, "key", k = 20)
        .orderBy(col("n_total").desc, col("key"))
    }),

    // ext graph+text — anchor-text aggregation: each document "links"
    // to target (doc_id·7+3) mod 37 with its first two words as anchor;
    // the top-3 terms per target (count DESC, term ASC) are the
    // off-page topic labels. Counts collapse before the rank window
    // ever sorts anything.
    "q158_anchor_text" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val anchors = d.select(((col("doc_id") * 7 + 3) % 37).as("dst"),
        array_join(slice(split(col("text"), " "), 1, 2), " ")
          .as("anchor_text"))
      ext.LinkGraph.anchorTopTerms(anchors, "dst", "anchor_text", k = 3)
        .orderBy("dst", "rank")
    }),

    // ext graph — semi-supervised LABEL PROPAGATION: sparse seed labels
    // (every 7th node of the 89-node symmetric graph) spread by
    // clamped-seed majority vote with the min-label tiebreak; 3 fixed
    // rounds replay as chained CTEs (votes → majority → fold). Nodes no
    // labeled neighbor has reached stay null.
    "q159_label_prop" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e0 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * 3 + 1) % 89).as("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = d.select((col("doc_id") % 89).as("id"))
        .filter(col("id") % 7 === 0).distinct()
        .select(col("id"), (expr("id div 7") % 3).as("label"))
      ext.LinkGraph.labelPropagation(edges, seeds, iterations = 3)
        .orderBy("id")
    }),

    // ext multimodal — POSIX ustar member listing: two-member archives
    // (body + meta) are byte-built per document with real headers
    // (octal sizes, checksums, 512-byte blocking), the parser walks the
    // blocks, and the oracle recomputes every member row from the
    // source text.
    "q160_tar_members" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val tars = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, ext.Archives.makeTar(Seq(
            (s"docs/$id/body.txt", Option(text).getOrElse("")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)),
            (s"docs/$id/meta.json", s"""{"id":$id}"""
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)))))
        }.toDF("doc_id", "tar")
      ext.Archives.tarMembers(tars, "doc_id", "tar").toDF()
        .select(col("archive_id").as("doc_id"), col("member_index"),
          col("name"), col("size"), col("type_flag"))
        .orderBy("doc_id", "member_index")
    }),

    // ext multimodal — gzip (RFC 1952) ROUNDTRIP: each document's UTF-8
    // bytes are deflate-compressed with standard framing, the parser
    // checks magic/method, inflates through the CRC/ISIZE-verifying
    // stream, and the decompressed length + sha-256 must match the
    // oracle's recomputation from the source text. (Compressed size is
    // omitted: deflate output length is not SQL-expressible — the PNG
    // n_bytes stance.)
    "q161_gzip_roundtrip" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val gzs = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, ext.Archives.gzip(Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.toDF("doc_id", "gz")
      ext.Archives.gzipInfos(gzs, "doc_id", "gz").toDF()
        .select(col("record_id").as("doc_id"), col("decompressed_bytes"),
          col("decompressed_sha256"))
        .orderBy("doc_id")
    }),

    // ext profile — recency-decayed activity mass per event type:
    // weight halves every 3 days before the fixed reference date, as an
    // exact power-of-two integer decay (no exp() float drift), summed
    // in one partial-aggregated pass.
    "q162_decay_counts" -> ((s, dir) => {
      ext.Profile.decayedCounts(tbl(s, dir, "events"), "event_type", "ts",
          refDate = "2024-02-01", halfLifeDays = 3)
        .orderBy("event_type")
    }),

    // CAPSTONE — crawl-frontier gate: the 37-domain link graph's
    // PageRank (q131 machinery) joined onto per-URL robots verdicts
    // (q151 machinery) — the two signals a frontier scheduler combines:
    // is this URL crawlABLE, and how authoritative is its domain. Only
    // allowed URLs survive, carrying their domain rank.
    "q163_frontier_score" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val edges = d.select((col("doc_id") % 37).as("src"),
        ((col("doc_id") * 7 + 3) % 37).as("dst"))
      val ranks = ext.LinkGraph.pageRank(edges, iterations = 5)
      val urls = d.select(col("doc_id"), (col("doc_id") % 37).as("domain_id"),
        concat(lit("https://www.site"), (col("doc_id") % 37).cast("string"),
          lit(".com/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 3).cast("string")).as("url"))
      val rules = d.select(
        concat(lit("www.site"), (col("doc_id") % 37).cast("string"),
          lit(".com")).as("domain"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
          | WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
          | WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
          | WHEN 9 THEN '/p4/x1' ELSE '/p0' END""".stripMargin)
          .as("rule_path"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
          | WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN false
          | WHEN 6 THEN true WHEN 7 THEN true WHEN 8 THEN false
          | WHEN 9 THEN true ELSE true END""".stripMargin).as("allow"))
        .distinct()
      ext.WebUrl.robotsEvaluate(urls.select("doc_id", "url"),
          "doc_id", "url", rules)
        .filter(col("allowed"))
        .join(urls.select("doc_id", "domain_id"), Seq("doc_id"))
        .join(ranks.withColumnRenamed("id", "domain_id"), Seq("domain_id"))
        .select(col("doc_id"), col("url"),
          col("rank").as("domain_rank_e12"))
        .orderBy("doc_id")
    }),

    // ext graph — multi-source BFS crawl depth: seeds are the ids ≡ 0
    // mod 10 of the 89-node graph, 4 hop-budget rounds (Bellman-Ford
    // shape, min-aggregate per round); nodes no seed reaches within the
    // budget stay null. Exact small integers replay as chained CTEs.
    "q164_hop_distance" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * 3 + 1) % 89).as("dst"))
      val e2 = d.select(((col("doc_id") * 5) % 89).as("src"),
        ((col("doc_id") * 7 + 4) % 89).as("dst"))
      val edges = e1.union(e2)
      val seeds = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .distinct().filter(col("id") % 10 === 0)
      ext.LinkGraph.hopDistance(edges, seeds, maxHops = 4)
        .orderBy("id")
    }),

    // ext graph — triangle enumeration on a ring-with-chords graph (40
    // guaranteed triangles {i, i+1, i+2}) plus a constant-apex fan that
    // pushes node 0's oriented degree past the cap: its 3 triangles
    // must vanish, the other 37 must survive — the link-farm cut,
    // replayed by the oracle's identical cap logic.
    "q165_triangles" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val i = col("doc_id") % 40
      val ring = d.select(i.as("src"), ((i + 1) % 40).as("dst"))
      val chords = d.select(i.as("src"), ((i + 2) % 40).as("dst"))
      val fan = d.select(lit(0L).as("src"),
        (col("doc_id") % 27 + 14).as("dst"))
      ext.LinkGraph.triangles(ring.union(chords).union(fan), maxDeg = 12)
        .orderBy("id_a", "id_b", "id_c")
    }),

    // source format — JSONL structured parse with the PERMISSIVE
    // corrupt-record channel (the q10 stance for JSON ingest): every
    // 13th record is malformed and must land whole in the corrupt
    // column with null fields, the rest parse to typed columns; all
    // inside the scan via from_json, no files, no UDF.
    "q166_jsonl_parse" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val line = when(col("doc_id") % 13 === 0,
        concat(lit("{\"id\": "), col("doc_id").cast("string"), lit(", lang")))
        .otherwise(concat(lit("{\"id\": "), col("doc_id").cast("string"),
          lit(", \"lang\": \""), coalesce(col("lang"), lit("und")),
          lit("\", \"n\": "), (col("doc_id") % 7).cast("string"), lit("}")))
      d.select(col("doc_id"), line.as("__json"))
        .withColumn("__p", from_json(col("__json"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, lang STRING, n INT, _bad STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_bad")))
        .select(col("doc_id"), col("__p.id").as("id"),
          col("__p.lang").as("lang"), col("__p.n").as("n"),
          col("__p._bad").as("corrupt_record"))
        .orderBy("doc_id")
    }),

    // sink/source format — ORC interchange roundtrip: the documents
    // table writes as ORC (snappy) and reads back through the ORC
    // scan; the per-lang aggregate over the roundtripped frame must
    // equal the oracle's aggregate over the original parquet. Covers
    // the second columnar format a lakehouse exchange needs.
    "q167_orc_roundtrip" -> ((s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft-q167").toString + "/docs_orc"
      tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").format("orc")
        .option("compression", "snappy").save(out)
      s.read.format("orc").load(out)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),

    // ext graph — reciprocal-link detection (the mutual-citation /
    // link-scheme signal): ordered pairs where BOTH directions exist,
    // found by one self-equi-join on the oriented key — no cross join.
    "q168_reciprocal_links" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e = d.select((col("doc_id") % 61).as("src"),
          ((col("doc_id") * 3 + 2) % 61).as("dst"))
        .union(d.select(((col("doc_id") * 5 + 1) % 61).as("src"),
          ((col("doc_id") * 2) % 61).as("dst")))
        .union(d.filter(col("doc_id") % 4 === 0)
          .select(((col("doc_id") * 7) % 61).as("src"),
            ((col("doc_id") * 11 + 3) % 61).as("dst")))
        .union(d.filter(col("doc_id") % 4 === 0)
          .select(((col("doc_id") * 11 + 3) % 61).as("src"),
            ((col("doc_id") * 7) % 61).as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
      e.join(e.select(col("dst").as("src"), col("src").as("dst")),
          Seq("src", "dst"), "left_semi")
        .filter(col("src") < col("dst"))
        .select(col("src").as("id_a"), col("dst").as("id_b"))
        .orderBy("id_a", "id_b")
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

    // ext search — exact positional phrase match ("table value"):
    // postings materialize for the phrase's terms only, adjacency is a
    // (doc, pos+i) semi-join chain, and overlapping matches count — the
    // oracle checks via an independent position-list join.
    "q173_phrase_match" -> ((s, dir) => {
      ext.TextStats.phraseMatch(
          tbl(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", "table value")
        .orderBy("doc_id")
    }),

    // ext multimodal — perceptual image hashing (dHash + aHash) over REAL
    // byte-decoded 18×16 textured BMPs: exact-integer 2×2 box sums
    // downsample to the classic 9×8 grid, comparisons are division-free,
    // and the oracle replays both 64-bit hashes closed-form over the
    // pixel formula (full 64 bits via a HUGEINT two's-complement fold).
    "q174_image_phash" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => ext.Multimodal.Asset(id, "image",
          ext.Multimodal.makeBmpTextured(id, 18, 16)))
      ext.Multimodal.imageHashes(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("dhash"), col("ahash"))
        .orderBy("doc_id")
    }),

    // ext multimodal dedup — image near-duplicate pairs: groups of 8
    // consecutive doc_ids share one textured base image, each member
    // perturbed at a different single pixel (≤2 dHash bits per member,
    // so intra-group hamming ≤4); pairing is the pigeonhole band join
    // over the 8-byte hashes — pixels never shuffle — which is LOSSLESS
    // at distance ≤ 6, so the oracle is the plain all-pairs filter.
    "q175_image_neardup" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val p = (id % 8).toInt
          ext.Multimodal.Asset(id, "image",
            ext.Multimodal.makeBmpTextured(id / 8, 18, 16,
              flip = Some((p * 2, p))))
        }
      val hashes = ext.Multimodal.imageHashes(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("dhash"))
      ext.Dedup.hammingPairs(hashes, "doc_id", "dhash", maxDistance = 6)
        .orderBy("id_a", "id_b")
    }),

    // ext archives — zstd frame ROUNDTRIP (the modern training-corpus
    // codec; zstd-jni rides the Spark classpath): compress per doc in
    // one map stage, decode through the real frame parser, gate on the
    // recovered payload's digest. Compressed size is omitted from the
    // gate (it is a zstd-library detail, not an engine semantic).
    "q176_zstd_roundtrip" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val zs = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          (id, ext.Archives.zstd(Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }.toDF("doc_id", "zst")
      ext.Archives.zstdInfos(zs, "doc_id", "zst").toDF()
        .select(col("record_id").as("doc_id"), col("decompressed_bytes"),
          col("decompressed_sha256"))
        .orderBy("doc_id")
    }),

    // ext linkage — blocked fuzzy join (entity resolution): typo'd probe
    // names re-linked to the name table through the (4-char prefix, ±2
    // length band) blocking contract + native codegen'd Jaro–Winkler
    // (byte-semantics pinned to DuckDB's, verified on adversarial
    // pairs). The oracle replays the same blocking predicate, so the
    // equi-join+explode blocking must lose exactly nothing. Score is
    // round-e4: every gate value sits ≥0.01 from a rounding boundary
    // (measured), so double noise cannot flip it.
    "q177_fuzzy_join" -> ((s, dir) => {
      val names = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          trim(lower(substring(col("text"), 1, 20))).as("name"))
      val probes = names.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 90000).as("probe_id"),
          expr("concat(substr(name,1,4), substr(name,6,1), " +
            "substr(name,5,1), substr(name,7))").as("name"))
      ext.Linkage.fuzzyJoin(probes, "probe_id", "name",
          names, "doc_id", "name", threshold = 0.85, lengthBand = 2,
          blockPrefix = 4)
        .select(col("id_l"), col("id_r"),
          round(col("jw") * 10000).cast("long").as("jw_e4"))
        .orderBy("id_l", "id_r")
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

    // ext crawl — sitemap XML entry extraction: per-doc synthetic flat
    // sitemaps (entries with/without optionals, one loc-less block that
    // must be dropped, an even-id extra entry), exploded to one row per
    // <url> via regexp_extract_all inside codegen. The oracle re-parses
    // the identically-synthesized XML with DuckDB's RE2.
    "q180_sitemap" -> ((s, dir) => {
      val id = col("doc_id")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset>"),
        lit("<url><loc>https://d"), (id % 7).cast("string"),
        lit(".example.com/p"), (id % 5).cast("string"),
        lit("</loc><lastmod>2024-01-0"), ((id % 9) + 1).cast("string"),
        lit("</lastmod><priority>0."), (id % 10).cast("string"),
        lit("</priority></url>"),
        lit("<url><loc> https://m"), (id % 3).cast("string"),
        lit(".example.com/ </loc></url>"),
        lit("<url><lastmod>2024-02-01</lastmod></url>"),
        when(id % 2 === 0, lit("<url><loc>https://x.example.com/q</loc>" +
          "<priority>1.0</priority></url>")).otherwise(lit("")),
        lit("</urlset>"))
      val maps = tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, xml.as("xml"))
      ext.WebUrl.parseSitemap(maps, "doc_id", "xml")
        .orderBy("doc_id", "entry_index")
    }),

    // ext multimodal — charset sniffing over binary payloads: BOM
    // dispatch + exact RFC 3629 UTF-8 well-formedness as a hex regex,
    // pure codegen'd column expressions (no decode attempt — the router
    // that must run BEFORE ANSI decode()). Payload mix per doc id covers
    // every label; the oracle derives labels closed-form.
    "q181_charset_sniff" -> ((s, dir) => {
      val id = col("doc_id")
      val utf8 = encode(col("text"), "UTF-8")
      def bytesLit(bs: Int*): Column = lit(bs.map(_.toByte).toArray)
      val payload = when(id % 5 === 0,
          concat(bytesLit(0xEF, 0xBB, 0xBF), utf8))
        .when(id % 5 === 1, concat(bytesLit(0xFF, 0xFE), utf8))
        .when(id % 5 === 2, concat(bytesLit(0xFE, 0xFF), utf8))
        .when(id % 5 === 3, concat(bytesLit(0xA9), utf8))
        .when(id % 10 === 4, encode(concat(col("text"), lit("é")), "UTF-8"))
        .otherwise(utf8)
      tbl(s, dir, "documents")
        .filter(id.isNotNull && col("text").isNotNull)
        .select(id, ext.Multimodal.sniffCharset(payload).as("charset"))
        .orderBy("doc_id")
    }),

    // ext selection — DSIR importance weights (hashed word-bigram
    // features, target = curated en subset vs the raw corpus): floored
    // e12 ln terms make every per-doc sum an order-free BIGINT the
    // oracle replays term-for-term; the dims-row weight table broadcasts
    // into the scoring join, so raw documents never shuffle. The gate
    // swaps xxhash64 bucketing for the q169 portable hash so both
    // engines bucket identically.
    "q182_importance_weights" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val target = docs.filter(col("lang") === "en" && col("doc_id") % 2 === 0)
      val portable = (g: Column) =>
        ((length(g) * 7 + ascii(substring(g, 1, 1)) * 31
          + ascii(substring(concat(g, lit("_")), 2, 1))) % 32).cast("int")
      ext.TextStats.importanceWeights(docs, target, "doc_id", "text",
          dims = 32, n = 2, hashDim = Some(portable))
        .orderBy("doc_id")
    }),

    // ext graph — k-core peeling (k=5, 4 fixed rounds): a mod-61
    // quasi-random periphery (avg degree ~4, melts under k=5 over a
    // genuine multi-round cascade) plus a planted 13-clique (the
    // independent-residue pair (id%13, (id//13)%13) covers all 78
    // edges) that survives as the core. Per round one degree aggregate
    // + two semi-joins over edges that only shrink, lineage cut per
    // round; fixed-count rounds keep the gate SQL-unrollable, the
    // fixpoint property is spec-asserted.
    "q183_kcore" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 61).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 61).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 61).as("src"),
        ((col("doc_id") * 5 + 2) % 61).as("dst"))
      val e3 = d.select((col("doc_id") % 13).as("src"),
        (expr("doc_id div 13") % 13).as("dst"))
      ext.LinkGraph.kCore(e1.union(e2).union(e3), k = 5, rounds = 4)
        .orderBy("id")
    }),

    // streaming — stream–stream interval join (view → purchase
    // attribution within 30 min, same user): watermarks + the event-time
    // bound are what make the state store finite on an unbounded stream;
    // the identical plan replays in batch here (withWatermark is a
    // documented batch no-op), so the oracle is a plain SQL interval
    // join. Cross-batch matching and late-row eviction are spec-driven.
    "q184_stream_interval_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      graft.streaming.StreamJoin.intervalJoin(views, buys, "user_id",
          "ts", "ts", maxDelay = "30 minutes")
        .select(col("l_event_id").as("view_id"),
          col("r_event_id").as("purchase_id"),
          col("l_user_id").as("user_id"),
          (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
            .as("micros_to_purchase"))
        .orderBy("view_id", "purchase_id")
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

    // ext tokenizer — unigram-LM (SentencePiece-family) vocabulary:
    // substring counts over the DISTINCT-WORD frame (never the corpus),
    // chars force-included for coverage, (count DESC, piece ASC) total
    // order, e12 log-probs. Unlike BPE's sequential merges this learn
    // is fully SQL-replayable — the oracle re-runs the whole selection.
    "q186_unigram_vocab" -> ((s, dir) => {
      ext.UnigramLm.learnFrame(tbl(s, dir, "documents"), "text",
        vocabSize = 200, maxPieceLen = 4, minCount = 2L)
    }),

    // ext tokenizer — exact Viterbi tokenization under the q186
    // vocabulary (shared through the gate memo — the q112/q119 lesson):
    // integer e12 scores, ties to fewer pieces then longer first piece.
    // Rows-only by design (Viterbi replay is not SQL-expressible);
    // the segmentation rules are spec-pinned against a plain reference.
    "q187_unigram_tokenize" -> ((s, dir) => {
      ext.UnigramLm.tokenize(
          tbl(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", unigramVocab200(s, dir), maxPieceLen = 4)
        .orderBy("doc_id")
    }),

    // ext layout — parquet BLOOM-FILTER write + point-lookup read-back:
    // the equality-probe pruning lever min/max stats can't give a
    // high-cardinality key. The gate round-trips through a real
    // bloom-enabled write and an equality-ish filtered read (values
    // verified against the raw table); the footer-level assertions
    // (filters present, membership answers) live in LayoutSpec.
    "q188_bloom_layout" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "source", "lang")
      val dest = java.nio.file.Files.createTempDirectory("graft-bloom")
        .toString + "/docs"
      ext.Layout.writeWithBloomFilters(docs, dest, Seq("doc_id"),
        ndvPerGroup = 1000L, numFiles = 4)
      s.read.parquet(dest)
        .filter(col("doc_id") % 37 === 1)
        .orderBy("doc_id")
    }),

    // ext audio curation — leading/trailing silence trim over REAL PCM
    // WAV bytes: per-frame exact integer Σs², active span + energy per
    // asset. Padded frames (lead = id%3, trail = (id//3)%2 of 5) keep
    // makeWav's closed form, so the oracle replays every frame energy.
    "q189_trim_silence" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          ext.Multimodal.Asset(id, "audio",
            ext.Multimodal.makeWavPadded(id, 800,
              lead = (id % 3).toInt, trail = ((id / 3) % 2).toInt))
        }
      ext.Multimodal.trimSilence(assets, frameSamples = 160).toDF()
        .select(col("asset_id").as("doc_id"), col("n_frames"),
          col("first_active"), col("last_active"),
          col("n_active_frames"), col("active_sum_sq"))
        .orderBy("doc_id")
    }),

    // ext crawl — per-host politeness schedule: rank within host in id
    // order × the host's crawl delay (policy-bounded window; see the
    // operator doc). Delays derive per-domain from the id so the oracle
    // replays the config join and the ranking.
    "q190_politeness" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val urls = d.select(col("doc_id"),
        concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 5).cast("string")).as("url"))
      val delays = d.select(
        concat(lit("d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("domain"),
        ((col("doc_id") % 7 + 1) * 250).as("delay_ms")).distinct()
      ext.WebUrl.politenessSchedule(urls, "doc_id", "url", delays)
        .orderBy("doc_id")
    }),

    // ext capstone — perplexity-bucketed mixture curation (the DoReMi/
    // CCNet shape): corpus-LM score each en document (q124's exact
    // machinery), bucket by fluency band, then fill each band to a
    // fixed token budget with the exact two-phase sampler (q108's
    // machinery). The oracle chains the stage oracles; bucket cuts are
    // safe because the oracle replays the identical double expression
    // tree, not because the cuts dodge the data.
    "q191_perplexity_mix" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val scored = ext.TextStats.bigramLogProbScore(
        docs.filter(col("lang") === "en"), "doc_id", "text")
      val base = scored
        .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
        .withColumn("bucket",
          when(col("mean_lp") >= -3.35, "high")
            .when(col("mean_lp") >= -3.40, "mid")
            .otherwise("low"))
      ext.Sampling.tokenBudgetPerGroup(base, "doc_id", "bucket", "n_chars",
          budget = 6000L)
        .select("doc_id", "bucket", "n_chars")
        .orderBy("doc_id")
    }),

    // ext capstone — crawl-frontier INGEST: discovered sitemaps parse to
    // entries (q180 machinery), URLs canonical-dedup across discoverers
    // (q143 machinery: case/tracking-param variants collapse, min id
    // survives), and the surviving frontier schedules per host under
    // politeness delays (q190 machinery). Synthesized locs keep the
    // canonical forms closed-form, so the oracle chains id arithmetic
    // instead of re-parsing.
    "q192_frontier_ingest" -> ((s, dir) => {
      val id = col("doc_id")
      val locA = concat(
        when(id % 2 === 0, lit("HTTPS://D")).otherwise(lit("https://d")),
        (id % 7).cast("string"),
        when(id % 2 === 0, lit(".Example.COM/p")).otherwise(lit(".example.com/p")),
        (id % 5).cast("string"),
        when(id % 3 === 0, lit("?utm_source=x")).otherwise(lit("")))
      val locB = concat(lit("https://m"), (id % 3).cast("string"),
        lit(".example.com/q"), (id % 11).cast("string"))
      val xml = concat(lit("<urlset><url><loc>"), locA,
        lit("</loc></url><url><loc>"), locB, lit("</loc></url></urlset>"))
      val maps = tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, xml.as("xml"))
      val entries = ext.WebUrl.parseSitemap(maps, "doc_id", "xml")
        .select((col("doc_id") * 4 + col("entry_index")).as("url_id"),
          col("loc").as("url"))
      val deduped = ext.WebUrl.dedupByCanonicalUrl(entries, "url", "url_id")
      val d = tbl(s, dir, "documents").filter(id.isNotNull)
      val delays = d.select(
        concat(lit("d"), (id % 7).cast("string"),
          lit(".example.com")).as("domain"),
        ((id % 7 + 1) * 250).as("delay_ms")).distinct()
      ext.WebUrl.politenessSchedule(
          deduped.select(col("url_id"), col("url_canon")),
          "url_id", "url_canon", delays)
        .select(col("url_id"), col("host"), col("fetch_seq"),
          col("fetch_offset_ms"))
        .orderBy("url_id")
    }),

    // sink/source format — CSV structured parse with the PERMISSIVE
    // corrupt channel (the q166/q10 stance for the third text format):
    // quoted fields with embedded commas parse, an unclosed quote
    // swallows the line tail into the field AND flags the corrupt
    // column (observed univocity behavior, pinned), plain rows parse
    // clean. Synthesis is id arithmetic, so the oracle is closed-form.
    "q193_csv_parse" -> ((s, dir) => {
      val id = col("doc_id")
      val line = when(id % 13 === 0,
          concat(id.cast("string"), lit(",\"unclosed,"),
            (id % 7).cast("string")))
        .when(id % 3 === 0,
          concat(id.cast("string"), lit(",\"w "), (id % 5).cast("string"),
            lit(", x\","), (id % 7).cast("string")))
        .otherwise(
          concat(id.cast("string"), lit(",w"), (id % 5).cast("string"),
            lit(","), (id % 7).cast("string")))
      tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, line.as("__line"))
        .withColumn("__p", from_csv(col("__line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, label STRING, n INT, _bad STRING"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_bad")))
        .select(col("doc_id"), col("__p.id").as("id"),
          col("__p.label").as("label"), col("__p.n").as("n"),
          col("__p._bad").as("corrupt_record"))
        .orderBy("doc_id")
    }),

    // streaming — continuous CDC upsert (latest-wins current state):
    // the events stream replayed in three arrival batches; the final
    // state per user is the max-(ts, event_id) row REGARDLESS of batch
    // order (latest-wins by version, not arrival — the batch split is
    // deliberately not time-ordered). Buckets rewrite only when
    // touched; the oracle is a plain argmax window over all events.
    "q194_stream_cdc" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val batches = (0 to 2).map(i => e.filter(col("event_id") % 3 === i))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q194").toString + "/cdc"
      graft.streaming.StreamingMerge.byBatch(s, batches, store,
          "user_id", orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          unix_micros(col("ts")).as("last_ts_us"))
        .orderBy("user_id")
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

    // ext versioning — corpus snapshot diff: prev = docs without the
    // %17 slice, next = docs without the %19 slice and with the %11
    // slice's text rewritten — so the diff must report added (in next
    // only), removed (in prev only) and changed (digest differs), and
    // NOTHING else. Digests join, documents never shuffle.
    "q196_snapshot_diff" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val prev = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(lit("edited: "), col("text"))).otherwise(col("text"))
            .as("text"))
      ext.Merge.snapshotDiff(prev, next, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // functions — mojibake repair (ftfy's core move as a codegen'd
    // expression): %3==0 docs arrive as UTF-8-read-as-Latin-1 wrecks
    // (built by encode/decode right in the plan), %3==1 docs carry a
    // REAL Latin-1 é that must survive untouched, the rest are clean
    // ASCII. The structural test repairs exactly the first class; the
    // oracle states the intended text closed-form.
    "q197_fix_mojibake" -> ((s, dir) => {
      val id = col("doc_id")
      val intended = when(id % 3 === 0, concat(col("text"), lit(" café")))
        .when(id % 3 === 1, concat(col("text"), lit(" café")))
        .otherwise(col("text"))
      val arrived = when(id % 3 === 0,
          decode(encode(intended, "UTF-8"), "ISO-8859-1"))
        .otherwise(intended)
      tbl(s, dir, "documents")
        .filter(id.isNotNull && col("text").isNotNull)
        .select(id,
          graft.functions.TextNormalizeFunctions.fixMojibake(arrived)
            .as("fixed"),
          (graft.functions.TextNormalizeFunctions.fixMojibake(arrived)
            === intended).as("recovered"))
        .orderBy("doc_id")
    }),

    // ext storage dedup — content-defined chunking over binary payloads
    // (gear rolling hash, FastCDC shape): ~50 B/chunk rows leave the
    // scan, payloads don't. CLOSED-FORM fixture (the q107/q179/q185
    // pattern): blocks CdcBlockEven/CdcBlockOdd were searched offline so
    // the gear hash's FIRST qualifying cut (len ≥ 64, h&255 == 0) lands
    // exactly at the block end — so `repeat(B, n) || tail` (tail 17 B <
    // minSize) must chunk into n block-chunks at multiples of |B| plus
    // one tail chunk, each with a CONSTANT sha-256 the oracle states
    // literally. Repeated identical digests are the dedup shape the
    // operator exists for; general (unknown-cut) inputs stay pinned by
    // ArchivesSpec's edit-locality/shift-resistance properties.
    "q198_cdc_chunks" -> ((s, dir) => {
      val id = col("doc_id")
      val block = when(id % 2 === 0, lit(CdcBlockEven))
        .otherwise(lit(CdcBlockOdd))
      val n = (id % 5 + 1).cast("int")
      val payload = encode(
        concat(repeat(block, n), lit(CdcTail)), "UTF-8")
      val assets = tbl(s, dir, "documents")
        .filter(id.isNotNull)
        .select(id, payload.as("data"))
      ext.Archives.cdcChunks(assets, "doc_id", "data",
          minSize = 64, avgSize = 256, maxSize = 1024).toDF()
        .select(col("record_id").as("doc_id"), col("chunk_index"),
          col("offset"), col("length"), col("digest"))
        .orderBy("doc_id", "chunk_index")
    }),

    // sink/source — schema evolution across parquet generations: v=1
    // files carry (doc_id, lang), v=2 adds (n_chars, source);
    // mergeSchema unifies, old rows surface NULLs for the new columns,
    // and the generation rides as a partition column. The lakehouse
    // reality check every long-lived corpus hits at its first schema
    // bump.
    "q199_schema_evolution" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val base = java.nio.file.Files
        .createTempDirectory("graft-q199").toString + "/docs"
      d.filter(col("doc_id") % 2 === 0).select("doc_id", "lang")
        .write.mode("overwrite").parquet(base + "/v=1")
      d.filter(col("doc_id") % 2 =!= 0)
        .select("doc_id", "lang", "n_chars", "source")
        .write.mode("overwrite").parquet(base + "/v=2")
      s.read.option("mergeSchema", "true").parquet(base)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("source"), col("v").cast("int").as("v"))
        .orderBy("doc_id")
    }),

    // ext text — mixed-language detection: groups of 3 docs join into
    // one multi-paragraph page (blank-line separated, doc_id order), the
    // per-paragraph langId argmax aggregates to paragraph/distinct-lang
    // counts + the dominant tag. The oracle replays langId per original
    // doc (each paragraph IS one doc's text) and the same argmax.
    "q200_mixed_language" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val pages = d
        .groupBy(expr("doc_id div 3").as("page_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s.getField("text")), "\n\n").as("page_text"))
      ext.TextStats.mixedLanguageProfile(pages, "page_id", "page_text")
        .orderBy("page_id")
    }),

    // ext linkage — SymSpell edit-distance-1 join: every %4==0 doc's
    // name gets a one-deletion typo twin (id+90000); the deletion-
    // neighborhood equi-join is LOSSLESS for ed ≤ 1 (unlike q177's
    // stated-recall blocking), so the oracle is the plain all-pairs
    // levenshtein filter.
    "q201_symspell_join" -> ((s, dir) => {
      val names = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          trim(lower(substring(col("text"), 1, 14))).as("name"))
      val typos = names.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 90000).as("doc_id"),
          concat(substring(col("name"), 1, 5),
            substring(col("name"), 7, 1000)).as("name"))
      ext.Linkage.editDistanceOneJoin(names.union(typos), "doc_id", "name")
        .orderBy("id_a", "id_b")
    }),

    // ext privacy — prefix-preserving IP pseudonymization over the
    // access-log field every analyst groups by: octet i depends only on
    // (key, octets 1..i), so subnet rollups survive; %11==0 rows carry
    // malformed/overflow addresses that must NULL out. Pure md5/conv
    // column exprs — the oracle replays the construction.
    "q202_ip_anonymize" -> ((s, dir) => {
      val id = col("doc_id")
      val ip = when(id % 11 === 0, lit("999.1.2.3"))
        .when(id % 13 === 0, lit("-"))
        .otherwise(concat(lit("10."), (id % 7).cast("string"),
          lit("."), (id % 5).cast("string"),
          lit("."), (id % 3).cast("string")))
      tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, ip.as("remote_ip"),
          ext.Privacy.anonymizeIpv4(ip, "graft-demo-key").as("anon_ip"))
        .orderBy("doc_id")
    }),

    // ext scheduling — exact largest-remainder budget apportionment:
    // 10007 fetches split across the 7 synthetic domains proportional
    // to their n_chars mass, summing to the budget EXACTLY (floors +
    // remainder to the largest fractional parts, ties to the smallest
    // domain). Decimal products, HUGEINT on the oracle side.
    "q203_crawl_budget" -> ((s, dir) => {
      val mass = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
        .groupBy(concat(lit("d"), (col("doc_id") % 7).cast("string"))
          .as("domain"))
        .agg(sum(col("n_chars")).as("mass"))
      ext.WebUrl.allocateBudget(mass, "domain", "mass", total = 10007L)
        .orderBy("domain")
    }),

    // ext capstone — CROSS-MODAL dedup: text-duplicate edges (exact
    // digest groups over docs + planted %9 text copies at id+20000) and
    // image near-dup edges (the q175 perceptual-hash bands) union into
    // ONE graph, and connected components labels the multimodal
    // clusters — a text copy and an image variant of the same page land
    // in the same cluster even though no single modality links them.
    // The oracle chains digest equality, the closed-form dHash pairs,
    // and a recursive-CTE reachability (the q49 pattern).
    "q204_multimodal_dedup" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val all = d.select(col("doc_id"), col("text"))
        .union(d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      // text edges: member → keep of each exact digest group
      val groups = ext.Dedup.exactGroups(all, "doc_id", "text")
      val textEdges = all.select(col("doc_id"), md5(col("text")).as("digest"))
        .join(groups.filter(col("n_copies") > 1), Seq("digest"))
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id").as("id_a"), col("keep_id").as("id_b"))
      // image edges: q175's grouped textured images, banded hamming ≤ 6
      val assets = d.select(col("doc_id")).as[Long].map { id =>
        val p = (id % 8).toInt
        ext.Multimodal.Asset(id, "image",
          ext.Multimodal.makeBmpTextured(id / 8, 18, 16,
            flip = Some((p * 2, p))))
      }
      val imgEdges = ext.Dedup.hammingPairs(
          ext.Multimodal.imageHashes(assets).toDF()
            .select(col("asset_id").as("doc_id"), col("dhash")),
          "doc_id", "dhash", maxDistance = 6)
        .select("id_a", "id_b")
      ext.Dedup.connectedComponents(textEdges.union(imgEdges))
        .select(col("id").as("doc_id"), col("comp").as("cluster"))
        .orderBy("doc_id")
    }),

    // ext crawl — robots.txt with the FULL RFC 9309 pattern grammar
    // ('*' wildcards, '$' end anchors): rules translate losslessly to
    // SQL LIKE (escape '#'), the verdict stays the single integer max
    // (longest pattern, allow wins ties). URLs carry .html suffixes so
    // anchors actually discriminate; the oracle replays the translation
    // and the LIKE matching.
    "q205_robots_wildcard" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val urls = d.select(col("doc_id"),
        concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 3).cast("string"),
          when(col("doc_id") % 4 === 0, lit(".html")).otherwise(lit("")))
          .as("url"))
      val rules = d.select(
        concat(lit("d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("domain"),
        expr("""CASE doc_id % 9
          | WHEN 0 THEN '/p0*' WHEN 1 THEN '/p1/*1' WHEN 2 THEN '/*.html$'
          | WHEN 3 THEN '/p2' WHEN 4 THEN '/p3/x*' WHEN 5 THEN '/p4*2$'
          | WHEN 6 THEN '/p0/x0$' WHEN 7 THEN '/*2.html$'
          | ELSE '/p1' END""".stripMargin).as("rule_path"),
        expr("""CASE doc_id % 9
          | WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
          | WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN true
          | WHEN 6 THEN true WHEN 7 THEN true ELSE false END""".stripMargin)
          .as("allow"))
        .distinct()
      ext.WebUrl.robotsEvaluateWildcard(urls, "doc_id", "url", rules)
        .orderBy("doc_id")
    }),

    // ext versioning — change magnitude over the q196 diff machinery:
    // the O(len²) edit distance runs ONLY on the changed ids (digest
    // pre-filter), distinguishing prefix stamps (%11: 8-char insert)
    // from character rewrites (%13: e→3 substitutions). The oracle
    // rebuilds both versions and applies DuckDB's identical levenshtein.
    "q206_change_magnitude" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val prev = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(lit("edited: "), col("text")))
            .when(col("doc_id") % 13 === 0, translate(col("text"), "e", "3"))
            .otherwise(col("text")).as("text"))
      ext.Merge.changeMagnitude(prev, next, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext eval — exact corpus percentile of the quality score (the AUC
    // stance: one window over the score VOCABULARY, rows never rank):
    // the form tail filters and mixture specs are actually written in.
    "q207_quality_percentile" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          ext.TextStats.qualityScore(col("text")).as("score"))
      ext.TextStats.scorePercentiles(d, "doc_id", "score")
        .select("doc_id", "score", "n_below", "pct_e6")
        .orderBy("doc_id")
    }),

    // ext profiling — burst/abuse signals per user: peak sliding-minute
    // event count (event-time RANGE window over epoch seconds), exact
    // e6 error ratio, and the combined suspect flag — the bot screen a
    // log pipeline runs before traffic numbers mean anything.
    "q208_burst_signals" -> ((s, dir) => {
      ext.Profile.burstSignals(tbl(s, dir, "events"),
          "user_id", "ts", "event_type", errorType = "error",
          windowSecs = 60, rateThreshold = 2L,
          errorRatioE6Threshold = 250000L)
        .orderBy("user_id")
    }),

    // ext temporal — clickstream paths per (user, session): q19's gap
    // rule, (ts, event_id) total order, the path string assembled by
    // an in-row struct sort so partition order can't leak. Oracle uses
    // DuckDB's ordered string_agg over the same session frame.
    "q209_session_paths" -> ((s, dir) => {
      ext.Funnel.sessionPaths(tbl(s, dir, "events"),
          "user_id", "ts", "event_id", "event_type", gapMinutes = 30)
        .select("user_id", "sess_id", "n_events", "start_us", "end_us",
          "duration_us", "path")
        .orderBy("user_id", "sess_id")
    }),

    // ext quality — Gopher repetition signals (§A1.1): duplicate-line
    // occurrence/char masses, most-frequent-n-gram char mass (n=2..4)
    // and duplicated-n-gram char mass (n=5..10) as EXACT integers from
    // ONE per-row kernel pass (these are per-document numbers — the
    // explode formulation would shuffle ~9× the corpus token count to
    // compute values that never leave the row), plus the paper's
    // thresholds as integer-cross-multiplied boolean flags. The oracle
    // rebuilds every field from unnested lines/grams.
    "q210_repetition_signals" -> ((s, dir) => {
      ext.TextStats.repetitionSignals(tbl(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext crawl — anchor-link extraction from synthesized HTML (the
    // WARC-payload → LinkGraph-edge ingest step): quoting variants,
    // case-insensitive tags, a rel=nofollow link, an href-less anchor
    // that must NOT emit, and an entity in the anchor text. The oracle
    // re-parses the identically-synthesized HTML with DuckDB's RE2 and
    // replays the stripHtml chain on the anchor slice.
    "q211_html_links" -> ((s, dir) => {
      val id = col("doc_id")
      val html = concat(
        lit("<html><body><p>intro</p><a href=\"https://d"),
        (id % 7).cast("string"),
        lit(".example.com/p"), (id % 5).cast("string"),
        lit("\">Link <b>"), (id % 3).cast("string"), lit("</b> text</a>"),
        lit("<a class='x' rel='nofollow' href='/rel/"), (id % 4).cast("string"),
        lit("'>Rel &amp; anchor</a>"),
        when(id % 2 === 0, lit("<A HREF=\"../up/q.html\">Up</A>"))
          .otherwise(lit("")),
        lit("<a name=\"skip\">no href</a></body></html>"))
      ext.WebUrl.extractHtmlLinks(
          tbl(s, dir, "documents").filter(id.isNotNull)
            .select(id, html.as("html")),
          "doc_id", "html")
        .orderBy("doc_id", "link_index")
    }),

    // ext crawl — RFC 3986 reference resolution (crawl subset) over an
    // 11-case href matrix per doc: absolute, scheme-relative, rooted,
    // query-only, fragment-only, sibling, ./, ../, past-root clamp,
    // nested + fragment, and the EMPTY reference ("" → the base minus
    // fragment, §5.4 — extractHtmlLinks emits href="" for <a href="">).
    // The oracle replays the identical regex chain.
    "q212_href_resolve" -> ((s, dir) => {
      val id = col("doc_id")
      val base = concat(lit("https://h"), (id % 5).cast("string"),
        lit(".example.com/a"), (id % 3).cast("string"),
        lit("/b/c.html?q="), (id % 2).cast("string"))
      val href = element_at(array(
        lit("https://abs.example.com/z"), lit("//cdn.example.com/j.js"),
        lit("/rooted.html"), lit("?p=2"), lit("#frag"), lit("d.html"),
        lit("./e.html"), lit("../up.html"), lit("../../../../past.html"),
        lit("sub/deep.html#x"), lit("")), (id % 11 + 1).cast("int"))
      tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, base.as("base"), href.as("href"))
        .withColumn("resolved",
          ext.WebUrl.resolveHref(col("base"), col("href")))
        .orderBy("doc_id")
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

    // ext text — interpolated Kneser–Ney bigram LM (the standard
    // smoothing: continuation counts, not raw unigram frequency, carry
    // the backed-off mass; absolute discount 0.75): self-scored over
    // the English slice, e12-floored ln terms, e6-coarsened mean (the
    // q142 determinism scheme). Oracle rebuilds every count frame and
    // replays the fixed probability shape.
    "q215_kneser_ney" -> ((s, dir) => {
      ext.TextStats.kneserNeyBigramScore(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text")
        .select("doc_id", "n_bigrams", "score_e6")
        .orderBy("doc_id")
    }),

    // ext crawl — robots.txt BODY parsing (RFC 9309 groups): synthetic
    // bodies where even ids carry a graftbot group (exact match wins,
    // its rules apply) and odd ids only a '*' group (fallback applies);
    // an empty Disallow and a comment line must vanish. The oracle
    // replays the line typing, the lag-based group ids, and the
    // exact-beats-star selection.
    "q216_robots_parse" -> ((s, dir) => {
      val id = col("doc_id")
      val body = concat(
        lit("# fetched\n"),
        when(id % 2 === 0, concat(
          lit("User-agent: graftbot\nDisallow: /g"), (id % 5).cast("string"),
          lit("/\nAllow: /g"), (id % 5).cast("string"),
          lit("/pub\nCrawl-delay: "), (id % 4).cast("string"),
          lit("\n\n"))).otherwise(lit("")),
        lit("User-agent: *\nDisallow: /x"), (id % 3).cast("string"),
        lit("/\nDisallow:\nSitemap: https://d"), (id % 7).cast("string"),
        lit(".example.com/sitemap.xml"))
      ext.WebUrl.parseRobotsTxt(
          tbl(s, dir, "documents").filter(id.isNotNull)
            .select(concat(lit("d"), id.cast("string")).as("domain"),
              body.as("body")),
          "domain", "body", userAgent = "graftbot")
        .orderBy("domain", "rule_path")
    }),

    // ext capstone — page → frontier: extractHtmlLinks pulls three
    // differently-shaped hrefs (relative, rooted with a tracking param,
    // absolute with uppercase scheme/host + default port) out of
    // synthesized HTML, resolveHref absolutizes them against the page,
    // canonicalizeUrl normalizes, and the frontier aggregates in-link
    // counts. The oracle states each link's CANONICAL CLOSED FORM
    // directly — so the whole extract→resolve→canonicalize chain must
    // reproduce it end-to-end, not just each stage in isolation.
    "q217_link_frontier" -> ((s, dir) => {
      val id = col("doc_id")
      val base = concat(lit("https://s"), (id % 6).cast("string"),
        lit(".example.com/dir"), (id % 3).cast("string"), lit("/page.html"))
      val html = concat(
        lit("<html><body><a href=\"art"), (id % 8).cast("string"),
        lit(".html\">rel</a><a href=\"/shared/hub.html?utm_source=x&ref="),
        (id % 4).cast("string"),
        lit("\">hub</a><a href='HTTPS://S"), (id % 6).cast("string"),
        lit(".Example.COM:443/dir"), ((id + 1) % 3).cast("string"),
        lit("/other.html'>abs</a></body></html>"))
      val pages = tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, base.as("base"), html.as("html"))
      ext.WebUrl.extractHtmlLinks(pages, "doc_id", "html")
        .join(pages.select(col("doc_id"), col("base")), Seq("doc_id"))
        .select(col("doc_id"), ext.WebUrl.canonicalizeUrl(
          ext.WebUrl.resolveHref(col("base"), col("href"))).as("target"))
        .groupBy("target")
        .agg(count(lit(1)).cast("long").as("n_refs"),
          min(col("doc_id")).as("first_referrer"))
        .orderBy("target")
    }),

    // ext text — Flesch reading ease, the replayable variant: regex
    // sentence segments, canonical-token words, vowel-group syllables;
    // one fixed double shape floored at e3. Exact counts + the score.
    "q218_readability" -> ((s, dir) => {
      ext.TextStats.readability(tbl(s, dir, "documents"), "doc_id", "text")
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

    // ext shaping — GPT-style concat-and-slice packing: per shard, docs
    // + one <eos> each concatenate into a token stream sliced into
    // EXACT 128-token sequences, documents straddling boundaries. The
    // engine emits one row per (doc, window) slice and assembles
    // windows in-row; the oracle replays per TOKEN (fine at sf) —
    // identical text only if start offsets, slicing, and offset-ordered
    // assembly all agree.
    "q220_pack_concat" -> ((s, dir) => {
      ext.Chunking.packConcat(
          tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
            .withColumn("shard", (col("doc_id") % 8).cast("int")),
          "doc_id", "text", seqTokens = 128, shardCol = "shard")
        .orderBy("shard", "seq_index")
    }),

    // ext capstone — robots → fetch plan: parseRobotsTxt rules (exact
    // graftbot group; the '*' Disallow-all group must NOT apply) feed
    // robotsEvaluateWildcard (the /pN* block loses to the longer /pN9$
    // allow — longest-match + allow-tie through the WHOLE chain), and
    // robotsCrawlDelays feeds politenessSchedule offsets. The oracle
    // states allowed-set and offsets in closed form, so parsing, group
    // selection, wildcard scoring, and scheduling must all compose.
    "q222_robots_politeness" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val id = col("doc_id")
      val h = id % 7
      val hostStr = concat(lit("d"), h.cast("string"), lit(".example.com"))
      val blocked = (h % 3).cast("string")
      val body = concat(
        lit("User-agent: graftbot\nDisallow: /p"), blocked,
        lit("*\nAllow: /p"), blocked, lit("9$\nCrawl-delay: "),
        (h + 1).cast("string"),
        lit("\n\nUser-agent: *\nDisallow: /"))
      val bodies = d.select(hostStr.as("domain"), body.as("body")).distinct()
      val urls = d.select(id,
        concat(lit("https://"), hostStr, lit("/p"),
          when(id % 11 === 0, concat(blocked, lit("9")))
            .otherwise((id % 5).cast("string"))).as("url"))
      val rules = ext.WebUrl.parseRobotsTxt(bodies, "domain", "body",
        userAgent = "graftbot")
      val delays = ext.WebUrl.robotsCrawlDelays(bodies, "domain", "body",
        userAgent = "graftbot")
      val allowed = ext.WebUrl
        .robotsEvaluateWildcard(urls, "doc_id", "url", rules)
        .filter(col("allowed")).select("doc_id", "url")
      ext.WebUrl.politenessSchedule(allowed, "doc_id", "url", delays)
        .orderBy("doc_id")
    }),

    // ext sampling — deterministic named train/val/test split
    // (90/5/5): first md5-bucket boundary that exceeds the key's hash
    // position wins, last split absorbs the boundary residue — split
    // membership is a pure function of doc_id the oracle replays with
    // two hex literals.
    "q221_hash_split" -> ((s, dir) => {
      ext.Sampling.hashSplit(
          tbl(s, dir, "documents").filter(col("doc_id").isNotNull),
          "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),

    // ext analytics — retention-cohort matrix over events: entities
    // cohort by first active day, cells count distinct active entities
    // per (cohort, day-offset), cohort size + ppm retention ride along.
    // One corpus-sized distinct, calendar-bounded windows, a grid-sized
    // aggregate.
    "q223_retention_cohorts" -> ((s, dir) => {
      ext.Funnel.retentionCohorts(tbl(s, dir, "events"), "user_id", "ts",
          maxOffsetDays = 14)
        .orderBy("cohort_day", "offset_days")
    }),

    // ext sketch — count–min heavy-hitters screen over document words:
    // the sketch is a (j, bucket, cnt) relation (≤ 4×1024 rows — union+
    // sum merges it across corpora), estimates broadcast-join a probe
    // batch, min-over-slices can only over-count so no true heavy
    // hitter is lost. Buckets = md5 hex slices decoded to ints; the
    // oracle replays them with an ascii-fold hex decode.
    "q224_cms_heavy_hitters" -> ((s, dir) => {
      def words(df: DataFrame): DataFrame = df
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val corpus = words(docs)
      val probes = words(docs.filter(col("doc_id") % 97 === 0))
      ext.FreqSketch.heavyHitters(corpus, "word", probes,
          minCount = 60L, width = 1024)
        .orderBy("item")
    }),

    // streaming ext — cross-batch CMS accumulation with fixed-size
    // state (the unbounded-domain complement of q157's exact counter):
    // 3 doc_id-striped batches fold into one cell store; by cell-wise
    // mergeability the final estimates equal the one-shot corpus
    // sketch, which is exactly what the oracle replays.
    "q225_stream_cms" -> ((s, dir) => {
      def words(df: DataFrame): DataFrame = df
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val batches = (0 to 2).map(i => words(docs.filter(col("doc_id") % 3 === i)))
      val probes = words(docs.filter(col("doc_id") % 89 === 0))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q225").toString + "/cms"
      streaming.StreamingFreqSketch.byBatch(s, batches, store, "word",
          probes, "word", width = 512, minCount = 80L)
        .orderBy("item")
    }),

    // ext layout QA — physical-layout audit via DISTRIBUTED parquet
    // footer reads (`Layout.rowGroupStats`: files parallelized across
    // executors, one metadata-only footer open per file, driver never
    // holds footers). The gate writes lineitem one-file-per-
    // l_returnflag (repartition on the partition column pins the
    // layout), then reconciles every row group's footer — row count,
    // min/max l_orderkey — against the data. At gate scale each file is
    // one row group, so the expected footers are plain SQL aggregates:
    // the audit is exact, not rows-only.
    "q226_layout_audit" -> ((s, dir) => {
      val dest = java.nio.file.Files
        .createTempDirectory("graft-q226").toString + "/ds"
      tbl(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
        .repartition(col("l_returnflag"))
        .write.partitionBy("l_returnflag").parquet(dest)
      ext.Layout.rowGroupStats(s, dest, "l_orderkey")
        .select(
          regexp_extract(col("file"), "l_returnflag=([^/]+)/", 1)
            .as("l_returnflag"),
          col("row_group"), col("n_rows"),
          col("min_value").as("min_orderkey"),
          col("max_value").as("max_orderkey"))
        .orderBy("l_returnflag", "row_group")
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

    // ext privacy — k-anonymity / l-diversity release audit: one QI-
    // keyed hash aggregate flags every quasi-identifier group that is
    // too small (k) or too uniform in the sensitive attribute (l).
    // Exact integer counts; the oracle is the same GROUP BY.
    "q233_k_anonymity" -> ((s, dir) => {
      ext.Privacy.kAnonymity(tbl(s, dir, "customer"),
          Seq("c_nationkey", "c_mktsegment"), Some("c_acctbal"),
          k = 12, l = 5)
        .orderBy("c_nationkey", "c_mktsegment")
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

    // ext sketch — HyperLogLog distinct count as a mergeable RELATION
    // (the distinct-count sibling of q224's CMS): ≤ 256 register rows,
    // integer-exact registers and harmonic-sum (dyadic 2^(40−rho)
    // terms summed as BIGINTs), ONE final double division replayed
    // identically by the oracle; the exact distinct count rides along
    // so the gate also measures the estimator's error.
    "q235_hll_distinct" -> ((s, dir) => {
      def words(df: DataFrame): DataFrame = df
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val corpus = words(tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull))
      val est = ext.FreqSketch.hllEstimate(
        ext.FreqSketch.hllSketch(corpus, "word", p = 8), p = 8)
      val exact = corpus.agg(count_distinct(col("word"))
        .as("exact_distinct"))
      est.crossJoin(exact)
    }),

    // streaming ext — bottom-k reservoir: a uniform k-sample of an
    // unbounded stream with ≤ k rows of state per batch. Priorities are
    // md5(key), so the sample is deterministic, batch-split INVARIANT
    // (global bottom-k ⊆ union of per-batch bottom-k's), and the
    // oracle replays it as one ORDER BY over the whole corpus — which
    // is exactly the invariance claim.
    "q236_stream_reservoir" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").filter(col("event_id").isNotNull)
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i).select("event_id"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q236").toString + "/res"
      streaming.StreamingReservoir.byBatch(s, batches, store,
          "event_id", "BIGINT", k = 100)
        .orderBy("priority", "event_id")
    }),

    // ext layout — compaction planning from a file listing: contiguous
    // ~targetBytes bins per partition (metadata-scale window), the
    // maintenance step between q226's footer audit and a rewrite job.
    // The file listing is DERIVED from data (per-bucket byte totals) so
    // the oracle replays the whole plan exactly.
    "q237_compaction_plan" -> ((s, dir) => {
      val files = tbl(s, dir, "lineitem")
        .select(col("l_returnflag").as("part"),
          (col("l_orderkey") % 20).cast("int").as("bkt"),
          col("l_quantity").cast("long").as("q"))
        .groupBy("part", "bkt")
        .agg((sum(col("q")) * 1000L).as("bytes"))
        .select(col("part"),
          concat(lit("f"), lpad(col("bkt").cast("string"), 3, "0"))
            .as("file"),
          col("bytes"))
      ext.Layout.compactionPlan(files, "part", "file", "bytes",
          targetBytes = 100000000L)
        .orderBy("part", "grp")
    }),

    // ext sketch — HDR histogram quantiles: the QUANTILE member of the
    // mergeable-sketch trio (q224 CMS frequencies, q235 HLL distincts).
    // Buckets are pure integer arithmetic (comparison-ladder log2, no
    // float log), so the histogram, ranks, and exact [lo, hi] bounds
    // replay bit-for-bit. floor() before the BIGINT cast — DuckDB CAST
    // rounds where Spark truncates (the q131 lesson).
    "q238_hdr_quantiles" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull)
        .select(floor(col("o_totalprice")).cast("long").as("v"))
      val hist = ext.FreqSketch.hdrHistogram(vals, "v", subBits = 5)
      ext.FreqSketch.hdrQuantiles(hist, Seq(0.5, 0.9, 0.99), subBits = 5)
        .orderBy("q")
    }),

    // ext sketch — Bloom filter as a mergeable RELATION (the SET-
    // membership member of the sketch family): build over the even-doc
    // vocabulary, probe the odd-doc vocabulary, and reconcile against
    // the exact semi-join. `n_missed` MUST be 0 — absence of a bit is
    // proof of absence (the no-false-negative contract); `n_false_pos`
    // measures the screen's cost, and both replay bit-for-bit from the
    // md5 double-hash positions.
    "q239_bloom_filter" -> ((s, dir) => {
      def words(p: Column => Column) = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .filter(p(col("doc_id")))
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val build = words(_ % 2 === 0)
      val probe = words(_ % 2 === 1)
      val sk = ext.SetSketch.bloomSketch(build, "word", mBits = 8192)
      val ct = ext.SetSketch.bloomContains(sk, probe, "word", mBits = 8192)
      val truth = probe.select(col("word").as("item")).distinct()
        .join(build.select(col("word").as("item")).distinct()
          .withColumn("__t", lit(1L)), Seq("item"), "left")
      ct.join(truth, Seq("item"))
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
          sum(coalesce(col("__t"), lit(0L))).as("n_true"),
          sum(when(col("maybe") && col("__t").isNull, 1L).otherwise(0L))
            .as("n_false_pos"),
          sum(when(!col("maybe") && col("__t").isNotNull, 1L).otherwise(0L))
            .as("n_missed"))
    }),

    // ext sketch — KMV distinct sketch with the SET OPERATIONS HLL
    // registers cannot do: union and intersection estimates between
    // the even- and odd-doc vocabularies, exact counts riding along so
    // the gate measures estimator error. Bottom-k closure
    // (merge-of-sketches ≡ sketch-of-union) is what the union path
    // exercises; every number is integer-exact up to the final
    // divisions, replayed identically by the oracle.
    "q240_kmv_distinct" -> ((s, dir) => {
      def words(p: Column => Column) = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .filter(p(col("doc_id")))
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val a = words(_ % 2 === 0)
      val b = words(_ % 2 === 1)
      val ska = ext.SetSketch.kmvSketch(a, "word", k = 256)
      val skb = ext.SetSketch.kmvSketch(b, "word", k = 256)
      val estA = ext.SetSketch.kmvEstimate(ska, k = 256)
        .select(col("estimate").as("est_a"))
      val estB = ext.SetSketch.kmvEstimate(skb, k = 256)
        .select(col("estimate").as("est_b"))
      val inter = ext.SetSketch.kmvIntersectEstimate(ska, skb, k = 256)
      val exact = a.select(col("word")).distinct()
        .withColumn("__ina", lit(1L))
        .join(b.select(col("word")).distinct().withColumn("__inb", lit(1L)),
          Seq("word"), "full")
        .agg(sum(coalesce(col("__ina"), lit(0L))).as("exact_a"),
          sum(coalesce(col("__inb"), lit(0L))).as("exact_b"),
          count(lit(1)).as("exact_union"),
          sum(coalesce(col("__ina"), lit(0L)) *
            coalesce(col("__inb"), lit(0L))).as("exact_intersect"))
      estA.crossJoin(broadcast(estB)).crossJoin(broadcast(inter))
        .crossJoin(broadcast(exact))
    }),

    // ext sketch — AMS tug-of-war: second-moment (self-join size) and
    // inner-product (equi-join size) estimates from 7-counter linear
    // sketches of the even-/odd-doc word-frequency vectors, the exact
    // moments riding along. Estimator products are doubles of < 2^53
    // integers (identical IEEE in both engines); the median-of-7 pick
    // replays as a QUALIFY rank in the oracle.
    "q241_ams_sketch" -> ((s, dir) => {
      def words(p: Column => Column) = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .filter(p(col("doc_id")))
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val a = words(_ % 2 === 0)
      val b = words(_ % 2 === 1)
      val ska = ext.FreqSketch.amsSketch(a, "word")
      val skb = ext.FreqSketch.amsSketch(b, "word")
      val f2 = ext.FreqSketch.amsF2(ska)
      val ip = ext.FreqSketch.amsInnerProduct(ska, skb)
      val ca = a.groupBy(col("word")).agg(count(lit(1)).as("ca"))
      val cb = b.groupBy(col("word")).agg(count(lit(1)).as("cb"))
      val f2Exact = ca.agg(coalesce(sum(col("ca") * col("ca")), lit(0L))
        .as("f2_exact"))
      val ipExact = ca.join(cb, Seq("word"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("ip_exact"))
      f2.crossJoin(broadcast(f2Exact)).crossJoin(broadcast(ip))
        .crossJoin(broadcast(ipExact))
    }),

    // streaming ext — cross-batch Bloom accumulation: the continuous
    // novelty screen (state ≤ mBits rows over the shared KeyedBatchStore
    // LSM in distinct mode). Each batch's distinct items are screened
    // against the filter of the batches BEFORE it, then folded in; the
    // oracle replays novelty from each bit's first-appearance batch,
    // checking both the screen and the accumulation order.
    "q242_stream_bloom" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"),
          concat(lit("u"), col("user_id").cast("string")).as("item"))
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i).select("item"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q242").toString + "/bloom"
      streaming.StreamingBloom.byBatch(s, batches, store, "item",
          mBits = 8192)
        .orderBy("batch_id")
    }),

    // ext net — longest-prefix-match CIDR enrichment of an IP column
    // (the reference access-log `remote_ip` shape): a synthetic CIDR
    // table at five prefix lengths derived from `customer`, probe IPs
    // from `orders` via a Knuth multiplicative hash, round-tripped
    // through dotted-quad text so the gate exercises longToIpv4 →
    // ipv4ToLong in-plan. LPM is a literal-length explode + broadcast
    // hash equi-join + bounded window — never a range join; the
    // aggregate reconciles match depth and attribution per segment.
    "q243_ip_cidr_lookup" -> ((s, dir) => {
      val ips = tbl(s, dir, "orders")
        .filter(col("o_orderkey").isNotNull)
        .select(col("o_orderkey").as("id"),
          (col("o_orderkey") * 2654435761L % 4294967296L).as("h"))
        .withColumn("ipn",
          ext.Net.ipv4ToLong(ext.Net.longToIpv4(col("h"))))
        .select("id", "ipn")
      val netsRaw = tbl(s, dir, "customer")
        .filter(col("c_custkey").isNotNull)
        .select(col("c_custkey").as("net_id"),
          col("c_mktsegment").as("segment"),
          (lit(8L) + col("c_custkey") % 5L * 4L).as("len"),
          (col("c_custkey") * 2654435761L % 4294967296L).as("neth"))
      val prefix = Seq(8, 12, 16, 20, 24)
        .foldLeft(lit(null).cast("long")) { (acc, l) =>
          when(col("len") === l.toLong,
            shiftright(col("neth"), 32 - l).cast("long")).otherwise(acc)
        }
      val nets = netsRaw.withColumn("prefix", prefix)
        .withColumn("__rk", row_number().over(
          Window.partitionBy(col("len"), col("prefix"))
            .orderBy(col("net_id"))))
        .filter(col("__rk") === 1)
        .select("len", "prefix", "net_id", "segment")
      ext.Net.longestPrefixJoin(ips, "id", "ipn", nets, "len", "prefix",
          minLen = 8, maxLen = 24)
        .groupBy(coalesce(col("matched_len"), lit(-1L)).as("matched_len"),
          coalesce(col("segment"), lit("(none)")).as("segment"))
        .agg(count(lit(1)).as("n_ips"),
          sum(coalesce(col("net_id"), lit(0L))).as("sum_net"))
        .orderBy("matched_len", "segment")
    }),

    // ext sketch — count sketch (signed CMS): unbiased per-item
    // frequency estimates from a fixed depth×width grid of SIGNED
    // counters. Probe = the 50 most frequent corpus words (exact
    // counts riding along), so the gate measures symmetric estimator
    // error where CMS could only over-count; every number is BIGINT-
    // exact (±1 signs × long counters, median = rank pick).
    "q244_count_sketch" -> ((s, dir) => {
      val words = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val sk = ext.FreqSketch.countSketch(words, "word", width = 2048)
      val exact = words.groupBy(col("word"))
        .agg(count(lit(1)).as("exact"))
      val probes = exact.orderBy(col("exact").desc, col("word"))
        .limit(50).select("word")
      ext.FreqSketch.csEstimate(sk, probes, "word", width = 2048)
        .join(exact.withColumnRenamed("word", "item"), Seq("item"))
        .select(col("item"), col("est"), col("exact"))
        .orderBy("item")
    }),

    // ext sketch — Misra–Gries heavy hitters: DETERMINISTIC k-row
    // summaries per event-id shard (no hashing — the mirror image of
    // CMS: under-counts by ≤ theta, never over), merged across the
    // four shards with the bounds adding. The gate reconciles every
    // survivor against its exact corpus count, replaying BOTH
    // inequalities of `lo ≤ true ≤ lo + theta` as data.
    "q245_misra_gries" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select((col("event_id") % 4L).as("shard"),
          // harmonic-skewed item domain (~19 distinct, top item ~50%
          // of rows) so the k=16 compress genuinely sheds mass
          concat(lit("u"),
            expr("CAST(100 DIV (1 + user_id % 100) AS STRING)")).as("item"))
      val k = 16
      val perShard = (0L to 3L).map(i =>
        ext.FreqSketch.mgSummarize(ev.filter(col("shard") === i),
          "item", "shard", k))
      val merged = ext.FreqSketch.mgMerge(perShard, k)
      val exact = ev.groupBy(col("item")).agg(count(lit(1)).as("exact"))
      merged.join(exact, Seq("item"))
        .select(col("item"), col("lo"), col("theta"), col("exact"),
          (col("lo") <= col("exact") &&
            col("exact") <= col("lo") + col("theta")).as("bounds_hold"))
        .orderBy("item")
    }),

    // ext privacy — ε-DP histogram release: discrete-Laplace noise on
    // the per-type event counts via deterministic inverse-CDF over
    // inlined integer thresholds (the noise draw is a keyed md5
    // uniform, so the release is retry-stable). The gate rides the
    // exact counts along to reconcile the noise draw and its clamp
    // bound; a REAL release ships n_noisy only.
    "q246_dp_counts" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").filter(col("event_type").isNotNull)
      val noisy = ext.Privacy.dpCounts(ev, Seq("event_type"),
        epsilon = 0.5)
      val exact = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_true"))
      noisy.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_true"), col("n_noisy"),
          (col("n_noisy") - col("n_true")).as("noise"),
          (abs(col("n_noisy") - col("n_true")) <= col("noise_bound"))
            .as("within_bound"))
        .orderBy("event_type")
    }),

    // streaming ext — cross-batch HDR quantiles: the continuous p50/
    // p99 tracker (state = the ≤ ~1.9k-row bucket histogram in the
    // KeyedBatchStore LSM, sum-merge). RUNNING quantiles after every
    // batch, so the oracle replays the accumulation at each step from
    // batch-prefix histograms — not just the final state.
    "q247_stream_hdr" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          floor(col("o_totalprice")).cast("long").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q247").toString + "/hdr"
      streaming.StreamingHdr.byBatch(s, batches, store, "v",
          Seq(0.5, 0.9, 0.99), subBits = 5)
        .orderBy("batch_id", "q")
    }),

    // ext layout — zone-map pruning audit: per-month zone stats over
    // the order-date column, three literal day-range predicates
    // (mid-range, narrow, before-the-data), and the SOUNDNESS theorem
    // replayed as data: a pruned zone contributes ZERO matching rows
    // (`leaked_rows` must be 0), while `scan_bound` prices what a
    // stats-pruned scan would actually read.
    "q248_zonemap_prune" -> ((s, dir) => {
      val preds = Seq((1L, 9100L, 9500L), (2L, 10000L, 10031L),
        (3L, 0L, 100L))
      val o = tbl(s, dir, "orders")
        .filter(col("o_orderdate").isNotNull)
        .select(date_format(col("o_orderdate"), "yyyyMM").as("zone"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"))
      val zones = ext.Layout.zoneMapStats(o, col("zone"), "day")
      val pruned = ext.Layout.zoneMapPrune(zones, preds)
      val perPred = pruned.groupBy(col("pred_id"))
        .agg(count(lit(1)).as("n_zones"),
          sum(when(!col("kept"), 1L).otherwise(0L)).as("n_pruned"),
          sum(when(col("kept"), col("n_rows")).otherwise(0L))
            .as("scan_bound"))
      val predArr = array(preds.map { case (id, lo, hi) =>
        struct(lit(id).as("pred_id"), lit(lo).as("lo"), lit(hi).as("hi"))
      }: _*)
      val exact = o.select(col("day"), explode(predArr).as("__p"))
        .groupBy(col("__p.pred_id").as("pred_id"))
        .agg(sum(when(col("day") >= col("__p.lo") &&
          col("day") <= col("__p.hi"), 1L).otherwise(0L)).as("exact_rows"))
      val lo = preds.foldLeft(lit(null).cast("long")) { (acc, p) =>
        when(col("pred_id") === p._1, p._2).otherwise(acc) }
      val hi = preds.foldLeft(lit(null).cast("long")) { (acc, p) =>
        when(col("pred_id") === p._1, p._3).otherwise(acc) }
      val leaked = o
        .join(pruned.filter(!col("kept")).select(col("pred_id"),
          col("zone")), Seq("zone"))
        .filter(col("day") >= lo && col("day") <= hi)
        .groupBy(col("pred_id"))
        .agg(count(lit(1)).as("leaked_rows"))
      perPred.join(exact, Seq("pred_id"))
        .join(leaked, Seq("pred_id"), "left")
        .select(col("pred_id"), col("n_zones"), col("n_pruned"),
          col("scan_bound"), col("exact_rows"),
          coalesce(col("leaked_rows"), lit(0L)).as("leaked_rows"))
        .orderBy("pred_id")
    }),

    // ext sketch — HLL BY GROUP: distinct users per event type from a
    // per-group register table (the production distinct-count shape),
    // exact counts riding along so the gate measures per-group raw-
    // estimator error. Merge path exercised: the register table is
    // built as two half-sketches merged with hllMergeBy, which must
    // equal the one-shot table the oracle replays.
    "q249_hll_by_group" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .select(col("event_type").as("t"),
          concat(lit("u"), col("user_id").cast("string")).as("item"),
          col("event_id"))
      val halves = Seq(0L, 1L).map(i =>
        ext.FreqSketch.hllSketchBy(ev.filter(col("event_id") % 2 === i),
          "t", "item", p = 8))
      val est = ext.FreqSketch.hllEstimateBy(
        ext.FreqSketch.hllMergeBy(halves), p = 8)
      val exact = ev.groupBy(col("t").as("grp"))
        .agg(count_distinct(col("item")).as("exact"))
      est.join(exact, Seq("grp"))
        .select(col("grp"), col("n_registers"), col("sum_scaled"),
          col("estimate"), col("exact"))
        .orderBy("grp")
    }),

    // ext sketch — HDR quantiles BY GROUP: p50/p95 price bounds per
    // order priority from per-group bucket histograms (built as two
    // merged half-histograms to exercise hdrMergeBy). The per-group
    // running sum windows over that group's ≤ ~1.9k-bucket frame —
    // the real group column is the partition key, corpus never sorts.
    "q250_hdr_by_group" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull &&
          col("o_orderpriority").isNotNull && col("o_orderkey").isNotNull)
        .select(col("o_orderpriority").as("pri"),
          floor(col("o_totalprice")).cast("long").as("v"),
          col("o_orderkey"))
      val halves = Seq(0L, 1L).map(i =>
        ext.FreqSketch.hdrHistogramBy(
          vals.filter(col("o_orderkey") % 2 === i), "pri", "v",
          subBits = 5))
      ext.FreqSketch.hdrQuantilesBy(ext.FreqSketch.hdrMergeBy(halves),
          Seq(0.5, 0.95), subBits = 5)
        .orderBy("grp", "q")
    }),

    // ext sketch — KMV full set algebra: difference and Jaccard
    // estimates between the even-/odd-doc vocabularies (the q240
    // union/intersection gate's completion), exact values riding
    // along. The union sketch's survivors are a uniform union sample,
    // so side-only fractions scale to |A \ B| / |B \ A| and
    // n_both/k_union IS the Jaccard estimator.
    "q251_kmv_set_algebra" -> ((s, dir) => {
      def words(p: Column => Column) = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .filter(p(col("doc_id")))
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val a = words(_ % 2 === 0)
      val b = words(_ % 2 === 1)
      val est = ext.SetSketch.kmvSetEstimates(
        ext.SetSketch.kmvSketch(a, "word", k = 256),
        ext.SetSketch.kmvSketch(b, "word", k = 256), k = 256)
      val exact = a.select(col("word")).distinct()
        .withColumn("__ina", lit(1L))
        .join(b.select(col("word")).distinct().withColumn("__inb", lit(1L)),
          Seq("word"), "full")
        .agg(
          sum(coalesce(col("__ina"), lit(0L)) *
            (lit(1L) - coalesce(col("__inb"), lit(0L))))
            .as("exact_only_a"),
          sum(coalesce(col("__inb"), lit(0L)) *
            (lit(1L) - coalesce(col("__ina"), lit(0L))))
            .as("exact_only_b"),
          count(lit(1)).as("exact_union"),
          sum(coalesce(col("__ina"), lit(0L)) *
            coalesce(col("__inb"), lit(0L))).as("exact_intersect"))
        .withColumn("exact_jaccard",
          col("exact_intersect").cast("double") /
            col("exact_union").cast("double"))
      est.crossJoin(broadcast(exact))
    }),

    // streaming ext — cross-batch HLL: continuous distinct-user
    // counting with per-batch register keys, so ONE store answers both
    // the cumulative count and a sliding last-2-batch window (expiry a
    // max-merged register table cannot do — max is not invertible).
    // Exact distinct counts ride along for both reads per batch.
    "q252_stream_hll" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select((col("event_id") % 3L).as("b"),
          // (user, session-slot) items: thousands of distinct values
          // with partial cross-batch overlap, so cumulative grows
          // while the window genuinely expires
          concat(lit("u"), col("user_id").cast("string"), lit(":"),
            (col("event_id") % 50L).cast("string")).as("item"))
      val batches = (0L to 2L).map(i =>
        ev.filter(col("b") === i).select("item"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q252").toString + "/hll"
      val est = streaming.StreamingHll.byBatch(s, batches, store,
        "item", p = 8, window = 2)
      val di = ev.select(col("b"), col("item")).distinct()
      val exact = di
        .select(col("b"), col("item"),
          explode(array((0L to 2L).map(lit): _*)).as("bid"))
        .filter(col("b") <= col("bid"))
        .groupBy(col("bid").as("batch_id"))
        .agg(count_distinct(col("item")).as("exact_cum"),
          count_distinct(when(col("b") >= col("bid") - 1L, col("item")))
            .as("exact_win"))
      est.join(exact, Seq("batch_id"))
        .select(col("batch_id"), col("est_cum"), col("est_win"),
          col("exact_cum"), col("exact_win"))
        .orderBy("batch_id")
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

    // ext stats — Poisson bootstrap: a 95% confidence interval for the
    // mean document length from ONE corpus scan (64 replicates ride
    // the scan as a map-side explode; per-(row, replicate) Poisson(1)
    // multiplicities from keyed md5 + inlined integer CDF thresholds).
    // The point estimate rides along — the CI must bracket it.
    "q254_poisson_bootstrap" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      val reps = ext.Bootstrap.replicateTotals(d, "doc_id", "n_chars",
        replicates = 64)
      val ci = ext.Bootstrap.confidenceInterval(reps)
      val point = d
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars").cast("long")).as("__sum"))
        .select(col("n_rows"),
          (col("__sum").cast("double") / col("n_rows").cast("double"))
            .as("point_mean"))
      ci.crossJoin(broadcast(point))
    }),

    // ext layout — consistent-hash resharding audit: order keys on an
    // 8-shard ring vs the same ring grown to 9, against the md5-mod
    // baseline. The Karger theorem replays as data: ring movement
    // ≈ 1/9 and EVERY moved key targets the added shard
    // (moved_wrong = 0), while mod-n moves ≈ 8/9; ring balance rides
    // along. Assignment is a pure codegen'd literal-array walk — no
    // join, no shuffle.
    "q255_consistent_hash" -> ((s, dir) => {
      val a = tbl(s, dir, "orders")
        .filter(col("o_orderkey").isNotNull)
        .select(concat(lit("o"), col("o_orderkey").cast("string")).as("k"))
        .select(col("k"),
          ext.Ring.consistentShard(col("k"), 8).as("s8"),
          ext.Ring.consistentShard(col("k"), 9).as("s9"),
          conv(substring(md5(col("k")), 1, 12), 16, 10).cast("long")
            .as("__h"))
        .withColumn("m8", pmod(col("__h"), lit(8L)))
        .withColumn("m9", pmod(col("__h"), lit(9L)))
      val loads = a.groupBy(col("s8"))
        .agg(count(lit(1)).as("__load"))
        .agg(max(col("__load")).as("max_load8"),
          min(col("__load")).as("min_load8"))
      val mv = a.agg(count(lit(1)).as("n_keys"),
        sum(when(col("s8") =!= col("s9"), 1L).otherwise(0L))
          .as("moved_ring"),
        sum(when(col("s8") =!= col("s9") && col("s9") =!= 8, 1L)
          .otherwise(0L)).as("moved_wrong"),
        sum(when(col("m8") =!= col("m9"), 1L).otherwise(0L))
          .as("moved_mod"))
      mv.crossJoin(broadcast(loads))
    }),

    // ext formats — Avro round trip WITHOUT spark-avro (only the core
    // avro-java library): orders encode into four deterministic object
    // containers (seed-keyed sync markers — stock Avro's random marker
    // is the classic nondeterministic-artifact trap), decode back via
    // the distributed container kernel into canonical JSON, and the
    // per-container aggregates must equal the direct parquet compute.
    "q256_avro_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val schemaJson =
        """{"type":"record","name":"O","fields":[
          |{"name":"k","type":"long"},
          |{"name":"st","type":"string"},
          |{"name":"tp","type":"long"}]}""".stripMargin
      val rows = tbl(s, dir, "orders")
        .filter(col("o_orderkey").isNotNull &&
          col("o_orderstatus").isNotNull && col("o_totalprice").isNotNull)
        .select((col("o_orderkey") % 4L).as("cid"),
          col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
          floor(col("o_totalprice")).cast("long").as("tp"))
        .as[(Long, Long, String, Long)]
      val bins = rows.groupByKey(_._1)
        .mapGroups { (cid, it) =>
          val sorted = it.toSeq.sortBy(_._2)
          (cid, ext.AvroIo.encodeContainer(schemaJson,
            sorted.iterator.map { case (_, k, st, tp) =>
              Map[String, Any]("k" -> k, "st" -> st, "tp" -> tp)
            }, syncSeed = s"c$cid"))
        }.toDF("cid", "bin")
      ext.AvroIo.decodeContainer(bins, "cid", "bin")
        .select(col("container_id"),
          get_json_object(col("json"), "$.k").cast("long").as("k"),
          get_json_object(col("json"), "$.st").as("st"),
          get_json_object(col("json"), "$.tp").cast("long").as("tp"))
        .groupBy(col("container_id"))
        .agg(count(lit(1)).as("n_records"), sum(col("tp")).as("sum_tp"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          count_distinct(col("st")).as("n_status"))
        .orderBy("container_id")
    }),

    // ext stats — paired A/B bootstrap: does `purchase` carry a higher
    // mean value than `click`? 64 shared Poisson draws resample BOTH
    // variants (replicate-level pairing), the CI of the per-replicate
    // difference decides significance; the point means ride along.
    "q257_bootstrap_ab" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("value").isNotNull &&
          col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"), col("event_id").as("id"),
          floor(col("value") * 100).cast("long").as("v"))
      val reps = ext.Bootstrap.replicateTotalsBy(ev, "g", "id", "v",
        replicates = 64)
      val ci = ext.Bootstrap.pairedDiffCI(reps, "click", "purchase")
      val pt = ev.agg(
        (sum(when(col("g") === "click", col("v"))).cast("double") /
          sum(when(col("g") === "click", 1L)).cast("double"))
          .as("mean_click"),
        (sum(when(col("g") === "purchase", col("v"))).cast("double") /
          sum(when(col("g") === "purchase", 1L)).cast("double"))
          .as("mean_purchase"))
      ci.crossJoin(broadcast(pt))
    })
  )

  // ------------------------------------------------------------ oracle SQL

  /** Marker-word language-ID as first-wins argmax CASE (mirrors
    * `TextStats.langId`'s strictly-greater fold).
    */
  private val LangIdOracle: String = {
    val scores = TextStats.LangMarkers.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks, x -> list_contains($arr, x))) AS s_$lang"
    }.mkString(",\n       |    ")
    val langs = TextStats.LangMarkers.map(_._1)
    val all = langs.map("s_" + _).mkString(", ")
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map("s_" + _)
      val restMax = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"WHEN s_$l >= $restMax THEN '$l'"
    }.mkString(" ")
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |    regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, lang,
       |    $scores
       |  FROM toks)
       |SELECT doc_id, lang,
       |  CASE WHEN greatest($all) = 0 THEN 'und'
       |       $cases
       |       ELSE '${langs.last}' END AS lang_pred
       |FROM scored""".stripMargin
  }

  /** Word-3-gram shingle CTE over a doc set named `all_docs(doc_id, text)` —
    * mirrors `Dedup.shingles(text, 3)`.
    */
  private val ShingleCte: String =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(t) - 2, 1)),
      |      i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
      |  FROM (SELECT doc_id,
      |          string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
      |        FROM all_docs))""".stripMargin

  /** Oracle for the IVF cross-table join (q102): centroids are the 16
    * RIGHT-side rows of smallest md5(id) rank (the engine's
    * id-distribution-free donor sample), right rows take their
    * single best cell and left rows their 3 best (cosine DESC,
    * centroid_id tie-break — the kernel's lowest-index rule), candidates
    * meet on the cell, exact cosine ranks within query. The cosine
    * applies the engine's zero-vector convention (denom > 0 ? dot/denom
    * : 0.0 — `NearestCentroids` and `Similarity.cosineCol` both use it)
    * rather than raw division, so the equivalence is unconditional: a
    * raw-division oracle would yield NaN for an all-zero embedding
    * (which DuckDB sorts FIRST under DESC) and diverge if one ever
    * entered the corpus.
    */
  private val IvfSemanticJoinOracle: String = {
    def cosine(a: String, b: String): String = {
      val denom =
        s"""(sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
      s"""CASE WHEN $denom > 0 THEN list_sum(list_transform(list_zip($a, $b),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |    / $denom ELSE 0.0 END""".stripMargin
    }
    s"""WITH rt AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 2),
       |lt AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 2),
       |centroids AS (
       |  SELECT vec_id AS centroid_id, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM rt
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
       |  ORDER BY vec_id),
       |corpus_assign AS (
       |  SELECT vec_id AS neighbor_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosine("e.embedding", "c.cvec")} DESC, c.centroid_id) AS crank
       |    FROM rt e CROSS JOIN centroids c)
       |  WHERE crank <= 1),
       |query_assign AS (
       |  SELECT query_id, cell FROM (
       |    SELECT e.vec_id AS query_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosine("e.embedding", "c.cvec")} DESC, c.centroid_id) AS crank
       |    FROM lt e CROSS JOIN centroids c)
       |  WHERE crank <= 3),
       |cand AS (
       |  SELECT DISTINCT q.query_id, ca.neighbor_id
       |  FROM query_assign q JOIN corpus_assign ca ON ca.cell = q.cell),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${cosine("q.embedding", "c.embedding")} AS cosine
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Oracle for the PQ-coded IVF join (q106): the q102 cell machinery
    * (md5-rank centroid donors, best cell per right row, 3 probes
    * per query) composed with the q80 PQ machinery (codebook = the 8
    * right rows of smallest md5(id) rank, codeword j = id-sorted rank —
    * nearest codeword per 8-dim subspace by
    * dot − |c|²/2, per-query LUTs), ADC-scored candidate pool of
    * k·rerankFactor = 20 per query, exact cosine re-rank. Same ADC
    * double-sum-order soundness note as [[PqAnnOracle]]; exact cosine
    * uses the engine's zero-vector rule.
    */
  private val IvfPqSemanticJoinOracle: String = {
    def dotSql(a: String, b: String): String =
      s"""list_sum(list_transform(list_zip($a, $b),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))""".stripMargin
    def cosine(a: String, b: String): String = {
      val denom =
        s"""(sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
           |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
      s"""CASE WHEN $denom > 0 THEN ${dotSql(a, b)}
         |    / $denom ELSE 0.0 END""".stripMargin
    }
    s"""WITH rt AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 <> 2),
       |lt AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 2),
       |centroids AS (
       |  SELECT vec_id AS centroid_id, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM rt
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
       |  ORDER BY vec_id),
       |corpus_assign AS (
       |  SELECT vec_id AS neighbor_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosine("e.embedding", "c.cvec")} DESC, c.centroid_id) AS crank
       |    FROM rt e CROSS JOIN centroids c)
       |  WHERE crank <= 1),
       |query_assign AS (
       |  SELECT query_id, cell FROM (
       |    SELECT e.vec_id AS query_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosine("e.embedding", "c.cvec")} DESC, c.centroid_id) AS crank
       |    FROM lt e CROSS JOIN centroids c)
       |  WHERE crank <= 3),
       |cw AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
       |    embedding AS wvec
       |  FROM (SELECT vec_id, embedding FROM rt
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8)),
       |cws AS (
       |  SELECT j, m, list_slice(wvec, m * 8 + 1, m * 8 + 8) AS c
       |  FROM cw CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS m)),
       |en AS (
       |  SELECT vec_id,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT e.vec_id, c.m, c.j,
       |      row_number() OVER (PARTITION BY e.vec_id, c.m ORDER BY
       |        (${dotSql("list_slice(e.embedding, c.m * 8 + 1, c.m * 8 + 8)", "c.c")}
       |         - 0.5 * list_sum(list_transform(c.c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
       |        c.j) AS rk
       |    FROM rt e CROSS JOIN cws c)
       |  WHERE rk = 1),
       |lut AS (
       |  SELECT q.vec_id AS query_id, c.m, c.j,
       |    ${dotSql("list_slice(q.embedding, c.m * 8 + 1, c.m * 8 + 8)", "c.c")} AS v
       |  FROM lt q CROSS JOIN cws c),
       |cand AS (
       |  SELECT DISTINCT q.query_id, ca.neighbor_id
       |  FROM query_assign q JOIN corpus_assign ca ON ca.cell = q.cell),
       |approx AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    CASE WHEN qn.nrm * cn.nrm > 0
       |         THEN sum(l.v) / (qn.nrm * cn.nrm) ELSE 0.0 END AS approx_cos
       |  FROM cand
       |  JOIN enc ON enc.vec_id = cand.neighbor_id
       |  JOIN lut l ON l.query_id = cand.query_id AND l.m = enc.m AND l.j = enc.code
       |  JOIN en qn ON qn.vec_id = cand.query_id
       |  JOIN en cn ON cn.vec_id = cand.neighbor_id
       |  GROUP BY cand.query_id, cand.neighbor_id, qn.nrm, cn.nrm),
       |pool AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY approx_cos DESC, neighbor_id) AS crank
       |    FROM approx) WHERE crank <= 20),
       |scored AS (
       |  SELECT pool.query_id, pool.neighbor_id,
       |    ${cosine("q.embedding", "c.embedding")} AS cosine
       |  FROM pool
       |  JOIN embeddings q ON q.vec_id = pool.query_id
       |  JOIN embeddings c ON c.vec_id = pool.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Generated oracle for the cross-table semantic join: same inlined
    * 10-bit hyperplane constants as [[LshAnnOracle]], but the query side
    * is every fifth embedding and the corpus side is the rest — the
    * both-sides-large regime lshTopKJoin exists for.
    */
  private val SemanticJoinOracle: String = {
    val planes = ext.Similarity.hyperplanes(dim = 64, bits = 10, seed = 42L)
    val values = planes.zipWithIndex
      .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
      .mkString(",\n  ")
    // zero-vector convention matches the engine (denom > 0 ? dot/denom :
    // 0.0) — same rationale as IvfSemanticJoinOracle's cosine
    val cosine = {
      val denom =
        """(sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          |       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
      s"""CASE WHEN $denom > 0 THEN list_sum(list_transform(list_zip(q.embedding, c.embedding),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |    / $denom ELSE 0.0 END""".stripMargin
    }
    s"""WITH planes AS (SELECT * FROM (VALUES
       |  $values) AS t(pidx, pvec)),
       |cd AS (
       |  SELECT e.vec_id, p.pidx,
       |    list_sum(list_transform(list_zip(e.embedding, p.pvec),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS d
       |  FROM embeddings e CROSS JOIN planes p),
       |cb AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << pidx) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM cd GROUP BY 1),
       |qb AS (SELECT vec_id AS query_id, bucket AS qbucket FROM cb WHERE vec_id % 5 = 1),
       |rb AS (SELECT vec_id AS neighbor_id, bucket FROM cb WHERE vec_id % 5 <> 1),
       |probes AS (
       |  SELECT query_id, qbucket AS bucket FROM qb
       |  UNION
       |  SELECT query_id, xor(qbucket, CAST(1 AS BIGINT) << i) AS bucket
       |  FROM qb, (SELECT unnest(generate_series(0, 9)) AS i)),
       |cand AS (
       |  SELECT DISTINCT p.query_id, rb.neighbor_id
       |  FROM probes p JOIN rb ON rb.bucket = p.bucket),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    $cosine AS cosine
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Generated oracle for the LSH ANN path: the 10×64 hyperplane constants
    * are inlined (full round-trip double precision), so DuckDB replicates
    * bucket assignment, multi-probe, and ranking exactly. Sound because the
    * minimum |dot(vec, plane)| across the corpus is ~8e-5 — sign decisions
    * and rank order sit far above any accumulation-order float noise.
    */
  private val LshAnnOracle: String = {
    val planes = ext.Similarity.hyperplanes(dim = 64, bits = 10, seed = 42L)
    val values = planes.zipWithIndex
      .map { case (p, i) => s"($i, [${p.mkString(", ")}])" }
      .mkString(",\n  ")
    val cosine =
      """list_sum(list_transform(list_zip(q.embedding, c.embedding),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    s"""WITH planes AS (SELECT * FROM (VALUES
       |  $values) AS t(pidx, pvec)),
       |cd AS (
       |  SELECT e.vec_id, p.pidx,
       |    list_sum(list_transform(list_zip(e.embedding, p.pvec),
       |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS d
       |  FROM embeddings e CROSS JOIN planes p),
       |cb AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN d >= 0 THEN (CAST(1 AS BIGINT) << pidx) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM cd GROUP BY 1),
       |qb AS (SELECT vec_id AS query_id, bucket AS qbucket FROM cb WHERE vec_id < 8),
       |probes AS (
       |  SELECT query_id, qbucket AS bucket FROM qb
       |  UNION
       |  SELECT query_id, xor(qbucket, CAST(1 AS BIGINT) << i) AS bucket
       |  FROM qb, (SELECT unnest(generate_series(0, 9)) AS i)),
       |cand AS (
       |  SELECT DISTINCT p.query_id, cb.vec_id AS neighbor_id
       |  FROM probes p JOIN cb ON cb.bucket = p.bucket),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    $cosine AS cosine
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 10""".stripMargin
  }

  /** Generated oracle for the IVF ANN path: centroid sampling, Voronoi
    * assignment (rank-1 cosine for corpus, rank ≤ nprobe for queries), and
    * candidate ranking replicated in SQL. Parameters mirror q28:
    * numCells=16, nprobe=4; centroids = 16 smallest md5(id) ranks.
    */
  private val IvfAnnOracle: String = {
    def cosine(a: String, b: String): String =
      s"""list_sum(list_transform(list_zip($a, $b),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    s"""WITH centroids AS (
       |  SELECT vec_id AS centroid_id, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
       |  ORDER BY vec_id),
       |corpus_assign AS (
       |  SELECT vec_id AS neighbor_id, cell FROM (
       |    SELECT e.vec_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosine("e.embedding", "c.cvec")} DESC, c.centroid_id) AS crank
       |    FROM embeddings e CROSS JOIN centroids c)
       |  WHERE crank <= 1),
       |query_assign AS (
       |  SELECT query_id, cell FROM (
       |    SELECT e.vec_id AS query_id, c.centroid_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosine("e.embedding", "c.cvec")} DESC, c.centroid_id) AS crank
       |    FROM embeddings e CROSS JOIN centroids c
       |    WHERE e.vec_id < 8)
       |  WHERE crank <= 4),
       |cand AS (
       |  SELECT DISTINCT q.query_id, ca.neighbor_id
       |  FROM query_assign q JOIN corpus_assign ca ON ca.cell = q.cell),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${cosine("q.embedding", "c.embedding")} AS cosine
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 10""".stripMargin
  }

  /** Generated oracle for the PQ ANN path: the md5-rank-sampled codebook is
    * derived from the embeddings table itself (same ids as the engine
    * side), then encoding (nearest codeword per subspace by
    * `dot − |c|²/2`, ties to the lowest code), per-query ADC lookup
    * tables, the approx-cosine candidate pool, and the exact re-rank are
    * replicated in SQL. Parameters mirror q80: 8 subspaces × 8 dims,
    * 16 codewords (smallest md5(id) ranks, j = id-sorted rank), pool =
    * k·rerankFactor = 40. Soundness
    * note: the ADC sum adds 8 doubles in GROUP-BY order on the DuckDB
    * side vs subspace order on the engine side — ulp drift there can
    * only reorder near-ties at the POOL boundary, and the final ranking
    * is the exact cosine computed identically on both sides.
    */
  private val PqAnnOracle: String = {
    def dotSql(a: String, b: String): String =
      s"""list_sum(list_transform(list_zip($a, $b),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))""".stripMargin
    def cosine(a: String, b: String): String =
      s"""${dotSql(a, b)}
         |    / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    s"""WITH cw AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM embeddings
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)),
       |cws AS (
       |  SELECT j, m, list_slice(cvec, m * 8 + 1, m * 8 + 8) AS c
       |  FROM cw CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS m)),
       |en AS (
       |  SELECT vec_id,
       |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |enc AS (
       |  SELECT vec_id, m, j AS code FROM (
       |    SELECT e.vec_id, c.m, c.j,
       |      row_number() OVER (PARTITION BY e.vec_id, c.m ORDER BY
       |        (${dotSql("list_slice(e.embedding, c.m * 8 + 1, c.m * 8 + 8)", "c.c")}
       |         - 0.5 * list_sum(list_transform(c.c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
       |        c.j) AS rk
       |    FROM embeddings e CROSS JOIN cws c)
       |  WHERE rk = 1),
       |lut AS (
       |  SELECT q.vec_id AS query_id, c.m, c.j,
       |    ${dotSql("list_slice(q.embedding, c.m * 8 + 1, c.m * 8 + 8)", "c.c")} AS v
       |  FROM embeddings q CROSS JOIN cws c WHERE q.vec_id < 8),
       |approx AS (
       |  SELECT l.query_id, enc.vec_id AS neighbor_id,
       |    sum(l.v) / (qn.nrm * cn.nrm) AS approx_cos
       |  FROM enc JOIN lut l ON l.m = enc.m AND l.j = enc.code
       |  JOIN en qn ON qn.vec_id = l.query_id
       |  JOIN en cn ON cn.vec_id = enc.vec_id
       |  GROUP BY l.query_id, enc.vec_id, qn.nrm, cn.nrm),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY approx_cos DESC, neighbor_id) AS crank
       |    FROM approx) WHERE crank <= 40),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    ${cosine("q.embedding", "c.embedding")} AS cosine
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.query_id
       |  JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |SELECT query_id, neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |FROM scored
       |QUALIFY rank <= 10""".stripMargin
  }

  /** Generated oracle for the random-projection path: the 16×64 seeded
    * Gaussian matrix is inlined at full round-trip double precision and
    * each output component is the same index-order float→double dot both
    * engines compute — bit-equal, no rank/sign indirection needed.
    */
  private val RandomProjectionOracle: String = {
    val planes = ext.Similarity.projectionMatrix(inDim = 64, outDim = 16, seed = 42L)
    // %.17e: 17 significant digits round-trip any double, and the
    // exponent makes DuckDB parse each literal as DOUBLE — a bare decimal
    // literal list types as DECIMAL[], truncating the constants and
    // shifting components by an ulp (raw values here, unlike the
    // sign/rank-gated ANN oracles, must be BIT-equal)
    val values = planes.zipWithIndex
      .map { case (p, r) =>
        val row = p.map(v => String.format(java.util.Locale.ROOT, "%.17e", Double.box(v)))
        s"($r, [${row.mkString(", ")}])"
      }
      .mkString(",\n  ")
    s"""WITH planes AS (SELECT * FROM (VALUES
       |  $values) AS t(dim, pvec))
       |SELECT e.vec_id, CAST(p.dim AS INT) AS dim,
       |  list_sum(list_transform(list_zip(e.embedding, p.pvec),
       |    z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))) AS value
       |FROM embeddings e CROSS JOIN planes p
       |ORDER BY 1, 2""".stripMargin
  }

  /** Generated oracle for char-trigram language ID: the per-language
    * trigram profiles are inlined; scoring/argmax mirror
    * `TextStats.langIdCharNgram` (first-wins ties).
    */
  private val LangIdNgramOracle: String = {
    val scores = TextStats.LangTrigramProfiles.map { case (lang, grams) =>
      val arr = grams.map(g => "'" + g.replace("'", "''") + "'").mkString("[", ", ", "]")
      s"len(list_filter(tg, x -> list_contains($arr, x))) AS s_$lang"
    }.mkString(",\n       |    ")
    val langs = TextStats.LangTrigramProfiles.map(_._1)
    val all = langs.map("s_" + _).mkString(", ")
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map("s_" + _)
      val restMax = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(", ")})"
      s"WHEN s_$l >= $restMax THEN '$l'"
    }.mkString(" ")
    s"""WITH padded AS (
       |  SELECT doc_id,
       |    ' ' || trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) || ' ' AS p
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(1, greatest(length(p) - 2, 1)),
       |      i -> substr(p, CAST(i AS INT), 3)) AS tg
       |  FROM padded),
       |scored AS (
       |  SELECT doc_id,
       |    $scores
       |  FROM grams)
       |SELECT doc_id,
       |  CASE WHEN greatest($all) = 0 THEN 'und'
       |       $cases
       |       ELSE '${langs.last}' END AS lang_pred
       |FROM scored""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q16_ann_lsh" -> LshAnnOracle,

    "q37_langid_ngram" -> LangIdNgramOracle,

    "q38_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey) >
        |  2 * (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q28_ann_ivf" -> IvfAnnOracle,
    "q80_ann_pq" -> PqAnnOracle,
    "q86_random_projection" -> RandomProjectionOracle,
    "q99_semantic_join" -> SemanticJoinOracle,
    "q102_ivf_semantic_join" -> IvfSemanticJoinOracle,
    "q106_ivf_pq_semantic_join" -> IvfPqSemanticJoinOracle,

    // Efraimidis–Spirakis replicated in SQL: the 52-bit h is rebuilt
    // hex-digit-by-digit (every intermediate is an exact double), then
    // u = (h+1)/2^52 and key = ln(u)/w rank the draw
    "q100_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(length(text) AS DOUBLE) + 1.0 AS wt
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |h AS (
        |  SELECT doc_id, wt,
        |    substr(md5(concat('graft-ws', '|', CAST(doc_id AS VARCHAR))), 1, 13) AS hx
        |  FROM w),
        |k AS (
        |  SELECT doc_id, wt,
        |    ln((list_sum(list_transform(generate_series(1, 13),
        |         i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1 AS DOUBLE)
        |              * pow(16, 13 - i))) + 1.0) / 4503599627370496.0) / wt AS kk
        |  FROM h)
        |SELECT doc_id, wt FROM (
        |  SELECT doc_id, wt FROM k ORDER BY kk DESC, doc_id LIMIT 100)
        |ORDER BY doc_id""".stripMargin,

    // per-stratum ranking with per-stratum cutoffs via CASE; unlisted
    // strata never enter the ranked set
    "q103_weighted_targets" ->
      """WITH w AS (
        |  SELECT doc_id, lang, CAST(length(text) AS DOUBLE) + 1.0 AS wt
        |  FROM documents
        |  WHERE text IS NOT NULL AND doc_id IS NOT NULL AND lang IN ('en', 'de')),
        |h AS (
        |  SELECT doc_id, lang, wt,
        |    substr(md5(concat('graft-ws', '|', CAST(doc_id AS VARCHAR))), 1, 13) AS hx
        |  FROM w),
        |k AS (
        |  SELECT doc_id, lang, wt,
        |    ln((list_sum(list_transform(generate_series(1, 13),
        |         i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1 AS DOUBLE)
        |              * pow(16, 13 - i))) + 1.0) / 4503599627370496.0) / wt AS kk
        |  FROM h),
        |r AS (
        |  SELECT doc_id, lang, wt,
        |    row_number() OVER (PARTITION BY lang ORDER BY kk DESC, doc_id) AS rn
        |  FROM k)
        |SELECT doc_id, lang, wt FROM r
        |WHERE rn <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 80 END
        |ORDER BY doc_id""".stripMargin,

    // the four patterns have no border (prefix = suffix), so
    // non-overlapping counts == all-occurrence counts per pattern
    "q120_multi_pattern_scan" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data,
        |  CAST(len(regexp_extract_all(text, 'row')) AS BIGINT) AS n_row,
        |  CAST(len(regexp_extract_all(text, 'table')) AS BIGINT) AS n_table,
        |  CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the,
        |  CAST(len(regexp_extract_all(text, 'data'))
        |     + len(regexp_extract_all(text, 'row'))
        |     + len(regexp_extract_all(text, 'table'))
        |     + len(regexp_extract_all(text, 'the')) AS BIGINT) AS total
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // replays train AND score: add-one-smoothed token llr from the seed
    // slice, integer-scaled logs summed as BIGINT, one double division
    "q121_nb_quality" ->
      """WITH seed AS (
        |  SELECT lang = 'en' AS pos, text FROM documents
        |  WHERE doc_id % 4 = 0 AND text IS NOT NULL AND lang IS NOT NULL),
        |stoks AS (
        |  SELECT pos,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM seed),
        |w AS (
        |  SELECT term,
        |    CAST(floor(ln(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) + 1 AS DOUBLE)) * 1e12) AS BIGINT)
        |    - CAST(floor(ln(CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) + 1 AS DOUBLE)) * 1e12) AS BIGINT) AS w
        |  FROM stoks GROUP BY 1),
        |tt AS (
        |  SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS tp,
        |         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS tn,
        |         count(DISTINCT term) AS v
        |  FROM stoks),
        |dt AS (
        |  SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS dp,
        |         sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS dn
        |  FROM seed),
        |consts AS (
        |  SELECT CAST(floor(ln(CAST(dp AS DOUBLE)) * 1e12) AS BIGINT)
        |         - CAST(floor(ln(CAST(dn AS DOUBLE)) * 1e12) AS BIGINT) AS prior,
        |         CAST(floor(ln(CAST(tp + v AS DOUBLE)) * 1e12) AS BIGINT)
        |         - CAST(floor(ln(CAST(tn + v AS DOUBLE)) * 1e12) AS BIGINT) AS denom
        |  FROM tt CROSS JOIN dt),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents WHERE text IS NOT NULL),
        |sc AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |         sum(COALESCE(w.w, 0)) AS sw
        |  FROM toks t LEFT JOIN w USING (term) GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  CAST(prior + sw - n_tokens * denom AS DOUBLE) / 1e12 AS nb_llr
        |FROM sc CROSS JOIN consts ORDER BY doc_id""".stripMargin,

    // replays url synthesis + canonicalization + registrable-domain
    // heuristic; RE2-safe patterns keep both engines identical
    "q122_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |    (CASE doc_id % 5 WHEN 0 THEN 'WWW.Example.COM'
        |      WHEN 1 THEN 'news.Example.co.uk' WHEN 2 THEN 'Sub.Blog.example.ORG'
        |      WHEN 3 THEN '192.168.10.42' ELSE 'example.net' END) ||
        |    (CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':8080' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id AS VARCHAR) ||
        |    (CASE doc_id % 3 WHEN 0 THEN '?utm_source=tw&z=9&a=1'
        |      WHEN 1 THEN '?b=2&utm_medium=email' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '#Sec2' ELSE '' END) AS url
        |  FROM documents WHERE doc_id IS NOT NULL),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '') AS hostport,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS query
        |  FROM u),
        |q AS (
        |  SELECT doc_id, scheme,
        |    lower(regexp_replace(hostport, ':[0-9]*$', '')) AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port, path,
        |    list_sort(list_filter(string_split(query, '&'),
        |      x -> NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid)(=|$)') AND x <> '')) AS params
        |  FROM p),
        |c AS (
        |  SELECT doc_id,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |       OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) AS url_canon,
        |    host, string_split(host, '.') AS labels
        |  FROM q),
        |r AS (
        |  SELECT doc_id, url_canon,
        |    CASE WHEN regexp_matches(host, '^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$') THEN host
        |         WHEN len(labels) <= 2 THEN host
        |         WHEN labels[-2] IN ('co','com','net','org','gov','ac','edu')
        |           AND length(labels[-1]) = 2 THEN array_to_string(labels[-3:], '.')
        |         ELSE array_to_string(labels[-2:], '.') END AS reg_domain
        |  FROM c)
        |SELECT doc_id, url_canon, reg_domain,
        |  CAST(count(*) OVER (PARTITION BY reg_domain) AS BIGINT) AS domain_docs
        |FROM r ORDER BY doc_id""".stripMargin,

    // literal alternation: same leftmost-first semantics as the engine's
    // (start asc, list order) sweep; no two patterns share a start here
    "q125_multi_redact" ->
      """SELECT doc_id,
        |  regexp_replace(text, 'data|row|table|the', '[X]', 'g') AS clean_text,
        |  CAST(length(regexp_replace(text, 'data|row|table|the', '[X]', 'g')) AS BIGINT) AS n_chars_clean
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // interpolated bigram probability in ONE fixed double-arithmetic
    // shape, quantized and BIGINT-summed (the q87 replay stance)
    "q124_bigram_logprob" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |bi AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |toks AS (SELECT unnest(t) AS term FROM d),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |c2 AS (SELECT term, count(*) AS c2 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |sc AS (
        |  SELECT b.doc_id,
        |    CAST(floor(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
        |      + 0.25 * (CAST(c2.c2 AS DOUBLE) / n)) * 1e12) AS BIGINT) AS lp
        |  FROM bi b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |    JOIN c2 ON b.w2 = c2.term CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(lp) AS DOUBLE) / 1e12 / count(*) AS mean_lp
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // max cosine over the benchmark slice per corpus row, then the
    // strict < tau survivor filter — same index-order double arithmetic
    // as the kernel (the q14/q15 list_sum equivalence)
    "q123_semantic_decontam" ->
      """WITH refs AS (SELECT embedding FROM embeddings WHERE vec_id % 23 = 0),
        |sc AS (
        |  SELECT e.vec_id,
        |    max(list_sum(list_transform(list_zip(e.embedding, r.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(r.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS max_ref_cosine
        |  FROM embeddings e CROSS JOIN refs r
        |  GROUP BY e.vec_id)
        |SELECT vec_id, max_ref_cosine FROM sc
        |WHERE max_ref_cosine < 0.92 ORDER BY vec_id""".stripMargin,

    // batch 0 = the q110 oracle over the corpus thirds (tagged 0);
    // batch 1 = the q117 oracle (tagged 1); union replays the fold
    "q118_stream_paragraph_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    concat(
        |      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |      chr(10), 'Subscribe to our newsletter!', chr(10),
        |      array_to_string(list_slice(string_split(text, ' '), 9, 16), ' ')) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp0 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM raw WHERE doc_id % 3 <> 0),
        |p0 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp0)),
        |k0 AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p0),
        |out0 AS (
        |  SELECT CAST(0 AS BIGINT) AS batch_id, k0.doc_id,
        |    string_agg(k0.para, chr(10) ORDER BY k0.idx) AS clean_text,
        |    CAST(len(any_value(sp0.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM k0 JOIN sp0 ON k0.doc_id = sp0.doc_id
        |  WHERE k0.rk = 1
        |  GROUP BY k0.doc_id),
        |cn AS (
        |  SELECT DISTINCT norm FROM p0 WHERE norm <> ''),
        |sp1 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM raw WHERE doc_id % 3 = 0),
        |p1 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp1)),
        |k1 AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p1),
        |out1 AS (
        |  SELECT CAST(1 AS BIGINT) AS batch_id, k1.doc_id,
        |    string_agg(k1.para, chr(10) ORDER BY k1.idx) AS clean_text,
        |    CAST(len(any_value(sp1.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM k1 JOIN sp1 ON k1.doc_id = sp1.doc_id
        |  WHERE k1.rk = 1
        |    AND (k1.norm = '' OR k1.norm NOT IN (SELECT norm FROM cn))
        |  GROUP BY k1.doc_id)
        |SELECT * FROM out0 UNION ALL SELECT * FROM out1
        |ORDER BY batch_id, doc_id""".stripMargin,

    // q110's machinery on the batch third, plus an anti-join against the
    // corpus thirds' distinct normalized paragraphs
    "q117_paragraph_dedup_incr" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    concat(
        |      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |      chr(10), 'Subscribe to our newsletter!', chr(10),
        |      array_to_string(list_slice(string_split(text, ' '), 9, 16), ' ')) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |cn AS (
        |  SELECT DISTINCT
        |    trim(regexp_replace(lower(para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT unnest(string_split(text, chr(10))) AS para
        |        FROM raw WHERE doc_id % 3 <> 0)
        |  WHERE trim(regexp_replace(lower(para), '\s+', ' ', 'g')) <> ''),
        |sp AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |       FROM raw WHERE doc_id % 3 = 0),
        |p AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u
        |        FROM sp)),
        |k AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p)
        |SELECT k.doc_id,
        |  string_agg(k.para, chr(10) ORDER BY k.idx) AS clean_text,
        |  CAST(len(any_value(sp.t)) AS BIGINT) AS n_paras,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM k JOIN sp ON k.doc_id = sp.doc_id
        |WHERE k.rk = 1
        |  AND (k.norm = '' OR k.norm NOT IN (SELECT norm FROM cn))
        |GROUP BY k.doc_id
        |ORDER BY k.doc_id""".stripMargin,

    // chr(195)||chr(169) = a lowercase-accent mojibake digraph,
    // chr(65533) = U+FFFD, chr(133)||chr(195)||chr(136) = a bare C1
    // control plus an UPPERCASE-accent digraph whose continuation is
    // itself C1 (the overlap the ratio subtracts); DuckDB
    // regexp_extract_all + len counts matches
    "q116_encoding_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    concat(CASE WHEN doc_id % 4 = 0 THEN chr(195) || chr(169)
        |                WHEN doc_id % 4 = 1 THEN chr(65533)
        |                WHEN doc_id % 4 = 2 THEN chr(133) || chr(195) || chr(136)
        |                ELSE '' END, text) AS t
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(t, '\x{fffd}')) AS BIGINT)
        |      AS n_replacement,
        |    CAST(len(regexp_extract_all(t, '[\x{0080}-\x{009f}]')) AS BIGINT)
        |      AS n_c1_controls,
        |    CAST(len(regexp_extract_all(t, '\x{00c3}[\x{0080}-\x{00bf}]')) AS BIGINT)
        |      AS n_latin1_utf8,
        |    CAST(len(regexp_extract_all(t, '\x{00c3}[\x{0080}-\x{009f}]')) AS BIGINT)
        |      AS ovl,
        |    CAST(length(t) AS BIGINT) AS n_chars
        |  FROM base)
        |SELECT doc_id, n_replacement, n_c1_controls, n_latin1_utf8, n_chars,
        |  CAST(n_replacement + n_c1_controls + n_latin1_utf8 - ovl AS DOUBLE)
        |    / greatest(n_chars, 1) AS bad_ratio
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // q108's greedy-prefix CTE feeding q113's shard/rank logic
    "q115_export_pipeline" ->
      """WITH sel AS (
        |  SELECT doc_id, lang, n_chars FROM (
        |    SELECT doc_id, lang, n_chars,
        |      sum(n_chars) OVER (PARTITION BY lang
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |        ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM documents
        |    WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |      AND n_chars IS NOT NULL AND n_chars >= 0)
        |  WHERE cum <= 15000),
        |h AS (
        |  SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS hx
        |  FROM sel),
        |s AS (
        |  SELECT doc_id, lang, n_chars, hx,
        |    CAST(CAST(('0x' || substr(hx, 1, 4)) AS BIGINT) % 4 AS INT) AS shard
        |  FROM h)
        |SELECT doc_id, lang, n_chars, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    // chr(769) = U+0301 combining acute, chr(233) = U+00E9 precomposed;
    // DuckDB length() counts code points like Spark's
    "q114_unicode_nfc" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    concat(substr(text, 1, 10),
        |      CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769) ELSE chr(233) END,
        |      substr(text, 11, 10)) AS raw
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
        |  CAST(length(raw) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc
        |FROM base
        |ORDER BY doc_id""".stripMargin,

    // shard from the first 4 md5 hex chars mod 8; pos replayed as a
    // per-shard row_number over (md5, doc_id) — the engine's two-phase
    // bucket/carry rank collapses to exactly this window
    "q113_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s AS (
        |  SELECT doc_id, hx,
        |    CAST(CAST(('0x' || substr(hx, 1, 4)) AS BIGINT) % 8 AS INT) AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) - 1
        |    AS BIGINT) AS pos
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    // 8×4 gray gradient v = (doc_id + x + y) % 256 under an identity
    // palette: luma milli-sum is 1000·Σv exactly, whatever the encoding
    // (literal vs LZW-compressed vs interlaced) — same grid as q105
    "q111_gif_decode" ->
      """SELECT d.doc_id,
        |  CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST(sum(1000 * ((d.doc_id + u.x + v.y) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 32) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 7)) AS u(x),
        |  unnest(generate_series(0, 3)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // greedy prefix under a running-sum window: the two-phase bucket
    // form is exactly the single window over (md5(doc_id), doc_id)
    "q108_token_budget" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IS NOT NULL
        |    AND n_chars IS NOT NULL AND n_chars >= 0)
        |WHERE cum <= 15000
        |ORDER BY doc_id""".stripMargin,

    // longest-first fill to per-language budgets; ties on n_chars break
    // by (md5(doc_id), doc_id) — the engine's exact fine order
    "q109_token_budget_quality" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    sum(n_chars) OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND lang IN ('en', 'zh', 'de')
        |    AND n_chars IS NOT NULL AND n_chars >= 0)
        |WHERE cum <= CASE lang WHEN 'en' THEN 25000
        |                       WHEN 'zh' THEN 10000 ELSE 8000 END
        |ORDER BY doc_id""".stripMargin,

    // split on newline (trailing empties kept by both engines),
    // normalize lower/collapse-ws/trim, first occurrence = min (doc_id,
    // idx) via row_number, empty-norm paragraphs always kept, reassemble
    // with string_agg ORDER BY idx
    "q110_paragraph_dedup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    concat(
        |      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |      chr(10), 'Subscribe to our newsletter!', chr(10),
        |      array_to_string(list_slice(string_split(text, ' '), 9, 16), ' ')) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp AS (SELECT doc_id, string_split(text, chr(10)) AS t FROM base),
        |p AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u
        |        FROM sp)),
        |k AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p)
        |SELECT k.doc_id,
        |  string_agg(k.para, chr(10) ORDER BY k.idx) AS clean_text,
        |  CAST(len(any_value(sp.t)) AS BIGINT) AS n_paras,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM k JOIN sp ON k.doc_id = sp.doc_id
        |WHERE k.rk = 1
        |GROUP BY k.doc_id
        |ORDER BY k.doc_id""".stripMargin,

    // two-batch replay: day 1 against an empty store emits nothing; day 2
    // probes day 1's grams (q98's postings/island machinery, batch-tagged)
    "q104_stream_span_dedup" ->
      """WITH day1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |day2 AS (
        |  SELECT doc_id + 90000 AS doc_id,
        |    concat(array_to_string(list_slice(string_split(text, ' '), 1, 10), ' '),
        |           ' tail', CAST(doc_id AS VARCHAR)) AS text
        |  FROM documents WHERE doc_id % 9 = 1),
        |bt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM day2),
        |bg AS (
        |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> {'pos': i - 1,
        |            'gram': array_to_string(list_slice(t, i, i + 4), ' ')})) AS u
        |    FROM bt WHERE len(t) >= 5)),
        |cg AS (
        |  SELECT unnest(list_transform(
        |      generate_series(1, greatest(len(t) - 4, 1)),
        |      i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS gram
        |  FROM (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |        FROM day1)),
        |hits AS (
        |  SELECT doc_id, pos FROM bg WHERE gram IN (SELECT gram FROM cg)),
        |m AS (
        |  SELECT doc_id, pos,
        |    max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM hits),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM m)
        |SELECT CAST(1 AS BIGINT) AS batch_id, doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl
        |GROUP BY doc_id, island
        |ORDER BY batch_id, doc_id, span_start""".stripMargin,

    "q101_weighted_per_group" ->
      """WITH w AS (
        |  SELECT doc_id, lang, CAST(length(text) AS DOUBLE) + 1.0 AS wt
        |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL),
        |h AS (
        |  SELECT doc_id, lang, wt,
        |    substr(md5(concat('graft-ws', '|', CAST(doc_id AS VARCHAR))), 1, 13) AS hx
        |  FROM w),
        |k AS (
        |  SELECT doc_id, lang, wt,
        |    ln((list_sum(list_transform(generate_series(1, 13),
        |         i -> CAST(strpos('0123456789abcdef', substr(hx, i, 1)) - 1 AS DOUBLE)
        |              * pow(16, 13 - i))) + 1.0) / 4503599627370496.0) / wt AS kk
        |  FROM h),
        |r AS (
        |  SELECT doc_id, lang, wt,
        |    row_number() OVER (PARTITION BY lang ORDER BY kk DESC, doc_id) AS rn
        |  FROM k)
        |SELECT doc_id, lang, wt FROM r WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,

    // the capstone oracle composes the stage oracles: q35's gates+dedup,
    // q83's repetition fraction, q82's decontamination postings, q70's
    // recursive CC, q88's md5 split (0.1 → '199a'), q89's chunk windows
    "q95_training_pipeline" -> {
      val dup3 =
        """CASE WHEN len(toks) > 0 THEN
          |      CAST(1 AS DOUBLE) - CAST(len(list_distinct(list_transform(
          |        generate_series(1, greatest(len(toks) - 2, 1)),
          |        i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS DOUBLE)
          |        / CAST(greatest(len(toks) - 2, 1) AS DOUBLE)
          |    ELSE 0.0 END""".stripMargin
      s"""WITH RECURSIVE t0 AS (
         |  SELECT doc_id, text,
         |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, text FROM t0
         |  WHERE ${qualityScoreSql("text")} >= 0.8 AND ($dup3) <= 0.6),
         |qt AS (
         |  SELECT doc_id,
         |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
         |  FROM q),
         |qg AS (
         |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
         |    SELECT doc_id, unnest(list_transform(
         |      generate_series(1, len(t) - 4),
         |      i -> {'pos': i - 1,
         |            'gram': array_to_string(list_slice(t, i, i + 4), ' ')})) AS u
         |    FROM qt WHERE len(t) >= 5)),
         |qdup AS (
         |  SELECT gram FROM qg GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         |qhits AS (
         |  SELECT doc_id, pos FROM qg WHERE gram IN (SELECT gram FROM qdup)),
         |qm AS (
         |  SELECT doc_id, pos,
         |    max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM qhits),
         |qisl AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM qm),
         |qspans AS (
         |  SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
         |  FROM qisl GROUP BY doc_id, island),
         |qtok AS (
         |  SELECT qt.doc_id, u.i AS i, t[u.i] AS token
         |  FROM qt, unnest(generate_series(1, len(t))) AS u(i)),
         |qkeep AS (
         |  SELECT k.doc_id, k.i, k.token
         |  FROM qtok k LEFT JOIN qspans sp
         |    ON k.doc_id = sp.doc_id AND k.i - 1 BETWEEN sp.s AND sp.e
         |  WHERE sp.doc_id IS NULL),
         |trimmed AS (
         |  SELECT doc_id, array_to_string(list(token ORDER BY i), ' ') AS text
         |  FROM qkeep GROUP BY doc_id),
         |e AS (
         |  SELECT * FROM trimmed
         |  WHERE doc_id IN (SELECT min(doc_id) FROM trimmed GROUP BY text)),
         |all_docs AS (SELECT doc_id, text FROM e),
         |$ShingleCte,
         |pairs AS (
         |  SELECT ida, idb, j FROM (
         |    SELECT a.doc_id AS ida, b.doc_id AS idb,
         |      CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |        / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS j
         |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         |  WHERE j >= 0.6),
         |surv AS (
         |  SELECT * FROM e
         |  WHERE doc_id NOT IN (SELECT DISTINCT idb FROM pairs WHERE j >= 0.8)),
         |bench AS (
         |  SELECT doc_id + 50000 AS doc_id,
         |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS text
         |  FROM documents WHERE doc_id % 11 = 0),
         |bg AS (
         |  SELECT doc_id AS test_id, unnest(s) AS gram FROM (
         |    SELECT doc_id, list_distinct(list_transform(
         |      generate_series(1, greatest(len(t) - 2, 1)),
         |      i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
         |    FROM (SELECT doc_id,
         |            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
         |          FROM bench))),
         |sg AS (
         |  SELECT doc_id AS corpus_id, unnest(s) AS gram FROM sh
         |  WHERE doc_id IN (SELECT doc_id FROM surv)),
         |cont AS (
         |  SELECT corpus_id FROM sg JOIN bg USING (gram)
         |  GROUP BY corpus_id HAVING count(DISTINCT sg.gram) >= 2),
         |dec AS (
         |  SELECT * FROM surv WHERE doc_id NOT IN (SELECT corpus_id FROM cont)),
         |sym AS (SELECT ida AS a, idb AS b FROM pairs
         |        UNION SELECT idb, ida FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a),
         |comp AS (SELECT x AS doc_id, min(y) AS component FROM r GROUP BY 1),
         |sp AS (
         |  SELECT d.doc_id, d.text,
         |    CASE WHEN substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) < '199a'
         |         THEN 'test' ELSE 'train' END AS split
         |  FROM dec d LEFT JOIN comp c USING (doc_id)),
         |tk AS (
         |  SELECT doc_id, split,
         |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM sp)
         |SELECT doc_id, split, CAST((s - 1) // 8 AS INT) AS chunk_index,
         |  array_to_string(list_slice(toks, s, s + 11), ' ') AS chunk_text,
         |  CAST(least(len(toks) - s + 1, 12) AS BIGINT) AS n_chunk_tokens
         |FROM tk, unnest(generate_series(1, greatest(len(toks), 1), 8)) AS u(s)
         |ORDER BY doc_id, chunk_index""".stripMargin
    },

    // 8×4 gray gradient v = (doc_id + x + y) % 256: luma milli-sum is
    // 1000·Σv exactly (299+587+114 = 1000 on gray), n_bytes = 54 header
    // + 4 rows × 24-byte stride = 150
    "q93_bmp_decode" ->
      """SELECT d.doc_id, CAST(150 AS BIGINT) AS n_bytes,
        |  CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST(sum(1000 * ((d.doc_id + u.x + v.y) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 32) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 7)) AS u(x),
        |  unnest(generate_series(0, 3)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // mono 16 kHz, 256 samples s_i = (doc_id·31 + i) % 65536 − 32768:
    // rms = sqrt(Σs²/256)/32768 (exact integer sum; sqrt is correctly
    // rounded on every IEEE engine); 44-byte header + 512 data bytes
    "q94_wav_decode" ->
      """SELECT d.doc_id, CAST(556 AS BIGINT) AS n_bytes,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(16 AS BIGINT) AS duration_ms,
        |  sqrt(CAST(sum(((d.doc_id * 31 + u.i) % 65536 - 32768)
        |              * ((d.doc_id * 31 + u.i) % 65536 - 32768)) AS DOUBLE)
        |       / 256) / 32768.0 AS rms
        |FROM documents d, unnest(generate_series(0, 255)) AS u(i)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // 8×4 gray gradient v = (doc_id + x + y) % 256 (same grid as q93's
    // BMP); luma milli-sum is 1000·Σv exactly on gray; channels alternate
    // RGB/RGBA by id parity and alpha never enters luma
    "q105_png_decode" ->
      """SELECT d.doc_id,
        |  CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(3 + (d.doc_id % 2) AS INT) AS channels,
        |  CAST(sum(1000 * ((d.doc_id + u.x + v.y) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 32) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 7)) AS u(x),
        |  unnest(generate_series(0, 3)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // 4×2 grid of flat 8×8 blocks, block value v = (doc_id + bx + by) %
    // 256 → every pixel in the block equals v exactly (DC-only, q=8),
    // so lumaMilli = Σ_blocks 64·1000·v regardless of mode (flat chroma
    // 128 ⇒ RGB = Y); channels = 1 for gray ids (doc_id % 3 = 0) else 3
    "q107_jpeg_decode" ->
      """SELECT d.doc_id,
        |  CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 3 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |  CAST(sum(64 * 1000 * ((d.doc_id + u.bx + v.by) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 512) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 3)) AS u(bx),
        |  unnest(generate_series(0, 1)) AS v(by)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q91_per_group_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20
        |ORDER BY doc_id""".stripMargin,

    "q92_profile_drift" -> {
      def prof(src: String, cols: Seq[String]) = cols.map { c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM $src""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH bsrc AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice AS legacy_price
         |  FROM orders WHERE o_orderkey % 2 = 0),
         |b AS (${prof("bsrc", Seq("o_orderkey", "o_orderstatus", "legacy_price"))}),
         |a AS (${prof("orders", Seq("o_orderkey", "o_orderstatus", "o_totalprice"))})
         |SELECT coalesce(a.col_name, b.col_name) AS col_name,
         |  coalesce(a.n_rows, 0) - coalesce(b.n_rows, 0) AS d_rows,
         |  coalesce(a.n_null, 0) - coalesce(b.n_null, 0) AS d_null,
         |  coalesce(a.n_distinct, 0) - coalesce(b.n_distinct, 0) AS d_distinct,
         |  NOT (a.min_value IS NOT DISTINCT FROM b.min_value) AS min_changed,
         |  NOT (a.max_value IS NOT DISTINCT FROM b.max_value) AS max_changed,
         |  CASE WHEN b.n_rows IS NULL THEN 'added'
         |       WHEN a.n_rows IS NULL THEN 'removed'
         |       ELSE 'common' END AS presence
         |FROM b FULL JOIN a ON a.col_name = b.col_name
         |ORDER BY 1""".stripMargin
    },

    "q89_chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((s - 1) // 8 AS INT) AS chunk_index,
        |  array_to_string(list_slice(toks, s, s + 11), ' ') AS chunk_text,
        |  CAST(least(len(toks) - s + 1, 12) AS BIGINT) AS n_chunk_tokens
        |FROM t, unnest(generate_series(1, greatest(len(toks), 1), 8)) AS u(s)
        |ORDER BY doc_id, chunk_index""".stripMargin,

    "q90_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT shard, doc_id, n_tokens,
        |  CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        - n_tokens) // 64 AS BIGINT) AS seq_index
        |FROM t
        |ORDER BY doc_id""".stripMargin,

    // same recursive-CC machinery as q70; 0.25 → md5-bucket threshold
    // '4000' (the q72 idiom)
    "q88_leakage_safe_split" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |e AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a),
         |comp AS (SELECT x AS doc_id, min(y) AS component FROM r GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(c.component, d.doc_id) AS split_key,
         |  CASE WHEN substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) < '4000'
         |       THEN 'test' ELSE 'train' END AS split
         |FROM all_docs d LEFT JOIN comp c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q87_unigram_logprob" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM d),
        |freq AS (SELECT term, count(*) AS n_t FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM toks)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CAST(floor(ln(CAST(f.n_t AS DOUBLE)) * 1e12) AS BIGINT)) AS DOUBLE)
        |    / 1e12 / count(*) - ln(n_total) AS mean_lp
        |FROM toks t JOIN freq f USING (term) CROSS JOIN tot
        |GROUP BY t.doc_id, n_total
        |ORDER BY t.doc_id""".stripMargin,

    "q10_parse_logline" -> ParsedOracle,

    "q11_days_apart" ->
      s"""WITH e AS ($EventsCte),
         |d AS (
         |  SELECT
         |    'arn:aws:sts::123456789012:assumed-role/svc' || (user_id % 7) AS requester,
         |    'app' || (user_id % 3) AS log_name,
         |    date_diff('day',
         |      make_date(2023, CAST(1 + event_id % 12 AS INT), CAST(1 + event_id % 28 AS INT)),
         |      CAST(date_trunc('day', ts) AS DATE)) AS days_apart,
         |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE CAST(round(value * 100) AS BIGINT) END AS bytes_sent
         |  FROM e
         |  WHERE event_id % 101 <> 0 AND value > 50 AND event_type <> 'error')
         |SELECT requester, log_name,
         |       CAST(count(*) AS BIGINT) AS access_count,
         |       CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
         |FROM d WHERE days_apart > 60
         |GROUP BY 1, 2
         |ORDER BY access_count DESC, requester, log_name""".stripMargin,

    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  min(l_shipdate) AS min_ship,
        |  max(l_shipdate) AS max_ship
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q02_filter_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 150000""".stripMargin,

    // Bloom pruning has no false negatives, so the oracle is the PLAIN
    // inner join — the equivalence is the entire correctness claim
    "q96_bloom_prune_join" ->
      """SELECT o_custkey,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // duplicated 5-token windows across documents -> per-doc postings ->
    // gaps-and-islands interval merge, mirroring Dedup.duplicateSpans
    "q97_duplicate_spans" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> {'pos': i - 1,
        |            'gram': array_to_string(list_slice(t, i, i + 4), ' ')})) AS u
        |    FROM t0 WHERE len(t) >= 5)),
        |dup AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (
        |  SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
        |m AS (
        |  SELECT doc_id, pos,
        |    max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM hits),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM m)
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl
        |GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // batch windows probed against corpus grams; corpus grams mirror the
    // WordNgrams kernel (short docs emit the whole text — harmless here,
    // a <k-token gram can never equal a k-token batch window)
    "q98_span_decontaminate" ->
      """WITH batch AS (
        |  SELECT doc_id + 70000 AS doc_id,
        |    concat(array_to_string(list_slice(string_split(text, ' '), 1, 12), ' '),
        |           ' uniq', CAST(doc_id AS VARCHAR)) AS text
        |  FROM documents WHERE doc_id % 9 = 0),
        |bt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM batch),
        |bg AS (
        |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> {'pos': i - 1,
        |            'gram': array_to_string(list_slice(t, i, i + 4), ' ')})) AS u
        |    FROM bt WHERE len(t) >= 5)),
        |cg AS (
        |  SELECT unnest(list_transform(
        |      generate_series(1, greatest(len(t) - 4, 1)),
        |      i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS gram
        |  FROM (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |        FROM documents)),
        |hits AS (
        |  SELECT doc_id, pos FROM bg WHERE gram IN (SELECT gram FROM cg)),
        |m AS (
        |  SELECT doc_id, pos,
        |    max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM hits),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM m)
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl
        |GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    "q03_string_funs" ->
      """SELECT doc_id,
        |  upper(substr(text, 1, 10)) AS head_upper,
        |  CAST(length(text) AS BIGINT) AS text_len,
        |  regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
        |  concat_ws('|', lang, source) AS tag,
        |  CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the
        |FROM documents""".stripMargin,

    "q04_dates" ->
      s"""WITH e AS ($EventsCte)
         |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  CAST(max(hour(ts)) AS INT) AS max_hr
         |FROM e
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q05_days_apart_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q06_join_star" ->
      """SELECT r_name,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q07_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 15""".stripMargin,

    "q08_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    // Session windows re-derived via lag/cumsum: session_start = min ts of
    // each gap-merged run per user.
    "q55_session_window" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT user_id, ts,
         |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM e),
         |y AS (
         |  SELECT user_id, ts,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess
         |  FROM x)
         |SELECT min(ts) AS session_start, user_id,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM y
         |GROUP BY user_id, sess
         |ORDER BY user_id, session_start""".stripMargin,

    // Incremental-dedup semantics in exact-Jaccard form: corpus ids < 400,
    // new ids >= 400; a new row is dropped on a match to any corpus row or
    // to a smaller-id new row.
    "q56_dedup_incremental" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents
         |  WHERE doc_id < 400 AND doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 20000, text FROM documents
         |  WHERE doc_id >= 400 AND doc_id % 5 = 0),
         |$ShingleCte,
         |drops AS (
         |  SELECT DISTINCT n.doc_id
         |  FROM sh n JOIN sh o
         |    ON ((o.doc_id < 400 AND n.doc_id >= 400)
         |        OR (o.doc_id >= 400 AND n.doc_id >= 400 AND o.doc_id < n.doc_id))
         |  WHERE CAST(len(list_intersect(n.s, o.s)) AS DOUBLE)
         |      / CAST(len(n.s) + len(o.s) - len(list_intersect(n.s, o.s)) AS DOUBLE) >= 0.8)
         |SELECT doc_id FROM sh
         |WHERE doc_id >= 400 AND doc_id NOT IN (SELECT doc_id FROM drops)
         |ORDER BY doc_id""".stripMargin,

    "q57_gap_fill" ->
      s"""WITH e AS ($EventsCte),
         |daily AS (
         |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |  FROM e WHERE event_type = 'purchase'
         |  GROUP BY 1, 2),
         |spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         |alldays AS (
         |  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
         |  FROM spans)
         |SELECT a.user_id, a.day, d.v,
         |  last_value(d.v IGNORE NULLS) OVER (
         |    PARTITION BY a.user_id ORDER BY a.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
         |FROM alldays a LEFT JOIN daily d ON a.user_id = d.user_id AND a.day = d.day
         |ORDER BY a.user_id, a.day""".stripMargin,

    "q58_moving_avg" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS t
        |  FROM orders GROUP BY 1)
        |SELECT day, CAST(t AS DOUBLE) AS daily_total,
        |  CAST(sum(t) OVER w AS DOUBLE)
        |    / count(t) OVER w AS ma7,
        |  CAST(count(t) OVER w AS BIGINT) AS n_days
        |FROM daily
        |WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    // same semantics as q08, via the partial top-k Aggregator
    "q54_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    "q09_distinct_agg" ->
      s"""WITH e AS ($EventsCte)
         |SELECT event_type,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM e
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q12_dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT md5(text) AS digest,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keep_id
        |FROM all_docs
        |GROUP BY 1""".stripMargin,

    "q13_dedup_minhash" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8""".stripMargin,

    "q14_dedup_embedding" ->
      """WITH all_v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 2.0 AS FLOAT))
        |  FROM embeddings WHERE vec_id % 9 = 0),
        |scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b FROM scored WHERE cosine >= 0.9""".stripMargin,

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

    "q17_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextStats.BpeishPattern}')) AS BIGINT) AS n_bpeish,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:''"()\\[\\]{}_-]')) AS DOUBLE)
         |    / greatest(length(text), 1) AS punct_ratio,
         |  CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |      x -> list_contains(${TextStats.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS DOUBLE)
         |    / greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS stopword_ratio,
         |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> length(x))) AS DOUBLE)
         |    / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS mean_word_len,
         |  CAST((CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 3 ELSE 0 END)
         |    + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:''"()\\[\\]{}_-]')) AS DOUBLE) / greatest(length(text), 1) < 0.3 THEN 2 ELSE 0 END)
         |    + (CASE WHEN CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |          x -> list_contains(${TextStats.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS DOUBLE)
         |          / greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) > 0.05 THEN 3 ELSE 0 END)
         |    + (CASE WHEN CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> length(x))) AS DOUBLE)
         |          / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 2 ELSE 0 END) AS DOUBLE) / 10 AS quality_score,
         |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
         |FROM documents""".stripMargin,

    "q18_text_langid" -> LangIdOracle,

    "q19_sessionize" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
         |  FROM e),
         |y AS (
         |  SELECT user_id, event_id, us,
         |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
         |  FROM x),
         |z AS (
         |  SELECT user_id,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM y)
         |SELECT user_id,
         |  CAST(max(sess_id) AS BIGINT) AS n_sessions,
         |  CAST(count(*) AS BIGINT) AS n_events
         |FROM z
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q20_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q21_rollup" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    // Mirrors Multimodal.fakeDecode's arithmetic over the utf-8 payload
    // (documents are ascii: char ops == byte ops).
    "q24_multimodal_decode" ->
      """SELECT doc_id AS asset_id, 'image' AS kind,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(16 + (strlen(text) % 240) AS INT) AS width,
        |  CAST(16 + ((ascii(substr(text, 1, 1)) * 7 + ascii(substr(text, length(text), 1))) % 240) AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  CAST((CAST(16 + (strlen(text) % 240) AS BIGINT)
        |        * (16 + ((ascii(substr(text, 1, 1)) * 7 + ascii(substr(text, length(text), 1))) % 240))) % 251 AS DOUBLE)
        |    / CAST(250 AS DOUBLE) AS mean_luma
        |FROM documents""".stripMargin,

    "q25_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |  CAST(i AS INT) AS frame_index,
        |  CAST(i * 1000 AS BIGINT) AS frame_offset_ms,
        |  CAST(strlen(text) AS BIGINT) * 1315423911 + i * 1000 AS frame_hash
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, strlen(text) % 10)) AS i
        |      FROM documents)""".stripMargin,

    // The salted join must be indistinguishable from the plain join.
    "q27_skew_salted_join" ->
      """SELECT s_name,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q29_setops" ->
      """SELECT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice < 50000
        |) EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice < 50000 AND o_custkey % 100 = 0
        |ORDER BY custkey""".stripMargin,

    // Pivot: absent (user, type) combinations yield NULL (count over an
    // empty filtered set via sum-of-cases mirrors Spark pivot-count).
    "q30_pivot" ->
      s"""WITH e AS ($EventsCte)
         |SELECT user_id,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
         |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
         |FROM e
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q31_compact_shape" -> ParsedOracle,

    "q33_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_quantity, 0.99) AS p99_qty
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q34_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q36_fuzzy_match" ->
      """SELECT doc_id,
        |  CAST(levenshtein(substr(text, 1, 30), 'the quick brown fox jumps over') AS BIGINT) AS dist_prose,
        |  CAST(levenshtein(substr(text, 1, 30), 'spark query engine data stream') AS BIGINT) AS dist_tech,
        |  CASE WHEN levenshtein(substr(text, 1, 30), 'the quick brown fox jumps over')
        |         <= levenshtein(substr(text, 1, 30), 'spark query engine data stream')
        |       THEN 'prose' ELSE 'tech' END AS nearest
        |FROM documents""".stripMargin,

    "q35_curate" ->
      s"""WITH q AS (
         |  SELECT doc_id, text, lang, source FROM documents
         |  WHERE ${qualityScoreSql("text")} >= 0.8),
         |e AS (
         |  SELECT * FROM q
         |  WHERE doc_id IN (SELECT min(doc_id) FROM q GROUP BY text)),
         |all_docs AS (SELECT doc_id, text FROM e),
         |$ShingleCte,
         |dropset AS (
         |  SELECT DISTINCT b.doc_id AS did
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8)
         |SELECT doc_id, lang, source FROM e
         |WHERE doc_id NOT IN (SELECT did FROM dropset)
         |ORDER BY doc_id""".stripMargin,

    "q32_json_props" ->
      """SELECT (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) AS k_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q26_stream_daily_counts" ->
      s"""WITH e AS ($EventsCte),
         |p AS (
         |  SELECT CAST(date_trunc('second', ts) AS TIMESTAMP) AS request_time,
         |    CASE WHEN value > 50 THEN 'REST.GET.OBJECT' ELSE 'REST.PUT.OBJECT' END AS operation,
         |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE CAST(round(value * 100) AS BIGINT) END AS bytes_sent
         |  FROM e WHERE event_id % 101 <> 0)
         |SELECT CAST(date_trunc('day', request_time) AS TIMESTAMP) AS day_start,
         |  operation,
         |  CAST(count(*) AS BIGINT) AS n_requests,
         |  CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
         |FROM p
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q40_asof_join" ->
      s"""WITH e AS ($EventsCte),
         |b AS (SELECT user_id, ts, event_id, value FROM e WHERE event_type = 'purchase')
         |SELECT a.event_id,
         |  b.event_id AS prior_purchase_id,
         |  epoch_us(a.ts) - epoch_us(b.ts) AS micros_since_purchase,
         |  b.value AS prior_purchase_value
         |FROM e a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
         |ORDER BY a.event_id""".stripMargin,

    "q41_range_join" ->
      """WITH promos AS (
        |  SELECT o_orderkey AS promo_id, o_orderdate AS start_ts,
        |         o_orderdate + INTERVAL 7 DAY AS end_ts
        |  FROM orders WHERE o_orderkey % 500 = 0)
        |SELECT promo_id,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM lineitem JOIN promos
        |  ON l_shipdate >= start_ts AND l_shipdate < end_ts
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q42_grouping_sets" ->
      """SELECT r_name, c_mktsegment,
        |  CAST(grouping(r_name) AS INT) AS g_region,
        |  CAST(grouping(c_mktsegment) AS INT) AS g_segment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, c_mktsegment), (r_name), (c_mktsegment), ())
        |ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin,

    "q43_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
        |  array_to_string((list(o_orderkey ORDER BY o_orderkey))[1:3], ',') AS first3,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS top_order
        |FROM orders
        |WHERE o_custkey < 200
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q44_unpivot" ->
      """SELECT l_returnflag, metric, val FROM (
        |  UNPIVOT (
        |    SELECT l_returnflag,
        |      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
        |    FROM lineitem GROUP BY 1)
        |  ON sum_qty, sum_price, sum_disc INTO NAME metric VALUE val)
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q45_sample_hash" ->
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
        |ORDER BY doc_id""".stripMargin,

    "q46_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price
        |FROM orders
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q47_tfidf_topterms" ->
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 100),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM d),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM d)
        |SELECT doc_id, term, tf, df,
        |  tf * (n_docs / df) AS score,
        |  CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tf * (n_docs / df) DESC, term) AS INT) AS rank
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q48_sliding_window" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT unnest([
         |      make_timestamp((epoch_us(ts) // 43200000000) * 43200000000),
         |      make_timestamp(((epoch_us(ts) // 43200000000) - 1) * 43200000000)]) AS w_start,
         |    event_type, value
         |  FROM e)
         |SELECT w_start, event_type,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM x
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    "q49_dedup_components" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |e AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
         |SELECT x AS doc_id, min(y) AS component
         |FROM r
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q50_audio_features" ->
      """SELECT doc_id AS asset_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(strlen(text) // 2 AS BIGINT) AS n_samples,
        |  CAST((strlen(text) // 2) // 16 AS BIGINT) AS duration_ms,
        |  CAST((ascii(substr(text, 1, 1)) * 31 + ascii(substr(text, length(text), 1))) % 1000 AS DOUBLE) / 1000.0 AS rms
        |FROM documents""".stripMargin,

    // Mirrors fakeDecode's dims then the resize math: scale = min of the
    // two box ratios, floor, clamp to >= 1.
    "q51_image_resize" ->
      """WITH f AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(16 + (strlen(text) % 240) AS INT) AS width,
        |    CAST(16 + ((ascii(substr(text, 1, 1)) * 7 + ascii(substr(text, length(text), 1))) % 240) AS INT) AS height
        |  FROM documents),
        |r AS (
        |  SELECT asset_id, width, height,
        |    least(224.0 / width, 224.0 / height) AS scale
        |  FROM f)
        |SELECT asset_id, width, height,
        |  greatest(1, CAST(floor(width * scale) AS INT)) AS out_width,
        |  greatest(1, CAST(floor(height * scale) AS INT)) AS out_height,
        |  CAST(greatest(1, CAST(floor(width * scale) AS INT)) AS BIGINT)
        |    * greatest(1, CAST(floor(height * scale) AS INT)) * 3 AS out_bytes
        |FROM r""".stripMargin,

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

    // exact algorithm on both sides: same pair set by construction (the
    // size-band blocking has zero false negatives, so no LSH-recall caveat)
    "q59_dedup_ngram_jaccard" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' zzz end' FROM documents WHERE doc_id % 11 = 0),
         |$ShingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8""".stripMargin,

    // mirrors TextStats.fingerprint = md5 ∘ Dedup.canonicalize
    "q60_fingerprint" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 30000, '  ' || regexp_replace(text, ' ', '  ', 'g')
        |  FROM documents WHERE doc_id % 13 = 0),
        |fps AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM all_docs)
        |SELECT doc_id, fp,
        |  CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_same
        |FROM fps
        |ORDER BY doc_id""".stripMargin,

    "q61_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    // aggregate over the expected parsed table (parse ∘ format = identity;
    // the DSv2 source must agree with the same oracle as q10's parser)
    // NOTE: ParsedOracle is concatenated, not interpolated inside a
    // stripMargin block — its `||` continuation lines would be eaten by a
    // second stripMargin pass.
    "q62_accesslog_source" ->
      (s"WITH parsed AS ($ParsedOracle)\n" +
        """SELECT operation,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(sum(bytes_sent) AS BIGINT) AS total_bytes,
          |  CAST(count(DISTINCT requester) AS BIGINT) AS n_requesters,
          |  max(request_time) AS max_time,
          |  CAST(count(error_line) AS BIGINT) AS n_corrupt
          |FROM parsed
          |GROUP BY operation
          |ORDER BY operation NULLS FIRST""".stripMargin),

    // morton interleave written as shift/mask arithmetic (4 bits/dim,
    // dim 0 = user_id at even bit positions, dim 1 = value at odd)
    "q63_zorder_cells" ->
      """WITH b AS (
        |  SELECT event_id, user_id, value,
        |    ntile(16) OVER (ORDER BY user_id, event_id) - 1 AS bu,
        |    ntile(16) OVER (ORDER BY value, event_id) - 1 AS bv
        |  FROM events),
        |z AS (
        |  SELECT user_id, value, CAST(
        |      ((bu & 1) * 1) + (((bu >> 1) & 1) * 4)
        |    + (((bu >> 2) & 1) * 16) + (((bu >> 3) & 1) * 64)
        |    + ((bv & 1) * 2) + (((bv >> 1) & 1) * 8)
        |    + (((bv >> 2) & 1) * 32) + (((bv >> 3) & 1) * 128) AS BIGINT) AS zval
        |  FROM b)
        |SELECT zval, CAST(count(*) AS BIGINT) AS n,
        |  min(user_id) AS min_u, max(user_id) AS max_u,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM z
        |GROUP BY zval
        |ORDER BY zval""".stripMargin,

    // decimal-exact power sums → identical IEEE double arithmetic (same
    // expression tree as the Spark side; see the q64 query comment)
    "q64_stat_moments" ->
      """WITH sums AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sxd,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS syd,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxxd,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syyd,
        |    sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxyd
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DOUBLE) AS nd,
        |    CAST(sxd AS DOUBLE) AS sx, CAST(syd AS DOUBLE) AS sy,
        |    CAST(sxxd AS DOUBLE) AS sxx, CAST(syyd AS DOUBLE) AS syy,
        |    CAST(sxyd AS DOUBLE) AS sxy
        |  FROM sums),
        |m AS (
        |  SELECT l_returnflag, n, nd, sx, sy,
        |    sxx - sx * sx / nd AS mxx,
        |    syy - sy * sy / nd AS myy,
        |    sxy - sx * sy / nd AS mxy
        |  FROM d)
        |SELECT l_returnflag, n,
        |  sqrt(mxx / (nd - 1)) AS sd_qty,
        |  myy / (nd - 1) AS var_price,
        |  mxy / (sqrt(mxx) * sqrt(myy)) AS corr_qty_price,
        |  mxy / (nd - 1) AS cov_qty_price,
        |  mxy / mxx AS slope,
        |  (sy - (mxy / mxx) * sx) / nd AS intercept
        |FROM m
        |ORDER BY l_returnflag""".stripMargin,

    "q65_window_analytics" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        |  lag(o_orderdate, 1) OVER w AS prev_date,
        |  lead(o_orderdate, 1) OVER w AS next_date,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS latest_key,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WHERE o_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q66_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM src""".stripMargin
      s"""WITH src AS (
         |  SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status, o_orderpriority
         |  FROM orders)
         |${one("o_orderkey")}
         |UNION ALL
         |${one("status")}
         |UNION ALL
         |${one("o_orderpriority")}
         |ORDER BY col_name""".stripMargin
    },

    "q67_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 13 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        |  FROM base WHERE o_orderkey % 17 = 0)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM upd
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice FROM base
        |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |ORDER BY o_orderkey""".stripMargin,

    // same association order as bm25PerTerm: every op is one
    // correctly-rounded IEEE step, so scores are bit-identical
    "q68_bm25" ->
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
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |    * ((tf * CAST(2.2 AS DOUBLE))
        |      / (tf + CAST(1.2 AS DOUBLE)
        |        * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl)))) AS score
        |FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        |ORDER BY doc_id, term""".stripMargin,

    "q69_pii_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact u' || doc_id || '@ex.org from 10.77.'
        |      || (doc_id % 256) || '.3 ref 123456789' || doc_id AS text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS after_ip
        |  FROM p)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(after_ip, '\d{9,}')) AS BIGINT) AS n_num,
        |  md5(regexp_replace(after_ip, '\d{9,}', '<NUM>', 'g')) AS redacted_md5
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    "q70_dedup_survivors" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |e AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a),
         |comp AS (SELECT x AS doc_id, min(y) AS component FROM r GROUP BY 1),
         |j AS (
         |  SELECT c.component, c.doc_id, CAST(length(d.text) AS BIGINT) AS len
         |  FROM comp c JOIN all_docs d USING (doc_id))
         |SELECT component, doc_id AS survivor_id, n_members, max_len FROM (
         |  SELECT component, doc_id, len,
         |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members,
         |    max(len) OVER (PARTITION BY component) AS max_len,
         |    row_number() OVER (PARTITION BY component ORDER BY len DESC, doc_id) AS rn
         |  FROM j) WHERE rn = 1
         |ORDER BY component""".stripMargin,

    "q71_funnel" ->
      s"""WITH ev AS ($EventsCte),
         |s1 AS (SELECT user_id, min(ts) AS t_1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t_2 FROM ev e JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.ts > s1.t_1 GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts) AS t_3 FROM ev e JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_2 GROUP BY 1)
         |SELECT s1.user_id, t_1, t_2, t_3,
         |  CAST(1 + (CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END)
         |         + (CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY 1""".stripMargin,

    // thresholds: round(rate * 65536) as 4-hex-digit strings — en 0.1 →
    // 199a, zh 0.5 → 8000, default 0.25 → 4000 (Sampling.hexThreshold)
    "q72_stratified_sample" ->
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE WHEN lang = 'en' THEN '199a'
        |       WHEN lang = 'zh' THEN '8000'
        |       ELSE '4000' END
        |ORDER BY doc_id""".stripMargin,

    "q73_skew_audit" ->
      """WITH k AS (SELECT least(o_custkey, 50) AS key FROM orders),
        |c AS (SELECT key, CAST(count(*) AS BIGINT) AS n_rows FROM k GROUP BY 1),
        |s AS (SELECT CAST(sum(n_rows) AS DOUBLE) / count(*) AS mean_rows FROM c)
        |SELECT key, n_rows, mean_rows,
        |  CAST(n_rows AS DOUBLE) / mean_rows AS ratio,
        |  TRUE AS is_hot
        |FROM c CROSS JOIN s
        |WHERE CAST(n_rows AS DOUBLE) / mean_rows >= 2.0
        |ORDER BY key""".stripMargin,

    "q74_cooccurrence" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
        |dt AS (
        |  SELECT DISTINCT doc_id, term FROM (
        |    SELECT doc_id,
        |      unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |    FROM d)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d),
        |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n_t FROM dt GROUP BY 1),
        |p AS (
        |  SELECT a.term AS term_a, b.term AS term_b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2 HAVING count(*) >= 25)
        |SELECT term_a, term_b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
        |  CAST(n_ab * n_docs AS DOUBLE) / CAST(ta.n_t * tb.n_t AS DOUBLE) AS lift
        |FROM p
        |JOIN tf ta ON p.term_a = ta.term
        |JOIN tf tb ON p.term_b = tb.term
        |CROSS JOIN nd
        |ORDER BY term_a, term_b""".stripMargin,

    // q64's decimal power-sum idiom: value is 2-decimal money-like, so the
    // DECIMAL(18,2) cast and the decimal products/sums are EXACT; the
    // mean/sd derivation mirrors zscoreOutliers' association order step
    // for step, making the flagged row set engine-identical.
    "q75_zscore_outliers" ->
      s"""WITH ev AS ($EventsCte),
         |m AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(value AS DECIMAL(18,2))) AS sxd,
         |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS sxxd
         |  FROM ev GROUP BY 1),
         |s AS (
         |  SELECT event_type,
         |    CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    sqrt((CAST(sxxd AS DOUBLE)
         |        - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE) / CAST(n AS DOUBLE))
         |      / (CAST(n AS DOUBLE) - 1)) AS sd
         |  FROM m)
         |SELECT event_id, e.event_type, value, (value - mean) / sd AS z
         |FROM ev e JOIN s ON e.event_type = s.event_type
         |WHERE NOT isnan(sd) AND sd > 0 AND abs((value - mean) / sd) > 2.5
         |ORDER BY event_id""".stripMargin,

    "q76_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
        |SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank,
        |  CAST(sum(n) OVER (ORDER BY n DESC, term) AS DOUBLE)
        |    / CAST(n_total AS DOUBLE) AS cum_share
        |FROM c CROSS JOIN t
        |QUALIFY rank <= 200
        |ORDER BY rank""".stripMargin,

    "q77_quantile_bins" ->
      """WITH b AS (
        |  SELECT o_totalprice,
        |    ntile(20) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
        |  FROM orders)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM b GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // brute-force exact oracle — the engine's asymmetric prefix filter is
    // lossless, so the pair sets must match exactly
    "q79_containment" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 30000,
         |    array_to_string(list_slice(string_split(text, ' '), 1,
         |      greatest(CAST(floor(len(string_split(text, ' ')) * 0.6) AS INT), 3)),
         |      ' ') AS text
         |  FROM documents WHERE doc_id % 9 = 0),
         |$ShingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS containment
         |FROM sh a JOIN sh b ON a.doc_id != b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    "q78_full_outer" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, c_name FROM customer WHERE c_custkey % 3 = 0),
        |o AS (
        |  SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders WHERE o_custkey % 2 = 0 GROUP BY 1)
        |SELECT k, c_name, n_orders,
        |  CASE WHEN c_name IS NULL THEN 'orders_only'
        |       WHEN n_orders IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS side
        |FROM c FULL JOIN o USING (k)
        |ORDER BY k""".stripMargin,

    // cumulative-after-batch-b = profile over doc_id % 3 <= b: the batch
    // replay's fold is associative/commutative, so the cumulative state at
    // batch b equals a fresh profile of the union of batches 0..b
    "q81_stream_profile" -> {
      def one(c: String) =
        s"""SELECT b.batch_id, '$c' AS col_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM b JOIN documents d ON d.doc_id % 3 <= b.batch_id
           |GROUP BY b.batch_id""".stripMargin
      s"""WITH b AS (
         |  SELECT CAST(unnest(generate_series(0, 2)) AS BIGINT) AS batch_id)
         |${one("doc_id")}
         |UNION ALL
         |${one("lang")}
         |UNION ALL
         |${one("n_chars")}
         |ORDER BY batch_id, col_name""".stripMargin
    },

    // identical recurrence to q71 — the streaming fold must reproduce the
    // batch funnel bit-for-bit on a single batch
    "q84_stream_funnel" ->
      s"""WITH ev AS ($EventsCte),
         |s1 AS (SELECT user_id, min(ts) AS t_1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t_2 FROM ev e JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.ts > s1.t_1 GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts) AS t_3 FROM ev e JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_2 GROUP BY 1)
         |SELECT s1.user_id, t_1, t_2, t_3,
         |  CAST(1 + (CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END)
         |         + (CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY 1""".stripMargin,

    // the exact stripHtml pass chain, RE2 flavor (global 'g' flag; inline
    // (?is); no backreferences anywhere — by design of stripHtml)
    "q85_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>T</title><style type="text/css">p { color: red; }</style></head><body><h1>Doc '
        |    || CAST(doc_id AS VARCHAR) || '</h1> <p>' || text
        |    || '</p><!-- trailing comment --><script>var x = "<p>not text</p>";</script><div>tail &amp;amp; &lt;b&gt;bold&lt;/b&gt;&nbsp;end</div></body></html>'
        |    AS html
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |            '(?s)<!--.*?-->', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, md5(clean) AS clean_md5,
        |  CAST(length(clean) AS BIGINT) AS n_chars
        |FROM stripped
        |ORDER BY doc_id""".stripMargin,

    "q82_decontaminate" -> {
      // distinct word-3-gram postings of a (doc_id, text) source — the
      // ShingleCte formula, parameterized by source and output id name
      def grams(src: String, outId: String) =
        s"""SELECT doc_id AS $outId, unnest(s) AS gram FROM (
           |    SELECT doc_id, list_distinct(list_transform(
           |      generate_series(1, greatest(len(t) - 2, 1)),
           |      i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
           |    FROM (SELECT doc_id,
           |            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
           |          FROM $src))""".stripMargin
      s"""WITH bench AS (
         |  SELECT doc_id + 50000 AS doc_id,
         |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS text
         |  FROM documents WHERE doc_id % 11 = 0),
         |cg AS (${grams("documents", "corpus_id")}),
         |tg AS (${grams("bench", "test_id")})
         |SELECT cg.corpus_id AS doc_id,
         |  CAST(count(DISTINCT cg.gram) AS BIGINT) AS n_shared_grams,
         |  CAST(count(DISTINCT tg.test_id) AS BIGINT) AS n_test_docs
         |FROM cg JOIN tg ON tg.gram = cg.gram
         |GROUP BY 1 HAVING count(DISTINCT cg.gram) >= 2
         |ORDER BY 1""".stripMargin
    },

    "q83_text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |    len(list_distinct(list_transform(
        |      generate_series(1, greatest(len(toks) - 1, 1)),
        |      i -> array_to_string(list_slice(toks, i, i + 1), ' ')))) AS d2,
        |    len(list_distinct(list_transform(
        |      generate_series(1, greatest(len(toks) - 2, 1)),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS d3
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(1 AS DOUBLE) - CAST(d2 AS DOUBLE) / CAST(greatest(len(toks) - 1, 1) AS DOUBLE)
        |  ELSE 0.0 END AS dup_2gram_frac,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(1 AS DOUBLE) - CAST(d3 AS DOUBLE) / CAST(greatest(len(toks) - 2, 1) AS DOUBLE)
        |  ELSE 0.0 END AS dup_3gram_frac,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_max(list_transform(list_distinct(toks),
        |      u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE)
        |  ELSE 0.0 END AS top_token_share
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // replays the line synthesis, then every Gopher rule column; ratios
    // are one double division of integer counts (RE2 `\x{...}` for the
    // bullet/ellipsis codepoints)
    "q126_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, concat_ws(chr(10), text,
        |    CASE WHEN doc_id % 3 = 0 THEN chr(8226) || ' list item'
        |         ELSE 'The data have to be of use, and that is that, with care.' END,
        |    CASE WHEN doc_id % 5 = 0 THEN '#x #y #z' ELSE 'a plain tail line' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'to be continued...' ELSE 'a closing line.' END) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t <> '') AS w,
        |    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> t <> '') AS wl,
        |    string_split(text, chr(10)) AS ls
        |  FROM base),
        |x AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(w, t -> length(t))), 0) AS DOUBLE)
        |      / greatest(len(w), 1) AS mean_word_len,
        |    CAST(len(regexp_extract_all(text, '#'))
        |      + len(regexp_extract_all(text, '(\.\.\.|\x{2026})')) AS DOUBLE)
        |      / greatest(len(w), 1) AS symbol_ratio,
        |    CAST(len(list_filter(ls, l ->
        |        regexp_matches(l, '^\s*[\x{2022}\x{2023}\x{25B6}*-]'))) AS DOUBLE)
        |      / greatest(len(ls), 1) AS bullet_frac,
        |    CAST(len(list_filter(ls, l ->
        |        regexp_matches(l, '(\.\.\.|\x{2026})\s*$'))) AS DOUBLE)
        |      / greatest(len(ls), 1) AS ellipsis_frac,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
        |      / greatest(len(w), 1) AS alpha_frac,
        |    CAST((CASE WHEN list_contains(wl, 'the') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'be') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'to') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'of') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'and') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'that') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'have') THEN 1 ELSE 0 END)
        |      + (CASE WHEN list_contains(wl, 'with') THEN 1 ELSE 0 END) AS BIGINT)
        |      AS stop_hits
        |  FROM m)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |  ellipsis_frac, alpha_frac, stop_hits,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        |   AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
        |   AND stop_hits >= 2) AS gopher_pass
        |FROM x
        |ORDER BY doc_id""".stripMargin,

    // replays the line synthesis, the kept-line predicate (terminal
    // punctuation + >=5 words + no "javascript"), and the document gate
    "q127_c4_clean" ->
      """WITH base AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    'This is a good line with enough words here.',
        |    array_to_string(list_slice(string_split(text, ' '), 1, 3), ' '),
        |    array_to_string(list_slice(string_split(text, ' '), 4, 12), ' ') || '.',
        |    CASE WHEN doc_id % 4 = 0 THEN 'Click here to enable javascript now.'
        |         ELSE 'Another decent sentence appears right here.' END,
        |    CASE WHEN doc_id % 6 = 0 THEN 'function f() { return 1; }'
        |         ELSE 'The last line ends properly.' END) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |k AS (
        |  SELECT doc_id, text, string_split(text, chr(10)) AS ls,
        |    list_filter(string_split(text, chr(10)), l ->
        |      regexp_matches(l, '[.!?"'']\s*$')
        |      AND len(list_filter(regexp_split_to_array(trim(l), '\s+'),
        |            t -> t <> '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM base)
        |SELECT doc_id,
        |  array_to_string(kept, chr(10)) AS clean_text,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
        |   AND NOT contains(text, '{')) AS keep_doc
        |FROM k
        |ORDER BY doc_id""".stripMargin,

    // replays the synthesis, counts distinct docs per normalized line,
    // and drops EVERY occurrence of lines in >= 3 docs (q110's explode/
    // reassemble idiom with a frequency filter instead of keep-first)
    "q128_boilerplate_strip" ->
      """WITH base AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |    CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter!'
        |         ELSE 'unique middle ' || CAST(doc_id AS VARCHAR) END,
        |    array_to_string(list_slice(string_split(text, ' '), 9, 16), ' '),
        |    CASE WHEN doc_id % 5 = 0 THEN 'Copyright 2026 Example Corp'
        |         ELSE 'All rights reserved to no one.' END) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp AS (SELECT doc_id, string_split(text, chr(10)) AS t FROM base),
        |p AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u
        |        FROM sp)),
        |f AS (
        |  SELECT norm FROM p WHERE norm <> ''
        |  GROUP BY norm HAVING count(DISTINCT doc_id) >= 3)
        |SELECT p.doc_id,
        |  string_agg(p.para, chr(10) ORDER BY p.idx) AS clean_text,
        |  CAST(len(any_value(sp.t)) AS BIGINT) AS n_paras,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM p JOIN sp ON p.doc_id = sp.doc_id
        |WHERE p.norm NOT IN (SELECT norm FROM f)
        |GROUP BY p.doc_id
        |ORDER BY p.doc_id""".stripMargin,

    // rebuilds the per-codepoint histogram and the floored-term sum
    // S = sum(c * floor(ln(c)*1e9)) — order-independent by construction —
    // then the same two floored derivations as the expression's callers
    "q129_char_entropy" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |      THEN text || ' h' || chr(233) || 'llo w' || chr(246) || 'rld ' || chr(8230)
        |      ELSE text END AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |ch AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
        |    i -> substr(text, i, 1))) AS c
        |  FROM base),
        |cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        |s AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN n < 2 THEN 0
        |        ELSE n * CAST(floor(ln(n) * 1e9) AS BIGINT) END) AS ln_sum,
        |    CAST(sum(n) AS BIGINT) AS n_chars
        |  FROM cnt GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(coalesce(s.n_chars, 0) AS BIGINT) AS n_chars,
        |  CAST(coalesce(s.ln_sum, 0) AS BIGINT) AS ln_sum_e9,
        |  CAST(floor(ln(greatest(coalesce(s.n_chars, 0), 1)) * 1e9) AS BIGINT)
        |    - CAST(floor(CAST(coalesce(s.ln_sum, 0) AS DOUBLE)
        |        / greatest(coalesce(s.n_chars, 0), 1)) AS BIGINT) AS entropy_e9
        |FROM base b LEFT JOIN s ON b.doc_id = s.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // replays the url synthesis + registrable-domain keying (q122's
    // rules: IPv4 and 2-label hosts pass through, co.uk-style second
    // levels take 3 labels), the q17 quality score scaled to e6, and the
    // per-domain mean as floor(intSum / count)
    "q130_domain_quality" ->
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN 'www.example.com'
         |         WHEN doc_id % 5 = 1 THEN 'news.example.co.uk'
         |         WHEN doc_id % 5 = 2 THEN 'sub.blog.example.org'
         |         WHEN doc_id % 5 = 3 THEN '192.168.10.42'
         |         ELSE 'example.net' END AS host,
         |    CAST(floor((CAST(
         |      (CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 3 ELSE 0 END)
         |      + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:''"()\\[\\]{}_-]')) AS DOUBLE) / greatest(length(text), 1) < 0.3 THEN 2 ELSE 0 END)
         |      + (CASE WHEN CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |            x -> list_contains(${TextStats.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS DOUBLE)
         |            / greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) > 0.05 THEN 3 ELSE 0 END)
         |      + (CASE WHEN CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> length(x))) AS DOUBLE)
         |            / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 2 ELSE 0 END)
         |      AS DOUBLE) / 10) * 1e6) AS BIGINT) AS q_e6
         |  FROM documents WHERE doc_id IS NOT NULL),
         |keyed AS (
         |  SELECT doc_id, q_e6,
         |    CASE WHEN host = 'www.example.com' THEN 'example.com'
         |         WHEN host = 'news.example.co.uk' THEN 'example.co.uk'
         |         WHEN host = 'sub.blog.example.org' THEN 'example.org'
         |         ELSE host END AS reg_domain
         |  FROM scored),
         |st AS (
         |  SELECT reg_domain, CAST(count(*) AS BIGINT) AS domain_docs,
         |    CAST(floor(CAST(sum(q_e6) AS DOUBLE) / count(*)) AS BIGINT)
         |      AS domain_mean_scaled
         |  FROM keyed GROUP BY 1)
         |SELECT k.doc_id, k.reg_domain, st.domain_docs, st.domain_mean_scaled,
         |  (st.domain_mean_scaled >= 500000) AS keep_domain
         |FROM keyed k JOIN st USING (reg_domain)
         |ORDER BY k.doc_id""".stripMargin,

    // replays the 5 damped rounds as chained CTEs; contributions are
    // (rank * 85) // (100 * outdeg) — EXACT integer ops on both sides,
    // no float anywhere — summed as BIGINT (order-free). Every rank is
    // re-CAST to BIGINT per round: DuckDB's sum(BIGINT) yields HUGEINT,
    // which the comparator would otherwise materialize as float64 (the
    // r5 lesson — hashes diverge on type, not value)
    "q131_pagerank" -> {
      val rounds = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        s"""r$k AS (
           |  SELECT n.id, CAST(p.base + coalesce(sum(
           |      (r.rank * 85) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN p
           |  LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prev r ON r.id = e.src
           |  LEFT JOIN od d ON d.src = e.src
           |  GROUP BY n.id, p.base)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 101 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 101, (doc_id * 5 + 2) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |p AS (SELECT CAST(150000000000 // count(*) AS BIGINT) AS base,
         |             CAST(1000000000000 // count(*) AS BIGINT) AS init
         |      FROM nodes),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id, (SELECT init FROM p) AS rank FROM nodes),
         |$rounds
         |SELECT id, CAST(rank AS BIGINT) AS rank_e12 FROM r5 ORDER BY id""".stripMargin
    },

    // q131's replay plus one dangling-share CTE per round: the sink mass
    // D (ranks of nodes with no out-edges, an anti-join sum) is floored
    // into a uniform share (D*85)//(100*N) and added to every node —
    // exactly LinkGraph.pageRank(redistributeDangling = true)'s driver
    // scalar. All sums re-CAST to BIGINT (DuckDB HUGEINT promotion).
    "q132_pagerank_dangling" -> {
      val rounds = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        s"""s$k AS (
           |  SELECT CAST((CAST(coalesce(sum(r.rank), 0) AS BIGINT) * 85)
           |      // (100 * (SELECT n FROM p)) AS BIGINT) AS share
           |  FROM $prev r LEFT JOIN od d ON d.src = r.id
           |  WHERE d.src IS NULL),
           |r$k AS (
           |  SELECT n.id, CAST(p.base + s.share + coalesce(sum(
           |      (r.rank * 85) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN p CROSS JOIN s$k s
           |  LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prev r ON r.id = e.src
           |  LEFT JOIN od d ON d.src = e.src
           |  GROUP BY n.id, p.base, s.share)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 89 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 89, (doc_id * 7 + 5) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(150000000000 // count(*) AS BIGINT) AS base,
         |             CAST(1000000000000 // count(*) AS BIGINT) AS init
         |      FROM nodes),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id, (SELECT init FROM p) AS rank FROM nodes),
         |$rounds
         |SELECT id, CAST(rank AS BIGINT) AS rank_e12 FROM r5 ORDER BY id""".stripMargin
    },

    "q133_personalized_pagerank" -> {
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 89 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 89, (doc_id * 7 + 5) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |ids AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |w AS (SELECT id, ((id * id + 3) % 11) * 100000 AS w FROM ids),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
         |nodes AS (SELECT id,
         |  CAST((w * 1000000) // (SELECT tw FROM tot) AS BIGINT) AS wn FROM w),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id,
         |  CAST((1000000000000 * wn) // 1000000 AS BIGINT) AS rank FROM nodes),
         |${personalizedRoundsSql(4)}
         |SELECT id, CAST(rank AS BIGINT) AS rank_e12 FROM r4 ORDER BY id""".stripMargin
    },

    // chains the q130 domain-quality aggregate (identical SQL shape, so
    // the stage oracles compose — the q95 pattern) into the q133 round
    // CTEs: the prior is each domain's mean quality, the graph links
    // domain k → (7k+3) mod 37.
    "q134_crawl_prior" -> {
      s"""WITH scored AS (
         |  SELECT doc_id, doc_id % 37 AS domain_id,
         |    'site' || CAST(doc_id % 37 AS VARCHAR) || '.com' AS reg_domain,
         |    CAST(floor(${qualityScoreSql("text")} * 1e6) AS BIGINT) AS q_e6
         |  FROM documents WHERE doc_id IS NOT NULL),
         |st AS (
         |  SELECT domain_id, reg_domain,
         |    CAST(floor(CAST(sum(q_e6) AS DOUBLE) / count(*)) AS BIGINT) AS dms
         |  FROM scored GROUP BY 1, 2),
         |e AS (
         |  SELECT DISTINCT doc_id % 37 AS src, (doc_id * 7 + 3) % 37 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL),
         |ids AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |w AS (SELECT i.id, greatest(coalesce(st.dms, 0), 0) AS w
         |      FROM ids i LEFT JOIN st ON st.domain_id = i.id),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
         |nodes AS (SELECT id,
         |  CAST((w * 1000000) // (SELECT tw FROM tot) AS BIGINT) AS wn FROM w),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id,
         |  CAST((1000000000000 * wn) // 1000000 AS BIGINT) AS rank FROM nodes),
         |${personalizedRoundsSql(4)}
         |SELECT r.id AS domain_id, st.reg_domain, st.dms AS quality_e6,
         |  CAST(r.rank AS BIGINT) AS rank_e12
         |FROM r4 r JOIN st ON st.domain_id = r.id
         |ORDER BY domain_id""".stripMargin
    },

    // replays the two-batch cumulative strip: batch 0 strips on its own
    // distinct-doc counts (>= 3), batch 1 on batch-1 counts PLUS batch
    // 0's (the frequency store), all occurrences dropped per batch
    "q135_stream_boilerplate" ->
      """WITH base AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |    CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter!'
        |         ELSE 'unique middle ' || CAST(doc_id AS VARCHAR) END,
        |    CASE WHEN doc_id < 4 THEN 'Rare promo banner'
        |         ELSE 'All rights reserved to no one.' END) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp0 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM base WHERE doc_id % 3 <> 0),
        |p0 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp0)),
        |c0 AS (SELECT norm, count(DISTINCT doc_id) AS n
        |       FROM p0 WHERE norm <> '' GROUP BY 1),
        |out0 AS (
        |  SELECT CAST(0 AS BIGINT) AS batch_id, p0.doc_id,
        |    string_agg(p0.para, chr(10) ORDER BY p0.idx) AS clean_text,
        |    CAST(len(any_value(sp0.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM p0 JOIN sp0 ON p0.doc_id = sp0.doc_id
        |  WHERE p0.norm NOT IN (SELECT norm FROM c0 WHERE n >= 3)
        |  GROUP BY p0.doc_id),
        |sp1 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM base WHERE doc_id % 3 = 0),
        |p1 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp1)),
        |c1 AS (SELECT norm, count(DISTINCT doc_id) AS n
        |       FROM p1 WHERE norm <> '' GROUP BY 1),
        |f1 AS (SELECT c1.norm FROM c1 LEFT JOIN c0 ON c0.norm = c1.norm
        |       WHERE c1.n + coalesce(c0.n, 0) >= 3),
        |out1 AS (
        |  SELECT CAST(1 AS BIGINT) AS batch_id, p1.doc_id,
        |    string_agg(p1.para, chr(10) ORDER BY p1.idx) AS clean_text,
        |    CAST(len(any_value(sp1.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM p1 JOIN sp1 ON p1.doc_id = sp1.doc_id
        |  WHERE p1.norm NOT IN (SELECT norm FROM f1)
        |  GROUP BY p1.doc_id)
        |SELECT * FROM out0 UNION ALL SELECT * FROM out1
        |ORDER BY batch_id, doc_id""".stripMargin,

    // per-frame Σs² over the q94 sample family, grouped by i // 100
    "q146_audio_frames" ->
      """SELECT d.doc_id, CAST(u.i // 100 AS INT) AS frame_idx,
        |  CAST(count(*) AS INT) AS n_in_frame,
        |  CAST(sum(((d.doc_id * 31 + u.i) % 65536 - 32768)
        |         * ((d.doc_id * 31 + u.i) % 65536 - 32768)) AS BIGINT) AS sum_sq,
        |  sqrt(CAST(sum(((d.doc_id * 31 + u.i) % 65536 - 32768)
        |              * ((d.doc_id * 31 + u.i) % 65536 - 32768)) AS DOUBLE)
        |       / count(*)) / 32768.0 AS rms
        |FROM documents d, unnest(generate_series(0, 255)) AS u(i)
        |GROUP BY d.doc_id, u.i // 100
        |ORDER BY d.doc_id, frame_idx""".stripMargin,

    // chains the stage oracles: q143's canonicalization replay picks the
    // min-id survivor, q139's reg-domain CASE + substring count audits,
    // q130's quality aggregate rolls up the remainder
    "q144_crawl_curation" -> {
      s"""WITH u AS (
        |  SELECT doc_id, text,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
        |    (CASE doc_id % 5 WHEN 0 THEN 'WWW.Example.COM'
        |      WHEN 1 THEN 'ads.tracker-hub.net' WHEN 2 THEN 'Sub.Blog.example.ORG'
        |      WHEN 3 THEN '192.168.10.42' ELSE 'example.net' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END) ||
        |    '/p/' || CAST(doc_id % 140 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 140 < 20 THEN '-casino' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x' ELSE '' END) AS url
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '') AS hostport,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '^[^#?]*\\?([^#]*)', 1) AS query
        |  FROM u),
        |q AS (
        |  SELECT doc_id, scheme,
        |    lower(regexp_replace(hostport, ':[0-9]*$$', '')) AS host,
        |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port, path,
        |    list_sort(list_filter(string_split(query, '&'),
        |      x -> NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid)(=|$$)') AND x <> '')) AS params
        |  FROM p),
        |c AS (
        |  SELECT doc_id,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |       OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) AS url_canon
        |  FROM q),
        |m AS (SELECT url_canon, min(doc_id) AS doc_id FROM c GROUP BY 1),
        |surv AS (SELECT u.doc_id, u.text, u.url FROM u JOIN m ON u.doc_id = m.doc_id),
        |kept AS (
        |  SELECT doc_id, text,
        |    CASE doc_id % 5 WHEN 0 THEN 'example.com' WHEN 1 THEN 'tracker-hub.net'
        |      WHEN 2 THEN 'example.org' WHEN 3 THEN '192.168.10.42'
        |      ELSE 'example.net' END AS reg_domain
        |  FROM surv
        |  WHERE (CASE doc_id % 5 WHEN 1 THEN 1 WHEN 3 THEN 1 ELSE 0 END) = 0
        |    AND len(regexp_extract_all(lower(url), 'casino')) = 0),
        |sc AS (
        |  SELECT doc_id, reg_domain,
        |    CAST(floor(${qualityScoreSql("text")} * 1e6) AS BIGINT) AS q_e6
        |  FROM kept),
        |st AS (
        |  SELECT reg_domain, CAST(count(*) AS BIGINT) AS domain_docs,
        |    CAST(floor(CAST(sum(q_e6) AS DOUBLE) / count(*)) AS BIGINT)
        |      AS domain_mean_scaled
        |  FROM sc GROUP BY 1)
        |SELECT sc.doc_id, sc.reg_domain, sc.q_e6, st.domain_docs,
        |  st.domain_mean_scaled,
        |  (st.domain_mean_scaled >= 500000) AS keep_domain
        |FROM sc JOIN st USING (reg_domain) ORDER BY sc.doc_id""".stripMargin
    },

    // recursive transitive closure over BOTH edge batches (q49's form):
    // the incremental fold must match the accumulated fixpoint
    "q147_dedup_components_incr" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id % 89 AS a, (doc_id * 3 + 1) % 89 AS b
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 2 = 0
        |  UNION ALL
        |  SELECT (doc_id * 5) % 141, (doc_id * 7 + 4) % 141
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 2 = 1),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM sym),
        |r(x, y) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
        |SELECT x AS id, min(y) AS component
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // one recursive closure over all three batch edge families — the
    // continuous fold must land on the same fixpoint
    "q148_stream_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id % 89 AS a, (doc_id * 3 + 1) % 89 AS b
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT (doc_id * 5) % 141, (doc_id * 7 + 4) % 141
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 = 1
        |  UNION ALL
        |  SELECT (doc_id * 11 + 7) % 200, (doc_id * 13 + 2) % 200
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 = 2),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM sym),
        |r(x, y) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
        |SELECT x AS id, min(y) AS component
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-group caps floor(sqrt(n)) replayed, md5-rank window (q91 form)
    "q141_temperature_mix" ->
      """WITH g AS (
        |  SELECT doc_id, doc_id % 23 AS grp
        |  FROM documents WHERE doc_id IS NOT NULL),
        |t AS (
        |  SELECT grp, greatest(1,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1.0 / 1.0) AS BIGINT))
        |    AS cap
        |  FROM g GROUP BY 1),
        |r AS (
        |  SELECT doc_id, grp, row_number() OVER (PARTITION BY grp
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM g)
        |SELECT r.doc_id, r.grp FROM r JOIN t USING (grp)
        |WHERE r.rk <= t.cap ORDER BY r.doc_id""".stripMargin,

    // q124's replay one order up: trigram windows + bigram transitions +
    // unigrams, interpolated in the identical double-arithmetic shape.
    // STAGED CTEs (j1/j2/sc, one-ON-join steps) rather than q124's flat
    // six-relation join: the flat form trips a DuckDB join-planner cliff
    // (minutes on 11k rows); the staged probabilities are the same IEEE
    // doubles, so values are unchanged
    "q142_trigram_logprob" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |tri AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |          i -> {'w1': t[i], 'w2': t[i + 1], 'w3': t[i + 2]})) AS u
        |        FROM d WHERE len(t) >= 3)),
        |bi AS (
        |  SELECT u.b1 AS b1, u.b2 AS b2
        |  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'b1': t[i], 'b2': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |toks AS (SELECT unnest(t) AS term FROM d),
        |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri GROUP BY 1, 2, 3),
        |ctx12 AS (SELECT w1, w2, count(*) AS ctx12 FROM tri GROUP BY 1, 2),
        |c23 AS (SELECT b1, b2, count(*) AS c23 FROM bi GROUP BY 1, 2),
        |c2b AS (SELECT b1, count(*) AS c2b FROM bi GROUP BY 1),
        |c3 AS (SELECT term, count(*) AS c3 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |u3 AS (SELECT term, CAST(c3 AS DOUBLE) / (SELECT n FROM tot) AS p3 FROM c3),
        |j1 AS (
        |  SELECT g.doc_id, g.w2, g.w3,
        |    CAST(c123.c123 AS DOUBLE) / CAST(ctx12.ctx12 AS DOUBLE) AS p1
        |  FROM tri g JOIN c123 USING (w1, w2, w3) JOIN ctx12 USING (w1, w2)),
        |j2 AS (
        |  SELECT j1.doc_id, j1.w3, j1.p1,
        |    CAST(c23.c23 AS DOUBLE) / CAST(c2b.c2b AS DOUBLE) AS p2
        |  FROM j1 JOIN c23 ON j1.w2 = c23.b1 AND j1.w3 = c23.b2
        |    JOIN c2b ON j1.w2 = c2b.b1),
        |sc AS (
        |  SELECT j2.doc_id,
        |    CAST(floor(ln(0.6 * j2.p1 + 0.3 * j2.p2 + 0.1 * u3.p3) * 1e12)
        |      AS BIGINT) AS lp
        |  FROM j2 JOIN u3 ON j2.w3 = u3.term)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1e6) AS BIGINT)
        |    AS score_e6
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // replays canonicalization with q122's regex pipeline, then keeps
    // the min-id member of each canonical group
    "q143_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.Example.COM' ELSE 'www.EXAMPLE.com' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END) ||
        |    '/page/' || CAST(doc_id % 50 AS VARCHAR) ||
        |    (CASE doc_id % 3 WHEN 0 THEN '?utm_source=x'
        |      WHEN 1 THEN '?gclid=1&utm_medium=y' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '#top' ELSE '' END) AS url
        |  FROM documents WHERE doc_id IS NOT NULL),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '') AS hostport,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS query
        |  FROM u),
        |q AS (
        |  SELECT doc_id, scheme,
        |    lower(regexp_replace(hostport, ':[0-9]*$', '')) AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port, path,
        |    list_sort(list_filter(string_split(query, '&'),
        |      x -> NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid)(=|$)') AND x <> '')) AS params
        |  FROM p),
        |c AS (
        |  SELECT doc_id,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |       OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) AS url_canon
        |  FROM q),
        |m AS (SELECT url_canon, min(doc_id) AS doc_id FROM c GROUP BY 1)
        |SELECT c.doc_id, c.url_canon FROM c JOIN m USING (url_canon, doc_id)
        |ORDER BY c.doc_id""".stripMargin,

    // per-script counts via regexp_extract_all over the same RE2 classes,
    // dominant via greatest + first-wins CASE, mixed flag exact-integer
    "q138_script_profile" -> {
      val ranges = TextStats.ScriptRanges
      val countCols = ranges.map { case (n, p) =>
        s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$n"
      }.mkString(",\n        |    ")
      val names = ranges.map { case (n, _) => s"n_$n" }
      val total = names.mkString(" + ")
      val cases = ranges.map { case (n, _) =>
        s"WHEN n_$n = mx THEN '$n'"
      }.mkString(" ")
      s"""WITH shaped AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 4 = 1 THEN 'привет мир как дела'
        |    WHEN doc_id % 4 = 2 THEN text || ' 你好世界 こんにちは'
        |    WHEN doc_id % 4 = 3 THEN 'مرحبا بالعالم ok'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id,
        |    $countCols,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM shaped),
        |t AS (
        |  SELECT *, CAST($total AS BIGINT) AS script_chars,
        |    greatest(${names.mkString(", ")}) AS mx
        |  FROM c)
        |SELECT doc_id, ${names.mkString(", ")}, n_chars, script_chars,
        |  CASE WHEN script_chars = 0 THEN 'none' $cases
        |       ELSE 'none' END AS dominant_script,
        |  ((script_chars - mx) * 10 >= script_chars
        |    AND script_chars > 0) AS is_mixed
        |FROM t ORDER BY doc_id""".stripMargin
    },

    // reg-domain mapping replayed per host CASE; substring hits as
    // non-overlapping regexp_extract_all counts over the lowercased url
    "q139_url_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN 'WWW.Example.COM'
        |          WHEN doc_id % 5 = 1 THEN 'ads.tracker-hub.net'
        |          WHEN doc_id % 5 = 2 THEN 'Sub.Blog.example.ORG'
        |          WHEN doc_id % 5 = 3 THEN '192.168.10.42'
        |          ELSE 'example.net' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '/ads/banner' || CAST(doc_id AS VARCHAR)
        |          ELSE '/Articles/' || CAST(doc_id AS VARCHAR) END) ||
        |    (CASE WHEN doc_id % 11 = 3 THEN '?ref=CASINO' ELSE '' END) AS url,
        |    CASE WHEN doc_id % 5 = 0 THEN 'example.com'
        |         WHEN doc_id % 5 = 1 THEN 'tracker-hub.net'
        |         WHEN doc_id % 5 = 2 THEN 'example.org'
        |         WHEN doc_id % 5 = 3 THEN '192.168.10.42'
        |         ELSE 'example.net' END AS reg_domain
        |  FROM documents WHERE doc_id IS NOT NULL),
        |f AS (
        |  SELECT doc_id, url, reg_domain,
        |    reg_domain IN ('tracker-hub.net', '192.168.10.42') AS domain_blocked,
        |    CAST(len(regexp_extract_all(lower(url), '/ads/'))
        |       + len(regexp_extract_all(lower(url), 'casino')) AS BIGINT)
        |      AS n_blocked_hits
        |  FROM u)
        |SELECT doc_id, url, reg_domain, domain_blocked, n_blocked_hits,
        |  (NOT domain_blocked AND n_blocked_hits = 0) AS keep_url
        |FROM f ORDER BY doc_id""".stripMargin,

    // G.711 expansion replayed per byte in exact integers: μ-law via the
    // complemented (mantissa·8+132)<<exp − 132 form, A-law via XOR 0x55
    // and the segment expansion; rms = sqrt(Σs²/n)/32768 as q94
    "q140_g711_decode" ->
      """WITH b AS (
        |  SELECT d.doc_id, (d.doc_id * 31 + u.i) % 256 AS byte
        |  FROM documents d, unnest(generate_series(0, 255)) AS u(i)),
        |x AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      (CASE WHEN (255 - byte) >= 128 THEN -1 ELSE 1 END) *
        |      ((((255 - byte) % 16) * 8 + 132)
        |         * (1 << (((255 - byte) // 16) % 8)) - 132)
        |    ELSE
        |      (CASE WHEN xor(byte, 85) >= 128 THEN 1 ELSE -1 END) *
        |      (CASE WHEN ((xor(byte, 85) // 16) % 8) = 0
        |            THEN (xor(byte, 85) % 16) * 16 + 8
        |            ELSE ((xor(byte, 85) % 16) * 16 + 264)
        |                 * (1 << (((xor(byte, 85) // 16) % 8) - 1)) END)
        |    END AS s
        |  FROM b)
        |SELECT doc_id, CAST(300 AS BIGINT) AS n_bytes,
        |  CAST(256 AS BIGINT) AS n_samples, CAST(32 AS BIGINT) AS duration_ms,
        |  sqrt(CAST(sum(s * s) AS DOUBLE) / 256) / 32768.0 AS rms
        |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // per-pixel closed forms over the 13x7 grid, keyed by doc_id mod 5
    "q137_png_variants" ->
      """SELECT d.doc_id,
        |  CAST(13 AS INT) AS width, CAST(7 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 5 IN (0, 1) THEN 1
        |            WHEN d.doc_id % 5 = 4 THEN 4 ELSE 3 END AS INT) AS channels,
        |  CAST(sum(1000 * (CASE d.doc_id % 5
        |    WHEN 0 THEN (d.doc_id + u.x + v.y) % 256
        |    WHEN 1 THEN 17 * ((d.doc_id + u.x + v.y) % 16)
        |    WHEN 2 THEN (d.doc_id + ((d.doc_id + u.x + v.y) % 256)) % 256
        |    WHEN 3 THEN (d.doc_id + ((d.doc_id + u.x + v.y) % 4)) % 256
        |    ELSE (d.doc_id + u.x + v.y) % 256 END)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 91) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 12)) AS u(x),
        |  unnest(generate_series(0, 6)) AS v(y)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q107's closed form, gray/444 keyed by doc_id parity
    "q136_jpeg_progressive" ->
      """SELECT d.doc_id,
        |  CAST(32 AS INT) AS width, CAST(16 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
        |  CAST(sum(64 * 1000 * ((d.doc_id + u.bx + v.by) % 256)) AS DOUBLE)
        |    / (1000.0 * 255.0 * 512) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 3)) AS u(bx),
        |  unnest(generate_series(0, 1)) AS v(by)
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // 3 HITS rounds as chained CTEs; every sum re-CAST to BIGINT (DuckDB
    // HUGEINT promotion) and each normalization is the dual-branch CASE
    // on its own round-total CTE, mirroring LinkGraph.hits' driver scalar
    "q149_hits" -> {
      // every multiply-referenced CTE is MATERIALIZED and the round
      // total rides in on ONE cross join per round: DuckDB otherwise
      // INLINES each CTE reference, and the chained rounds' references
      // compound into exponentially many re-opened parquet scans
      // ("Too many open files" at round 3 even with a 20k fd limit)
      def norm(x: String) =
        s"""CAST(CASE WHEN t.t > 0 AND t.t <= 9200000000000
           |    THEN ($x * 1000000) // t.t
           |    ELSE $x // greatest(t.t // 1000000, 1)
           |    END AS BIGINT)""".stripMargin
      val rounds = (1 to 3).map { k =>
        val prevH = if (k == 1) "h0" else s"h${k - 1}"
        s"""a${k}r AS MATERIALIZED (
           |  SELECT n.id, CAST(coalesce(sum(h.h), 0) AS BIGINT) AS a
           |  FROM nodes n LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prevH h ON h.id = e.src
           |  GROUP BY n.id),
           |a${k}t AS MATERIALIZED (
           |  SELECT CAST(sum(a) AS BIGINT) AS t FROM a${k}r),
           |a$k AS MATERIALIZED (
           |  SELECT id, ${norm("a")} AS a FROM a${k}r, a${k}t t),
           |h${k}r AS MATERIALIZED (
           |  SELECT n.id, CAST(coalesce(sum(a.a), 0) AS BIGINT) AS h
           |  FROM nodes n LEFT JOIN e ON e.src = n.id
           |  LEFT JOIN a$k a ON a.id = e.dst
           |  GROUP BY n.id),
           |h${k}t AS MATERIALIZED (
           |  SELECT CAST(sum(h) AS BIGINT) AS t FROM h${k}r),
           |h$k AS MATERIALIZED (
           |  SELECT id, ${norm("h")} AS h FROM h${k}r, h${k}t t)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT doc_id % 101 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 101, (doc_id * 5 + 2) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes),
         |$rounds
         |SELECT h3.id, CAST(h3.h AS BIGINT) AS hub_e6,
         |       CAST(a3.a AS BIGINT) AS auth_e6
         |FROM h3 JOIN a3 ON a3.id = h3.id ORDER BY h3.id""".stripMargin
    },

    // the capped-pairing replay: out-degree computed over the distinct
    // de-self-looped edges, citers past the cap (or below 2) dropped,
    // then the unordered pair count with the same >= 2 floor
    "q150_cocitation" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id % 23 AS src, ((doc_id % 23) % 5) * 3 AS dst
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT doc_id % 23, ((doc_id % 23) % 7) * 2 + 1
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT doc_id % 23, ((doc_id % 23) % 4) * 5 + 2
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT 999, doc_id % 47
        |    FROM documents WHERE doc_id IS NOT NULL)
        |  WHERE src <> dst),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |keep AS (SELECT e.src, e.dst FROM e JOIN deg USING (src)
        |         WHERE deg.d BETWEEN 2 AND 12),
        |p AS (SELECT least(a.dst, b.dst) AS id_a, greatest(a.dst, b.dst) AS id_b
        |      FROM keep a JOIN keep b ON a.src = b.src AND a.dst < b.dst)
        |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common
        |FROM p GROUP BY id_a, id_b HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // longest-match replay: the oracle knows the URL path in closed form,
    // scores matching rules 2·len+allow, and reads the verdict off the
    // parity of the max — the same single-aggregate form as the engine
    "q151_robots" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
        |urls AS (SELECT doc_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      || '/x' || (doc_id % 3) AS url,
        |    '/p' || (doc_id % 5) || '/x' || (doc_id % 3) AS path,
        |    'd' || (doc_id % 7) || '.example.com' AS host
        |  FROM d),
        |rules AS (SELECT DISTINCT
        |    'd' || (doc_id % 7) || '.example.com' AS domain,
        |    CASE doc_id % 11
        |      WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
        |      WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
        |      WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
        |      WHEN 9 THEN '/p4/x1' ELSE '/p0' END AS rule_path,
        |    CASE doc_id % 11
        |      WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN FALSE
        |      WHEN 3 THEN TRUE WHEN 4 THEN FALSE WHEN 5 THEN FALSE
        |      WHEN 6 THEN TRUE WHEN 7 THEN TRUE WHEN 8 THEN FALSE
        |      WHEN 9 THEN TRUE ELSE TRUE END AS allow
        |  FROM d),
        |m AS (SELECT u.doc_id,
        |    max(2 * length(r.rule_path)
        |      + CASE WHEN r.allow THEN 1 ELSE 0 END) AS score
        |  FROM urls u JOIN rules r
        |    ON r.domain = u.host AND starts_with(u.path, r.rule_path)
        |  GROUP BY u.doc_id)
        |SELECT u.doc_id, u.url,
        |  coalesce(m.score % 2 = 1, TRUE) AS allowed,
        |  CAST(coalesce(m.score // 2, 0) AS BIGINT) AS matched_len
        |FROM urls u LEFT JOIN m ON m.doc_id = u.doc_id
        |ORDER BY u.doc_id""".stripMargin,

    // every parsed WARC field recomputed from the source row, incl. the
    // sha-256 payload digest and the UTF-8 octet Content-Length
    "q152_warc" ->
      """SELECT doc_id,
        |  'response' AS warc_type,
        |  'https://example.com/doc/' || doc_id AS target_uri,
        |  '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |    || 'T00:00:00Z' AS warc_date,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
        |    AS content_length,
        |  sha256(coalesce(text, '')) AS payload_sha256
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the same punctuation injection (RE2 '\1', global flag) and
    // [.!?]+ segmentation replayed over DuckDB list ops
    "q153_sentences" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(text, '(table|fast|stream)', '\1.', 'g') AS text
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s AS (SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(x)), x -> x <> '') AS sents
        |  FROM t),
        |w AS (SELECT doc_id, sents,
        |    list_transform(sents,
        |      x -> CAST(len(regexp_split_to_array(x, '\s+')) AS BIGINT)) AS wp
        |  FROM s)
        |SELECT doc_id,
        |  CAST(len(sents) AS BIGINT) AS n_sentences,
        |  CAST(coalesce(list_sum(wp), 0) AS BIGINT) AS total_words,
        |  CAST(coalesce(list_max(wp), 0) AS BIGINT) AS max_words,
        |  CAST(CASE WHEN len(sents) > 0
        |    THEN (coalesce(list_sum(wp), 0) * 1000000) // len(sents)
        |    ELSE 0 END AS BIGINT) AS mean_words_e6
        |FROM w ORDER BY doc_id""".stripMargin,

    // the router's expected verdict in closed form over the id cycle
    "q154_mime_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 7
        |    WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
        |    WHEN 2 THEN 'image/jpeg' WHEN 3 THEN 'image/gif'
        |    WHEN 4 THEN 'audio/wav' WHEN 5 THEN 'image/qoi'
        |    ELSE 'text/plain' END AS mime
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // per-pixel closed form over the 9×12 grid: alternating constant
    // rows (y%4=3), unit-step rows (y%4=1), (1,2,1)-step rows
    // otherwise; channels by parity
    "q155_qoi_decode" ->
      """SELECT d.doc_id,
        |  CAST(9 AS INT) AS width, CAST(12 AS INT) AS height,
        |  CAST(CASE WHEN d.doc_id % 2 = 0 THEN 3 ELSE 4 END AS INT)
        |    AS channels,
        |  CAST(sum(CASE WHEN v.y % 4 = 3
        |    THEN 1000 * ((d.doc_id + 101 + 7 * ((v.y // 4) % 2)) % 256)
        |    WHEN v.y % 4 = 1
        |    THEN 299 * ((d.doc_id + u.x + v.y) % 256)
        |       + 587 * ((d.doc_id + u.x + v.y + 1) % 256)
        |       + 114 * ((d.doc_id + u.x + v.y + 2) % 256)
        |    ELSE 299 * ((d.doc_id + u.x + v.y) % 256)
        |       + 587 * ((d.doc_id + 2 * u.x + v.y) % 256)
        |       + 114 * ((d.doc_id + u.x + 2 * v.y) % 256) END) AS DOUBLE)
        |    / (1000.0 * 255.0 * 108) AS mean_luma
        |FROM documents d,
        |  unnest(generate_series(0, 8)) AS u(x),
        |  unnest(generate_series(0, 11)) AS v(y)
        |WHERE d.doc_id IS NOT NULL
        |GROUP BY d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q88's recursive transitive closure, then the fold as the count of
    // range boundaries at or below the md5 prefix (k=5: 3333/6666/9999/cccc)
    "q156_kfold" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |e AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a),
         |comp AS (SELECT x AS doc_id, min(y) AS component FROM r GROUP BY 1),
         |keyed AS (
         |  SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key,
         |    substr(md5(CAST(coalesce(c.component, d.doc_id) AS VARCHAR)), 1, 4) AS h
         |  FROM all_docs d LEFT JOIN comp c USING (doc_id))
         |SELECT doc_id, split_key,
         |  CAST((CASE WHEN h >= '3333' THEN 1 ELSE 0 END)
         |     + (CASE WHEN h >= '6666' THEN 1 ELSE 0 END)
         |     + (CASE WHEN h >= '9999' THEN 1 ELSE 0 END)
         |     + (CASE WHEN h >= 'cccc' THEN 1 ELSE 0 END) AS INT) AS fold
         |FROM keyed
         |ORDER BY doc_id""".stripMargin,

    // the one-shot heavy-hitters the incremental fold must reproduce
    "q157_stream_topk" ->
      """WITH k AS (
        |  SELECT event_type || '#' || (user_id % 50) AS key
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL)
        |SELECT key, CAST(count(*) AS BIGINT) AS n_total
        |FROM k GROUP BY key
        |ORDER BY n_total DESC, key LIMIT 20""".stripMargin,

    // the same count-then-rank with the deterministic tiebreak
    "q158_anchor_text" ->
      """WITH a AS (
        |  SELECT (doc_id * 7 + 3) % 37 AS dst,
        |    unnest(regexp_split_to_array(trim(lower(
        |      array_to_string(list_slice(regexp_split_to_array(text, ' '), 1, 2), ' ')
        |    )), '\s+')) AS term
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT dst, term, CAST(count(*) AS BIGINT) AS n_anchors
        |  FROM a WHERE term <> '' GROUP BY dst, term),
        |r AS (
        |  SELECT dst, term, n_anchors,
        |    CAST(row_number() OVER (PARTITION BY dst
        |      ORDER BY n_anchors DESC, term ASC) AS INT) AS rank
        |  FROM c)
        |SELECT dst, term, n_anchors, rank FROM r WHERE rank <= 3
        |ORDER BY dst, rank""".stripMargin,

    // 3 clamped-seed majority rounds as chained CTEs (votes → window-max
    // majority with min-label tiebreak → fold with seed/vote/prev
    // precedence); CTEs MATERIALIZED per the q149 lesson
    "q159_label_prop" -> {
      val rounds = (1 to 3).map { k =>
        val prev = s"l${k - 1}"
        s"""v$k AS MATERIALIZED (
           |  SELECT e.dst AS id, l.label, CAST(count(*) AS BIGINT) AS c
           |  FROM e JOIN $prev l ON l.id = e.src
           |  WHERE l.label IS NOT NULL
           |  GROUP BY e.dst, l.label),
           |b$k AS MATERIALIZED (
           |  SELECT id, min(label) AS vote FROM (
           |    SELECT id, label, c, max(c) OVER (PARTITION BY id) AS mx
           |    FROM v$k) WHERE c = mx GROUP BY id),
           |l$k AS MATERIALIZED (
           |  SELECT n.id,
           |    coalesce(s.label, b.vote, p.label) AS label
           |  FROM nodes n
           |  LEFT JOIN seeds s ON s.id = n.id
           |  LEFT JOIN b$k b ON b.id = n.id
           |  LEFT JOIN $prev p ON p.id = n.id)"""
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT doc_id % 89 AS src, (doc_id * 3 + 1) % 89 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL),
         |e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM
         |    (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |seeds AS MATERIALIZED (
         |  SELECT id, (id // 7) % 3 AS label FROM (
         |    SELECT DISTINCT doc_id % 89 AS id FROM documents
         |    WHERE doc_id IS NOT NULL) WHERE id % 7 = 0),
         |l0 AS MATERIALIZED (
         |  SELECT n.id, s.label FROM nodes n LEFT JOIN seeds s ON s.id = n.id),
         |$rounds
         |SELECT id, label FROM l3 ORDER BY id""".stripMargin
    },

    // both member rows recomputed from the source text; sizes are UTF-8
    // octet lengths
    "q160_tar_members" ->
      """SELECT doc_id, member_index, name, size, type_flag FROM (
        |  SELECT doc_id, CAST(0 AS INT) AS member_index,
        |    'docs/' || doc_id || '/body.txt' AS name,
        |    CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS size,
        |    'file' AS type_flag
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, CAST(1 AS INT),
        |    'docs/' || doc_id || '/meta.json',
        |    CAST(octet_length(encode('{"id":' || doc_id || '}')) AS BIGINT),
        |    'file'
        |  FROM documents WHERE doc_id IS NOT NULL)
        |ORDER BY doc_id, member_index""".stripMargin,

    // decompressed length + digest straight from the source text
    "q161_gzip_roundtrip" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
        |    AS decompressed_bytes,
        |  sha256(coalesce(text, '')) AS decompressed_sha256
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the same clamped power-of-two decay, replayed per event
    "q162_decay_counts" -> {
      s"""WITH e AS ($EventsCte)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(1000000 // CAST(power(2, least(
         |    greatest(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01'), 0)
         |      // 3, 30)) AS BIGINT)) AS BIGINT) AS decayed_mass
         |FROM e
         |WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |GROUP BY event_type
         |ORDER BY event_type""".stripMargin
    },

    // q131's 5 PageRank rounds on the 37-domain graph + the q151
    // longest-match robots replay, joined: allowed URLs with their
    // domain's rank
    "q163_frontier_score" -> {
      val rounds = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        s"""r$k AS MATERIALIZED (
           |  SELECT n.id, CAST(p.base + coalesce(sum(
           |      (r.rank * 85) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN p
           |  LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prev r ON r.id = e.src
           |  LEFT JOIN od d ON d.src = e.src
           |  GROUP BY n.id, p.base)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT doc_id % 37 AS src, (doc_id * 7 + 3) % 37 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |p AS (SELECT CAST(150000000000 // count(*) AS BIGINT) AS base,
         |             CAST(1000000000000 // count(*) AS BIGINT) AS init
         |      FROM nodes),
         |od AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT id, (SELECT init FROM p) AS rank FROM nodes),
         |$rounds,
         |urls AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 37 AS domain_id,
         |    'https://www.site' || (doc_id % 37) || '.com/p' || (doc_id % 5)
         |      || '/x' || (doc_id % 3) AS url,
         |    '/p' || (doc_id % 5) || '/x' || (doc_id % 3) AS path,
         |    'www.site' || (doc_id % 37) || '.com' AS host
         |  FROM documents WHERE doc_id IS NOT NULL),
         |rules AS MATERIALIZED (SELECT DISTINCT
         |    'www.site' || (doc_id % 37) || '.com' AS domain,
         |    CASE doc_id % 11
         |      WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
         |      WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
         |      WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
         |      WHEN 9 THEN '/p4/x1' ELSE '/p0' END AS rule_path,
         |    CASE doc_id % 11
         |      WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN FALSE
         |      WHEN 3 THEN TRUE WHEN 4 THEN FALSE WHEN 5 THEN FALSE
         |      WHEN 6 THEN TRUE WHEN 7 THEN TRUE WHEN 8 THEN FALSE
         |      WHEN 9 THEN TRUE ELSE TRUE END AS allow
         |  FROM documents WHERE doc_id IS NOT NULL),
         |m AS MATERIALIZED (SELECT u.doc_id,
         |    max(2 * length(r.rule_path)
         |      + CASE WHEN r.allow THEN 1 ELSE 0 END) AS score
         |  FROM urls u JOIN rules r
         |    ON r.domain = u.host AND starts_with(u.path, r.rule_path)
         |  GROUP BY u.doc_id)
         |SELECT u.doc_id, u.url, CAST(r5.rank AS BIGINT) AS domain_rank_e12
         |FROM urls u
         |LEFT JOIN m ON m.doc_id = u.doc_id
         |JOIN r5 ON r5.id = u.domain_id
         |WHERE coalesce(m.score % 2 = 1, TRUE)
         |ORDER BY u.doc_id""".stripMargin
    },

    // 4 Bellman-Ford rounds as chained MATERIALIZED CTEs, min-merge of
    // previous distance and best in-neighbor + 1
    "q164_hop_distance" -> {
      val rounds = (1 to 4).map { k =>
        val prev = s"d${k - 1}"
        s"""c$k AS MATERIALIZED (
           |  SELECT e.dst AS id, min(p.dist + 1) AS c
           |  FROM e JOIN $prev p ON p.id = e.src
           |  WHERE p.dist IS NOT NULL GROUP BY e.dst),
           |d$k AS MATERIALIZED (
           |  SELECT n.id,
           |    CASE WHEN p.dist IS NULL THEN c.c
           |         WHEN c.c IS NULL THEN p.dist
           |         ELSE least(p.dist, c.c) END AS dist
           |  FROM nodes n
           |  LEFT JOIN c$k c ON c.id = n.id
           |  LEFT JOIN $prev p ON p.id = n.id)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id % 89 AS src, (doc_id * 3 + 1) % 89 AS dst
         |    FROM documents WHERE doc_id IS NOT NULL
         |    UNION ALL
         |    SELECT (doc_id * 5) % 89, (doc_id * 7 + 4) % 89
         |    FROM documents WHERE doc_id IS NOT NULL)),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |seeds AS MATERIALIZED (SELECT id FROM nodes WHERE id % 10 = 0),
         |d0 AS MATERIALIZED (
         |  SELECT n.id, CASE WHEN s.id IS NOT NULL THEN CAST(0 AS BIGINT)
         |    ELSE NULL END AS dist
         |  FROM nodes n LEFT JOIN seeds s ON s.id = n.id),
         |$rounds
         |SELECT id, CAST(dist AS BIGINT) AS dist FROM d4 ORDER BY id""".stripMargin
    },

    // symmetrize + orient by id, cap the apex's oriented degree, then
    // wedge + closing-edge joins — the same shape the engine plans
    "q165_triangles" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT doc_id % 40 AS src, (doc_id % 40 + 1) % 40 AS dst
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT doc_id % 40, (doc_id % 40 + 2) % 40
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT 0, doc_id % 27 + 14
        |    FROM documents WHERE doc_id IS NOT NULL)
        |  WHERE src <> dst),
        |adj AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0),
        |kept AS MATERIALIZED (
        |  SELECT adj.a, adj.b FROM adj JOIN (
        |    SELECT a FROM adj GROUP BY a HAVING count(*) <= 12) d
        |  USING (a)),
        |w AS (SELECT x.a AS id_a, x.b AS id_b, y.b AS id_c
        |      FROM kept x JOIN kept y ON x.a = y.a AND x.b < y.b)
        |SELECT w.id_a, w.id_b, w.id_c
        |FROM w JOIN adj ON adj.a = w.id_b AND adj.b = w.id_c
        |ORDER BY id_a, id_b, id_c""".stripMargin,

    // the corrupt-vs-parsed split in closed form: malformed records
    // carry their whole input line, parsed ones their typed fields
    "q166_jsonl_parse" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE doc_id END AS id,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |       ELSE coalesce(lang, 'und') END AS lang,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |       ELSE CAST(doc_id % 7 AS INT) END AS n,
        |  CASE WHEN doc_id % 13 = 0
        |       THEN '{"id": ' || doc_id || ', lang'
        |       ELSE NULL END AS corrupt_record
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the roundtrip must preserve every value: aggregate the ORIGINAL
    "q167_orc_roundtrip" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // both directions present, reported once as (lo, hi)
    "q168_reciprocal_links" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id % 61 AS src, (doc_id * 3 + 2) % 61 AS dst
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT (doc_id * 5 + 1) % 61, (doc_id * 2) % 61
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT (doc_id * 7) % 61, (doc_id * 11 + 3) % 61
        |    FROM documents WHERE doc_id IS NOT NULL AND doc_id % 4 = 0
        |    UNION ALL
        |    SELECT (doc_id * 11 + 3) % 61, (doc_id * 7) % 61
        |    FROM documents WHERE doc_id IS NOT NULL AND doc_id % 4 = 0)
        |  WHERE src <> dst)
        |SELECT a.src AS id_a, a.dst AS id_b
        |FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
        |WHERE a.src < a.dst
        |ORDER BY id_a, id_b""".stripMargin,

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

    // independent replay: full position lists + an adjacency join
    "q173_phrase_match" ->
      """WITH arr AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |pos AS (
        |  SELECT doc_id, u.i, a[u.i] AS t
        |  FROM arr, unnest(generate_series(1, len(a))) u(i))
        |SELECT p1.doc_id, CAST(count(*) AS BIGINT) AS n_matches
        |FROM pos p1 JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i = p1.i + 1
        |WHERE p1.t = 'table' AND p2.t = 'value'
        |GROUP BY p1.doc_id
        |ORDER BY p1.doc_id""".stripMargin,

    // closed-form replay of both 64-bit perceptual hashes over the
    // textured pixel formula: 2×2 box sums (gray, so the 1000× luma
    // scale cancels out of every comparison), HUGEINT bit fold, then
    // the two's-complement cast back to BIGINT
    "q174_image_phash" ->
      s"""WITH ${imageHashCtes("(d.doc_id * 31 + u.x * u.x" +
            " + (3 + d.doc_id % 5) * u.x * v.y" +
            " + (7 + d.doc_id % 11) * v.y) % 256")}
         |SELECT dh.doc_id,
         |  ${hugeToLong("dh.h")} AS dhash,
         |  ${hugeToLong("ah.h")} AS ahash
         |FROM dh JOIN ah USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // banded-pairing is lossless at hamming ≤ 6 (7 bands, pigeonhole),
    // so the oracle is the straight all-pairs hamming filter over the
    // closed-form dHashes of the grouped+perturbed images
    "q175_image_neardup" ->
      s"""WITH ${imageHashCtes(
            "((d.doc_id // 8) * 31 + u.x * u.x" +
            " + (3 + (d.doc_id // 8) % 5) * u.x * v.y" +
            " + (7 + (d.doc_id // 8) % 11) * v.y" +
            " + CASE WHEN u.x = 2 * (d.doc_id % 8) AND v.y = d.doc_id % 8" +
            " THEN 96 ELSE 0 END) % 256")},
         |hh AS (
         |  SELECT doc_id, ${hugeToLong("h")} AS dhash FROM dh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         |FROM hh a JOIN hh b ON b.doc_id > a.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         |ORDER BY id_a, id_b""".stripMargin,

    // same shape as q161: the roundtrip must hand back exactly the utf-8
    // payload, digest-checked from the raw text
    "q176_zstd_roundtrip" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
        |    AS decompressed_bytes,
        |  sha256(coalesce(text, '')) AS decompressed_sha256
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the full blocking contract in the WHERE clause: first char equal,
    // length within the band, JW ≥ threshold (DuckDB's byte-based
    // jaro_winkler_similarity is the pinned reference semantics)
    "q177_fuzzy_join" ->
      """WITH names AS (
        |  SELECT doc_id, trim(lower(substr(text, 1, 20))) AS n
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |probes AS (
        |  SELECT doc_id + 90000 AS id_l,
        |    concat(substr(n, 1, 4), substr(n, 6, 1),
        |      substr(n, 5, 1), substr(n, 7)) AS p
        |  FROM names WHERE doc_id % 3 = 0)
        |SELECT a.id_l, b.doc_id AS id_r,
        |  CAST(round(jaro_winkler_similarity(a.p, b.n) * 10000) AS BIGINT)
        |    AS jw_e4
        |FROM probes a JOIN names b
        |  ON substr(a.p, 1, 4) = substr(b.n, 1, 4)
        |  AND abs(length(a.p) - length(b.n)) <= 2
        |  AND length(a.p) > 0 AND length(b.n) > 0
        |  AND jaro_winkler_similarity(a.p, b.n) >= 0.85
        |ORDER BY id_l, id_r""".stripMargin,

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

    // identical XML synthesis, DuckDB RE2 re-parse: <url> blocks with
    // ordinality, loc-less block dropped, ''→NULL optionals
    "q180_sitemap" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    '<?xml version="1.0"?><urlset>'
        |    || '<url><loc>https://d' || (doc_id % 7)
        |    || '.example.com/p' || (doc_id % 5)
        |    || '</loc><lastmod>2024-01-0' || ((doc_id % 9) + 1)
        |    || '</lastmod><priority>0.' || (doc_id % 10)
        |    || '</priority></url>'
        |    || '<url><loc> https://m' || (doc_id % 3)
        |    || '.example.com/ </loc></url>'
        |    || '<url><lastmod>2024-02-01</lastmod></url>'
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN '<url><loc>https://x.example.com/q</loc><priority>1.0</priority></url>'
        |         ELSE '' END
        |    || '</urlset>' AS xml
        |  FROM documents WHERE doc_id IS NOT NULL),
        |b AS (
        |  SELECT doc_id, regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS l
        |  FROM x),
        |e AS (
        |  SELECT doc_id, CAST(u.i - 1 AS INT) AS entry_index, l[u.i] AS blk
        |  FROM b, unnest(generate_series(1, len(l))) AS u(i))
        |SELECT doc_id, entry_index,
        |  regexp_extract(blk, '<loc>\s*([^<\s][^<]*?)\s*</loc>', 1) AS loc,
        |  nullif(regexp_extract(blk, '<lastmod>\s*([^<]+?)\s*</lastmod>', 1), '')
        |    AS lastmod,
        |  nullif(regexp_extract(blk, '<priority>\s*([^<]+?)\s*</priority>', 1), '')
        |    AS priority
        |FROM e
        |WHERE length(regexp_extract(blk, '<loc>\s*([^<\s][^<]*?)\s*</loc>', 1)) > 0
        |ORDER BY doc_id, entry_index""".stripMargin,

    // label derivation closed-form: BOM branches by id, the 0xA9 branch
    // is structurally invalid UTF-8, 'é' forces the multibyte branch,
    // and ascii-vs-utf8 falls out of octet-vs-char length
    "q181_charset_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'utf-8-bom'
        |    WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'utf-16be'
        |    WHEN 3 THEN 'binary'
        |    ELSE CASE
        |      WHEN doc_id % 10 = 4 THEN 'utf-8'
        |      WHEN octet_length(encode(text)) = length(text) THEN 'ascii'
        |      ELSE 'utf-8' END
        |  END AS charset
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // full replay: canonicalized word bigrams, portable bucketing, both
    // corpus distributions, smoothed floored-ln weights, per-doc sums
    "q182_importance_weights" ->
      """WITH cf AS (
        |  SELECT doc_id, lang,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |g AS (
        |  SELECT doc_id, lang,
        |    array_to_string(list_slice(t, u.i, u.i + 1), ' ') AS g
        |  FROM cf, unnest(generate_series(1, greatest(len(t) - 1, 1))) AS u(i)),
        |gg AS (
        |  SELECT doc_id, lang,
        |    CAST((length(g) * 7 + ascii(substr(g, 1, 1)) * 31
        |      + ascii(substr(g || '_', 2, 1))) % 32 AS INT) AS dim
        |  FROM g WHERE g <> ''),
        |rawf AS (
        |  SELECT doc_id, dim, CAST(count(*) AS BIGINT) AS c
        |  FROM gg GROUP BY doc_id, dim),
        |tf AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS ct
        |  FROM gg WHERE lang = 'en' AND doc_id % 2 = 0 GROUP BY dim),
        |rf AS (SELECT dim, CAST(sum(c) AS BIGINT) AS cr FROM rawf GROUP BY dim),
        |tot AS (
        |  SELECT (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tf) AS tt,
        |         (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM rf) AS tr),
        |w AS (
        |  SELECT rf.dim,
        |    CAST(floor(ln(CAST(coalesce(tf.ct, 0) + 1 AS DOUBLE)) * 1e12) AS BIGINT)
        |    - CAST(floor(ln(CAST(tot.tt + 32 AS DOUBLE)) * 1e12) AS BIGINT)
        |    - CAST(floor(ln(CAST(rf.cr + 1 AS DOUBLE)) * 1e12) AS BIGINT)
        |    + CAST(floor(ln(CAST(tot.tr + 32 AS DOUBLE)) * 1e12) AS BIGINT) AS w
        |  FROM rf LEFT JOIN tf ON tf.dim = rf.dim, tot)
        |SELECT r.doc_id, CAST(sum(r.c) AS BIGINT) AS n_feats,
        |  CAST(sum(r.c * w.w) AS BIGINT) AS logw_e12
        |FROM rawf r JOIN w ON w.dim = r.dim
        |GROUP BY r.doc_id
        |ORDER BY r.doc_id""".stripMargin,

    // identical 4-round unroll: per round degrees over surviving
    // undirected simple edges, keep ≥ k, re-restrict edges; final
    // degrees re-counted and filtered like the engine's output stage
    "q183_kcore" -> {
      val k = 5
      val rounds = (1 to 4).map { r =>
        val prev = s"e${r - 1}"
        s"""d$r AS (
           |  SELECT id, count(*) AS d FROM (
           |    SELECT a AS id FROM $prev UNION ALL SELECT b AS id FROM $prev)
           |  GROUP BY id),
           |k$r AS (SELECT id FROM d$r WHERE d >= $k),
           |e$r AS (
           |  SELECT e.a, e.b FROM $prev e
           |  JOIN k$r x ON x.id = e.a
           |  JOIN k$r y ON y.id = e.b)"""
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT doc_id % 61 AS src, (doc_id * doc_id + 1) % 61 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION ALL
         |  SELECT (doc_id * 3) % 61, (doc_id * 5 + 2) % 61
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id % 13, (doc_id // 13) % 13
         |  FROM documents WHERE doc_id IS NOT NULL),
         |e0 AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst),
         |$rounds
         |SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
         |  SELECT a AS id FROM e4 UNION ALL SELECT b AS id FROM e4)
         |GROUP BY id HAVING count(*) >= $k
         |ORDER BY id""".stripMargin
    },

    // the batch meaning of the interval join, verbatim
    "q184_stream_interval_join" ->
      s"""WITH e AS ($EventsCte)
         |SELECT v.event_id AS view_id, p.event_id AS purchase_id,
         |  v.user_id,
         |  CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT)
         |    AS micros_to_purchase
         |FROM e v JOIN e p
         |  ON p.user_id = v.user_id
         |  AND v.event_type = 'view' AND p.event_type = 'purchase'
         |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
         |WHERE v.user_id IS NOT NULL AND v.ts IS NOT NULL
         |  AND p.ts IS NOT NULL
         |ORDER BY view_id, purchase_id""".stripMargin,

    // the full selection replay: distinct-word substring counts,
    // char-exempt minCount cut, chars-first ranked LIMIT, e12 log-probs
    // against the selected-vocab total
    "q186_unigram_vocab" ->
      """WITH w AS (
        |  SELECT word, CAST(sum(1) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL) t
        |  WHERE word <> '' GROUP BY word),
        |subs AS (
        |  SELECT substr(word, u.i, v.l) AS piece, CAST(sum(n) AS BIGINT) AS cnt
        |  FROM w,
        |    unnest(generate_series(1, length(word))) AS u(i),
        |    unnest(generate_series(1, least(4, length(word) - u.i + 1))) AS v(l)
        |  GROUP BY piece),
        |kept AS (SELECT * FROM subs WHERE cnt >= 2 OR length(piece) = 1),
        |ranked AS (
        |  SELECT piece, cnt FROM kept
        |  ORDER BY (CASE WHEN length(piece) = 1 THEN 1 ELSE 0 END) DESC,
        |    cnt DESC, piece ASC
        |  LIMIT 200),
        |tot AS (SELECT CAST(greatest(sum(cnt), 1) AS BIGINT) AS t FROM ranked)
        |SELECT piece, cnt AS count,
        |  CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e12) AS BIGINT)
        |    - CAST(floor(ln(CAST(tot.t AS DOUBLE)) * 1e12) AS BIGINT)
        |    AS logp_e12
        |FROM ranked, tot
        |ORDER BY count DESC, piece ASC""".stripMargin,

    // value-level roundtrip check of the bloom-enabled write
    "q188_bloom_layout" ->
      """SELECT doc_id, source, lang FROM documents
        |WHERE doc_id % 37 = 1
        |ORDER BY doc_id""".stripMargin,

    // frame energies in closed form (padded frames contribute 0), then
    // the active-span aggregate; 800 samples = 5 frames of 160
    "q189_trim_silence" ->
      """WITH s AS (
        |  SELECT d.doc_id, CAST(u.i // 160 AS INT) AS f,
        |    CASE WHEN (u.i // 160) < d.doc_id % 3
        |           OR (u.i // 160) >= 5 - (d.doc_id // 3) % 2
        |      THEN 0
        |      ELSE (d.doc_id * 31 + u.i) % 65536 - 32768 END AS v
        |  FROM documents d, unnest(generate_series(0, 799)) AS u(i)
        |  WHERE d.doc_id IS NOT NULL),
        |fe AS (
        |  SELECT doc_id, f, CAST(sum(v * v) AS BIGINT) AS e
        |  FROM s GROUP BY doc_id, f)
        |SELECT doc_id, CAST(5 AS INT) AS n_frames,
        |  CAST(min(CASE WHEN e > 0 THEN f END) AS INT) AS first_active,
        |  CAST(max(CASE WHEN e > 0 THEN f END) AS INT) AS last_active,
        |  CAST(count(CASE WHEN e > 0 THEN 1 END) AS INT) AS n_active_frames,
        |  CAST(coalesce(sum(CASE WHEN e > 0 THEN e END), 0) AS BIGINT)
        |    AS active_sum_sq
        |FROM fe GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    // the same conservative-merge config join + per-host id-order rank
    "q190_politeness" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      AS url,
        |    'd' || (doc_id % 7) || '.example.com' AS host
        |  FROM documents WHERE doc_id IS NOT NULL),
        |del AS (
        |  SELECT 'd' || (doc_id % 7) || '.example.com' AS host,
        |    CAST(max((doc_id % 7 + 1) * 250) AS BIGINT) AS delay_ms
        |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT u.doc_id, u.url, u.host,
        |    CAST(row_number() OVER (PARTITION BY u.host ORDER BY u.doc_id) - 1
        |      AS BIGINT) AS fetch_seq,
        |    del.delay_ms
        |  FROM u LEFT JOIN del ON del.host = u.host)
        |SELECT doc_id, url, host, fetch_seq,
        |  CAST(fetch_seq * coalesce(delay_ms, 1000) AS BIGINT)
        |    AS fetch_offset_ms
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    // chains q124's scoring replay (identical double tree → identical
    // buckets) into q108's per-group budget window
    "q191_perplexity_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |bi AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |toks AS (SELECT unnest(t) AS term FROM d),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |c2 AS (SELECT term, count(*) AS c2 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |sc AS (
        |  SELECT b.doc_id,
        |    CAST(floor(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
        |      + 0.25 * (CAST(c2.c2 AS DOUBLE) / n)) * 1e12) AS BIGINT) AS lp
        |  FROM bi b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |    JOIN c2 ON b.w2 = c2.term CROSS JOIN tot),
        |m AS (
        |  SELECT doc_id, CAST(sum(lp) AS DOUBLE) / 1e12 / count(*) AS mean_lp
        |  FROM sc GROUP BY doc_id),
        |bk AS (
        |  SELECT m.doc_id,
        |    CASE WHEN m.mean_lp >= -3.35 THEN 'high'
        |         WHEN m.mean_lp >= -3.40 THEN 'mid'
        |         ELSE 'low' END AS bucket,
        |    doc.n_chars
        |  FROM m JOIN documents doc ON doc.doc_id = m.doc_id)
        |SELECT doc_id, bucket, n_chars FROM (
        |  SELECT doc_id, bucket, n_chars,
        |    sum(n_chars) OVER (PARTITION BY bucket
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM bk
        |  WHERE doc_id IS NOT NULL AND bucket IS NOT NULL
        |    AND n_chars IS NOT NULL AND n_chars >= 0)
        |WHERE cum <= 6000
        |ORDER BY doc_id""".stripMargin,

    // id-arithmetic replay of the chained stages: canonical forms are
    // closed-form by construction; dedup keeps min url_id per canonical;
    // the politeness rank runs over the survivors in url_id order
    "q192_frontier_ingest" ->
      """WITH e AS (
        |  SELECT doc_id * 4 + 0 AS url_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      AS canon,
        |    'd' || (doc_id % 7) || '.example.com' AS host
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id * 4 + 1,
        |    'https://m' || (doc_id % 3) || '.example.com/q' || (doc_id % 11),
        |    'm' || (doc_id % 3) || '.example.com'
        |  FROM documents WHERE doc_id IS NOT NULL),
        |surv AS (
        |  SELECT min(url_id) AS url_id, canon, host
        |  FROM e GROUP BY canon, host),
        |del AS (
        |  SELECT 'd' || (doc_id % 7) || '.example.com' AS host,
        |    CAST(max((doc_id % 7 + 1) * 250) AS BIGINT) AS delay_ms
        |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT s.url_id, s.host,
        |    CAST(row_number() OVER (PARTITION BY s.host ORDER BY s.url_id) - 1
        |      AS BIGINT) AS fetch_seq,
        |    del.delay_ms
        |  FROM surv s LEFT JOIN del ON del.host = s.host)
        |SELECT url_id, host, fetch_seq,
        |  CAST(fetch_seq * coalesce(delay_ms, 1000) AS BIGINT)
        |    AS fetch_offset_ms
        |FROM r
        |ORDER BY url_id""".stripMargin,

    // the pinned PERMISSIVE semantics in closed form: unclosed-quote
    // rows keep the parsed prefix (id), swallow the tail into label,
    // null the rest, and carry the whole line in the corrupt column
    "q193_csv_parse" ->
      """SELECT doc_id,
        |  doc_id AS id,
        |  CASE WHEN doc_id % 13 = 0 THEN 'unclosed,' || (doc_id % 7)
        |       WHEN doc_id % 3 = 0 THEN 'w ' || (doc_id % 5) || ', x'
        |       ELSE 'w' || (doc_id % 5) END AS label,
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |       ELSE CAST(doc_id % 7 AS INT) END AS n,
        |  CASE WHEN doc_id % 13 = 0
        |       THEN doc_id || ',"unclosed,' || (doc_id % 7)
        |       ELSE NULL END AS corrupt_record
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // batch-split-independent final state = one argmax over all events
    "q194_stream_cdc" ->
      s"""WITH e AS ($EventsCte)
         |SELECT user_id, event_id AS last_event_id,
         |  event_type AS last_type,
         |  CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM e WHERE user_id IS NOT NULL AND ts IS NOT NULL)
         |WHERE rn = 1
         |ORDER BY user_id""".stripMargin,

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

    // membership by the mod slices; changed = the rewritten %11 slice
    // present on both sides
    "q196_snapshot_diff" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 17 = 0 THEN 'added'
        |       WHEN doc_id % 19 = 0 THEN 'removed'
        |       ELSE 'changed' END AS change
        |FROM d
        |WHERE (doc_id % 17 = 0 AND doc_id % 19 <> 0)
        |   OR (doc_id % 19 = 0 AND doc_id % 17 <> 0)
        |   OR (doc_id % 11 = 0 AND doc_id % 17 <> 0 AND doc_id % 19 <> 0)
        |ORDER BY doc_id""".stripMargin,

    // membership by parity; v1 rows surface NULL for the added columns
    "q199_schema_evolution" ->
      """SELECT doc_id, lang,
        |  CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars,
        |  CASE WHEN doc_id % 2 = 1 THEN source END AS source,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT) AS v
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // langId replay per ORIGINAL doc (each paragraph is one doc's
    // text), grouped to pages with the same count-then-tag argmax
    "q200_mixed_language" -> {
      s"""WITH pred AS ($LangIdOracle),
         |d AS (
         |  SELECT p.doc_id, p.lang_pred
         |  FROM pred p JOIN documents doc ON doc.doc_id = p.doc_id
         |  WHERE doc.text IS NOT NULL AND length(trim(doc.text)) > 0),
         |c AS (
         |  SELECT doc_id // 3 AS page_id, lang_pred,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM d GROUP BY 1, 2),
         |dom AS (
         |  SELECT page_id, lang_pred AS dominant_lang
         |  FROM (SELECT page_id, lang_pred,
         |          row_number() OVER (PARTITION BY page_id
         |            ORDER BY n DESC, lang_pred ASC) AS rn
         |        FROM c)
         |  WHERE rn = 1)
         |SELECT c.page_id, CAST(sum(c.n) AS BIGINT) AS n_paragraphs,
         |  CAST(count(*) AS BIGINT) AS n_langs,
         |  any_value(dom.dominant_lang) AS dominant_lang,
         |  (count(*) > 1) AS is_mixed
         |FROM c JOIN dom ON dom.page_id = c.page_id
         |GROUP BY c.page_id
         |ORDER BY c.page_id""".stripMargin
    },

    // closed-form CDC replay: n = 1 + doc_id%5 block chunks at offsets
    // i*|B| plus one 17-byte tail chunk, digests stated literally (the
    // fixture blocks cut exactly at their ends — see CdcBlockEven)
    "q198_cdc_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, (doc_id % 2 = 0) AS ev,
         |    CAST(1 + doc_id % 5 AS BIGINT) AS n,
         |    CAST(CASE WHEN doc_id % 2 = 0 THEN 179 ELSE 177 END AS BIGINT) AS bl
         |  FROM documents WHERE doc_id IS NOT NULL),
         |c AS (
         |  SELECT doc_id, ev, n, bl, u.i AS ci
         |  FROM d, unnest(generate_series(0, n)) u(i))
         |SELECT doc_id, CAST(ci AS INT) AS chunk_index,
         |  CAST(ci * bl AS BIGINT) AS "offset",
         |  CAST(CASE WHEN ci < n THEN bl ELSE 17 END AS INT) AS length,
         |  CASE WHEN ci < n THEN
         |    (CASE WHEN ev THEN '$CdcDigestEven' ELSE '$CdcDigestOdd' END)
         |  ELSE '$CdcDigestTail' END AS digest
         |FROM c
         |ORDER BY doc_id, chunk_index""".stripMargin,

    // the INTENDED text in closed form: mojibake rows repair to it,
    // genuine Latin-1 rows already carry it, recovered is true for all
    "q197_fix_mojibake" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN text || ' café'
        |       ELSE text END AS fixed,
        |  true AS recovered
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the blocking is lossless, so the oracle is brute force: all pairs
    // over names ∪ one-deletion typos with levenshtein ≤ 1
    "q201_symspell_join" ->
      """WITH n AS (
        |  SELECT doc_id, trim(lower(substr(text, 1, 14))) AS name
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id + 90000,
        |    substr(trim(lower(substr(text, 1, 14))), 1, 5)
        |      || substr(trim(lower(substr(text, 1, 14))), 7)
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 4 = 0),
        |nn AS (SELECT doc_id, name FROM n WHERE length(name) > 0)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM nn a JOIN nn b ON b.doc_id > a.doc_id
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // the keyed-hash construction replayed: two hex nibbles of
    // md5(key || '/i:' || prefix) per octet, hex→dec via strpos
    "q202_ip_anonymize" -> {
      def hx(expr: String, pos: Int): String =
        s"(strpos('0123456789abcdef', substr($expr, $pos, 1)) - 1)"
      def oct(i: Int): String = {
        val h = s"md5('graft-demo-key' || '/$i:' || " +
          s"array_to_string(list_slice(p, 1, $i), '.'))"
        s"CAST(${hx(h, 1)} * 16 + ${hx(h, 2)} AS VARCHAR)"
      }
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN '999.1.2.3'
         |         WHEN doc_id % 13 = 0 THEN '-'
         |         ELSE '10.' || (doc_id % 7) || '.' || (doc_id % 5)
         |           || '.' || (doc_id % 3) END AS ip
         |  FROM documents WHERE doc_id IS NOT NULL),
         |o AS (
         |  SELECT doc_id, ip, string_split(ip, '.') AS p,
         |    regexp_matches(ip,
         |      '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$$')
         |    AND NOT EXISTS (SELECT 1 FROM unnest(string_split(ip, '.')) AS u(t)
         |                    WHERE lpad(t, 3, '0') > '255') AS ok
         |  FROM base)
         |SELECT doc_id, ip AS remote_ip,
         |  CASE WHEN ok THEN
         |    ${oct(1)} || '.' || ${oct(2)} || '.' || ${oct(3)} || '.' || ${oct(4)}
         |  END AS anon_ip
         |FROM o
         |ORDER BY doc_id""".stripMargin
    },

    // the same exact integer apportionment in HUGEINT
    "q203_crawl_budget" ->
      """WITH m AS (
        |  SELECT 'd' || (doc_id % 7) AS domain,
        |    CAST(sum(n_chars) AS HUGEINT) AS w
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1
        |  HAVING sum(n_chars) > 0),
        |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM m),
        |b AS (
        |  SELECT m.domain, (m.w * 10007) AS p,
        |    ((m.w * 10007) - ((m.w * 10007) % t.tw)) / t.tw AS base,
        |    (m.w * 10007) % t.tw AS rem
        |  FROM m, t),
        |d AS (SELECT CAST(10007 - sum(base) AS BIGINT) AS deficit FROM b),
        |r AS (
        |  SELECT domain, base,
        |    row_number() OVER (ORDER BY rem DESC, domain ASC) AS rk
        |  FROM b)
        |SELECT r.domain,
        |  CAST(r.base + CASE WHEN r.rk <= d.deficit THEN 1 ELSE 0 END
        |    AS BIGINT) AS allocated
        |FROM r, d
        |ORDER BY r.domain""".stripMargin,

    // chained: digest-group text edges + the q175 closed-form image
    // pairs, then min-label reachability (the q49 recursive pattern)
    "q204_multimodal_dedup" -> {
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id + 20000, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 9 = 0),
         |g AS (
         |  SELECT md5(text) AS dg, min(doc_id) AS k, count(*) AS n
         |  FROM all_docs GROUP BY 1),
         |te AS (
         |  SELECT a.doc_id AS a, g.k AS b
         |  FROM all_docs a JOIN g ON md5(a.text) = g.dg
         |  WHERE g.n > 1 AND a.doc_id <> g.k),
         |${imageHashCtes(
            "((d.doc_id // 8) * 31 + u.x * u.x" +
            " + (3 + (d.doc_id // 8) % 5) * u.x * v.y" +
            " + (7 + (d.doc_id // 8) % 11) * v.y" +
            " + CASE WHEN u.x = 2 * (d.doc_id % 8) AND v.y = d.doc_id % 8" +
            " THEN 96 ELSE 0 END) % 256")},
         |hh AS (
         |  SELECT doc_id, ${hugeToLong("h")} AS dhash FROM dh),
         |ie AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM hh a JOIN hh b ON b.doc_id > a.doc_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6),
         |e AS (SELECT a, b FROM te UNION SELECT a, b FROM ie),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
         |SELECT x AS doc_id, min(y) AS cluster
         |FROM r
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    },

    // the same glob→LIKE translation and longest-pattern/allow-ties max
    "q205_robots_wildcard" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      || '/x' || (doc_id % 3)
        |      || (CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END) AS url,
        |    'd' || (doc_id % 7) || '.example.com' AS host,
        |    '/p' || (doc_id % 5) || '/x' || (doc_id % 3)
        |      || (CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END) AS path
        |  FROM documents WHERE doc_id IS NOT NULL),
        |r AS (
        |  SELECT DISTINCT 'd' || (doc_id % 7) || '.example.com' AS host,
        |    CASE doc_id % 9
        |      WHEN 0 THEN '/p0*' WHEN 1 THEN '/p1/*1' WHEN 2 THEN '/*.html$'
        |      WHEN 3 THEN '/p2' WHEN 4 THEN '/p3/x*' WHEN 5 THEN '/p4*2$'
        |      WHEN 6 THEN '/p0/x0$' WHEN 7 THEN '/*2.html$'
        |      ELSE '/p1' END AS rp,
        |    CASE doc_id % 9
        |      WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
        |      WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN true
        |      WHEN 6 THEN true WHEN 7 THEN true ELSE false END AS allow
        |  FROM documents WHERE doc_id IS NOT NULL),
        |rl AS (
        |  SELECT host, rp, allow,
        |    (CASE WHEN rp LIKE '%$' THEN
        |       replace(regexp_replace(substr(rp, 1, length(rp) - 1),
        |         '([%_#])', '#\1', 'g'), '*', '%')
        |     ELSE
        |       replace(regexp_replace(rp, '([%_#])', '#\1', 'g'), '*', '%')
        |       || '%' END) AS lk
        |  FROM r),
        |scored AS (
        |  SELECT u.doc_id,
        |    max(2 * length(rl.rp) + CASE WHEN rl.allow THEN 1 ELSE 0 END)
        |      AS score
        |  FROM u JOIN rl ON rl.host = u.host
        |  WHERE u.path LIKE rl.lk ESCAPE '#'
        |  GROUP BY u.doc_id)
        |SELECT u.doc_id, u.url,
        |  coalesce(s.score % 2 = 1, true) AS allowed,
        |  CAST(coalesce(s.score // 2, 0) AS BIGINT) AS matched_len
        |FROM u LEFT JOIN scored s ON s.doc_id = u.doc_id
        |ORDER BY u.doc_id""".stripMargin,

    // both versions rebuilt, changed = text differs, same levenshtein
    "q206_change_magnitude" ->
      """WITH pn AS (
        |  SELECT doc_id, text AS ptext,
        |    CASE WHEN doc_id % 11 = 0 THEN 'edited: ' || text
        |         WHEN doc_id % 13 = 0 THEN replace(text, 'e', '3')
        |         ELSE text END AS ntext
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |    AND doc_id % 17 <> 0 AND doc_id % 19 <> 0)
        |SELECT doc_id,
        |  CAST(levenshtein(ptext, ntext) AS BIGINT) AS dist,
        |  CAST(levenshtein(ptext, ntext) * 1000000
        |    // greatest(length(ntext), length(ptext), 1) AS BIGINT) AS rel_e6
        |FROM pn WHERE ptext <> ntext
        |ORDER BY doc_id""".stripMargin,

    // the same strictly-below running count over distinct scores
    "q207_quality_percentile" -> {
      s"""WITH d AS (
         |  SELECT doc_id, ${qualityScoreSql("text")} AS score
         |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |ps AS (SELECT score, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
         |wb AS (
         |  SELECT score,
         |    CAST(coalesce(sum(n) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS below
         |  FROM ps),
         |t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM d)
         |SELECT d.doc_id, d.score, wb.below AS n_below,
         |  CAST(wb.below * 1000000 // t.tot AS BIGINT) AS pct_e6
         |FROM d JOIN wb ON wb.score = d.score, t
         |ORDER BY d.doc_id""".stripMargin
    },

    // the same event-time range window and exact ratios
    "q208_burst_signals" ->
      s"""WITH e AS ($EventsCte),
         |b AS (
         |  SELECT user_id, epoch(ts) AS sec,
         |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
         |  FROM e WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |w AS (
         |  SELECT user_id, err,
         |    count(*) OVER (PARTITION BY user_id ORDER BY sec
         |      RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS burst
         |  FROM b)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(err) AS BIGINT) AS n_errors,
         |  CAST(max(burst) AS BIGINT) AS max_burst,
         |  CAST(CAST(sum(err) AS BIGINT) * 1000000 // count(*) AS BIGINT)
         |    AS error_ratio_e6,
         |  (max(burst) >= 2 OR
         |   CAST(sum(err) AS BIGINT) * 1000000 // count(*) >= 250000)
         |    AS is_suspect
         |FROM w GROUP BY user_id
         |ORDER BY user_id""".stripMargin,

    // the q19 session CTEs + an ORDER BY inside string_agg
    "q209_session_paths" ->
      s"""WITH e AS ($EventsCte),
         |x AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev_us
         |  FROM e
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
         |y AS (
         |  SELECT user_id, event_id, event_type, us,
         |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
         |      THEN 1 ELSE 0 END AS is_new
         |  FROM x),
         |z AS (
         |  SELECT user_id, event_id, event_type, us,
         |    sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
         |      ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM y),
         |p AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
         |    ORDER BY us, event_id) AS rn
         |  FROM z)
         |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(min(us) AS BIGINT) AS start_us,
         |  CAST(max(us) AS BIGINT) AS end_us,
         |  CAST(max(us) - min(us) AS BIGINT) AS duration_us,
         |  string_agg(CASE WHEN rn <= 64 THEN event_type END, '>'
         |    ORDER BY us, event_id) AS path
         |FROM p GROUP BY user_id, sess_id
         |ORDER BY user_id, sess_id""".stripMargin,

    // every field rebuilt from unnested lines/grams; binary string
    // order on gram ties matches the kernel's UTF-8 byte compare
    "q210_repetition_signals" -> {
      def gramCtes(n: Int): String =
        s"""g$n AS (
           |  SELECT doc_id, array_to_string(list_slice(toks, u.i, u.i + ${n - 1}), ' ') AS g
           |  FROM w, unnest(generate_series(1, len(toks) - ${n - 1})) AS u(i)
           |  WHERE len(toks) >= $n),
           |gc$n AS (
           |  SELECT doc_id, g, count(*) AS c, length(g) AS glen
           |  FROM g$n GROUP BY doc_id, g)""".stripMargin
      val tops = (2 to 4).map { n =>
        s"""t$n AS (
           |  SELECT doc_id, CAST(c * glen AS BIGINT) AS top_gram_chars_$n
           |  FROM (SELECT doc_id, c, glen,
           |          row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, g ASC) AS rn
           |        FROM gc$n) WHERE rn = 1)""".stripMargin
      }
      val dups = (5 to 10).map { n =>
        s"""u$n AS (
           |  SELECT doc_id,
           |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * glen END), 0)
           |      AS BIGINT) AS dup_gram_chars_$n
           |  FROM gc$n GROUP BY doc_id)""".stripMargin
      }
      def flag(num: String, den: String, pct: Int, name: String): String =
        s"($den > 0 AND $num * 100 > $den * $pct) AS $name"
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |w AS (
         |  SELECT doc_id, list_filter(
         |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
         |    x -> x <> '') AS toks
         |  FROM d),
         |base AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(CASE WHEN len(toks) = 0 THEN 0
         |      ELSE list_sum(list_transform(toks, x -> length(x)))
         |           + len(toks) - 1 END AS BIGINT) AS text_chars
         |  FROM w),
         |rawlines AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(u.l, '^[ \\t\\f\\r]+', ''),
         |      '[ \\t\\f\\r]+$$', '') AS line
         |  FROM d, unnest(string_split(text, chr(10))) AS u(l)),
         |lc AS (
         |  SELECT doc_id, line, count(*) AS c, length(line) AS llen
         |  FROM rawlines WHERE line <> '' GROUP BY doc_id, line),
         |lagg AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
         |      AS dup_line_count,
         |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * llen END), 0) AS BIGINT)
         |      AS dup_line_chars,
         |    CAST(sum(c * llen) AS BIGINT) AS line_chars_total
         |  FROM lc GROUP BY doc_id),
         |${gramCtes(2)}, ${gramCtes(3)}, ${gramCtes(4)},
         |${gramCtes(5)}, ${gramCtes(6)}, ${gramCtes(7)},
         |${gramCtes(8)}, ${gramCtes(9)}, ${gramCtes(10)},
         |${tops.mkString(",\n")},
         |${dups.mkString(",\n")}
         |SELECT b.doc_id, b.n_words, b.text_chars,
         |  coalesce(l.n_lines, 0) AS n_lines,
         |  coalesce(l.dup_line_count, 0) AS dup_line_count,
         |  coalesce(l.dup_line_chars, 0) AS dup_line_chars,
         |  coalesce(l.line_chars_total, 0) AS line_chars_total,
         |  ${(2 to 4).map(n => s"coalesce(t$n.top_gram_chars_$n, 0) AS top_gram_chars_$n").mkString(",\n         |  ")},
         |  ${(5 to 10).map(n => s"coalesce(u$n.dup_gram_chars_$n, 0) AS dup_gram_chars_$n").mkString(",\n         |  ")},
         |  ${flag("coalesce(l.dup_line_count, 0)", "coalesce(l.n_lines, 0)", 30, "flag_dup_line")},
         |  ${flag("coalesce(l.dup_line_chars, 0)", "coalesce(l.line_chars_total, 0)", 20, "flag_dup_line_char")},
         |  ${flag("coalesce(t2.top_gram_chars_2, 0)", "b.text_chars", 20, "flag_top_2gram")},
         |  ${flag("coalesce(t3.top_gram_chars_3, 0)", "b.text_chars", 18, "flag_top_3gram")},
         |  ${flag("coalesce(t4.top_gram_chars_4, 0)", "b.text_chars", 16, "flag_top_4gram")},
         |  ${flag("coalesce(u5.dup_gram_chars_5, 0)", "b.text_chars", 15, "flag_dup_5gram")},
         |  ${flag("coalesce(u6.dup_gram_chars_6, 0)", "b.text_chars", 14, "flag_dup_6gram")},
         |  ${flag("coalesce(u7.dup_gram_chars_7, 0)", "b.text_chars", 13, "flag_dup_7gram")},
         |  ${flag("coalesce(u8.dup_gram_chars_8, 0)", "b.text_chars", 12, "flag_dup_8gram")},
         |  ${flag("coalesce(u9.dup_gram_chars_9, 0)", "b.text_chars", 11, "flag_dup_9gram")},
         |  ${flag("coalesce(u10.dup_gram_chars_10, 0)", "b.text_chars", 10, "flag_dup_10gram")}
         |FROM base b
         |LEFT JOIN lagg l USING (doc_id)
         |${(2 to 4).map(n => s"LEFT JOIN t$n USING (doc_id)").mkString("\n         |")}
         |${(5 to 10).map(n => s"LEFT JOIN u$n USING (doc_id)").mkString("\n         |")}
         |ORDER BY doc_id""".stripMargin
    },

    // identical HTML synthesis; RE2 block scan with ordinality; the
    // q85 stripHtml chain replayed on the anchor slice
    "q211_html_links" -> {
      // nested q85 strip chain over an expression (entity order matters:
      // &amp; last)
      def strip(e: String): String =
        s"""trim(regexp_replace(
           |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |      regexp_replace(
           |        regexp_replace(
           |          regexp_replace(
           |            regexp_replace(
           |              regexp_replace($e, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
           |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
           |            '(?s)<!--.*?-->', ' ', 'g'),
           |          '<[^>]+>', ' ', 'g'),
           |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
           |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
           |      '\\s+', ' ', 'g'))""".stripMargin
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><body><p>intro</p><a href="https://d' || (doc_id % 7)
         |    || '.example.com/p' || (doc_id % 5)
         |    || '">Link <b>' || (doc_id % 3) || '</b> text</a>'
         |    || '<a class=''x'' rel=''nofollow'' href=''/rel/' || (doc_id % 4)
         |    || '''>Rel &amp; anchor</a>'
         |    || CASE WHEN doc_id % 2 = 0
         |         THEN '<A HREF="../up/q.html">Up</A>' ELSE '' END
         |    || '<a name="skip">no href</a></body></html>' AS html
         |  FROM documents WHERE doc_id IS NOT NULL),
         |b AS (
         |  SELECT doc_id,
         |    regexp_extract_all(html,
         |      '(?is)<a\\s[^>]*href\\s*=\\s*(?:"[^"]*"|''[^'']*'')[^>]*>.*?</a>', 0) AS l
         |  FROM h),
         |e AS (
         |  SELECT doc_id, CAST(u.i - 1 AS INT) AS link_index, l[u.i] AS blk
         |  FROM b, unnest(generate_series(1, len(l))) AS u(i))
         |SELECT doc_id, link_index,
         |  CASE WHEN regexp_extract(blk, '(?is)href\\s*=\\s*"([^"]*)"', 1) <> ''
         |    THEN regexp_extract(blk, '(?is)href\\s*=\\s*"([^"]*)"', 1)
         |    ELSE regexp_extract(blk, '(?is)href\\s*=\\s*''([^'']*)''', 1) END
         |    AS href,
         |  ${strip("regexp_extract(blk, '(?is)^<a\\s[^>]*>(.*)</a>$$', 1)")} AS anchor,
         |  regexp_matches(regexp_extract(blk, '(?is)^(<a\\s[^>]*>)', 1),
         |    '(?is)rel\\s*=\\s*("[^"]*nofollow[^"]*"|''[^'']*nofollow[^'']*'')')
         |    AS nofollow
         |FROM e
         |ORDER BY doc_id, link_index""".stripMargin
    },

    // the same join + dot-fold regex chain, nested textually
    "q212_href_resolve" -> {
      val origin = "regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
      val scheme = "regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)"
      val basePath =
        "regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
      val baseDir =
        s"CASE WHEN $basePath = '' THEN '/' ELSE regexp_replace($basePath, '[^/]*$$', '') END"
      val pathOrSlash = s"CASE WHEN $basePath = '' THEN '/' ELSE $basePath END"
      val baseQuery = "regexp_extract(base, '^[^?#]*(\\?[^#]*)', 1)"
      val joined =
        s"""CASE
           |    WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN href
           |    WHEN href LIKE '//%' THEN $scheme || ':' || href
           |    WHEN href LIKE '/%' THEN $origin || href
           |    WHEN href LIKE '?%' THEN $origin || $pathOrSlash || href
           |    WHEN href LIKE '#%' OR href = ''
           |      THEN $origin || $pathOrSlash || $baseQuery
           |    ELSE $origin || $baseDir || href END""".stripMargin
      val noFrag = s"regexp_replace($joined, '#.*$$', '')"
      val jOrigin =
        s"regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
      val jRest =
        s"regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$$', 1)"
      val dotFolded = (1 to 8).foldLeft(
        (1 to 8).foldLeft(jRest)((c, _) =>
          s"regexp_replace($c, '/\\.(/|$$)', '/', 'g')")) { (c, _) =>
        s"regexp_replace($c, '/(\\.[^/.][^/]*|\\.\\.[^/]+|[^/.][^/]*)/\\.\\.(/|$$)', '/', 'g')"
      }
      val clamped = s"regexp_replace($dotFolded, '^/(\\.\\./)*(\\.\\.$$)?', '/', 'g')"
      s"""WITH d AS (
         |  SELECT doc_id,
         |    'https://h' || (doc_id % 5) || '.example.com/a' || (doc_id % 3)
         |      || '/b/c.html?q=' || (doc_id % 2) AS base,
         |    (['https://abs.example.com/z', '//cdn.example.com/j.js',
         |      '/rooted.html', '?p=2', '#frag', 'd.html', './e.html',
         |      '../up.html', '../../../../past.html',
         |      'sub/deep.html#x', ''])[(doc_id % 11) + 1] AS href
         |  FROM documents WHERE doc_id IS NOT NULL)
         |SELECT doc_id, base, href, $jOrigin || $clamped AS resolved
         |FROM d
         |ORDER BY doc_id""".stripMargin
    },

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

    // count frames + the verbatim fixed probability shape:
    // (c−D)/cv + (D·(n1v/cv))·(n1w/nall)
    "q215_kneser_ney" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |bi AS (
        |  SELECT doc_id, u.v AS v, u.w AS w
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'v': t[i], 'w': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |cvw AS (SELECT v, w, count(*) AS cvw FROM bi GROUP BY 1, 2),
        |cv AS (SELECT v, count(*) AS cv FROM bi GROUP BY 1),
        |n1v AS (SELECT v, count(*) AS n1v FROM cvw GROUP BY 1),
        |n1w AS (SELECT w, count(*) AS n1w FROM cvw GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nall FROM cvw),
        |sc AS (
        |  SELECT bi.doc_id,
        |    CAST(floor(ln(
        |      ((CAST(cvw.cvw AS DOUBLE) - 0.75) / CAST(cv.cv AS DOUBLE))
        |      + ((0.75 * (CAST(n1v.n1v AS DOUBLE) / CAST(cv.cv AS DOUBLE)))
        |         * (CAST(n1w.n1w AS DOUBLE) / (SELECT nall FROM tot)))
        |    ) * 1e12) AS BIGINT) AS lp
        |  FROM bi JOIN cvw USING (v, w) JOIN cv USING (v)
        |    JOIN n1v USING (v) JOIN n1w USING (w))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1e6) AS BIGINT)
        |    AS score_e6
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // identical body synthesis; line typing + lag group ids +
    // exact-beats-star replayed
    "q216_robots_parse" ->
      """WITH r AS (
        |  SELECT 'd' || doc_id AS domain,
        |    '# fetched' || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      'User-agent: graftbot' || chr(10) ||
        |      'Disallow: /g' || (doc_id % 5) || '/' || chr(10) ||
        |      'Allow: /g' || (doc_id % 5) || '/pub' || chr(10) ||
        |      'Crawl-delay: ' || (doc_id % 4) || chr(10) || chr(10)
        |    ELSE '' END ||
        |    'User-agent: *' || chr(10) ||
        |    'Disallow: /x' || (doc_id % 3) || '/' || chr(10) ||
        |    'Disallow:' || chr(10) ||
        |    'Sitemap: https://d' || (doc_id % 7) || '.example.com/sitemap.xml'
        |    AS body
        |  FROM documents WHERE doc_id IS NOT NULL),
        |lines AS (
        |  SELECT domain, CAST(u.i AS INT) AS i,
        |    trim(regexp_replace(ls[u.i], '#.*$', '')) AS l
        |  FROM (SELECT domain, string_split(body, chr(10)) AS ls FROM r),
        |    unnest(generate_series(1, len(ls))) AS u(i)),
        |typed AS (
        |  SELECT domain, i, l,
        |    lower(regexp_extract(l, '(?i)^user-agent\s*:\s*(\S+)', 1)) AS ua
        |  FROM lines),
        |t2 AS (
        |  SELECT *, (ua <> '') AS isua,
        |    CASE WHEN ua <> '' AND NOT coalesce(
        |      lag(ua <> '') OVER (PARTITION BY domain ORDER BY i), false)
        |      THEN 1 ELSE 0 END AS newg
        |  FROM typed),
        |t3 AS (
        |  SELECT *, sum(newg) OVER (PARTITION BY domain ORDER BY i
        |    ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM t2),
        |grps AS (
        |  SELECT domain, grp,
        |    max(CASE WHEN ua = 'graftbot' THEN 1 ELSE 0 END) AS ex,
        |    max(CASE WHEN ua = '*' THEN 1 ELSE 0 END) AS st
        |  FROM t3 WHERE isua GROUP BY 1, 2),
        |de AS (SELECT domain, max(ex) AS hasex FROM grps GROUP BY 1),
        |app AS (
        |  SELECT t3.domain, t3.l,
        |    coalesce(CASE WHEN de.hasex = 1 THEN g.ex = 1 ELSE g.st = 1 END,
        |      false) AS applies
        |  FROM t3 LEFT JOIN grps g USING (domain, grp)
        |    LEFT JOIN de USING (domain))
        |SELECT domain,
        |  CASE WHEN al <> '' THEN al ELSE dis END AS rule_path,
        |  (al <> '') AS allow
        |FROM (
        |  SELECT domain, applies,
        |    regexp_extract(l, '(?i)^allow\s*:\s*(\S+)', 1) AS al,
        |    regexp_extract(l, '(?i)^disallow\s*:\s*(\S+)', 1) AS dis
        |  FROM app)
        |WHERE applies AND (al <> '' OR dis <> '')
        |ORDER BY domain, rule_path""".stripMargin,

    // each link's canonical target in closed form — the engine must
    // reproduce it through the real extract→resolve→canonicalize chain
    "q217_link_frontier" ->
      """WITH t AS (
        |  SELECT doc_id, unnest([
        |    'https://s' || (doc_id % 6) || '.example.com/dir' || (doc_id % 3)
        |      || '/art' || (doc_id % 8) || '.html',
        |    'https://s' || (doc_id % 6) || '.example.com/shared/hub.html?ref='
        |      || (doc_id % 4),
        |    'https://s' || (doc_id % 6) || '.example.com/dir'
        |      || ((doc_id + 1) % 3) || '/other.html'
        |  ]) AS target
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT target, CAST(count(*) AS BIGINT) AS n_refs,
        |  min(doc_id) AS first_referrer
        |FROM t GROUP BY target
        |ORDER BY target""".stripMargin,

    // same segmentation/token/vowel-group counts; the score shape
    // replayed verbatim
    "q218_readability" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS canon
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(canon, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_words,
        |    CAST(len(list_filter(list_transform(
        |        string_split_regex(text, '[.!?]+'),
        |        s -> trim(s)), s -> s <> '')) AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(canon, '[aeiouy]+', 0)) AS BIGINT)
        |      AS n_syllables
        |  FROM d)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
        |    CAST(floor(1000.0 * (206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
        |      AS BIGINT)
        |  END AS flesch_e3
        |FROM c ORDER BY doc_id""".stripMargin,

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

    // per-token replay: same starts, same stream order, same windows
    "q220_pack_concat" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |    list_append(list_filter(
        |      string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> ''), '<eos>') AS t
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |st AS (
        |  SELECT *, sum(len(t)) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - len(t) AS strt
        |  FROM d),
        |tok AS (
        |  SELECT shard, strt + u.i - 1 AS pos, t[u.i] AS tok
        |  FROM st, unnest(generate_series(1, len(t))) AS u(i))
        |SELECT shard, CAST(pos // 128 AS BIGINT) AS seq_index,
        |  string_agg(tok, ' ' ORDER BY pos) AS seq_text,
        |  CAST(count(*) AS BIGINT) AS n_seq_tokens
        |FROM tok GROUP BY 1, 2
        |ORDER BY shard, seq_index""".stripMargin,

    // closed-form allowed set + offsets: /pX allowed iff X != h%3 or
    // the /p(h%3)9 allow-exception; delay = (h+1) s
    "q222_robots_politeness" ->
      """WITH d0 AS (
        |  SELECT doc_id, doc_id % 7 AS h, doc_id % 5 AS p
        |  FROM documents WHERE doc_id IS NOT NULL),
        |u AS (
        |  SELECT doc_id, h, 'd' || h || '.example.com' AS host,
        |    'https://d' || h || '.example.com' ||
        |    CASE WHEN doc_id % 11 = 0 THEN '/p' || (h % 3) || '9'
        |         ELSE '/p' || p END AS url,
        |    (doc_id % 11 = 0 OR p <> (h % 3)) AS ok
        |  FROM d0),
        |r AS (
        |  SELECT doc_id, url, host, h,
        |    CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) - 1
        |      AS BIGINT) AS fetch_seq
        |  FROM u WHERE ok)
        |SELECT doc_id, url, host, fetch_seq,
        |  CAST(fetch_seq * ((h + 1) * 1000) AS BIGINT) AS fetch_offset_ms
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    // boundaries: round(0.9*65536)=58982=0xe666, round(0.95*65536)=
    // 62259=0xf333; last split takes the rest
    "q221_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |         THEN 'train'
        |       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    "q223_retention_cohorts" ->
      s"""WITH e AS ($EventsCte),
         |a AS (
         |  SELECT DISTINCT user_id AS ue, CAST(ts AS DATE) AS day
         |  FROM e WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |c AS (
         |  SELECT ue, day, min(day) OVER (PARTITION BY ue) AS cohort_day
         |  FROM a),
         |cells AS (
         |  SELECT cohort_day,
         |    CAST(day - cohort_day AS INT) AS offset_days,
         |    CAST(count(*) AS BIGINT) AS n_active
         |  FROM c WHERE day - cohort_day <= 14
         |  GROUP BY 1, 2)
         |SELECT cohort_day, offset_days, n_active,
         |  CAST(max(CASE WHEN offset_days = 0 THEN n_active END)
         |    OVER (PARTITION BY cohort_day) AS BIGINT) AS cohort_size,
         |  CAST(n_active * 1000000 //
         |    max(CASE WHEN offset_days = 0 THEN n_active END)
         |      OVER (PARTITION BY cohort_day) AS BIGINT) AS retention_e6
         |FROM cells
         |ORDER BY cohort_day, offset_days""".stripMargin,

    // CMS replay: same md5 hex slices decoded via ascii fold, same
    // % width buckets, same min-over-4-slices with absent cells = 0
    "q224_cms_heavy_hitters" -> cmsOracle(width = 1024, probeMod = 97,
      minCount = 60),

    // the streaming accumulator's cell-wise mergeability makes the
    // fold-3-batches result equal the ONE-SHOT corpus sketch — the
    // oracle replays the one-shot form (batch membership by doc_id % 3
    // is irrelevant to the merged counters, which is the point)
    "q225_stream_cms" -> cmsOracle(width = 512, probeMod = 89,
      minCount = 80),

    // deterministic layout (one file per l_returnflag, one row group per
    // file at gate scale) makes the parquet FOOTERS data-derivable: the
    // expected (n_rows, min, max) per group is a plain aggregate
    "q226_layout_audit" ->
      """SELECT l_returnflag, 0 AS row_group,
        |  count(*) AS n_rows,
        |  min(l_orderkey) AS min_orderkey,
        |  max(l_orderkey) AS max_orderkey
        |FROM lineitem
        |GROUP BY 1
        |ORDER BY 1, 2""".stripMargin,

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

    "q233_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS group_size,
        |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_distinct,
        |  (count(*) < 12 OR count(DISTINCT c_acctbal) < 5) AS at_risk
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

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

    "q235_hll_distinct" -> HllOracle,

    // the batch-split-invariance claim IS the oracle: the streamed
    // reservoir must equal the one-shot bottom-k of the whole corpus
    "q236_stream_reservoir" ->
      """SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS priority
        |FROM (SELECT DISTINCT event_id FROM events WHERE event_id IS NOT NULL)
        |ORDER BY priority, event_id
        |LIMIT 100""".stripMargin,

    "q237_compaction_plan" ->
      """WITH files AS (
        |  SELECT part, 'f' || lpad(CAST(bkt AS VARCHAR), 3, '0') AS file,
        |    CAST(sum(q) * 1000 AS BIGINT) AS bytes
        |  FROM (SELECT l_returnflag AS part,
        |          CAST(l_orderkey % 20 AS INT) AS bkt,
        |          CAST(l_quantity AS BIGINT) AS q
        |        FROM lineitem) t
        |  GROUP BY 1, 2),
        |cum AS (
        |  SELECT part, file, bytes,
        |    sum(bytes) OVER (PARTITION BY part ORDER BY file
        |      ROWS UNBOUNDED PRECEDING) AS c
        |  FROM files),
        |g AS (
        |  SELECT part, file, bytes,
        |    CAST((c - bytes) // 100000000 AS INT) AS grp
        |  FROM cum)
        |SELECT part, grp,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS bytes,
        |  min(file) AS first_file, max(file) AS last_file,
        |  (count(*) > 1) AS rewrite
        |FROM g
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q238_hdr_quantiles" -> HdrOracle,
    "q239_bloom_filter" -> BloomOracle,
    "q240_kmv_distinct" -> KmvOracle,
    "q241_ams_sketch" -> AmsOracle,
    "q242_stream_bloom" -> StreamBloomOracle,
    "q243_ip_cidr_lookup" -> CidrOracle,
    "q244_count_sketch" -> CountSketchOracle,
    "q245_misra_gries" -> MisraGriesOracle,
    "q246_dp_counts" -> DpCountsOracle,
    "q247_stream_hdr" -> StreamHdrOracle,
    "q248_zonemap_prune" -> ZoneMapOracle,
    "q249_hll_by_group" -> HllByGroupOracle,
    "q250_hdr_by_group" -> HdrByGroupOracle,
    "q251_kmv_set_algebra" -> KmvSetAlgebraOracle,
    "q252_stream_hll" -> StreamHllOracle,
    "q253_interleaving" -> InterleavingOracle,
    "q254_poisson_bootstrap" -> BootstrapOracle,
    "q255_consistent_hash" -> RingOracle,

    /* Avro replay (q256): the round trip is lossless by the format, so
     * the oracle is the DIRECT per-container aggregate of the source
     * rows — any encode/decode corruption (dropped record, mangled
     * field, wrong container routing) breaks a count, a sum or a key
     * bound. */
    "q256_avro_roundtrip" ->
      s"""SELECT o_orderkey % 4 AS container_id,
         |  CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)
         |    AS sum_tp,
         |  min(o_orderkey) AS min_k, max(o_orderkey) AS max_k,
         |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status
         |FROM orders
         |WHERE o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL
         |  AND o_totalprice IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q257_bootstrap_ab" -> BootstrapAbOracle
  )

  /** Paired-bootstrap replay (q257): the [[BootstrapOracle]] draw
    * machinery per (variant, replicate), per-replicate mean
    * differences joined ON the replicate id (the pairing), rank-pick
    * CI, and the significance predicate — all from the same inlined
    * thresholds.
    */
  private val BootstrapAbOracle: String = {
    val b = 64
    val list = ext.Bootstrap.PoissonThresholds.mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT event_type AS g, event_id AS id,
       |    CAST(floor(value * 100) AS BIGINT) AS v
       |  FROM events
       |  WHERE event_id IS NOT NULL AND value IS NOT NULL
       |    AND event_type IN ('click', 'purchase')),
       |draws AS (
       |  SELECT e.g, b.b, e.v,
       |    md5('boot-v1|' || CAST(b.b AS VARCHAR) || '|'
       |      || CAST(e.id AS VARCHAR)) AS hx
       |  FROM ev e CROSS JOIN (SELECT unnest(range($b)) AS b) b),
       |mult AS (
       |  SELECT g, b, v, CAST(len(list_filter($list,
       |    t -> t <= ${hexFold("1", 12)})) AS BIGINT) AS m
       |  FROM draws),
       |reps AS (
       |  SELECT g, b, CAST(sum(m) AS BIGINT) AS n_eff,
       |    CAST(sum(m * v) AS BIGINT) AS total
       |  FROM mult GROUP BY 1, 2),
       |means AS (
       |  SELECT g, b, CAST(total AS DOUBLE) / CAST(n_eff AS DOUBLE)
       |    AS mean
       |  FROM reps WHERE n_eff > 0),
       |diffs AS (
       |  SELECT a.b, p.mean - a.mean AS mean
       |  FROM (SELECT b, mean FROM means WHERE g = 'click') a
       |  JOIN (SELECT b, mean FROM means WHERE g = 'purchase') p
       |    USING (b)),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM diffs),
       |ranked AS (
       |  SELECT mean, row_number() OVER (ORDER BY mean, b) AS rk
       |  FROM diffs),
       |ci AS (
       |  SELECT
       |    max(CASE WHEN rk = greatest(1, CAST(ceil(0.025 * nb) AS BIGINT))
       |      THEN mean END) AS lo,
       |    max(CASE WHEN rk = greatest(1, CAST(ceil(0.5 * nb) AS BIGINT))
       |      THEN mean END) AS mid,
       |    max(CASE WHEN rk = greatest(1, CAST(ceil(0.975 * nb) AS BIGINT))
       |      THEN mean END) AS hi
       |  FROM ranked CROSS JOIN nb),
       |pt AS (
       |  SELECT
       |    CAST(sum(CASE WHEN g = 'click' THEN v END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN g = 'click' THEN 1 END) AS DOUBLE)
       |      AS mean_click,
       |    CAST(sum(CASE WHEN g = 'purchase' THEN v END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN g = 'purchase' THEN 1 END) AS DOUBLE)
       |      AS mean_purchase
       |  FROM ev)
       |SELECT lo, mid, hi, (lo > 0.0 OR hi < 0.0) AS significant,
       |  mean_click, mean_purchase
       |FROM ci CROSS JOIN pt""".stripMargin
  }

  /** Ring replay (q255): both rings' sorted (point, shard) tables —
    * built by the SAME Scala constructor the operator inlines — become
    * SQL list literals; the owner walk is the identical
    * filter-count-and-wrap, the baseline the identical md5-mod.
    */
  private val RingOracle: String = {
    def lists(n: Int): (String, String) = {
      val (p, sh) = ext.Ring.ringPoints(n, 64, "ring-v1")
      (p.mkString("[", ", ", "]"), sh.mkString("[", ", ", "]"))
    }
    val (p8, s8) = lists(8)
    val (p9, s9) = lists(9)
    def owner(points: String, shards: String, out: String): String =
      s"""$shards[CASE
         |  WHEN len(list_filter($points, p -> p < h))
         |    = len($points) THEN 1
         |  ELSE len(list_filter($points, p -> p < h)) + 1 END] AS $out"""
        .stripMargin
    s"""WITH k AS (
       |  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS k
       |  FROM orders WHERE o_orderkey IS NOT NULL),
       |h AS (SELECT k, ${hexFold("1", 12)} AS h
       |  FROM (SELECT k, md5(k) AS hx FROM k) t),
       |a AS (
       |  SELECT k, h,
       |    ${owner(p8, s8, "s8")},
       |    ${owner(p9, s9, "s9")},
       |    h % 8 AS m8, h % 9 AS m9
       |  FROM h),
       |loads AS (
       |  SELECT CAST(max(l) AS BIGINT) AS max_load8,
       |    CAST(min(l) AS BIGINT) AS min_load8
       |  FROM (SELECT s8, count(*) AS l FROM a GROUP BY 1) t),
       |mv AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |    CAST(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS moved_ring,
       |    CAST(sum(CASE WHEN s8 <> s9 AND s9 <> 8 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS moved_wrong,
       |    CAST(sum(CASE WHEN m8 <> m9 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS moved_mod
       |  FROM a)
       |SELECT n_keys, moved_ring, moved_wrong, moved_mod,
       |  max_load8, min_load8
       |FROM mv CROSS JOIN loads""".stripMargin
  }

  /** Poisson-bootstrap replay (q254): the SAME integer CDF thresholds
    * [[ext.Bootstrap.PoissonThresholds]] inlines into the Spark plan,
    * the same keyed 48-bit md5 uniform per (replicate, row), BIGINT
    * replicate sums, one double division per replicate, and the CI
    * picks as `row_number` ranks under `(mean, b)` order.
    */
  private val BootstrapOracle: String = {
    val b = 64
    val list = ext.Bootstrap.PoissonThresholds.mkString("[", ", ", "]")
    s"""WITH d AS (
       |  SELECT doc_id, CAST(n_chars AS BIGINT) AS v
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
       |draws AS (
       |  SELECT b.b, d.v,
       |    md5('boot-v1|' || CAST(b.b AS VARCHAR) || '|'
       |      || CAST(d.doc_id AS VARCHAR)) AS hx
       |  FROM d CROSS JOIN (SELECT unnest(range($b)) AS b) b),
       |mult AS (
       |  SELECT b, v, CAST(len(list_filter($list,
       |    t -> t <= ${hexFold("1", 12)})) AS BIGINT) AS m
       |  FROM draws),
       |reps AS (
       |  SELECT b, CAST(sum(m) AS BIGINT) AS n_eff,
       |    CAST(sum(m * v) AS BIGINT) AS total
       |  FROM mult GROUP BY 1),
       |means AS (
       |  SELECT b, CAST(total AS DOUBLE) / CAST(n_eff AS DOUBLE) AS mean
       |  FROM reps WHERE n_eff > 0),
       |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM means),
       |ranked AS (
       |  SELECT mean, row_number() OVER (ORDER BY mean, b) AS rk
       |  FROM means),
       |ci AS (
       |  SELECT
       |    max(CASE WHEN rk = greatest(1, CAST(ceil(0.025 * nb) AS BIGINT))
       |      THEN mean END) AS lo,
       |    max(CASE WHEN rk = greatest(1, CAST(ceil(0.5 * nb) AS BIGINT))
       |      THEN mean END) AS mid,
       |    max(CASE WHEN rk = greatest(1, CAST(ceil(0.975 * nb) AS BIGINT))
       |      THEN mean END) AS hi
       |  FROM ranked CROSS JOIN nb),
       |pt AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS point_mean
       |  FROM d)
       |SELECT lo, mid, hi, n_rows, point_mean
       |FROM ci CROSS JOIN pt""".stripMargin
  }

  /** Team-draft replay (q253): the six draft rounds unroll into CTE
    * pairs (counts → per-run best-unpicked → pick → selection union) —
    * the q232 MMR replay pattern; the tie coin and the click stand-in
    * are first-hex-char parities of keyed md5, folded with the same
    * integer CASE both engines share.
    */
  private val InterleavingOracle: String = {
    val rounds = 6
    def hex1(arg: String): String =
      s"(CASE WHEN ascii(substr(md5($arg), 1, 1)) >= 97 " +
        s"THEN ascii(substr(md5($arg), 1, 1)) - 87 " +
        s"ELSE ascii(substr(md5($arg), 1, 1)) - 48 END)"
    val roundCtes = (1 to rounds).map { r =>
      val coin = hex1(s"'tdi-v1|' || query || '|' || '$r'")
      s"""cnt$r AS (
         |  SELECT q.query,
         |    coalesce(sum(CASE WHEN s.team = 'A' THEN 1 ELSE 0 END), 0)
         |      AS na,
         |    coalesce(sum(CASE WHEN s.team = 'B' THEN 1 ELSE 0 END), 0)
         |      AS nb
         |  FROM queries q LEFT JOIN sel${r - 1} s ON q.query = s.query
         |  GROUP BY 1),
         |ca$r AS (
         |  SELECT a.query, a.doc FROM runa a
         |  LEFT JOIN sel${r - 1} s ON a.query = s.query AND a.doc = s.doc
         |  WHERE s.doc IS NULL
         |  QUALIFY row_number() OVER (PARTITION BY a.query
         |    ORDER BY a.rank) = 1),
         |cb$r AS (
         |  SELECT b.query, b.doc FROM runb b
         |  LEFT JOIN sel${r - 1} s ON b.query = s.query AND b.doc = s.doc
         |  WHERE s.doc IS NULL
         |  QUALIFY row_number() OVER (PARTITION BY b.query
         |    ORDER BY b.rank) = 1),
         |pk$r AS (
         |  SELECT query, doc, CAST($r AS INT) AS pos, team FROM (
         |    SELECT c.query,
         |      CASE WHEN c.ch THEN coalesce(a.doc, b.doc)
         |           ELSE coalesce(b.doc, a.doc) END AS doc,
         |      CASE WHEN c.ch AND a.doc IS NOT NULL THEN 'A'
         |           WHEN c.ch THEN 'B'
         |           WHEN b.doc IS NOT NULL THEN 'B' ELSE 'A' END AS team
         |    FROM (SELECT query, na, nb,
         |        CASE WHEN na < nb THEN TRUE WHEN na > nb THEN FALSE
         |          ELSE ($coin % 2) = 0 END AS ch
         |      FROM cnt$r) c
         |    LEFT JOIN ca$r a ON c.query = a.query
         |    LEFT JOIN cb$r b ON c.query = b.query) t
         |  WHERE doc IS NOT NULL),
         |sel$r AS (
         |  SELECT query, doc, pos, team FROM sel${r - 1}
         |  UNION ALL SELECT query, doc, pos, team FROM pk$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       |  SELECT 'g' || CAST(doc_id % 3 AS VARCHAR) AS query,
       |    doc_id AS doc, n_chars
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
       |runa AS (
       |  SELECT query, doc, rank FROM (
       |    SELECT query, doc, CAST(row_number() OVER (
       |      PARTITION BY query ORDER BY n_chars DESC, doc) AS BIGINT)
       |      AS rank
       |    FROM d) t
       |  WHERE rank <= 6),
       |runb AS (
       |  SELECT query, doc, rank FROM (
       |    SELECT query, doc, CAST(row_number() OVER (
       |      PARTITION BY query ORDER BY doc DESC) AS BIGINT) AS rank
       |    FROM d) t
       |  WHERE rank <= 6),
       |queries AS (
       |  SELECT DISTINCT query FROM (
       |    SELECT query FROM runa UNION ALL SELECT query FROM runb) t),
       |sel0 AS (
       |  SELECT CAST(NULL AS VARCHAR) AS query, CAST(NULL AS BIGINT) AS doc,
       |    CAST(NULL AS INT) AS pos, CAST(NULL AS VARCHAR) AS team
       |  WHERE FALSE),
       |$roundCtes
       |SELECT query, doc, pos, team,
       |  (${hex1("'click|' || CAST(doc AS VARCHAR)")} % 2) = 0 AS clicked
       |FROM sel$rounds
       |ORDER BY 1, 3""".stripMargin
  }

  /** Streaming-HLL replay (q252): per-batch register keys fold to the
    * same registers as sketching the batch-prefix (cumulative) or the
    * batch-window item sets directly — the max-merge law — so the
    * oracle rebuilds both register tables per batch id from the
    * [[HllByGroupOracle]] integer machinery with grp = batch id.
    */
  private val StreamHllOracle: String = {
    val p = 8; val m = 1 << p
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val aConst = alphaE6 * m.toLong * m
    def slice(j: Int): String = (0 until 8).map { i =>
      val pos = j * 8 + 1 + i
      val pw = math.pow(16, 7 - i).toLong
      s"CAST(CASE WHEN ascii(substr(hx, $pos, 1)) >= 97 " +
        s"THEN ascii(substr(hx, $pos, 1)) - 87 " +
        s"ELSE ascii(substr(hx, $pos, 1)) - 48 END AS BIGINT) * $pw"
    }.mkString("(", " + ", ")")
    val rhoCase = (1 to 32)
      .map(i => s"WHEN wb >= ${1L << (32 - i)} THEN $i").mkString(" ")
    def estSql(src: String, out: String): String =
      s"""regs_$out AS (
         |  SELECT bid, CAST(wa // ${1L << (32 - p)} AS INT) AS bucket,
         |    max(CASE $rhoCase ELSE 33 END) AS rho
         |  FROM $src GROUP BY 1, 2),
         |agg_$out AS (
         |  SELECT bid, CAST(count(*) AS BIGINT) AS nr,
         |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (40 - rho)), 0)
         |      AS BIGINT) AS s
         |  FROM regs_$out GROUP BY 1),
         |est_$out AS (
         |  SELECT bid, CAST($aConst AS DOUBLE) / 1000000.0
         |    * 1099511627776.0
         |    / CAST(s + ($m - nr) * (CAST(1 AS BIGINT) << 40) AS DOUBLE)
         |    AS $out
         |  FROM agg_$out)""".stripMargin
    s"""WITH ev AS (
       |  SELECT event_id % 3 AS b,
       |    'u' || CAST(user_id AS VARCHAR) || ':'
       |      || CAST(event_id % 50 AS VARCHAR) AS item
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |bat(bid) AS (VALUES (0), (1), (2)),
       |di AS (SELECT DISTINCT b, item FROM ev),
       |cum AS (
       |  SELECT DISTINCT bat.bid, di.item
       |  FROM di JOIN bat ON di.b <= bat.bid),
       |win AS (
       |  SELECT DISTINCT bat.bid, di.item
       |  FROM di JOIN bat ON di.b <= bat.bid AND di.b >= bat.bid - 1),
       |hc AS (SELECT bid, md5(item) AS hx FROM cum),
       |hw AS (SELECT bid, md5(item) AS hx FROM win),
       |wc AS (SELECT bid, ${slice(0)} AS wa, ${slice(1)} AS wb FROM hc),
       |ww AS (SELECT bid, ${slice(0)} AS wa, ${slice(1)} AS wb FROM hw),
       |${estSql("wc", "est_cum")},
       |${estSql("ww", "est_win")},
       |ex AS (
       |  SELECT bid,
       |    CAST(count(DISTINCT item) AS BIGINT) AS exact_cum
       |  FROM cum GROUP BY 1),
       |exw AS (
       |  SELECT bid,
       |    CAST(count(DISTINCT item) AS BIGINT) AS exact_win
       |  FROM win GROUP BY 1)
       |SELECT CAST(c.bid AS BIGINT) AS batch_id, c.est_cum, w.est_win,
       |  ex.exact_cum, exw.exact_win
       |FROM est_est_cum c JOIN est_est_win w USING (bid)
       |JOIN ex USING (bid) JOIN exw USING (bid)
       |ORDER BY 1""".stripMargin
  }

  /** KMV set-algebra replay (q251): the [[KmvOracle]] machinery plus
    * side-only survivor counts, difference scaling and the
    * `n_both / k_union` Jaccard estimator — the identical
    * multiply-then-divide association as the Spark expressions.
    */
  private val KmvSetAlgebraOracle: String = {
    val k = 256
    val num = (k - 1).toLong << 48
    s"""WITH $ParitySplitWordCtes,
       |da AS (SELECT DISTINCT word FROM wa),
       |db AS (SELECT DISTINCT word FROM wb),
       |ha AS (SELECT DISTINCT ${hexFold("1", 12)} AS h
       |  FROM (SELECT md5(word) AS hx FROM da) t),
       |hb AS (SELECT DISTINCT ${hexFold("1", 12)} AS h
       |  FROM (SELECT md5(word) AS hx FROM db) t),
       |ska AS (SELECT h FROM ha ORDER BY h LIMIT $k),
       |skb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
       |sku AS (
       |  SELECT DISTINCT h FROM (
       |    SELECT h FROM ska UNION ALL SELECT h FROM skb) t
       |  ORDER BY h LIMIT $k),
       |fl AS (
       |  SELECT u.h,
       |    CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS ina,
       |    CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS inb
       |  FROM sku u LEFT JOIN ska a ON u.h = a.h
       |    LEFT JOIN skb b ON u.h = b.h),
       |un AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_union,
       |    CAST(coalesce(sum(ina * inb), 0) AS BIGINT) AS n_both,
       |    CAST(coalesce(sum(ina * (1 - inb)), 0) AS BIGINT) AS n_only_a,
       |    CAST(coalesce(sum(inb * (1 - ina)), 0) AS BIGINT) AS n_only_b,
       |    coalesce(max(h), 0) AS kth
       |  FROM fl),
       |ue AS (
       |  SELECT *,
       |    CASE WHEN k_union < $k THEN CAST(k_union AS DOUBLE)
       |      ELSE CAST($num AS DOUBLE) / CAST(kth AS DOUBLE) END AS union_est
       |  FROM un),
       |ests AS (
       |  SELECT k_union, n_both, n_only_a, n_only_b, union_est,
       |    CASE WHEN k_union = 0 THEN 0.0
       |      ELSE CAST(n_both AS DOUBLE) * union_est
       |        / CAST(k_union AS DOUBLE) END AS intersect_est,
       |    CASE WHEN k_union = 0 THEN 0.0
       |      ELSE CAST(n_only_a AS DOUBLE) * union_est
       |        / CAST(k_union AS DOUBLE) END AS diff_a_est,
       |    CASE WHEN k_union = 0 THEN 0.0
       |      ELSE CAST(n_only_b AS DOUBLE) * union_est
       |        / CAST(k_union AS DOUBLE) END AS diff_b_est,
       |    CASE WHEN k_union = 0 THEN 0.0
       |      ELSE CAST(n_both AS DOUBLE)
       |        / CAST(k_union AS DOUBLE) END AS jaccard_est
       |  FROM ue),
       |ex AS (
       |  SELECT
       |    CAST(sum(ina * (1 - inb)) AS BIGINT) AS exact_only_a,
       |    CAST(sum(inb * (1 - ina)) AS BIGINT) AS exact_only_b,
       |    CAST(count(*) AS BIGINT) AS exact_union,
       |    CAST(sum(ina * inb) AS BIGINT) AS exact_intersect
       |  FROM (
       |    SELECT CASE WHEN a.word IS NULL THEN 0 ELSE 1 END AS ina,
       |      CASE WHEN b.word IS NULL THEN 0 ELSE 1 END AS inb
       |    FROM da a FULL OUTER JOIN db b ON a.word = b.word) t)
       |SELECT k_union, n_both, n_only_a, n_only_b, union_est,
       |  intersect_est, diff_a_est, diff_b_est, jaccard_est,
       |  exact_only_a, exact_only_b, exact_union, exact_intersect,
       |  CAST(exact_intersect AS DOUBLE) / CAST(exact_union AS DOUBLE)
       |    AS exact_jaccard
       |FROM ests CROSS JOIN ex""".stripMargin
  }

  /** Per-group HDR replay (q250): the [[HdrOracle]] integer machinery
    * partitioned by the group column — bucket ladder, per-group
    * cumulative pick, [lo, hi] bounds; half-histogram merging on the
    * Spark side must land on this one-shot per-group histogram.
    */
  private val HdrByGroupOracle: String = {
    val ladder = (6 to 62).reverse
      .map(i => s"WHEN v >= ${1L << i} THEN $i").mkString(" ")
    s"""WITH vals AS (
       |  SELECT o_orderpriority AS grp,
       |    CAST(floor(o_totalprice) AS BIGINT) AS v
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
       |    AND o_orderkey IS NOT NULL),
       |bk AS (
       |  SELECT grp, CASE WHEN v < 32 THEN v
       |    ELSE (e - 5) * 32 + (v >> CAST(e - 5 AS INT)) END AS bucket
       |  FROM (SELECT grp, v, CASE $ladder ELSE 5 END AS e FROM vals) t),
       |hist AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM bk GROUP BY 1, 2),
       |n AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS total
       |  FROM hist GROUP BY 1),
       |cum AS (
       |  SELECT grp, bucket,
       |    sum(cnt) OVER (PARTITION BY grp ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS c
       |  FROM hist),
       |qs AS (
       |  SELECT CAST(0.5 AS DOUBLE) AS q
       |  UNION ALL SELECT CAST(0.95 AS DOUBLE)),
       |ranked AS (
       |  SELECT n.grp, q, greatest(CAST(1 AS BIGINT),
       |    CAST(ceil(q * total) AS BIGINT)) AS rank
       |  FROM qs CROSS JOIN n),
       |picked AS (
       |  SELECT r.grp, r.q, r.rank, CAST(min(c.bucket) AS BIGINT) AS bucket
       |  FROM ranked r JOIN cum c ON c.grp = r.grp AND c.c >= r.rank
       |  GROUP BY 1, 2, 3)
       |SELECT grp, q, rank, bucket,
       |  CAST(CASE WHEN bucket < 32 THEN bucket
       |    ELSE (bucket - (bucket // 32 - 1) * 32) << CAST(bucket // 32 - 1 AS INT)
       |    END AS BIGINT) AS lo,
       |  CAST(CASE WHEN bucket < 32 THEN bucket
       |    ELSE ((bucket - (bucket // 32 - 1) * 32 + 1) << CAST(bucket // 32 - 1 AS INT)) - 1
       |    END AS BIGINT) AS hi
       |FROM picked
       |ORDER BY 1, 2""".stripMargin
  }

  /** Per-group HLL replay (q249): the [[HllOracle]] integer machinery
    * GROUP-WISE — register max per (group, bucket), dyadic 2^(40−rho)
    * BIGINT sums with the absent-bucket correction, one double
    * division per group. Merging two half-sketches on the Spark side
    * must land on this same one-shot register table (union + max).
    */
  private val HllByGroupOracle: String = {
    val p = 8; val m = 1 << p
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val aConst = alphaE6 * m.toLong * m
    def slice(j: Int): String = (0 until 8).map { i =>
      val pos = j * 8 + 1 + i
      val pw = math.pow(16, 7 - i).toLong
      s"CAST(CASE WHEN ascii(substr(hx, $pos, 1)) >= 97 " +
        s"THEN ascii(substr(hx, $pos, 1)) - 87 " +
        s"ELSE ascii(substr(hx, $pos, 1)) - 48 END AS BIGINT) * $pw"
    }.mkString("(", " + ", ")")
    val rhoCase = (1 to 32)
      .map(i => s"WHEN wb >= ${1L << (32 - i)} THEN $i").mkString(" ")
    s"""WITH ev AS (
       |  SELECT event_type AS grp, 'u' || CAST(user_id AS VARCHAR) AS item
       |  FROM events
       |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
       |h AS (SELECT grp, md5(item) AS hx FROM ev),
       |w32 AS (SELECT grp, ${slice(0)} AS wa, ${slice(1)} AS wb FROM h),
       |regs AS (
       |  SELECT grp, CAST(wa // ${1L << (32 - p)} AS INT) AS bucket,
       |    max(CASE $rhoCase ELSE 33 END) AS rho
       |  FROM w32 GROUP BY 1, 2),
       |agg AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_registers,
       |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (40 - rho)), 0)
       |      AS BIGINT) AS s
       |  FROM regs GROUP BY 1),
       |ex AS (SELECT grp, CAST(count(DISTINCT item) AS BIGINT) AS exact
       |  FROM ev GROUP BY 1)
       |SELECT a.grp, a.n_registers,
       |  CAST(a.s + ($m - a.n_registers) * (CAST(1 AS BIGINT) << 40)
       |    AS BIGINT) AS sum_scaled,
       |  CAST($aConst AS DOUBLE) / 1000000.0 * 1099511627776.0
       |    / CAST(a.s + ($m - a.n_registers) * (CAST(1 AS BIGINT) << 40)
       |      AS DOUBLE) AS estimate,
       |  e.exact
       |FROM agg a JOIN ex e USING (grp)
       |ORDER BY 1""".stripMargin
  }

  /** Zone-map replay (q248): per-month min/max/row stats, keep test
    * `vmax ≥ lo AND vmin ≤ hi` (NULL stats = all-NULL zone = pruned),
    * scan bound = kept-zone row sum, and the soundness check — rows
    * matching a predicate inside its pruned zones — via the same
    * zone-key join.
    */
  private val ZoneMapOracle: String =
    s"""WITH preds(pred_id, lo, hi) AS (
       |  VALUES (1, 9100, 9500), (2, 10000, 10031), (3, 0, 100)),
       |o AS (
       |  SELECT strftime(o_orderdate, '%Y%m') AS zone,
       |    date_diff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE)) AS day
       |  FROM orders WHERE o_orderdate IS NOT NULL),
       |zones AS (
       |  SELECT zone, CAST(count(*) AS BIGINT) AS n_rows,
       |    min(day) AS vmin, max(day) AS vmax
       |  FROM o GROUP BY 1),
       |cls AS (
       |  SELECT p.pred_id, z.zone, z.n_rows,
       |    (z.vmin IS NOT NULL AND z.vmax >= p.lo AND z.vmin <= p.hi)
       |      AS kept
       |  FROM zones z CROSS JOIN preds p),
       |per AS (
       |  SELECT pred_id, CAST(count(*) AS BIGINT) AS n_zones,
       |    CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT)
       |      AS n_pruned,
       |    CAST(sum(CASE WHEN kept THEN n_rows ELSE 0 END) AS BIGINT)
       |      AS scan_bound
       |  FROM cls GROUP BY 1),
       |exact AS (
       |  SELECT p.pred_id, CAST(sum(CASE WHEN o.day BETWEEN p.lo AND p.hi
       |    THEN 1 ELSE 0 END) AS BIGINT) AS exact_rows
       |  FROM o CROSS JOIN preds p GROUP BY 1),
       |leaked AS (
       |  SELECT c.pred_id, CAST(count(*) AS BIGINT) AS leaked_rows
       |  FROM o JOIN cls c ON o.zone = c.zone AND NOT c.kept
       |  JOIN preds p ON p.pred_id = c.pred_id
       |  WHERE o.day BETWEEN p.lo AND p.hi
       |  GROUP BY 1)
       |SELECT CAST(per.pred_id AS BIGINT) AS pred_id, per.n_zones,
       |  per.n_pruned, per.scan_bound, e.exact_rows,
       |  coalesce(l.leaked_rows, 0) AS leaked_rows
       |FROM per JOIN exact e USING (pred_id)
       |LEFT JOIN leaked l USING (pred_id)
       |ORDER BY 1""".stripMargin

  /** Streaming-HDR replay (q247): the [[HdrOracle]] integer machinery
    * per batch PREFIX — histogram over batches ≤ b equals the
    * accumulated LSM state after batch b by sum-mergeability, so the
    * running quantile picks replay from prefix-filtered bucket counts.
    */
  private val StreamHdrOracle: String = {
    val ladder = (6 to 62).reverse
      .map(i => s"WHEN v >= ${1L << i} THEN $i").mkString(" ")
    s"""WITH vals AS (
       |  SELECT o_orderkey % 3 AS b,
       |    CAST(floor(o_totalprice) AS BIGINT) AS v
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
       |bat AS (SELECT * FROM (VALUES (0), (1), (2)) t(bid)),
       |bk AS (
       |  SELECT b, CASE WHEN v < 32 THEN v
       |    ELSE (e - 5) * 32 + (v >> CAST(e - 5 AS INT)) END AS bucket
       |  FROM (SELECT b, v, CASE $ladder ELSE 5 END AS e FROM vals) t),
       |hist AS (
       |  SELECT bat.bid, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM bk JOIN bat ON bk.b <= bat.bid GROUP BY 1, 2),
       |n AS (SELECT bid, CAST(sum(cnt) AS BIGINT) AS total
       |  FROM hist GROUP BY 1),
       |cum AS (
       |  SELECT bid, bucket,
       |    sum(cnt) OVER (PARTITION BY bid ORDER BY bucket
       |      ROWS UNBOUNDED PRECEDING) AS c
       |  FROM hist),
       |qs AS (
       |  SELECT CAST(0.5 AS DOUBLE) AS q
       |  UNION ALL SELECT CAST(0.9 AS DOUBLE)
       |  UNION ALL SELECT CAST(0.99 AS DOUBLE)),
       |ranked AS (
       |  SELECT bid, q, greatest(CAST(1 AS BIGINT),
       |    CAST(ceil(q * total) AS BIGINT)) AS rank
       |  FROM qs CROSS JOIN n),
       |picked AS (
       |  SELECT r.bid, r.q, r.rank, CAST(min(c.bucket) AS BIGINT) AS bucket
       |  FROM ranked r JOIN cum c ON c.bid = r.bid AND c.c >= r.rank
       |  GROUP BY 1, 2, 3)
       |SELECT CAST(bid AS BIGINT) AS batch_id, q, rank, bucket,
       |  CAST(CASE WHEN bucket < 32 THEN bucket
       |    ELSE (bucket - (bucket // 32 - 1) * 32) << CAST(bucket // 32 - 1 AS INT)
       |    END AS BIGINT) AS lo,
       |  CAST(CASE WHEN bucket < 32 THEN bucket
       |    ELSE ((bucket - (bucket // 32 - 1) * 32 + 1) << CAST(bucket // 32 - 1 AS INT)) - 1
       |    END AS BIGINT) AS hi
       |FROM picked
       |ORDER BY 1, 2""".stripMargin
  }

  /** DP-release replay (q246): the SAME inverse-CDF integer thresholds
    * [[ext.Privacy.dpThresholds]] inlines into the Spark plan are
    * rendered here as a SQL list literal; the uniform is the identical
    * 48-bit md5 fold, so `noise = |{thresholds ≤ u}| − B` is the same
    * integer in both engines — cross-engine `exp` rounding never
    * enters.
    */
  private val DpCountsOracle: String = {
    val (b, th) = ext.Privacy.dpThresholds(0.5)
    val list = th.mkString("[", ", ", "]")
    s"""WITH g AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
       |  FROM events WHERE event_type IS NOT NULL GROUP BY 1),
       |u AS (
       |  SELECT event_type, n_true, md5('dp-v1|' || event_type) AS hx
       |  FROM g),
       |z AS (
       |  SELECT event_type, n_true,
       |    CAST(len(list_filter($list,
       |      t -> t <= ${hexFold("1", 12)})) AS BIGINT) - $b AS noise
       |  FROM u)
       |SELECT event_type, n_true,
       |  CAST(n_true + noise AS BIGINT) AS n_noisy,
       |  CAST(noise AS BIGINT) AS noise,
       |  (abs(noise) <= $b) AS within_bound
       |FROM z ORDER BY 1""".stripMargin
  }

  /** Misra–Gries replay (q245): per-shard counts, θ = the count at
    * rank k+1 under `(cnt DESC, item)` (0 when absent), survivors
    * `cnt > θ` with `lo = cnt − θ`; merge = per-item `lo` sums +
    * shard-θ total, re-compressed the same way. Pure integers — the
    * `bounds_hold` column replays the MG guarantee as data.
    */
  private val MisraGriesOracle: String = {
    val k = 16
    s"""WITH ev AS (
       |  SELECT event_id % 4 AS shard,
       |    'u' || CAST(100 // (1 + user_id % 100) AS VARCHAR) AS item
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |cnts AS (
       |  SELECT shard, item, CAST(count(*) AS BIGINT) AS cnt
       |  FROM ev GROUP BY 1, 2),
       |rk AS (
       |  SELECT shard, item, cnt, row_number() OVER (
       |    PARTITION BY shard ORDER BY cnt DESC, item) AS r
       |  FROM cnts),
       |tk AS (
       |  SELECT s.shard, coalesce(t.cnt, 0) AS tk
       |  FROM (SELECT DISTINCT shard FROM rk) s
       |  LEFT JOIN (SELECT shard, cnt FROM rk WHERE r = ${k + 1}) t
       |    USING (shard)),
       |summ AS (
       |  SELECT r.shard, r.item, r.cnt - t.tk AS lo, t.tk AS theta
       |  FROM rk r JOIN tk t USING (shard) WHERE r.cnt > t.tk),
       |summed AS (
       |  SELECT item, CAST(sum(lo) AS BIGINT) AS cnt FROM summ GROUP BY 1),
       |tin AS (
       |  SELECT CAST(coalesce(sum(theta), 0) AS BIGINT) AS theta_in
       |  FROM (SELECT DISTINCT shard, theta FROM summ) t),
       |mrk AS (
       |  SELECT item, cnt, row_number() OVER (ORDER BY cnt DESC, item) AS r
       |  FROM summed),
       |mtk AS (
       |  SELECT coalesce(max(CASE WHEN r = ${k + 1} THEN cnt END), 0) AS tk
       |  FROM mrk),
       |merged AS (
       |  SELECT m.item, m.cnt - x.tk AS lo, i.theta_in + x.tk AS theta
       |  FROM mrk m CROSS JOIN mtk x CROSS JOIN tin i
       |  WHERE m.cnt > x.tk),
       |exact AS (
       |  SELECT item, CAST(count(*) AS BIGINT) AS exact FROM ev GROUP BY 1)
       |SELECT g.item, CAST(g.lo AS BIGINT) AS lo,
       |  CAST(g.theta AS BIGINT) AS theta, e.exact,
       |  (g.lo <= e.exact AND e.exact <= g.lo + g.theta) AS bounds_hold
       |FROM merged g JOIN exact e USING (item)
       |ORDER BY 1""".stripMargin
  }

  /** Count-sketch replay (q244): 20-bit bucket slices at hex chars
    * 1–25, sign parities at chars 26–30, per-(j, bucket) signed BIGINT
    * sums over the corpus, probe estimates as `sign · counter` with
    * the median as a `row_number = 3` pick under `(value, j)` order —
    * the exact [[ext.FreqSketch.csEstimate]] arithmetic.
    */
  private val CountSketchOracle: String = {
    val d = ext.FreqSketch.CsDepth
    val width = 2048
    val idx = (0 until d).map(j => s"($j)").mkString(", ")
    val rank = (d + 1) / 2
    s"""WITH w AS (
       |  SELECT u.w AS word
       |  FROM documents d,
       |    unnest(string_split(trim(regexp_replace(lower(d.text),
       |      '\\s+', ' ', 'g')), ' ')) AS u(w)
       |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
       |    AND len(u.w) > 0),
       |cnt AS (SELECT word, CAST(count(*) AS BIGINT) AS exact
       |  FROM w GROUP BY 1),
       |sk AS (
       |  SELECT j, ${hexFold("j * 5 + 1", 5)} % $width AS bucket,
       |    CAST(sum((${hexFold("j + 26", 1)} % 2) * 2 - 1) AS BIGINT) AS s
       |  FROM (SELECT md5(word) AS hx FROM w) t
       |    CROSS JOIN (VALUES $idx) v(j)
       |  GROUP BY 1, 2),
       |pr AS (SELECT word FROM cnt ORDER BY exact DESC, word LIMIT 50),
       |ph AS (SELECT word, md5(word) AS hx FROM pr),
       |pv AS (
       |  SELECT p.word, v.j,
       |    ((${hexFold("v.j + 26", 1)} % 2) * 2 - 1)
       |      * coalesce(s.s, 0) AS est_j
       |  FROM ph p CROSS JOIN (VALUES $idx) v(j)
       |  LEFT JOIN sk s ON s.j = v.j
       |    AND s.bucket = ${hexFold("v.j * 5 + 1", 5)} % $width),
       |med AS (
       |  SELECT word AS item, est_j FROM pv
       |  QUALIFY row_number() OVER (PARTITION BY word ORDER BY est_j, j)
       |    = $rank)
       |SELECT m.item, CAST(m.est_j AS BIGINT) AS est, c.exact
       |FROM med m JOIN cnt c ON m.item = c.word
       |ORDER BY 1""".stripMargin
  }

  /** LPM replay (q243): the same Knuth-hash IPs and customer-derived
    * CIDR table, candidates by integer right-shift equality, the
    * most-specific pick as a `row_number` over `len DESC` (tie-free —
    * nets are deduped per (len, prefix)), left-joined back so
    * unmatched probes land in the (-1, '(none)') bucket. All shifts
    * ≤ 24 bits — inside DuckDB's safe `<<` range.
    */
  private val CidrOracle: String =
    s"""WITH ips AS (
       |  SELECT o_orderkey AS id,
       |    (o_orderkey * 2654435761) % 4294967296 AS h
       |  FROM orders WHERE o_orderkey IS NOT NULL),
       |nets0 AS (
       |  SELECT c_custkey AS net_id, c_mktsegment AS segment,
       |    8 + (c_custkey % 5) * 4 AS len,
       |    ((c_custkey * 2654435761) % 4294967296)
       |      // (CAST(1 AS BIGINT) << CAST(32 - (8 + (c_custkey % 5) * 4)
       |        AS INTEGER)) AS prefix
       |  FROM customer WHERE c_custkey IS NOT NULL),
       |nets AS (
       |  SELECT len, prefix, net_id, segment FROM nets0
       |  QUALIFY row_number() OVER (PARTITION BY len, prefix
       |    ORDER BY net_id) = 1),
       |best AS (
       |  SELECT i.id, n.len, n.net_id, n.segment
       |  FROM ips i JOIN nets n
       |    ON (i.h // (CAST(1 AS BIGINT) << CAST(32 - n.len AS INTEGER)))
       |      = n.prefix
       |  QUALIFY row_number() OVER (PARTITION BY i.id ORDER BY n.len DESC)
       |    = 1)
       |SELECT coalesce(b.len, -1) AS matched_len,
       |  coalesce(b.segment, '(none)') AS segment,
       |  CAST(count(*) AS BIGINT) AS n_ips,
       |  CAST(sum(coalesce(b.net_id, 0)) AS BIGINT) AS sum_net
       |FROM ips i LEFT JOIN best b USING (id)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Rank-eval replay (q228): the cosine retriever is the q15 formula;
    * the nDCG discount and ideal-DCG prefix constants are the SAME
    * integers the Spark plan inlines (`Retrieval.discountsE9` /
    * `idcgPrefixE9` interpolated here at build time), so DCG sums and
    * the `//`-scaled metrics are exact BIGINTs in both engines — no
    * log2 is evaluated by either engine at query time.
    */
  private val RankEvalOracle: String = {
    val disc = ext.Retrieval.discountsE9(10).mkString("[", ", ", "]")
    val idcg = ext.Retrieval.idcgPrefixE9(10).mkString("[", ", ", "]")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label FROM embeddings WHERE vec_id < 8),
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
       |h AS (
       |  SELECT r.query_id,
       |    CAST(count(*) AS BIGINT) AS n_retrieved,
       |    CAST(coalesce(sum(CASE WHEN j.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits,
       |    CAST(coalesce(sum(CASE WHEN j.neighbor_id IS NOT NULL THEN ($disc)[r.rnk] END), 0) AS BIGINT) AS dcg_e9
       |  FROM retrieved r LEFT JOIN judge j
       |    ON r.query_id = j.query_id AND r.neighbor_id = j.neighbor_id
       |  GROUP BY 1),
       |base AS (
       |  SELECT coalesce(h.query_id, relc.query_id) AS query,
       |    CAST(coalesce(h.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       |    CAST(coalesce(relc.n_relevant, 0) AS BIGINT) AS n_relevant,
       |    CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
       |    CAST(coalesce(h.dcg_e9, 0) AS BIGINT) AS dcg_e9
       |  FROM h FULL OUTER JOIN relc ON h.query_id = relc.query_id)
       |SELECT query, n_retrieved, n_relevant, hits, dcg_e9,
       |  CASE WHEN n_relevant >= 1
       |    THEN CAST(($idcg)[CAST(least(n_relevant, 10) AS INT)] AS BIGINT) END AS idcg_e9,
       |  CASE WHEN n_relevant >= 1
       |    THEN CAST((hits * 1000000) // n_relevant AS BIGINT) END AS recall_e6,
       |  CASE WHEN n_relevant >= 1
       |    THEN CAST((dcg_e9 * 1000000) // ($idcg)[CAST(least(n_relevant, 10) AS INT)] AS BIGINT) END AS ndcg_e6
       |FROM base
       |ORDER BY query""".stripMargin
  }

  /** Graded-nDCG replay (q229): gains are `(1 << rel) − 1` BIGINTs, the
    * 1e6-scaled discounts come from `Retrieval.discountsE6` (same
    * integers both engines inline), ideal DCG sorts the judgment set by
    * gain desc / doc asc exactly as the Spark window does.
    */
  private val GradedNdcgOracle: String = {
    val disc = ext.Retrieval.discountsE6(10).mkString("[", ", ", "]")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label FROM embeddings WHERE vec_id < 8),
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
       |g AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    (CAST(1 AS BIGINT) << (CASE WHEN e.vec_id % 2 = q.query_id % 2 THEN 2 ELSE 1 END)) - 1 AS gain
       |  FROM q JOIN embeddings e ON q.label = e.label),
       |ideal AS (
       |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant,
       |    CAST(sum(CASE WHEN irank <= 10 THEN gain * ($disc)[CAST(irank AS INT)] END) AS BIGINT) AS idcg_e6
       |  FROM (SELECT query_id, gain,
       |          row_number() OVER (PARTITION BY query_id ORDER BY gain DESC, neighbor_id) AS irank
       |        FROM g)
       |  GROUP BY 1),
       |h AS (
       |  SELECT r.query_id,
       |    CAST(count(*) AS BIGINT) AS n_retrieved,
       |    CAST(coalesce(sum(g.gain * ($disc)[r.rnk]), 0) AS BIGINT) AS dcg_e6
       |  FROM retrieved r LEFT JOIN g
       |    ON r.query_id = g.query_id AND r.neighbor_id = g.neighbor_id
       |  GROUP BY 1)
       |SELECT coalesce(h.query_id, ideal.query_id) AS query,
       |  CAST(coalesce(h.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       |  CAST(coalesce(ideal.n_relevant, 0) AS BIGINT) AS n_relevant,
       |  CAST(coalesce(h.dcg_e6, 0) AS BIGINT) AS dcg_e6,
       |  ideal.idcg_e6,
       |  CASE WHEN ideal.idcg_e6 >= 1
       |    THEN CAST((coalesce(h.dcg_e6, 0) * 1000000) // ideal.idcg_e6 AS BIGINT) END AS ndcg_e6
       |FROM h FULL OUTER JOIN ideal ON h.query_id = ideal.query_id
       |ORDER BY query""".stripMargin
  }

  /** MMR replay (q232): the five greedy rounds unrolled as CTE chains —
    * round i anti-joins the selected set, takes max pool-pair sim to it
    * (the same proven-exact cosine kernel text), and argmaxes
    * `0.75·rel − 0.25·maxsim` with the doc tiebreak. λ = 0.75 is dyadic
    * so both engines compute the identical doubles.
    */
  private val MmrOracle: String = {
    def cosSql(a: String, b: String): String =
      s"""list_sum(list_transform(list_zip($a, $b),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         |    / (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |       * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    val rounds = (2 to 5).map { i =>
      val p = i - 1
      s"""rem$i AS (
         |  SELECT p.query_id, p.neighbor_id, p.rel
         |  FROM pool p LEFT JOIN s$p s
         |    ON p.query_id = s.query_id AND p.neighbor_id = s.neighbor_id
         |  WHERE s.neighbor_id IS NULL),
         |ms$i AS (
         |  SELECT x.query_id, x.id_a, max(x.sim) AS ms
         |  FROM sims x JOIN s$p s
         |    ON x.query_id = s.query_id AND x.id_b = s.neighbor_id
         |  GROUP BY 1, 2),
         |pick$i AS (
         |  SELECT r.query_id, r.neighbor_id, r.rel, $i AS mmr_rank
         |  FROM rem$i r LEFT JOIN ms$i
         |    ON ms$i.query_id = r.query_id AND ms$i.id_a = r.neighbor_id
         |  QUALIFY row_number() OVER (PARTITION BY r.query_id
         |    ORDER BY 0.75 * r.rel - 0.25 * coalesce(ms$i.ms, 0.0) DESC,
         |      r.neighbor_id) = 1),
         |s$i AS (SELECT * FROM s$p UNION ALL SELECT * FROM pick$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 4),
       |scored AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    ${cosSql("q.qv", "e.embedding")} AS cosine
       |  FROM q CROSS JOIN embeddings e),
       |pool AS (
       |  SELECT query_id, neighbor_id, cosine AS rel,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
       |  FROM scored QUALIFY rnk <= 20),
       |pv AS (
       |  SELECT p.query_id, p.neighbor_id, e.embedding
       |  FROM pool p JOIN embeddings e ON e.vec_id = p.neighbor_id),
       |sims AS (
       |  SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
       |    ${cosSql("a.embedding", "b.embedding")} AS sim
       |  FROM pv a JOIN pv b
       |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
       |s1 AS (
       |  SELECT query_id, neighbor_id, rel, 1 AS mmr_rank FROM pool
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) = 1),
       |$rounds
       |SELECT query_id AS query, neighbor_id AS doc, rel,
       |  CAST(mmr_rank AS INT) AS mmr_rank
       |FROM s5
       |ORDER BY query, mmr_rank""".stripMargin
  }

  /** HLL replay (q235): same word CTE and ascii-fold hex decode as the
    * CMS oracle; bucket/rho from two 32-bit md5 slices with an integer
    * CASE ladder for the leading-zero rank (no log2 — a float-log
    * portability hazard); harmonic sum as BIGINT dyadic terms; ONE
    * final double division with the identical constant sequence.
    */
  private val HllOracle: String = {
    val p = 8; val m = 1 << p
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val aConst = alphaE6 * m.toLong * m
    def slice(j: Int): String = (0 until 8).map { i =>
      val pos = j * 8 + 1 + i
      val pw = math.pow(16, 7 - i).toLong
      s"CAST(CASE WHEN ascii(substr(hx, $pos, 1)) >= 97 " +
        s"THEN ascii(substr(hx, $pos, 1)) - 87 " +
        s"ELSE ascii(substr(hx, $pos, 1)) - 48 END AS BIGINT) * $pw"
    }.mkString("(", " + ", ")")
    val rhoCase = (1 to 32)
      .map(i => s"WHEN wb >= ${1L << (32 - i)} THEN $i").mkString(" ")
    s"""WITH w AS (
       |  SELECT u.w AS word
       |  FROM documents d,
       |    unnest(string_split(trim(regexp_replace(lower(d.text),
       |      '\\s+', ' ', 'g')), ' ')) AS u(w)
       |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
       |    AND len(u.w) > 0),
       |h AS (SELECT md5(word) AS hx, word FROM w),
       |w32 AS (SELECT ${slice(0)} AS wa, ${slice(1)} AS wb FROM h),
       |regs AS (
       |  SELECT CAST(wa // ${1L << (32 - p)} AS INT) AS bucket,
       |    max(CASE $rhoCase ELSE 33 END) AS rho
       |  FROM w32 GROUP BY 1),
       |agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_registers,
       |    CAST(coalesce(sum(CAST(1 AS BIGINT) << (40 - rho)), 0) AS BIGINT) AS s
       |  FROM regs),
       |ex AS (SELECT CAST(count(DISTINCT word) AS BIGINT) AS exact_distinct FROM w)
       |SELECT n_registers,
       |  CAST(s + ($m - n_registers) * ${1L << 40} AS BIGINT) AS sum_scaled,
       |  CAST($aConst AS DOUBLE) / 1000000.0 * 1099511627776.0
       |    / CAST(s + ($m - n_registers) * ${1L << 40} AS DOUBLE) AS estimate,
       |  exact_distinct
       |FROM agg CROSS JOIN ex""".stripMargin
  }

  /** Ascii-fold hex decode of `len` chars of column `hx` starting at
    * 1-based `start` (a SQL expression — may reference columns), as a
    * BIGINT — the shared primitive of every sketch oracle.
    */
  private def hexFold(start: String, len: Int): String =
    (0 until len).map { i =>
      val pos = if (start.forall(_.isDigit)) (start.toInt + i).toString
        else s"$start + $i"
      val pw = math.pow(16, len - 1 - i).toLong
      s"CAST(CASE WHEN ascii(substr(hx, $pos, 1)) >= 97 " +
        s"THEN ascii(substr(hx, $pos, 1)) - 87 " +
        s"ELSE ascii(substr(hx, $pos, 1)) - 48 END AS BIGINT) * $pw"
    }.mkString("(", " + ", ")")

  /** The even-/odd-doc word CTEs shared by the q239–q241 sketch
    * oracles: same normalization as the q235 HLL word CTE, split on
    * `doc_id % 2`.
    */
  private def ParitySplitWordCtes: String =
    s"""wa AS (
       |  SELECT u.w AS word
       |  FROM documents d,
       |    unnest(string_split(trim(regexp_replace(lower(d.text),
       |      '\\s+', ' ', 'g')), ' ')) AS u(w)
       |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
       |    AND d.doc_id % 2 = 0 AND len(u.w) > 0),
       |wb AS (
       |  SELECT u.w AS word
       |  FROM documents d,
       |    unnest(string_split(trim(regexp_replace(lower(d.text),
       |      '\\s+', ' ', 'g')), ' ')) AS u(w)
       |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
       |    AND d.doc_id % 2 = 1 AND len(u.w) > 0)""".stripMargin

  /** Bloom replay (q239): double-hashed bit positions
    * `(h1 + i·h2) % m` from two 32-bit md5 words, distinct-bit build
    * side, per-probe hit counts (duplicate positions count twice on
    * both engines — identical construction), reconciled against the
    * exact vocabulary semi-join. `n_missed` = 0 IS the
    * no-false-negative theorem, replayed rather than asserted.
    */
  private val BloomOracle: String = {
    val m = 8192
    val k = ext.SetSketch.BloomK
    val idx = (0 until k).map(i => s"($i)").mkString(", ")
    s"""WITH $ParitySplitWordCtes,
       |hb AS (SELECT md5(word) AS hx FROM wa),
       |hw AS (SELECT ${hexFold("1", 8)} AS h1, ${hexFold("9", 8)} AS h2
       |  FROM hb),
       |bits AS (
       |  SELECT DISTINCT (h1 + i * h2) % $m AS bit
       |  FROM hw CROSS JOIN (VALUES $idx) t(i)),
       |pd AS (SELECT DISTINCT word AS item FROM wb),
       |ph AS (SELECT item, md5(item) AS hx FROM pd),
       |pw AS (SELECT item, ${hexFold("1", 8)} AS h1, ${hexFold("9", 8)} AS h2
       |  FROM ph),
       |pbits AS (
       |  SELECT item, (h1 + i * h2) % $m AS bit
       |  FROM pw CROSS JOIN (VALUES $idx) t(i)),
       |hits AS (
       |  SELECT p.item,
       |    CAST(sum(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS BIGINT)
       |      AS hits
       |  FROM pbits p LEFT JOIN bits b USING (bit) GROUP BY 1),
       |bd AS (SELECT DISTINCT word AS item FROM wa),
       |tr AS (
       |  SELECT p.item, CASE WHEN b.item IS NULL THEN 0 ELSE 1 END AS t
       |  FROM pd p LEFT JOIN bd b USING (item))
       |SELECT CAST(count(*) AS BIGINT) AS n_probes,
       |  CAST(sum(CASE WHEN hits = $k THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_maybe,
       |  CAST(sum(t) AS BIGINT) AS n_true,
       |  CAST(sum(CASE WHEN hits = $k AND t = 0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_false_pos,
       |  CAST(sum(CASE WHEN hits < $k AND t = 1 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_missed
       |FROM hits h JOIN tr USING (item)""".stripMargin
  }

  /** KMV replay (q240): 48-bit hashes (12 hex chars), DISTINCT +
    * ORDER BY + LIMIT k bottom-k sketches, the (k−1)·2^48/h(k)
    * estimate with the identical integer numerator and one double
    * division, and the Beyer et al. union/intersection scaling —
    * exact counts from the same vocabulary CTEs.
    */
  private val KmvOracle: String = {
    val k = 256
    val num = (k - 1).toLong << 48
    s"""WITH $ParitySplitWordCtes,
       |da AS (SELECT DISTINCT word FROM wa),
       |db AS (SELECT DISTINCT word FROM wb),
       |ha AS (SELECT DISTINCT ${hexFold("1", 12)} AS h
       |  FROM (SELECT md5(word) AS hx FROM da) t),
       |hb AS (SELECT DISTINCT ${hexFold("1", 12)} AS h
       |  FROM (SELECT md5(word) AS hx FROM db) t),
       |ska AS (SELECT h FROM ha ORDER BY h LIMIT $k),
       |skb AS (SELECT h FROM hb ORDER BY h LIMIT $k),
       |ea AS (
       |  SELECT CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE CAST($num AS DOUBLE) / CAST(max(h) AS DOUBLE) END AS est_a
       |  FROM ska),
       |eb AS (
       |  SELECT CASE WHEN count(*) < $k THEN CAST(count(*) AS DOUBLE)
       |    ELSE CAST($num AS DOUBLE) / CAST(max(h) AS DOUBLE) END AS est_b
       |  FROM skb),
       |sku AS (
       |  SELECT DISTINCT h FROM (
       |    SELECT h FROM ska UNION ALL SELECT h FROM skb) t
       |  ORDER BY h LIMIT $k),
       |fl AS (
       |  SELECT u.h,
       |    CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS ina,
       |    CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS inb
       |  FROM sku u LEFT JOIN ska a ON u.h = a.h
       |    LEFT JOIN skb b ON u.h = b.h),
       |un AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k_union,
       |    CAST(coalesce(sum(ina * inb), 0) AS BIGINT) AS n_both,
       |    coalesce(max(h), 0) AS kth
       |  FROM fl),
       |ue AS (
       |  SELECT k_union, n_both,
       |    CASE WHEN k_union < $k THEN CAST(k_union AS DOUBLE)
       |      ELSE CAST($num AS DOUBLE) / CAST(kth AS DOUBLE) END AS union_est
       |  FROM un),
       |ie AS (
       |  SELECT k_union, n_both, union_est,
       |    CASE WHEN k_union = 0 THEN 0.0
       |      ELSE CAST(n_both AS DOUBLE) * union_est
       |        / CAST(k_union AS DOUBLE) END AS intersect_est
       |  FROM ue),
       |ex AS (
       |  SELECT
       |    CAST(sum(ina) AS BIGINT) AS exact_a,
       |    CAST(sum(inb) AS BIGINT) AS exact_b,
       |    CAST(count(*) AS BIGINT) AS exact_union,
       |    CAST(sum(ina * inb) AS BIGINT) AS exact_intersect
       |  FROM (
       |    SELECT coalesce(a.word, b.word) AS word,
       |      CASE WHEN a.word IS NULL THEN 0 ELSE 1 END AS ina,
       |      CASE WHEN b.word IS NULL THEN 0 ELSE 1 END AS inb
       |    FROM da a FULL OUTER JOIN db b ON a.word = b.word) t)
       |SELECT est_a, est_b, k_union, n_both, union_est, intersect_est,
       |  exact_a, exact_b, exact_union, exact_intersect
       |FROM ea CROSS JOIN eb CROSS JOIN ie CROSS JOIN ex""".stripMargin
  }

  /** AMS replay (q241): ±1 signs from the low bit of each 16-bit md5
    * word (the j-th 4-hex slice), per-j counter sums as BIGINTs,
    * estimator products as doubles of exact integers, and the
    * median-of-7 as a `row_number() = 4` pick under `(value, j)` order
    * — the same order `sort_array(struct(v, j))` gives Spark.
    */
  private val AmsOracle: String = {
    val d = ext.FreqSketch.AmsDepth
    val idx = (0 until d).map(j => s"($j)").mkString(", ")
    val rank = (d + 1) / 2
    s"""WITH $ParitySplitWordCtes,
       |sa AS (
       |  SELECT j, CAST(sum((${hexFold("j * 4 + 1", 4)} % 2) * 2 - 1)
       |    AS BIGINT) AS s
       |  FROM (SELECT md5(word) AS hx FROM wa) t
       |    CROSS JOIN (VALUES $idx) v(j)
       |  GROUP BY 1),
       |sb AS (
       |  SELECT j, CAST(sum((${hexFold("j * 4 + 1", 4)} % 2) * 2 - 1)
       |    AS BIGINT) AS s
       |  FROM (SELECT md5(word) AS hx FROM wb) t
       |    CROSS JOIN (VALUES $idx) v(j)
       |  GROUP BY 1),
       |f2 AS (
       |  SELECT v AS f2_est FROM (
       |    SELECT CAST(s AS DOUBLE) * CAST(s AS DOUBLE) AS v, j FROM sa) t
       |  QUALIFY row_number() OVER (ORDER BY v, j) = $rank),
       |ip AS (
       |  SELECT v AS ip_est FROM (
       |    SELECT CAST(a.s AS DOUBLE) * CAST(b.s AS DOUBLE) AS v, a.j
       |    FROM sa a JOIN sb b ON a.j = b.j) t
       |  QUALIFY row_number() OVER (ORDER BY v, j) = $rank),
       |ca AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM wa GROUP BY 1),
       |cb AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM wb GROUP BY 1),
       |f2x AS (SELECT CAST(coalesce(sum(c * c), 0) AS BIGINT) AS f2_exact
       |  FROM ca),
       |ipx AS (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT) AS ip_exact
       |  FROM ca a JOIN cb b ON a.word = b.word)
       |SELECT f2_est, f2_exact, ip_est, ip_exact
       |FROM f2 CROSS JOIN f2x CROSS JOIN ip CROSS JOIN ipx""".stripMargin
  }

  /** Streaming-Bloom replay (q242): novelty against prior batches only
    * — a bit's FIRST-appearance batch decides every later probe, so
    * "item in batch b is maybe-seen" ≡ "all its bits first appeared
    * strictly before b". Same double-hash positions as [[BloomOracle]];
    * duplicate positions per item count per-probe on both engines.
    */
  private val StreamBloomOracle: String = {
    val m = 8192
    val k = ext.SetSketch.BloomK
    val idx = (0 until k).map(i => s"($i)").mkString(", ")
    s"""WITH ev AS (
       |  SELECT event_id % 3 AS b,
       |    'u' || CAST(user_id AS VARCHAR) AS item
       |  FROM events
       |  WHERE event_id IS NOT NULL AND user_id IS NOT NULL),
       |di AS (SELECT DISTINCT b, item FROM ev),
       |ih AS (SELECT b, item, md5(item) AS hx FROM di),
       |iw AS (SELECT b, item, ${hexFold("1", 8)} AS h1,
       |    ${hexFold("9", 8)} AS h2
       |  FROM ih),
       |ib AS (
       |  SELECT b, item, (h1 + i * h2) % $m AS bit
       |  FROM iw CROSS JOIN (VALUES $idx) t(i)),
       |fb AS (SELECT bit, min(b) AS first_b FROM ib GROUP BY 1),
       |pr AS (
       |  SELECT d.b, d.item,
       |    min(CASE WHEN f.first_b < d.b THEN 1 ELSE 0 END) AS seen
       |  FROM ib d JOIN fb f ON d.bit = f.bit GROUP BY 1, 2)
       |SELECT CAST(b AS BIGINT) AS batch_id,
       |  CAST(count(*) AS BIGINT) AS n_items,
       |  CAST(sum(CASE WHEN seen = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_novel
       |FROM pr GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** HDR-quantile replay (q238): the comparison-ladder log2, the bucket
    * formula, the cumulative pick, and the [lo, hi] bounds — all pure
    * integer arithmetic in both engines; quantile fractions are CAST
    * AS DOUBLE so DuckDB does not silently use DECIMAL math where Spark
    * multiplies doubles.
    */
  private val HdrOracle: String = {
    val ladder = (6 to 62).reverse
      .map(i => s"WHEN v >= ${1L << i} THEN $i").mkString(" ")
    s"""WITH vals AS (
       |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
       |  FROM orders WHERE o_totalprice IS NOT NULL),
       |bk AS (
       |  SELECT CASE WHEN v < 32 THEN v
       |    ELSE (e - 5) * 32 + (v >> CAST(e - 5 AS INT)) END AS bucket
       |  FROM (SELECT v, CASE $ladder ELSE 5 END AS e FROM vals) t),
       |hist AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cnt FROM bk GROUP BY 1),
       |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM hist),
       |cum AS (
       |  SELECT bucket,
       |    sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS c
       |  FROM hist),
       |qs AS (
       |  SELECT CAST(0.5 AS DOUBLE) AS q
       |  UNION ALL SELECT CAST(0.9 AS DOUBLE)
       |  UNION ALL SELECT CAST(0.99 AS DOUBLE)),
       |ranked AS (
       |  SELECT q, greatest(CAST(1 AS BIGINT),
       |    CAST(ceil(q * total) AS BIGINT)) AS rank
       |  FROM qs CROSS JOIN n),
       |picked AS (
       |  SELECT r.q, r.rank, CAST(min(c.bucket) AS BIGINT) AS bucket
       |  FROM ranked r JOIN cum c ON c.c >= r.rank
       |  GROUP BY 1, 2)
       |SELECT q, rank, bucket,
       |  CAST(CASE WHEN bucket < 32 THEN bucket
       |    ELSE (bucket - (bucket // 32 - 1) * 32) << CAST(bucket // 32 - 1 AS INT)
       |    END AS BIGINT) AS lo,
       |  CAST(CASE WHEN bucket < 32 THEN bucket
       |    ELSE ((bucket - (bucket // 32 - 1) * 32 + 1) << CAST(bucket // 32 - 1 AS INT)) - 1
       |    END AS BIGINT) AS hi
       |FROM picked
       |ORDER BY q""".stripMargin
  }

  /** One-shot CMS heavy-hitters oracle over document words (q224 batch
    * form, q225 streaming fold — identical by mergeability): md5 hex
    * slices → ascii-fold hex decode → `% width` cells → min over
    * slices, absent cells 0.
    */
  private def cmsOracle(width: Int, probeMod: Int, minCount: Long): String = {
    def slice(j: Int): String = (0 until 8).map { i =>
      val pos = j * 8 + 1 + i
      val pw = math.pow(16, 7 - i).toLong
      s"CAST(CASE WHEN ascii(substr(hx, $pos, 1)) >= 97 " +
        s"THEN ascii(substr(hx, $pos, 1)) - 87 " +
        s"ELSE ascii(substr(hx, $pos, 1)) - 48 END AS BIGINT) * $pw"
    }.mkString("(", " + ", ")")
    val cells = (0 until ext.FreqSketch.Depth).map(j =>
      s"SELECT $j AS j, ${slice(j)} % $width AS bucket, " +
        "CAST(count(*) AS BIGINT) AS cnt FROM h GROUP BY 2")
      .mkString("\n  UNION ALL ")
    val probeCells = (0 until ext.FreqSketch.Depth).map(j =>
      s"SELECT item, $j AS j, ${slice(j)} % $width AS bucket FROM ph")
      .mkString("\n  UNION ALL ")
    s"""WITH w AS (
       |  SELECT u.w AS word
       |  FROM documents d,
       |    unnest(string_split(trim(regexp_replace(lower(d.text),
       |      '\\s+', ' ', 'g')), ' ')) AS u(w)
       |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
       |    AND len(u.w) > 0),
       |h AS (SELECT md5(word) AS hx FROM w),
       |cells AS (
       |  $cells),
       |p AS (
       |  SELECT DISTINCT u.w AS item
       |  FROM documents d,
       |    unnest(string_split(trim(regexp_replace(lower(d.text),
       |      '\\s+', ' ', 'g')), ' ')) AS u(w)
       |  WHERE d.doc_id IS NOT NULL AND d.text IS NOT NULL
       |    AND d.doc_id % $probeMod = 0 AND len(u.w) > 0),
       |ph AS (SELECT item, md5(item) AS hx FROM p),
       |pc AS (
       |  $probeCells),
       |est AS (
       |  SELECT pc.item,
       |    CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
       |  FROM pc LEFT JOIN cells
       |    ON cells.j = pc.j AND cells.bucket = pc.bucket
       |  GROUP BY pc.item)
       |SELECT item, est FROM est WHERE est >= $minCount
       |ORDER BY item""".stripMargin
  }

  /** Shared Lloyd-replay CTE chain (q213/q214): md5-rank donors, two
    * rounds of exact-L2 assignment (dot − |c|²/2, lowest-index ties) +
    * decimal(28,8)-exact mean updates, final assignment in `af`.
    */
  private lazy val KMeansLloydCtes: String = {
    def score(v: String, c: String): String =
      s"""(list_sum(list_transform(list_zip($v, $c),
         |        z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)))
         |      - list_sum(list_transform($c,
         |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) / 2)""".stripMargin
    def assignCte(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT vec_id, j AS cl FROM (
         |    SELECT e.vec_id, c.j,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${score("e.embedding", "c.c")} DESC, c.j) AS rn
         |    FROM e, $cents c) WHERE rn = 1)""".stripMargin
    def updateCte(assign: String, prev: String, out: String): String =
      s"""${out}_m AS (
         |  SELECT cl AS j, pos,
         |    CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,8))) AS DOUBLE)
         |      / count(*) AS m
         |  FROM (
         |    SELECT a.cl, generate_subscripts(e.embedding, 1) AS pos,
         |      unnest(e.embedding) AS x
         |    FROM $assign a JOIN e USING (vec_id))
         |  GROUP BY 1, 2),
         |$out AS (
         |  SELECT p.j, coalesce(u.c, p.c) AS c
         |  FROM $prev p LEFT JOIN (
         |    SELECT j, list(m ORDER BY pos) AS c FROM ${out}_m GROUP BY j) u
         |    USING (j))""".stripMargin
    s"""e AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
       |init AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
       |  FROM (SELECT vec_id, embedding FROM e
       |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4)),
       |${assignCte("a0", "init")},
       |${updateCte("a0", "init", "c1")},
       |${assignCte("a1", "c1")},
       |${updateCte("a1", "c1", "c2")},
       |${assignCte("af", "c2")}""".stripMargin
  }

  /** Shared CTEs for the perceptual-hash oracles (q174/q175): pixel grid
    * from `valExpr` over the 18×16 textured BMP, exact 2×2 box sums, and
    * the dHash/aHash bit folds as HUGEINT (bit 63 overflows BIGINT mid-
    * sum; [[hugeToLong]] folds back to two's complement at the end) —
    * mirroring [[ext.Multimodal.imageHashes]] at the 9×8 grid.
    */
  private def imageHashCtes(valExpr: String): String =
    s"""px AS (
       |  SELECT d.doc_id, u.x, v.y, $valExpr AS val
       |  FROM documents d,
       |    unnest(generate_series(0, 17)) AS u(x),
       |    unnest(generate_series(0, 15)) AS v(y)),
       |bx AS (
       |  SELECT doc_id, x // 2 AS gx, y // 2 AS gy,
       |    CAST(sum(val) AS BIGINT) AS s
       |  FROM px GROUP BY doc_id, gx, gy),
       |dh AS (
       |  SELECT a.doc_id,
       |    CAST(coalesce(sum(CASE WHEN b.s > a.s
       |      THEN (1::HUGEINT << (a.gy * 8 + a.gx)) ELSE 0::HUGEINT END),
       |      0) AS HUGEINT) AS h
       |  FROM bx a JOIN bx b ON b.doc_id = a.doc_id AND b.gy = a.gy
       |    AND b.gx = a.gx + 1
       |  WHERE a.gx < 8
       |  GROUP BY a.doc_id),
       |tot AS (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS t
       |  FROM bx WHERE gx < 8 GROUP BY doc_id),
       |ah AS (
       |  SELECT b.doc_id,
       |    CAST(coalesce(sum(CASE WHEN b.s * 64 > t.t
       |      THEN (1::HUGEINT << (b.gy * 8 + b.gx)) ELSE 0::HUGEINT END),
       |      0) AS HUGEINT) AS h
       |  FROM bx b JOIN tot t USING (doc_id)
       |  WHERE b.gx < 8
       |  GROUP BY b.doc_id)""".stripMargin

  /** HUGEINT bit-fold → two's-complement BIGINT (bit 63 set ⇒ negative). */
  private def hugeToLong(h: String): String =
    s"CAST($h - CASE WHEN $h >= (1::HUGEINT << 63) " +
      s"THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END AS BIGINT)"

  /** Personalized-PageRank round CTEs shared by q133/q134: per round one
    * dangling-mass scalar m = (D·85)//100 (anti-join sum over the previous
    * ranks) and one grouped contribution sum, teleport and mass landing
    * per the e6-scaled node prior `wn` — the exact integer steps of
    * [[ext.LinkGraph.personalizedPageRank]]. Requires CTEs `e`, `nodes`
    * (id, wn), `od`, `r0` in scope; sums re-CAST to BIGINT (HUGEINT).
    */
  private def personalizedRoundsSql(iterations: Int): String =
    (1 to iterations).map { k =>
      val prev = s"r${k - 1}"
      s"""m$k AS (
         |  SELECT CAST((CAST(coalesce(sum(r.rank), 0) AS BIGINT) * 85) // 100
         |    AS BIGINT) AS m
         |  FROM $prev r LEFT JOIN od d ON d.src = r.id
         |  WHERE d.src IS NULL),
         |r$k AS (
         |  SELECT n.id, CAST((150000000000 * n.wn) // 1000000
         |      + coalesce(sum((r.rank * 85) // (100 * d.outdeg)), 0)
         |      + (mm.m * n.wn) // 1000000 AS BIGINT) AS rank
         |  FROM nodes n CROSS JOIN m$k mm
         |  LEFT JOIN e ON e.dst = n.id
         |  LEFT JOIN $prev r ON r.id = e.src
         |  LEFT JOIN od d ON d.src = e.src
         |  GROUP BY n.id, n.wn, mm.m)"""
    }.mkString(",\n")
}
