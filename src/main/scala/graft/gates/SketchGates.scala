package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — bounded-relation sketches: HLL, KMV, AMS, Bloom, count-sketch, Misra-Gries, HDR quantiles, CMS (batch + per-group forms).
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object SketchGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext sketch — approximate distinct users per event type via the
    // library's OWN oracle-gated HLL (md5 registers, dyadic BIGINT
    // harmonic sum, one final division — the q249 path), so the gate
    // replays bit-for-bit in DuckDB. p=5 keeps the ln-free RAW
    // estimator in regime at gate scale (n ≥ 2.5·m needs m ≤ 60 for
    // the sf0.01 fixture's 150 users/type). Spark's builtin
    // approx_count_distinct (engine-internal HLL++ registers, the
    // formerly rows-only form) stays spec-pinned as a SHADOW in
    // FreqSketchSpec: both estimators must land near the exact count.
    "q22_approx_distinct" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      ext.FreqSketch.hllEstimateBy(
          ext.FreqSketch.hllSketchBy(ev, "event_type", "user_id", p = 5),
          p = 5)
        .select(col("grp").as("event_type"),
          col("estimate").as("approx_users"))
        .orderBy("event_type")
    }),

    // ext sketch-agg — corpus-level content sketches per source and the
    // estimated pairwise overlap between sources, via the library's OWN
    // oracle-gated HLL: each source's shingle set collapses to ≤ 2^p
    // registers (union-mergeable — the whole point of group sketches:
    // the pairwise matrix is #groups², never corpus-sized), and the
    // Jaccard estimate is inclusion–exclusion over the raw estimates
    // (|A|+|B|−|A∪B|)/|A∪B|, every term one exact-integer division the
    // DuckDB oracle replays bit-for-bit. The formerly rows-only
    // MinHash-union form (xxh64 signatures, MinHashUnionAgg) stays
    // spec-pinned as a SHADOW in FreqSketchSpec: both overlap
    // estimators must track the exact shingle-set Jaccard.
    "q39_group_sketch" -> ((s, dir) => {
      val sh = tbl(s, dir, "documents")
        .filter(col("source").isNotNull && col("text").isNotNull)
        .select(col("source"),
          explode(Dedup.shingles(col("text"))).as("shingle"))
      val sk = ext.FreqSketch.hllSketchBy(sh, "source", "shingle", p = 8)
      ext.FreqSketch.hllPairwiseOverlap(sk, p = 8)
        .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
          col("est_union"), col("est_jaccard"))
        .orderBy("src_a", "src_b")
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

    // ext sketch — deterministic t-digest (k0 rank-clustered): the
    // mergeable-quantile complement to HDR for unbounded/real value
    // domains. Three order-key shards summarize to ≤ δ+1 centroid
    // rows each (exact per-shard rank windows, integer DIV bucketing),
    // merge re-clusters the ≤ 3(δ+1)-row summary union, and quantile
    // reads report the exact [vmin, vmax] bracket (the true quantile
    // is ALWAYS inside — TDigestSpec pins it) plus a fixed-IEEE
    // interpolation estimate. Every arithmetic step up to the final
    // double is integer/decimal exact, so the oracle replays the
    // whole digest bit-for-bit.
    "q259_tdigest_quantiles" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
        .select((col("o_orderkey") % 3L).as("shard"),
          col("o_totalprice").as("v"))
      val delta = 32
      val perShard = (0L to 2L).map(i =>
        ext.TDigest.tdigestSummarize(vals.filter(col("shard") === i),
          "v", "shard", delta))
      val digest = ext.TDigest.tdigestMerge(perShard, delta)
      ext.TDigest.tdigestQuantiles(digest, Seq(0.1, 0.5, 0.9, 0.99))
        .select(col("qi"), col("q"), col("n"), col("target_rank"),
          col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"),
          (col("vmin").cast("double") <= col("estimate") &&
            col("estimate") <= col("vmax").cast("double"))
            .as("est_in_bracket"))
        .orderBy("qi")
    }),

    // ext sketch — WEIGHTED t-digest: each row stands for `weight`
    // copies of its value (the cmsSketch weight convention), so
    // quantiles answer over the weighted multiset — price quantiles
    // weighted by quantity here; latency-by-request-count or
    // size-by-token-count in production. Four supplier shards
    // summarize in one pass; one re-cluster merges; brackets stay
    // exact over weighted ranks.
    "q265_tdigest_weighted" -> ((s, dir) => {
      val vals = tbl(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull &&
          col("l_quantity").isNotNull && col("l_suppkey").isNotNull)
        .select((col("l_suppkey") % 4L).as("shard"),
          col("l_extendedprice").as("v"), col("l_quantity").as("wt"))
      val delta = 32
      val digest = ext.TDigest.tdigestMerge(Seq(
        ext.TDigest.tdigestSummarize(vals, "v", "shard", delta,
          weightCol = Some("wt"))), delta)
      ext.TDigest.tdigestQuantiles(digest, Seq(0.5, 0.95))
        .select(col("qi"), col("q"), col("n"), col("target_rank"),
          col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"))
        .orderBy("qi")
    }),

    // ext sketch — per-GROUP t-digest quantiles (the q249/q250
    // per-group sketch shape for real-valued domains): one summarize
    // with the group key as the shard column gives each group its
    // ≤ δ+1-row digest in one pass; quantile picks work the
    // groups·(δ+1)-row digest frame only. Exact [vmin, vmax] brackets
    // per (group, q), replayed bit-for-bit.
    "q264_tdigest_by_group" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull &&
          col("o_orderpriority").isNotNull)
        .select(col("o_orderpriority").as("grp"),
          col("o_totalprice").as("v"))
      val delta = 16
      val digest = ext.TDigest.tdigestSummarize(vals, "v", "grp", delta)
      ext.TDigest.tdigestQuantilesByGroup(digest, Seq(0.5, 0.9))
        .select(col("shard").as("grp"), col("qi"), col("q"), col("n"),
          col("target_rank"), col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"))
        .orderBy("grp", "qi")
    }),

    // ext sketch — per-group digest MERGE across "days": daily
    // per-priority digests (the artifact worth storing) re-cluster
    // within each group, and the monthly per-group quantile read works
    // the merged ≤ groups·(δ+1)-row frame — days never re-read. Exact
    // brackets survive the merge per group.
    "q266_tdigest_group_merge" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull &&
          col("o_orderpriority").isNotNull && col("o_orderkey").isNotNull)
        .select((col("o_orderkey") % 2L).as("day"),
          col("o_orderpriority").as("grp"), col("o_totalprice").as("v"))
      val delta = 16
      val perDay = (0L to 1L).map(d =>
        ext.TDigest.tdigestSummarize(
          vals.filter(col("day") === d), "v", "grp", delta))
      val merged = ext.TDigest.tdigestMergeByGroup(perDay, delta)
      ext.TDigest.tdigestQuantilesByGroup(merged, Seq(0.5, 0.9))
        .select(col("shard").as("grp"), col("qi"), col("q"), col("n"),
          col("target_rank"), col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"))
        .orderBy("grp", "qi")
    }),

    // ext sketch — CMS inner-product join-size estimate: the planner
    // primitive that prices |A ⋈ B| from two Depth×width sketches
    // BEFORE committing the real join's shuffle. Per slice the bucket
    // dot product = true join size + nonnegative collision mass, so
    // min-over-slices never under-estimates — `never_under` asserts
    // the guarantee as data against the exact join size riding along
    // (a 1-row global aggregate broadcast).
    "q262_join_size_estimate" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("event_id").isNotNull)
      val width = 1024
      val a = ext.FreqSketch.cmsSketch(
        ev.filter(col("event_id") % 2 === 0), "user_id", width)
      val b = ext.FreqSketch.cmsSketch(
        ev.filter(col("event_id") % 2 === 1), "user_id", width)
      val exact = ev.filter(col("event_id") % 2 === 0)
        .groupBy("user_id").agg(count(lit(1)).as("ca"))
        .join(ev.filter(col("event_id") % 2 === 1)
          .groupBy("user_id").agg(count(lit(1)).as("cb")), "user_id")
        .agg(sum(col("ca") * col("cb")).cast("long")
          .as("exact_join_size"))
      ext.FreqSketch.cmsJoinSize(a, b)
        .crossJoin(broadcast(exact))
        .select(col("j").cast("long").as("j"), col("dot"),
          col("join_size_est"), col("exact_join_size"),
          (col("join_size_est") >= col("exact_join_size"))
            .as("never_under"))
        .orderBy("j")
    }),
  )

  /** t-digest replay (q259): the identical per-shard rank windows and
    * integer `//` (= Spark `DIV`) k0 bucketing, the identical
    * `(vmin, vmax, weight, sumv)` merge ordering, floor-then-cast
    * target ranks (Spark's double→long cast truncates, DuckDB's
    * rounds — floor first is identical), and the same fixed IEEE
    * interpolation over exact decimal operands. `def` for object-init
    * order safety.
    */
  private def TDigestOracle: String = {
    val delta = 32
    s"""WITH vals AS (
       |  SELECT o_orderkey % 3 AS shard,
       |    CAST(o_totalprice AS DECIMAL(28,8)) AS v
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL),
       |w AS (
       |  SELECT shard, v, CAST(count(*) AS BIGINT) AS w
       |  FROM vals GROUP BY 1, 2),
       |rk AS (
       |  SELECT shard, v, w,
       |    sum(w) OVER (PARTITION BY shard ORDER BY v) AS cum,
       |    sum(w) OVER (PARTITION BY shard) AS n
       |  FROM w),
       |cl AS (
       |  SELECT shard, v, w, ((cum - w) * $delta) // n AS cluster
       |  FROM rk),
       |dig AS (
       |  SELECT shard, cluster, CAST(sum(w) AS BIGINT) AS weight,
       |    CAST(sum(v * w) AS DECIMAL(28,8)) AS sumv,
       |    min(v) AS vmin, max(v) AS vmax
       |  FROM cl GROUP BY 1, 2),
       |${tdigestReclusterSql("dig", "mg", delta)},
       |mr AS (
       |  SELECT weight, sumv, vmin, vmax,
       |    sum(weight) OVER (ORDER BY vmin, vmax, weight, sumv
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(weight) OVER () AS n
       |  FROM mg),
       |qs(qi, q) AS (VALUES (0, 0.1), (1, 0.5), (2, 0.9), (3, 0.99)),
       |pick AS (
       |  SELECT qi, q, n,
       |    CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS target_rank,
       |    weight, vmin, vmax, cum - weight AS bef
       |  FROM qs JOIN mr
       |    ON CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT)
       |      BETWEEN cum - weight AND cum - 1)
       |SELECT CAST(qi AS BIGINT) AS qi, CAST(q AS DOUBLE) AS q,
       |  CAST(n AS BIGINT) AS n, target_rank, weight,
       |  CAST(vmin AS DOUBLE) AS vmin_d, CAST(vmax AS DOUBLE) AS vmax_d,
       |  CAST(vmin AS DOUBLE) + CAST(vmax - vmin AS DOUBLE) *
       |    (CAST(target_rank - bef AS DOUBLE) /
       |      CAST(greatest(weight - 1, 1) AS DOUBLE)) AS estimate,
       |  (CAST(vmin AS DOUBLE) <=
       |      CAST(vmin AS DOUBLE) + CAST(vmax - vmin AS DOUBLE) *
       |        (CAST(target_rank - bef AS DOUBLE) /
       |          CAST(greatest(weight - 1, 1) AS DOUBLE))
       |    AND CAST(vmin AS DOUBLE) + CAST(vmax - vmin AS DOUBLE) *
       |        (CAST(target_rank - bef AS DOUBLE) /
       |          CAST(greatest(weight - 1, 1) AS DOUBLE))
       |      <= CAST(vmax AS DOUBLE)) AS est_in_bracket
       |FROM pick ORDER BY qi""".stripMargin
  }

  /** CMS join-size replay (q262): both sketches rebuilt from the same
    * md5 8-hex slices (the [[Support.hexFold]] ascii decode), per-slice
    * integer dot products, min over slices via a window, and the exact
    * `Σ cntA·cntB` join size — all integers, bit-replayable.
    */
  private def JoinSizeOracle: String = {
    val width = 1024
    def cells(src: String, out: String): String =
      (0 until ext.FreqSketch.Depth).map(j =>
        s"SELECT $j AS j, ${hexFold(s"${j * 8 + 1}", 8)} % $width " +
          s"AS bucket, CAST(count(*) AS BIGINT) AS cnt " +
          s"FROM $src GROUP BY 2").mkString(s"$out AS (",
        "\n  UNION ALL ", ")")
    s"""WITH ev AS (
       |  SELECT user_id, event_id % 2 AS side FROM events
       |  WHERE user_id IS NOT NULL AND event_id IS NOT NULL),
       |ha AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx
       |  FROM ev WHERE side = 0),
       |hb AS (SELECT md5(CAST(user_id AS VARCHAR)) AS hx
       |  FROM ev WHERE side = 1),
       |${cells("ha", "ca")},
       |${cells("hb", "cb")},
       |dots AS (
       |  SELECT ca.j, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS dot
       |  FROM ca JOIN cb ON ca.j = cb.j AND ca.bucket = cb.bucket
       |  GROUP BY 1),
       |dom AS (SELECT unnest(generate_series(0,
       |  ${ext.FreqSketch.Depth - 1})) AS j),
       |dfull AS (
       |  SELECT dom.j, CAST(coalesce(d.dot, 0) AS BIGINT) AS dot
       |  FROM dom LEFT JOIN dots d USING (j)),
       |m AS (SELECT j, dot,
       |  CAST(min(dot) OVER () AS BIGINT) AS join_size_est FROM dfull),
       |exact AS (
       |  SELECT CAST(sum(x.ca * y.cb) AS BIGINT) AS exact_join_size
       |  FROM (SELECT user_id, count(*) AS ca FROM ev
       |        WHERE side = 0 GROUP BY 1) x
       |  JOIN (SELECT user_id, count(*) AS cb FROM ev
       |        WHERE side = 1 GROUP BY 1) y USING (user_id))
       |SELECT CAST(m.j AS BIGINT) AS j, m.dot, m.join_size_est,
       |  e.exact_join_size,
       |  (m.join_size_est >= e.exact_join_size) AS never_under
       |FROM m CROSS JOIN exact e ORDER BY 1""".stripMargin
  }

  /** Per-group t-digest replay (q264): the [[TDigestOracle]] summarize
    * machinery with the group key as the shard, rank windows and
    * quantile band picks PARTITIONED BY the group — same integer/
    * decimal-exact arithmetic, one output row per (group, q).
    */
  private def TDigestByGroupOracle: String = {
    val delta = 16
    s"""WITH vals AS (
       |  SELECT o_orderpriority AS shard,
       |    CAST(o_totalprice AS DECIMAL(28,8)) AS v
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
       |w AS (
       |  SELECT shard, v, CAST(count(*) AS BIGINT) AS w
       |  FROM vals GROUP BY 1, 2),
       |rk AS (
       |  SELECT shard, v, w,
       |    sum(w) OVER (PARTITION BY shard ORDER BY v) AS cum,
       |    sum(w) OVER (PARTITION BY shard) AS n
       |  FROM w),
       |dig AS (
       |  SELECT shard, CAST(sum(w) AS BIGINT) AS weight,
       |    CAST(sum(v * w) AS DECIMAL(28,8)) AS sumv,
       |    min(v) AS vmin, max(v) AS vmax
       |  FROM (SELECT shard, v, w, ((cum - w) * $delta) // n AS cluster
       |        FROM rk) t
       |  GROUP BY shard, cluster),
       |k AS (
       |  SELECT shard, weight, sumv, vmin, vmax,
       |    sum(weight) OVER (PARTITION BY shard
       |      ORDER BY vmin, vmax, weight, sumv
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(weight) OVER (PARTITION BY shard) AS n
       |  FROM dig),
       |qs(qi, q) AS (VALUES (0, 0.5), (1, 0.9)),
       |pick AS (
       |  SELECT shard, qi, q, n,
       |    CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS target_rank,
       |    weight, vmin, vmax, cum - weight AS bef
       |  FROM qs JOIN k
       |    ON CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT)
       |      BETWEEN cum - weight AND cum - 1)
       |SELECT shard AS grp, CAST(qi AS BIGINT) AS qi,
       |  CAST(q AS DOUBLE) AS q, CAST(n AS BIGINT) AS n, target_rank,
       |  weight, CAST(vmin AS DOUBLE) AS vmin_d,
       |  CAST(vmax AS DOUBLE) AS vmax_d,
       |  CAST(vmin AS DOUBLE) + CAST(vmax - vmin AS DOUBLE) *
       |    (CAST(target_rank - bef AS DOUBLE) /
       |      CAST(greatest(weight - 1, 1) AS DOUBLE)) AS estimate
       |FROM pick ORDER BY 1, 2""".stripMargin
  }

  /** Weighted t-digest replay (q265): the q259 machinery with
    * w = Σ l_quantity multiplicities instead of row counts (integer-
    * valued in TPC-H, so the BIGINT cast is engine-identical), four
    * supplier shards summarized per (shard, cluster), ONE re-cluster
    * merge, weighted-rank quantile picks.
    */
  private def TDigestWeightedOracle: String = {
    val delta = 32
    s"""WITH vals AS (
       |  SELECT l_suppkey % 4 AS shard,
       |    CAST(l_extendedprice AS DECIMAL(28,8)) AS v,
       |    CAST(l_quantity AS BIGINT) AS wt
       |  FROM lineitem
       |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
       |    AND l_suppkey IS NOT NULL AND CAST(l_quantity AS BIGINT) > 0),
       |w AS (
       |  SELECT shard, v, CAST(sum(wt) AS BIGINT) AS w
       |  FROM vals GROUP BY 1, 2),
       |rk AS (
       |  SELECT shard, v, w,
       |    sum(w) OVER (PARTITION BY shard ORDER BY v) AS cum,
       |    sum(w) OVER (PARTITION BY shard) AS n
       |  FROM w),
       |dig AS (
       |  SELECT CAST(sum(w) AS BIGINT) AS weight,
       |    CAST(sum(v * w) AS DECIMAL(28,8)) AS sumv,
       |    min(v) AS vmin, max(v) AS vmax
       |  FROM (SELECT shard, v, w, ((cum - w) * $delta) // n AS cluster
       |        FROM rk) t
       |  GROUP BY shard, cluster),
       |${tdigestReclusterSql("dig", "mg", delta)},
       |mr AS (
       |  SELECT weight, sumv, vmin, vmax,
       |    sum(weight) OVER (ORDER BY vmin, vmax, weight, sumv
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(weight) OVER () AS n
       |  FROM mg),
       |qs(qi, q) AS (VALUES (0, 0.5), (1, 0.95)),
       |pick AS (
       |  SELECT qi, q, n,
       |    CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS target_rank,
       |    weight, vmin, vmax, cum - weight AS bef
       |  FROM qs JOIN mr
       |    ON CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT)
       |      BETWEEN cum - weight AND cum - 1)
       |SELECT CAST(qi AS BIGINT) AS qi, CAST(q AS DOUBLE) AS q,
       |  CAST(n AS BIGINT) AS n, target_rank, weight,
       |  CAST(vmin AS DOUBLE) AS vmin_d, CAST(vmax AS DOUBLE) AS vmax_d,
       |  CAST(vmin AS DOUBLE) + CAST(vmax - vmin AS DOUBLE) *
       |    (CAST(target_rank - bef AS DOUBLE) /
       |      CAST(greatest(weight - 1, 1) AS DOUBLE)) AS estimate
       |FROM pick ORDER BY qi""".stripMargin
  }

  /** Per-group digest-merge replay (q266): per-(day, group) summarize
    * — rank windows partitioned by (day, shard) — then the union's
    * re-cluster partitioned by shard alone, then per-group quantile
    * picks; same exact arithmetic throughout.
    */
  private def TDigestGroupMergeOracle: String = {
    val delta = 16
    s"""WITH vals AS (
       |  SELECT o_orderkey % 2 AS day, o_orderpriority AS shard,
       |    CAST(o_totalprice AS DECIMAL(28,8)) AS v
       |  FROM orders
       |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
       |    AND o_orderkey IS NOT NULL),
       |w AS (
       |  SELECT day, shard, v, CAST(count(*) AS BIGINT) AS w
       |  FROM vals GROUP BY 1, 2, 3),
       |rk AS (
       |  SELECT day, shard, v, w,
       |    sum(w) OVER (PARTITION BY day, shard ORDER BY v) AS cum,
       |    sum(w) OVER (PARTITION BY day, shard) AS n
       |  FROM w),
       |dig AS (
       |  SELECT shard, CAST(sum(w) AS BIGINT) AS weight,
       |    CAST(sum(v * w) AS DECIMAL(28,8)) AS sumv,
       |    min(v) AS vmin, max(v) AS vmax
       |  FROM (SELECT day, shard, v, w,
       |          ((cum - w) * $delta) // n AS cluster FROM rk) t
       |  GROUP BY day, shard, cluster),
       |${tdigestReclusterSql("dig", "mg", delta, grp = Some("shard"))},
       |k AS (
       |  SELECT shard, weight, sumv, vmin, vmax,
       |    sum(weight) OVER (PARTITION BY shard
       |      ORDER BY vmin, vmax, weight, sumv
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |    sum(weight) OVER (PARTITION BY shard) AS n
       |  FROM mg),
       |qs(qi, q) AS (VALUES (0, 0.5), (1, 0.9)),
       |pick AS (
       |  SELECT shard, qi, q, n,
       |    CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS target_rank,
       |    weight, vmin, vmax, cum - weight AS bef
       |  FROM qs JOIN k
       |    ON CAST(floor(q * CAST(n - 1 AS DOUBLE)) AS BIGINT)
       |      BETWEEN cum - weight AND cum - 1)
       |SELECT shard AS grp, CAST(qi AS BIGINT) AS qi,
       |  CAST(q AS DOUBLE) AS q, CAST(n AS BIGINT) AS n, target_rank,
       |  weight, CAST(vmin AS DOUBLE) AS vmin_d,
       |  CAST(vmax AS DOUBLE) AS vmax_d,
       |  CAST(vmin AS DOUBLE) + CAST(vmax - vmin AS DOUBLE) *
       |    (CAST(target_rank - bef AS DOUBLE) /
       |      CAST(greatest(weight - 1, 1) AS DOUBLE)) AS estimate
       |FROM pick ORDER BY 1, 2""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(

    "q259_tdigest_quantiles" -> TDigestOracle,

    "q262_join_size_estimate" -> JoinSizeOracle,

    "q264_tdigest_by_group" -> TDigestByGroupOracle,

    "q265_tdigest_weighted" -> TDigestWeightedOracle,

    "q266_tdigest_group_merge" -> TDigestGroupMergeOracle,

    // CMS replay: same md5 hex slices decoded via ascii fold, same
    // % width buckets, same min-over-4-slices with absent cells = 0
    "q224_cms_heavy_hitters" -> cmsOracle(width = 1024, probeMod = 97,
      minCount = 60),

    "q235_hll_distinct" -> HllOracle,

    "q238_hdr_quantiles" -> HdrOracle,

    "q239_bloom_filter" -> BloomOracle,

    "q240_kmv_distinct" -> KmvOracle,

    "q241_ams_sketch" -> AmsOracle,

    "q244_count_sketch" -> CountSketchOracle,

    "q245_misra_gries" -> MisraGriesOracle,

    "q22_approx_distinct" -> ApproxDistinctOracle,

    "q39_group_sketch" -> GroupSketchOracle,

    "q249_hll_by_group" -> HllByGroupOracle,

    "q250_hdr_by_group" -> HdrByGroupOracle,

    "q251_kmv_set_algebra" -> KmvSetAlgebraOracle,
  )
}
