package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — sampling & splits: hash/stratified/weighted/reservoir-adjacent sampling, k-fold, leakage-safe splits, bootstrap inference.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object SamplingGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext sampling — deterministic content-hash sampling (~15.6%): the
    // reproducible alternative to TABLESAMPLE (whose row choice is
    // engine/partitioning-dependent); the same idiom stratifies by any key.
    "q45_sample_hash" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "28")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
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

    // ext sampling — deterministic fixed-size cap per group: first 20 of
    // each language by md5-of-key rank (a pure function of the rows, like
    // every sampler here).
    "q91_per_group_sample" -> ((s, dir) => {
      ext.Sampling.perGroupSample(tbl(s, dir, "documents"),
          "doc_id", "lang", k = 20)
        .select("doc_id", "lang")
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
    }),
  )

  val oracleSql: Map[String, String] = Map(

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

    "q91_per_group_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20
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

    "q45_sample_hash" ->
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
        |ORDER BY doc_id""".stripMargin,

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

    "q254_poisson_bootstrap" -> BootstrapOracle,

    "q257_bootstrap_ab" -> BootstrapAbOracle,
  )
}
