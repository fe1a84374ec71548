package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — document quality scoring and curation pipelines (Gopher/C4-style rules, profiles, the composed training-data capstones).
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object QualityGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext curation — the full pipeline: quality gate → exact dedup →
    // MinHash near-dedup, one deterministic pass (Curation.curate).
    "q35_curate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ext.Curation.curate(docs, "doc_id", "text", minQuality = 0.8)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
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
  )

  val oracleSql: Map[String, String] = Map(

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
  )
}
