package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — privacy family: PII redaction, IP anonymization, k-anonymity/l-diversity audit, DP count release.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object PrivacyGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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

    // ext privacy — ε-DP clipped-sum/mean release: per-ENTITY
    // contribution totals are clipped into [-2, 5] before the group
    // sum, bounding the sensitivity one user can exert no matter how
    // many events they carry (a raw sum release has unbounded
    // sensitivity and is unprotectable). The clipped sum is snapped to
    // the Δ=5 grid (exact floor-div arithmetic) and released with
    // Δ-scaled discrete-Laplace noise; the entity count rides its own
    // budget; the mean is post-processing. The gate rides the exact
    // clipped sums along to reconcile both draws and their clamp
    // bounds; a REAL release ships the noisy columns only.
    "q261_dp_sums" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        // the caller picks the integer grid: whole value units here
        .withColumn("vq",
          floor(col("value")).cast("long"))
      val noisy = ext.Privacy.dpSums(ev, Seq("event_type"), "user_id",
        "vq", clipLo = -2L, clipHi = 5L,
        epsilonSum = 1.0, epsilonCount = 0.5)
      val exact = ev.groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("vq")).as("__c"))
        .withColumn("__clipped",
          greatest(lit(-2L), least(lit(5L),
            coalesce(col("__c"), lit(0L)))))
        .groupBy(col("event_type"))
        .agg(sum(col("__clipped")).as("sum_clipped_true"),
          count(lit(1)).as("n_true"))
      noisy.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_true"),
          col("sum_clipped_true"), col("sum_snapped"),
          col("sum_noisy"), col("n_noisy"), col("mean_noisy"),
          (col("sum_noisy") - col("sum_snapped")).as("noise_sum"),
          (abs(col("sum_noisy") - col("sum_snapped"))
              <= col("noise_bound_sum") &&
            abs(col("n_noisy") - col("n_true")) <= col("noise_bound_n"))
            .as("within_bounds"))
        .orderBy("event_type")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // literal alternation: same leftmost-first semantics as the engine's
    // (start asc, list order) sweep; no two patterns share a start here
    "q125_multi_redact" ->
      """SELECT doc_id,
        |  regexp_replace(text, 'data|row|table|the', '[X]', 'g') AS clean_text,
        |  CAST(length(regexp_replace(text, 'data|row|table|the', '[X]', 'g')) AS BIGINT) AS n_chars_clean
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

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

    "q233_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS group_size,
        |  CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_distinct,
        |  (count(*) < 12 OR count(DISTINCT c_acctbal) < 5) AS at_risk
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q246_dp_counts" -> DpCountsOracle,

    "q261_dp_sums" -> DpSumsOracle,
  )
}
