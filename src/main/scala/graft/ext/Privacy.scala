package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy transforms for log analytics — the step between "we keep
  * access logs" and "analysts may query them": pseudonymize the
  * identifying fields while PRESERVING the join/group structure the
  * analytics actually need. Complements the PII redaction operators
  * (q69/q125), which remove identifiers from free text; these rewrite
  * STRUCTURED identifiers deterministically.
  */
object Privacy {

  /** Prefix-preserving IPv4 pseudonymization (the Crypto-PAn property,
    * keyed-hash construction): octet i of the output depends only on
    * the KEY and octets 1..i of the input — so two addresses sharing a
    * real /8, /16 or /24 prefix share the pseudonymized prefix to the
    * same depth, and subnet-level aggregations (the reason access logs
    * keep IPs at all) still work on the pseudonymized column. Same key
    * ⇒ same mapping across runs and tables (joins survive); without
    * the key the mapping is a keyed one-way hash per prefix.
    *
    * Construction: anon_i = first byte of md5(key ‖ "/i:" ‖
    * octets₁..ᵢ) — pure codegen'd column expressions (md5/concat/conv),
    * no UDF, and externally replayable by any engine with md5 (the
    * oracle recomputes it in SQL). This is the pragmatic keyed-hash
    * variant: full Crypto-PAn preserves prefixes at BIT granularity
    * via AES; octet granularity is what log analytics group by, at a
    * fraction of the cost. Inputs that are not dotted-quad IPv4 return
    * NULL (sentinel '-' and IPv6 route elsewhere).
    */
  def anonymizeIpv4(ip: Column, key: String): Column = {
    require(key.nonEmpty, "key must not be empty")
    val parts = split(ip, "\\.")
    def octet(i: Int): Column = {
      // prefix = octets 1..i joined — the only input the hash sees
      val prefix = array_join(slice(parts, 1, i), ".")
      conv(substring(md5(concat(lit(key), lit(s"/$i:"), prefix)), 1, 2),
        16, 10)
    }
    // octet range check WITHOUT a numeric cast: under ANSI a cast of a
    // non-numeric token would throw even on rows the regex branch
    // rejects (no per-row short-circuit in vectorized eval); zero-padded
    // string comparison is total and equivalent for 1-3 digit tokens
    val valid = ip.rlike("^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$") &&
      !exists(parts, p => lpad(p, 3, "0") > lit("255"))
    when(ip.isNull || !valid, lit(null).cast("string"))
      .otherwise(concat_ws(".", octet(1), octet(2), octet(3), octet(4)))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns —
    * the release gate a dataset must pass before its rows can be
    * shared: every quasi-identifier combination must be carried by at
    * least k rows (k-anonymity, Sweeney 2002), and within each such
    * group the sensitive attribute must take at least l distinct
    * values (distinct l-diversity, Machanavajjhala et al. 2007 — a
    * k-anonymous group whose members all share one diagnosis still
    * leaks it).
    *
    * @param df            the dataset to audit.
    * @param qiCols        quasi-identifier columns (the combination an
    *                      attacker can look up externally). NULL is a
    *                      value like any other: rows with NULL QI
    *                      values form their own groups (an all-NULL
    *                      row is still a linkable signature).
    * @param sensitiveCol  the sensitive attribute for l-diversity;
    *                      None → `l_distinct` is NULL and only the
    *                      k test applies.
    * @param k             minimum group size.
    * @param l             minimum distinct sensitive values per group.
    * @return one row per distinct QI combination: the QI columns,
    *         `group_size`, `l_distinct` (NULL without a sensitive
    *         column), and `at_risk` — true when the group fails
    *         either bar.
    *
    * Scale shape: ONE hash aggregate keyed on the QI columns
    * (map-side combined; count_distinct of the sensitive column is the
    * standard two-phase distinct aggregate) — no window, no join, no
    * driver action. The output is QI-cardinality-sized; callers gate a
    * release on `at_risk` rows (count or anti-join back to suppress).
    */
  def kAnonymity(df: org.apache.spark.sql.DataFrame, qiCols: Seq[String],
                 sensitiveCol: Option[String], k: Long,
                 l: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    val aggs = count(lit(1)).as("group_size") +:
      sensitiveCol.map(s =>
        count_distinct(col(s)).as("l_distinct")).toSeq
    val grouped = df.groupBy(qiCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val withL =
      if (sensitiveCol.isDefined) grouped
      else grouped.withColumn("l_distinct", lit(null).cast("long"))
    withL.withColumn("at_risk",
      col("group_size") < k ||
        (if (sensitiveCol.isDefined) col("l_distinct") < l else lit(false)))
  }
}
