package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IPv4 network analytics: dotted-quad parsing and the LONGEST-PREFIX-
  * MATCH join that enriches a log's `remote_ip` column (the reference
  * schema's field 4, `scripts/oss_s3_server_side_logging_compacter
  * .py:22,106` — every S3 access-log row carries one) with CIDR-table
  * attributes: ASN / geo / office-egress / blocklist ranges.
  *
  * LPM is not an equi-join — a /16 and a /24 can both cover an address
  * and the MOST SPECIFIC must win — and the naive form (`ip BETWEEN
  * net_lo AND net_hi` theta-join, then pick) plans as a range join
  * that degenerates toward probe×nets at 100 TB. Spark-first shape
  * instead: every prefix length is a LITERAL, so each probe row
  * explodes to at most `maxLen − minLen + 1` `(len, ip >> (32−len))`
  * keys map-side, the network table (keyed the same way) broadcasts,
  * and the join is a plain hash equi-join; the most-specific pick is a
  * per-probe-row window over a frame bounded by the length-domain
  * constant (≤ 33 rows). Probe amplification is a CONSTANT factor —
  * bounded by the length domain, not by table sizes — and the corpus
  * never shuffles when the network table broadcasts.
  *
  * All arithmetic is integer (shifts by literal counts), so a DuckDB
  * oracle replays the match bit-for-bit.
  */
object Net {

  /** Dotted-quad IPv4 string → BIGINT in [0, 2^32), NULL when the
    * string is not a valid address (wrong shape, octet > 255, leading
    * signs). Pure codegen expressions — no UDF, ANSI-safe on EVERY
    * eval path: the validity condition contains no cast at all (octet
    * range is checked by zero-padded string comparison, the
    * `Privacy.anonymizeIpv4` idiom — vectorized boolean AND need not
    * short-circuit per row under ANSI, so a cast anywhere in the
    * condition could throw on rows the regex rejects), and the casts
    * in the value branch are reachable only for rows the regex
    * already proved are four 1–3 digit tokens.
    */
  def ipv4ToLong(ip: Column): Column = {
    val parts = split(ip, "\\.")
    val valid = ip.rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$") &&
      !exists(parts, p => lpad(p, 3, "0") > lit("255"))
    val oct = (i: Int) => element_at(parts, i + 1).cast("long")
    when(ip.isNotNull && valid,
      oct(0) * 16777216L + oct(1) * 65536L + oct(2) * 256L + oct(3))
  }

  /** BIGINT in [0, 2^32) → dotted-quad string (the inverse of
    * [[ipv4ToLong]] on valid addresses). NULL outside the range.
    */
  def longToIpv4(n: Column): Column =
    when(n.isNotNull && n >= 0L && n < 4294967296L,
      concat_ws(".",
        (n / 16777216L).cast("long").cast("string"),
        pmod((n / 65536L).cast("long"), lit(256L)).cast("string"),
        pmod((n / 256L).cast("long"), lit(256L)).cast("string"),
        pmod(n, lit(256L)).cast("string")))

  /** Longest-prefix-match join: for each row of `probes` (with a
    * UNIQUE `idCol` and a numeric IPv4 `ipCol` as produced by
    * [[ipv4ToLong]]), attach the columns of the most specific matching
    * row of `nets` — a CIDR table with integer columns `lenCol`
    * (prefix length, in [minLen, maxLen]) and `prefixCol`
    * (= network_address >> (32 − len); a `len = 0` default route has
    * `prefix = 0`). Unmatched / NULL-ip probes keep their row with the
    * net columns NULL (left-join semantics).
    *
    * Ties at the same length (duplicate `(len, prefix)` rows in
    * `nets`) break deterministically by the ascending sort of the
    * remaining `nets` columns, so the result is a pure function of the
    * inputs. Plan shape: probe explode (constant ≤ maxLen−minLen+1
    * amplification, map-side) → broadcast hash join on
    * `(len, prefix)` → per-probe-row window (frame ≤ the length
    * domain) → left join back on `idCol`.
    */
  def longestPrefixJoin(probes: DataFrame, idCol: String, ipCol: String,
                        nets: DataFrame, lenCol: String, prefixCol: String,
                        minLen: Int = 0, maxLen: Int = 32): DataFrame = {
    require(0 <= minLen && minLen <= maxLen && maxLen <= 32,
      s"need 0 <= minLen <= maxLen <= 32, got [$minLen, $maxLen]")
    val netCols = nets.columns.filter(c => c != lenCol && c != prefixCol)
    // probe keys: one (len, prefix-of-ip-at-len) struct per literal
    // length — shift counts are literals, so the whole explode codegens
    val keys = (minLen to maxLen).map { l =>
      struct(lit(l.toLong).as("__len"),
        shiftright(col(ipCol).cast("long"), 32 - l).cast("long")
          .as("__prefix"))
    }
    val cand = probes
      .filter(col(ipCol).isNotNull)
      .select(col(idCol).as("__pid"), explode(array(keys: _*)).as("__k"))
      .select(col("__pid"), col("__k.__len").as("__len"),
        col("__k.__prefix").as("__prefix"))
    val netsK = nets.select(
      (col(lenCol).cast("long").as("__len") +:
        col(prefixCol).cast("long").as("__prefix") +:
        netCols.map(col)): _*)
    val matched = cand
      .join(broadcast(netsK), Seq("__len", "__prefix"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__pid"))
          .orderBy((col("__len").desc +: netCols.map(c => col(c).asc)): _*)))
      .filter(col("__rk") === 1)
      .select((col("__pid") +: col("__len").as("matched_len") +:
        netCols.map(col)): _*)
    probes.join(matched, probes(idCol) === matched("__pid"), "left")
      .drop("__pid")
  }
}
