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
}
