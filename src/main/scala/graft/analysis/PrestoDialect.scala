package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Presto/Athena → Spark dialect shims for every scalar function the
  * reference's SQL layer uses (`example_queries/days_apart_analysis.sql`;
  * inventory in SURVEY.md §2.3). Thin wrappers over codegen'd built-ins —
  * no UDFs, no custom expressions.
  */
object PrestoDialect {

  /** Presto 2-arg `regexp_replace(s, pat)` = delete every match
    * (`days_apart_analysis.sql:16`). Spark has no 2-arg form.
    */
  def regexpReplace(c: Column, pattern: String): Column =
    regexp_replace(c, pattern, "")

  /** Presto `regexp_extract(s, pat, group)` returns NULL on miss; Spark's
    * built-in returns `""`. Normalize to the Presto semantics
    * (`days_apart_analysis.sql:17`).
    */
  def regexpExtract(c: Column, pattern: String, group: Int): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))

  /** Presto `regexp_extract_all(s, pat, group)` → array of group matches
    * (`days_apart_analysis.sql:18,22`). Spark ≥3.1 built-in is identical.
    */
  def regexpExtractAll(c: Column, pattern: String, group: Int): Column =
    regexp_extract_all(c, lit(pattern), lit(group))

  /** Presto `array_join(arr, sep)` (`days_apart_analysis.sql:18,22`). */
  def arrayJoin(c: Column, sep: String): Column = array_join(c, sep)

  /** Presto `date_parse(s, fmt)` with MySQL-style format specifiers →
    * `to_timestamp` with a Java pattern (`days_apart_analysis.sql:18,22`).
    * Presto raises on a malformed string; we return null instead
    * (PERMISSIVE, deliberate divergence — a single bad key must not kill a
    * 100 TB scan; null then drops out of the days_apart filter).
    */
  def dateParse(c: Column, prestoFormat: String): Column =
    try_to_timestamp(c, lit(translateFormat(prestoFormat)))

  /** MySQL-style `%Y-%m-%d …` → Java `yyyy-MM-dd …`. Covers the specifiers
    * Presto documents for `date_parse`; unknown specifiers throw.
    */
  def translateFormat(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val ch = fmt.charAt(i)
      if (ch == '%' && i + 1 < fmt.length) {
        sb.append(fmt.charAt(i + 1) match {
          case 'Y' => "yyyy"; case 'y' => "yy"
          case 'm' => "MM"; case 'c' => "M"
          case 'd' => "dd"; case 'e' => "d"
          case 'H' => "HH"; case 'k' => "H"
          case 'h' | 'I' => "hh"; case 'l' => "h"
          case 'i' => "mm"; case 's' | 'S' => "ss"
          case 'f' => "SSSSSS"
          case 'p' => "a"
          case 'M' => "MMMM"; case 'b' => "MMM"
          case 'W' => "EEEE"; case 'a' => "EEE"
          case 'j' => "DDD"
          case 'T' => "HH:mm:ss"
          case '%' => "%"
          case other => throw new IllegalArgumentException(
            s"unsupported date_parse specifier %$other in '$fmt'")
        })
        i += 2
      } else {
        // Literal text: quote letters so Java's formatter doesn't eat them.
        if (ch.isLetter) sb.append('\'').append(ch).append('\'')
        else sb.append(ch)
        i += 1
      }
    }
    sb.toString
  }

  /** Presto `date_trunc(unit, ts)` (`days_apart_analysis.sql:19,23`) —
    * Spark built-in has the same (unit, col) shape.
    */
  def dateTrunc(unit: String, c: Column): Column = date_trunc(unit, c)

  /** Presto `date_diff(unit, from, to)` = `to - from` in whole units
    * (`days_apart_analysis.sql:21-24`). Only 'day' appears in the
    * reference; support the common units.
    */
  def dateDiff(unit: String, from: Column, to: Column): Column =
    unit.toLowerCase match {
      case "day"    => datediff(to_date(to), to_date(from)).cast("long")
      case "hour"   => ((unix_timestamp(to) - unix_timestamp(from)) / 3600L).cast("long")
      case "minute" => ((unix_timestamp(to) - unix_timestamp(from)) / 60L).cast("long")
      case "second" => (unix_timestamp(to) - unix_timestamp(from)).cast("long")
      case other => throw new IllegalArgumentException(s"unsupported date_diff unit $other")
    }
}
