package graft.logs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Raw access-log lines → typed 19-column DataFrame, as pure column
  * expressions (whole-stage-codegen friendly, no UDFs, no Python/RDD hop).
  *
  * Grammar: the 18-group regex of the reference
  * (`scripts/oss_s3_server_side_logging_compacter.py:21-25`), translated
  * Python→Java (named groups dropped; applied unanchored, matching
  * `re.search` — Spark's `rlike`/`regexp_extract` use `Matcher.find`).
  *
  * Semantics preserved bit-for-bit (reference `:45-100`):
  *   - unparseable line → 18 nulls + `error_line` = raw text;
  *   - `'-'` sentinel → null for `key`, `http_status`, `error_code`,
  *     `bytes_sent`, `object_size`, `total_time`, `turn_around_time`,
  *     `version_id`; the 3-char `'"-"'` sentinel for `referrer`/`user_agent`;
  *     `request` is never nulled and keeps its surrounding quotes;
  *   - `version_id` captures exactly ONE non-space char (`(?P<version>\S)`,
  *     a reference quirk kept for fidelity);
  *   - timestamp: text between `[` and the first space, parsed as
  *     `dd/MMM/yyyy:HH:mm:ss`; the `+0000` offset is discarded (reference
  *     `:37-42` slices it off before parsing) → naive UTC; parse failure →
  *     null (reference returns None on exception).
  */
object LogLineParser {

  /** Java translation of S3_ACCESS_LOG_PATTERN (reference `:21-25`). */
  val Pattern: String =
    """(\S+) (\S+) (\[[^\]]*\]) (\S+) (\S+) (\S+) (\S+) (\S+) ("[^"]*"|-) """ +
    """(\S+) (\S+) (\S+) (\S+) (\S+) (\S+) ("[^"]*"|-) ("[^"]*"|-) (\S)"""

  // Capture-group numbers, 1-based, in pattern order.
  private val Owner = 1; private val Bucket = 2; private val Time = 3
  private val Ip = 4; private val Requester = 5; private val ReqId = 6
  private val Operation = 7; private val Key = 8; private val Request = 9
  private val Status = 10; private val Error = 11; private val Bytes = 12
  private val Size = 13; private val TotalTime = 14; private val Turnaround = 15
  private val Referrer = 16; private val UserAgent = 17; private val Version = 18

  /** Parse a one-string-column DataFrame (default column `value`, as
    * produced by `spark.read.text`) into the canonical 19-column frame.
    */
  def parse(raw: DataFrame, lineCol: String = "value"): DataFrame = {
    val line = col(lineCol)
    val matched = line.rlike(Pattern)

    def g(i: Int): Column = regexp_extract(line, Pattern, i)
    // Guard every field on `matched` — regexp_extract returns "" (not null)
    // when the pattern misses, which must become null, not empty string.
    def field(c: Column): Column = when(matched, c)
    def str(i: Int): Column = field(g(i))
    def dashNull(i: Int): Column = field(nullif(g(i), lit("-")))
    def quotedDashNull(i: Int): Column = field(nullif(g(i), lit("\"-\"")))
    // PERMISSIVE under ANSI mode: numeric fields parse only when they look
    // numeric; '-' and anything else → null instead of an ANSI cast error
    // (matches the reference's sentinel guard; a non-numeric token would
    // have crashed the reference's int(), we degrade to null by design).
    def dashNullAs(i: Int, t: org.apache.spark.sql.types.DataType): Column = {
      val c = g(i)
      field(when(c.rlike("^-?[0-9]+$"), c.cast(t)))
    }

    // Reference time munging (`:37-42`): keep only the text between '[' and
    // the first space — i.e. drop the numeric offset — then lenient-parse;
    // try_to_timestamp → null on failure (the reference returns None).
    val tsText = regexp_extract(g(Time), """\[([^ \]]+)""", 1)
    val requestTime = field(try_to_timestamp(tsText, lit("dd/MMM/yyyy:HH:mm:ss")))

    raw.select(
      str(Owner).as("bucket_owner"),
      str(Bucket).as("s3_bucket"),
      requestTime.as("request_time"),
      str(Ip).as("remote_ip"),
      str(Requester).as("requester"),
      str(ReqId).as("request_id"),
      str(Operation).as("operation"),
      dashNull(Key).as("key"),
      str(Request).as("request"),
      dashNullAs(Status, IntegerType).as("http_status"),
      dashNull(Error).as("error_code"),
      dashNullAs(Bytes, LongType).as("bytes_sent"),
      dashNullAs(Size, LongType).as("object_size"),
      dashNullAs(TotalTime, LongType).as("total_time"),
      dashNullAs(Turnaround, LongType).as("turn_around_time"),
      quotedDashNull(Referrer).as("referrer"),
      quotedDashNull(UserAgent).as("user_agent"),
      dashNull(Version).as("version_id"),
      when(matched, lit(null).cast("string")).otherwise(line).as("error_line")
    )
  }

  /** Drop blank / whitespace-only lines before parsing (reference
    * `s3_read_file` strips each line and skips empties, `:165-167`).
    * `rlike("\\S")` rather than `trim`: Spark's trim strips spaces only,
    * Python's strip() strips all whitespace.
    */
  def dropBlankLines(raw: DataFrame, lineCol: String = "value"): DataFrame =
    raw.filter(col(lineCol).rlike("\\S"))
}
