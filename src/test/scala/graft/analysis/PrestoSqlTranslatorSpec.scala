package graft.analysis

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.logs.LogLineParser

class PrestoSqlTranslatorSpec extends SparkTestBase {
  import spark.implicits._
  import PrestoSqlTranslator.translate

  test("unit rewrites") {
    assert(translate("regexp_replace(requester, '/i-.*')") ==
      "regexp_replace(requester, '/i-.*', '')")
    assert(translate("regexp_replace(a, 'p', 'r')") ==
      "regexp_replace(a, 'p', 'r')")
    assert(translate("regexp_extract(key, 'logs/([^/]*)/.*', 1)") ==
      "(CASE WHEN (key) RLIKE ('logs/([^/]*)/.*') " +
        "THEN regexp_extract(key, 'logs/([^/]*)/.*', 1) END)")
    assert(translate("date_parse(x, '%Y-%m-%d')") ==
      "try_to_timestamp(x, 'yyyy-MM-dd')")
    assert(translate("""SELECT * FROM "my-table"""") ==
      "SELECT * FROM `my-table`")
    // raw Presto backslash survives Spark's escape-processing parser
    assert(translate("""regexp_extract_all(key, '/(\d+)', 1)""") ==
      """regexp_extract_all(key, '/(\\d+)', 1)""")
    // nested calls rewritten inside-out, no double wrapping
    val nested = translate(
      "date_diff('day', date_parse(a, '%Y-%m-%d'), date_trunc('day', t))")
    assert(nested ==
      "CAST((unix_timestamp(date_trunc('day', t)) - " +
        "unix_timestamp(try_to_timestamp(a, 'yyyy-MM-dd'))) DIV 86400 AS BIGINT)")
  }

  test("edge rewrites: quote escapes, 2-arg extract, comments in args") {
    // Presto '' quote-escape → \' (adjacent-literal concatenation trap)
    assert(translate("WHERE msg = 'can''t'") == """WHERE msg = 'can\'t'""")
    // 2-arg regexp_extract returns the WHOLE match in Presto (group 0)
    assert(translate("regexp_extract(x, 'a+')").contains(
      "regexp_extract(x, 'a+', 0)"))
    // comments inside an interesting call must not break arg splitting
    val withComment = translate(
      "date_diff('day', a, -- note ')', tricky\n b)")
    assert(withComment.contains("unix_timestamp(") &&
      withComment.contains("DIV 86400"), withComment)
  }

  test("semantic parity on Spark: empty-match vs miss, whole-day periods") {
    // regexp_extract: genuine empty-group match → '' (not NULL); miss → NULL
    val r = spark.sql(translate(
      "SELECT regexp_extract('abc', '([0-9]*)', 1) AS empty_match, " +
        "regexp_extract('abc', 'xyz(q)', 1) AS miss")).head()
    assert(r.getString(0) == "" && r.isNullAt(1))
    // date_diff('day') counts COMPLETE 24h periods between timestamps
    val d = spark.sql(translate(
      "SELECT date_diff('day', TIMESTAMP '2019-01-01 23:00:00', " +
        "TIMESTAMP '2019-01-02 01:00:00') AS d0, " +
        "date_diff('day', TIMESTAMP '2019-01-01 00:00:00', " +
        "TIMESTAMP '2019-01-03 00:00:00') AS d2")).head()
    assert(d.getLong(0) == 0L && d.getLong(1) == 2L)
  }

  /** Synthetic parsed frame: GETs of objects written >400 days before the
    * read (2018 paths, 2019-12 reads) plus fresh reads and a non-GET.
    */
  private def parsedLogs() = {
    def line(reqId: Int, requester: String, keyDate: String, op: String) =
      s"""own bkt [30/Dec/2019:10:00:00 +0000] 1.2.3.4 $requester R$reqId $op logs/app/$keyDate/f.tgz "GET /x HTTP/1.1" 200 - 100 200 5 1 "-" "ua" -"""
    val lines = Seq(
      line(1, "arn:role/svc/i-abc", "2018/01/05", "REST.GET.OBJECT"),
      line(2, "arn:role/svc/i-def", "2018/01/06", "REST.GET.OBJECT"),
      line(3, "arn:role/svc/i-abc", "2019/12/29", "REST.GET.OBJECT"),
      line(4, "arn:role/svc/i-abc", "2018/01/05", "REST.PUT.OBJECT"))
    LogLineParser.parse(lines.toDF("value"))
  }

  test("the reference's days_apart_analysis.sql runs VERBATIM after translation") {
    val ref = new java.io.File(
      "/root/reference/example_queries/days_apart_analysis.sql")
    assume(ref.exists(), "reference checkout not present")
    val prestoSql = new String(
      java.nio.file.Files.readAllBytes(ref.toPath), "UTF-8")
    // table name from the file, dashes and all — needs the "→` rewrite
    parsedLogs().createOrReplaceTempView("translated_input")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW `example-s3-access-logs-table` " +
      "AS SELECT * FROM translated_input")
    val got = spark.sql(translate(prestoSql))
      .select("requester", "log_name", "access_count", "total_bytes")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // two >400-day GETs share requester (after /i- strip) and log_name
    assert(got.toSeq == Seq(("arn:role/svc", "app", 2L, 200L)))
    // and the engine's DataFrame form agrees
    val df = DaysApart.frame(parsedLogs(), threshold = 400)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(df.toSeq == got.toSeq)
  }
}
