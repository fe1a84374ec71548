package graft.analysis

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PrestoDialectSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, v: String): Any =
    Seq(v).toDF("s").select(c).collect()(0).get(0)

  test("2-arg regexp_replace deletes matches (Presto semantics)") {
    assert(one(PrestoDialect.regexpReplace(col("s"), "/i-.*"),
      "arn:aws:sts::1:assumed-role/r/i-0abc123") == "arn:aws:sts::1:assumed-role/r")
  }

  test("regexpExtract returns NULL on miss (not empty string)") {
    assert(one(PrestoDialect.regexpExtract(col("s"), "x(y)", 1), "abc") == null)
    assert(one(PrestoDialect.regexpExtract(col("s"), "a(b)", 1), "abc") == "b")
  }

  test("regexpExtractAll + arrayJoin reconstruct path dates") {
    val got = one(PrestoDialect.arrayJoin(
      PrestoDialect.regexpExtractAll(col("s"), """/(\d+)""", 1), "-"),
      "logs/app/2019/03/04/obj")
    assert(got == "2019-03-04")
  }

  test("translateFormat: MySQL specifiers to Java patterns") {
    assert(PrestoDialect.translateFormat("%Y-%m-%d") == "yyyy-MM-dd")
    assert(PrestoDialect.translateFormat("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
    assert(PrestoDialect.translateFormat("%d/%b/%Y") == "dd/MMM/yyyy")
    // literal letters must be quoted so the Java formatter ignores them
    assert(PrestoDialect.translateFormat("%YT%m") == "yyyy'T'MM")
    intercept[IllegalArgumentException](PrestoDialect.translateFormat("%Q"))
  }

  test("dateParse: valid parses, malformed yields null (PERMISSIVE)") {
    assert(one(PrestoDialect.dateParse(col("s"), "%Y-%m-%d"), "2019-03-04")
      .toString == "2019-03-04 00:00:00.0")
    assert(one(PrestoDialect.dateParse(col("s"), "%Y-%m-%d"), "not-a-date") == null)
  }

  test("dateDiff units") {
    val df = Seq(("2019-01-01 00:00:00", "2019-01-03 12:00:00")).toDF("a", "b")
      .select(to_timestamp(col("a")).as("a"), to_timestamp(col("b")).as("b"))
    def d(unit: String): Long = df.select(
      PrestoDialect.dateDiff(unit, col("a"), col("b"))).as[Long].collect()(0)
    assert(d("day") == 2)
    assert(d("hour") == 60)
    assert(d("second") == 216000)
    intercept[IllegalArgumentException](
      df.select(PrestoDialect.dateDiff("fortnight", col("a"), col("b"))))
  }
}
