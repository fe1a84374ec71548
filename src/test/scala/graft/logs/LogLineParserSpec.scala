package graft.logs

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.Row

class LogLineParserSpec extends SparkTestBase {
  import spark.implicits._

  /** Canonical AWS-docs example line (FIXTURES.md §1). */
  val canonical: String =
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be awsexamplebucket " +
    "[06/Feb/2019:00:00:38 +0000] 192.0.2.3 " +
    "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be 3E57427F3EXAMPLE " +
    "REST.GET.VERSIONING - \"GET /awsexamplebucket?versioning HTTP/1.1\" 200 - 113 - 7 - " +
    "\"-\" \"S3Console/0.4\" - " +
    "s9lzHYrFp76ZVxRcpX9+5cjAnEH2ROuNkd2BHfIa6UkFVdtjf5mKR3/eTPFvsiP/XV/VLi31234= " +
    "SigV2 ECDHE-RSA-AES128-GCM-SHA256 AuthHeader awsexamplebucket.s3.amazonaws.com"

  val getObjectLine: String =
    "owner1 mybucket [04/Mar/2019:10:15:00 +0000] 10.0.0.1 " +
    "arn:aws:iam::123456789012:assumed-role/role/i-0abc123 REQ1 REST.GET.OBJECT " +
    "logs/service_name/2019/03/04/part-0.tgz \"GET /mybucket/logs HTTP/1.1\" 200 - 4096 8192 12 5 " +
    "\"-\" \"aws-sdk-java/1.11\" -"

  def parseOne(line: String): Row =
    LogLineParser.parse(Seq(line).toDF("value")).collect().head

  test("canonical line parses field-exactly") {
    val r = parseOne(canonical)
    assert(r.getAs[String]("bucket_owner") ==
      "79a59df900b949e55d96a1e698fbacedfd6e09d98eacf8f8d5218e7cd47ef2be")
    assert(r.getAs[String]("s3_bucket") == "awsexamplebucket")
    assert(r.getAs[Timestamp]("request_time") ==
      Timestamp.valueOf("2019-02-06 00:00:38"))
    assert(r.getAs[String]("remote_ip") == "192.0.2.3")
    assert(r.getAs[String]("request_id") == "3E57427F3EXAMPLE")
    assert(r.getAs[String]("operation") == "REST.GET.VERSIONING")
    assert(r.getAs[String]("key") == null, "'-' key → null")
    assert(r.getAs[String]("request") == "\"GET /awsexamplebucket?versioning HTTP/1.1\"",
      "request keeps its quotes")
    assert(r.getAs[Int]("http_status") == 200)
    assert(r.getAs[String]("error_code") == null)
    assert(r.getAs[Long]("bytes_sent") == 113L)
    assert(r.isNullAt(r.fieldIndex("object_size")))
    assert(r.getAs[Long]("total_time") == 7L)
    assert(r.isNullAt(r.fieldIndex("turn_around_time")))
    assert(r.getAs[String]("referrer") == null, "\"-\" referrer → null")
    assert(r.getAs[String]("user_agent") == "\"S3Console/0.4\"")
    assert(r.getAs[String]("version_id") == null)
    assert(r.getAs[String]("error_line") == null)
  }

  test("GET-object line: key + sizes survive, version_id single-char quirk") {
    val r = parseOne(getObjectLine)
    assert(r.getAs[String]("operation") == "REST.GET.OBJECT")
    assert(r.getAs[String]("key") == "logs/service_name/2019/03/04/part-0.tgz")
    assert(r.getAs[Long]("bytes_sent") == 4096L)
    assert(r.getAs[Long]("object_size") == 8192L)
    assert(r.getAs[Long]("turn_around_time") == 5L)
    assert(r.getAs[String]("referrer") == null)
    assert(r.getAs[String]("user_agent") == "\"aws-sdk-java/1.11\"")
  }

  test("version_id captures exactly one non-space char (reference quirk)") {
    val line = getObjectLine.dropRight(1) + "3VersionIdCharsAfterFirstIgnored"
    val r = parseOne(line)
    assert(r.getAs[String]("version_id") == "3")
  }

  test("corrupt line → 18 nulls + error_line = raw text") {
    val junk = "this is not an access log"
    val r = parseOne(junk)
    AccessLogSchema.columns.dropRight(1).foreach { c =>
      assert(r.isNullAt(r.fieldIndex(c)), s"$c must be null on corrupt line")
    }
    assert(r.getAs[String]("error_line") == junk)
  }

  test("all-sentinel line: every optional field nulls out") {
    val line = "o b [06/Feb/2019:00:00:38 +0000] ip req rid OP - - - - - - - - \"-\" \"-\" -"
    val r = parseOne(line)
    Seq("key", "http_status", "error_code", "bytes_sent", "object_size",
        "total_time", "turn_around_time", "referrer", "user_agent", "version_id")
      .foreach(c => assert(r.isNullAt(r.fieldIndex(c)), s"$c must be null"))
    assert(r.getAs[String]("request") == "-", "unquoted '-' request is NOT nulled")
    assert(r.getAs[String]("error_line") == null)
  }

  test("unparseable timestamp → null request_time, row still parses") {
    val line = canonical.replace("[06/Feb/2019:00:00:38 +0000]", "[garbage]")
    val r = parseOne(line)
    assert(r.isNullAt(r.fieldIndex("request_time")))
    assert(r.getAs[String]("s3_bucket") == "awsexamplebucket")
    assert(r.getAs[String]("error_line") == null)
  }

  test("blank lines are dropped before parsing") {
    val df = Seq(canonical, "", "   ", "\t", getObjectLine).toDF("value")
    assert(LogLineParser.dropBlankLines(df).count() == 2)
  }

  test("output schema matches the canonical 19-column schema") {
    val parsed = LogLineParser.parse(Seq(canonical).toDF("value"))
    assert(parsed.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      AccessLogSchema.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("parse is total on arbitrary garbage (property)") {
    val rnd = new scala.util.Random(42)
    val garbage = Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(120)).mkString(" ").trim)
      .filter(_.nonEmpty)
    val df = LogLineParser.parse(garbage.toDF("value"))
    assert(df.count() == garbage.size) // never throws, never drops
  }
}
