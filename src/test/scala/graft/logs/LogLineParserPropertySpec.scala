package graft.logs

import org.scalacheck.Gen

import graft.SparkTestBase

/** Property tests over the log-line grammar (SURVEY.md §5.2): generated
  * valid lines parse totally and round-trip every field; arbitrary garbage
  * yields exactly the all-null + error_line row. Runs the parse through
  * the real Spark pipeline in batches (one job per forAll case would be
  * minutes), asserting per-row.
  */
class LogLineParserPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('-', '.', '/', ':', '_')))
      .map(_.mkString).suchThat(s => s.nonEmpty && s != "-")

  private val quoted: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(l => "\"" + l.mkString + "\"")

  private val dashOr: Gen[String] => Gen[String] =
    g => Gen.frequency(1 -> Gen.const("-"), 3 -> g)

  private val num: Gen[String] = Gen.choose(0L, 999999999L).map(_.toString)

  private case class Fields(
      owner: String, bucket: String, time: String, ip: String, requester: String,
      reqid: String, operation: String, key: String, request: String,
      status: String, error: String, bytes: String, size: String,
      total: String, turnaround: String, referrer: String, useragent: String,
      version: String) {
    def line: String =
      s"$owner $bucket $time $ip $requester $reqid $operation $key $request " +
        s"$status $error $bytes $size $total $turnaround $referrer $useragent $version"
  }

  private val fieldsGen: Gen[Fields] = for {
    owner <- token; bucket <- token
    mon <- Gen.oneOf("Jan", "Feb", "Mar", "Apr", "May", "Jun",
      "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")
    day <- Gen.choose(1, 28); hh <- Gen.choose(0, 23)
    mm <- Gen.choose(0, 59); ss <- Gen.choose(0, 59)
    time = f"[$day%02d/$mon/2019:$hh%02d:$mm%02d:$ss%02d +0000]"
    ip <- token; requester <- token; reqid <- token; operation <- token
    key <- dashOr(token)
    request <- Gen.frequency(1 -> Gen.const("-"), 3 -> quoted)
    status <- dashOr(num); error <- dashOr(token)
    bytes <- dashOr(num); size <- dashOr(num)
    total <- dashOr(num); turnaround <- dashOr(num)
    referrer <- Gen.frequency(1 -> Gen.const("\"-\""), 2 -> quoted)
    useragent <- Gen.frequency(1 -> Gen.const("\"-\""), 2 -> quoted)
    version <- Gen.oneOf(Gen.const("-"), Gen.alphaNumChar.map(_.toString))
  } yield Fields(owner, bucket, time, ip, requester, reqid, operation, key,
    request, status, error, bytes, size, total, turnaround, referrer,
    useragent, version)

  test("generated valid lines: parse is total and round-trips every field") {
    val cases = Gen.listOfN(200, fieldsGen).sample.get
    val rows = LogLineParser.parse(cases.map(_.line).toDF("value")).collect()
    cases.zip(rows).foreach { case (f, r) =>
      withClue(f.line) {
        assert(r.isNullAt(r.fieldIndex("error_line")), "must match the grammar")
        assert(r.getAs[String]("bucket_owner") == f.owner)
        assert(r.getAs[String]("s3_bucket") == f.bucket)
        assert(!r.isNullAt(r.fieldIndex("request_time")), "time must parse")
        assert(r.getAs[String]("remote_ip") == f.ip)
        assert(r.getAs[String]("requester") == f.requester)
        assert(r.getAs[String]("request_id") == f.reqid)
        assert(r.getAs[String]("operation") == f.operation)
        if (f.key == "-") assert(r.isNullAt(r.fieldIndex("key")))
        else assert(r.getAs[String]("key") == f.key)
        assert(r.getAs[String]("request") == f.request) // quotes preserved, never nulled
        if (f.status == "-") assert(r.isNullAt(r.fieldIndex("http_status")))
        else assert(r.getAs[Int]("http_status") == f.status.toInt)
        if (f.bytes == "-") assert(r.isNullAt(r.fieldIndex("bytes_sent")))
        else assert(r.getAs[Long]("bytes_sent") == f.bytes.toLong)
        if (f.referrer == "\"-\"") assert(r.isNullAt(r.fieldIndex("referrer")))
        else assert(r.getAs[String]("referrer") == f.referrer)
        if (f.useragent == "\"-\"") assert(r.isNullAt(r.fieldIndex("user_agent")))
        else assert(r.getAs[String]("user_agent") == f.useragent)
        if (f.version == "-") assert(r.isNullAt(r.fieldIndex("version_id")))
        else assert(r.getAs[String]("version_id") == f.version)
      }
    }
  }

  test("garbage lines: exactly the all-null + error_line row, never a throw") {
    val garbage = Gen.listOfN(100,
      Gen.oneOf(
        Gen.alphaStr,
        Gen.listOf(Gen.oneOf('a', ' ', '"', '[', ']')).map(_.mkString),
        Gen.const("a b"),
        Gen.const("[unclosed time a b c")))
      .sample.get
      .filter(_.exists(!_.isWhitespace)) // blank lines are dropped upstream
      // a short line CAN embed a valid-grammar substring only with ≥18
      // fields; cap tokens to keep these unambiguous misses
      .filter(_.split("\\s+").length < 18)
    val rows = LogLineParser.parse(garbage.toDF("value")).collect()
    garbage.zip(rows).foreach { case (g, r) =>
      withClue(g) {
        (0 until 18).foreach(i => assert(r.isNullAt(i)))
        assert(r.getAs[String]("error_line") == g)
      }
    }
  }

  test("round-trip through the timestamp: parsed time equals encoded time") {
    val cases = Gen.listOfN(50, fieldsGen).sample.get
    val rows = LogLineParser.parse(cases.map(_.line).toDF("value"))
      .select("request_time").collect()
    cases.zip(rows).foreach { case (f, r) =>
      val expected = f.time.drop(1).takeWhile(_ != ' ') // dd/MMM/yyyy:HH:mm:ss
      val fmt = new java.text.SimpleDateFormat("dd/MMM/yyyy:HH:mm:ss", java.util.Locale.US)
      fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
      assert(r.getTimestamp(0).getTime == fmt.parse(expected).getTime)
    }
  }
}
