package graft.ext

import java.nio.charset.StandardCharsets

import graft.SparkTestBase

class WarcSpec extends SparkTestBase {
  import spark.implicits._

  test("roundtrip: parse(make(payload)) recovers every header field") {
    val payload = "hello warc é世".getBytes(StandardCharsets.UTF_8)
    val rec = Warc.makeRecord("https://x.org/a", "2026-01-05T00:00:00Z", payload)
    val got = Warc.parseRecord(42L, rec)
    assert(got.warc_type == "response")
    assert(got.target_uri == "https://x.org/a")
    assert(got.warc_date == "2026-01-05T00:00:00Z")
    assert(got.content_length == payload.length.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString
    assert(got.payload_sha256 == expect)
  }

  test("payload bytes are framed by Content-Length, not by scanning") {
    // a payload CONTAINING the CRLF-CRLF separator must not split early
    val payload = "part1\r\n\r\npart2".getBytes(StandardCharsets.US_ASCII)
    val got = Warc.parseRecord(1L, Warc.makeRecord("u", "d", payload))
    assert(got.content_length == payload.length.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    assert(got.payload_sha256 ==
      md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString)
  }

  test("empty payload is a valid record") {
    val got = Warc.parseRecord(1L, Warc.makeRecord("u", "d", Array.empty))
    assert(got.content_length == 0L)
  }

  test("malformed records fail loudly by name") {
    assert(intercept[IllegalArgumentException](Warc.parseRecord(1L,
      "HTTP/1.1 200 OK\r\n\r\nbody".getBytes(StandardCharsets.US_ASCII)))
      .getMessage.contains("not a WARC record"))
    assert(intercept[IllegalArgumentException](Warc.parseRecord(1L,
      "WARC/1.0\r\nWARC-Type: x".getBytes(StandardCharsets.US_ASCII)))
      .getMessage.contains("separator"))
    val truncated = Warc.makeRecord("u", "d",
      "0123456789".getBytes(StandardCharsets.US_ASCII)).dropRight(8)
    assert(intercept[IllegalArgumentException](
      Warc.parseRecord(1L, truncated)).getMessage.contains("truncated"))
    assert(intercept[RuntimeException](Warc.parseRecord(1L,
      "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
        .getBytes(StandardCharsets.US_ASCII)))
      .getMessage.contains("Content-Length"))
  }

  test("parseRecords: distributed parse over a binary column") {
    val df = Seq(
      (1L, Warc.makeRecord("https://x.org/1", "2026-01-01T00:00:00Z",
        "alpha".getBytes(StandardCharsets.UTF_8))),
      (2L, Warc.makeRecord("https://x.org/2", "2026-01-02T00:00:00Z",
        "beta".getBytes(StandardCharsets.UTF_8))))
      .toDF("id", "warc")
    val got = Warc.parseRecords(df, "id", "warc").collect()
      .map(r => r.record_id -> r.target_uri).toMap
    assert(got == Map(1L -> "https://x.org/1", 2L -> "https://x.org/2"))
  }
}
