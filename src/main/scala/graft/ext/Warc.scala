package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) record framing — the storage format of
  * every public web crawl (Common Crawl, IA): a text header block
  * (`WARC/1.0` + named fields), CRLF-CRLF, `Content-Length` payload
  * octets, CRLF-CRLF record separator. A 100 TB text pipeline's first
  * stage is exactly this: split concatenated WARC streams into records
  * and lift (type, target URI, date, payload) into columns.
  *
  * Both directions are real: [[makeRecord]] emits spec-shaped bytes and
  * [[parseRecords]] is a byte-level parser (header scan, field split,
  * Content-Length-driven payload extraction — never a regex over the
  * payload, which is arbitrary binary). Parsing is per-record
  * `mapPartitions` over a binary column: embarrassingly parallel, no
  * shuffle, codegen-adjacent kernel work exactly like the image codecs.
  *
  * Payload digest is SHA-256 hex (the spec's `WARC-Payload-Digest`
  * allows any labeled algorithm; sha-256 is what an external SQL engine
  * can recompute, which keeps the whole roundtrip oracle-checkable).
  */
object Warc {

  final case class WarcRecord(
      record_id: Long, warc_type: String, target_uri: String,
      warc_date: String, content_length: Long, payload_sha256: String)

  private val HeaderSep = "\r\n\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Build one WARC/1.0 response record around a payload. */
  def makeRecord(targetUri: String, date: String,
                 payload: Array[Byte]): Array[Byte] = {
    val header =
      s"""WARC/1.0\r
         |WARC-Type: response\r
         |WARC-Target-URI: $targetUri\r
         |WARC-Date: $date\r
         |Content-Length: ${payload.length}\r
         |\r
         |""".stripMargin
    val h = header.getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private def indexOf(data: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = from
    val last = data.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && data(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Parse ONE record's bytes: header fields + Content-Length payload.
    * Malformed framing fails loudly by name (bad version line, missing
    * separator, truncated payload), never by index crash.
    */
  def parseRecord(recordId: Long, data: Array[Byte]): WarcRecord = {
    val sep = indexOf(data, HeaderSep, 0)
    require(sep > 0, "WARC record has no header/payload separator")
    val header = new String(data, 0, sep, StandardCharsets.US_ASCII)
    val lines = header.split("\r\n")
    require(lines.nonEmpty && lines(0).startsWith("WARC/"),
      s"not a WARC record: ${lines.headOption.getOrElse("")}")
    val fields = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None else Some(l.substring(0, i).trim.toLowerCase ->
        l.substring(i + 1).trim)
    }.toMap
    val len = fields.getOrElse("content-length",
      sys.error("WARC record missing Content-Length")).toLong
    val start = sep + 4
    require(len >= 0 && len <= Int.MaxValue, s"bad Content-Length $len")
    require(start + len <= data.length,
      s"WARC payload truncated: need $len octets, have ${data.length - start}")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(data, start, len.toInt)
    val sha = md.digest().map(b => f"${b & 0xFF}%02x").mkString
    WarcRecord(recordId,
      fields.getOrElse("warc-type", ""),
      fields.getOrElse("warc-target-uri", ""),
      fields.getOrElse("warc-date", ""),
      len, sha)
  }

  /** Lift a (id, warc_bytes) frame into parsed record columns. */
  def parseRecords(df: DataFrame, idCol: String,
                   dataCol: String): Dataset[WarcRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(dataCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => parseRecord(id, bytes) })
  }
}
