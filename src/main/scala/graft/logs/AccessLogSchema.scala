package graft.logs

import org.apache.spark.sql.types._

/** Canonical S3 server-side-access-log record, 19 columns.
  *
  * Mirrors the reference schema `S3_ACCESS_LOG_OUTPUT_SCHEMA`
  * (reference `scripts/oss_s3_server_side_logging_compacter.py:103-125`)
  * with the intermediate `request_time_string` replaced by the patched
  * `request_time` timestamp of the final projection (reference `:220-243`).
  * All fields nullable: an unparseable line yields 18 nulls plus the raw
  * text in `error_line` (PERMISSIVE semantics, reference `:47-69`).
  */
final case class AccessLogRecord(
    bucket_owner: Option[String],
    s3_bucket: Option[String],
    request_time: Option[java.sql.Timestamp],
    remote_ip: Option[String],
    requester: Option[String],
    request_id: Option[String],
    operation: Option[String],
    key: Option[String],
    request: Option[String],
    http_status: Option[Int],
    error_code: Option[String],
    bytes_sent: Option[Long],
    object_size: Option[Long],
    total_time: Option[Long],
    turn_around_time: Option[Long],
    referrer: Option[String],
    user_agent: Option[String],
    version_id: Option[String],
    error_line: Option[String]
)

object AccessLogSchema {

  /** Output column order (reference `:223-243`). */
  val columns: Seq[String] = Seq(
    "bucket_owner", "s3_bucket", "request_time", "remote_ip", "requester",
    "request_id", "operation", "key", "request", "http_status", "error_code",
    "bytes_sent", "object_size", "total_time", "turn_around_time",
    "referrer", "user_agent", "version_id", "error_line"
  )

  val schema: StructType = StructType(Seq(
    StructField("bucket_owner", StringType),
    StructField("s3_bucket", StringType),
    StructField("request_time", TimestampType),
    StructField("remote_ip", StringType),
    StructField("requester", StringType),
    StructField("request_id", StringType),
    StructField("operation", StringType),
    StructField("key", StringType),
    StructField("request", StringType),
    StructField("http_status", IntegerType),
    StructField("error_code", StringType),
    StructField("bytes_sent", LongType),
    StructField("object_size", LongType),
    StructField("total_time", LongType),
    StructField("turn_around_time", LongType),
    StructField("referrer", StringType),
    StructField("user_agent", StringType),
    StructField("version_id", StringType),
    StructField("error_line", StringType)
  ))
}
