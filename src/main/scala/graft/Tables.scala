package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (`TESTDATA.md`).
  *
  * `events.parquet` has shipped `ts` under several physical encodings
  * across driver generations — INT64 TIMESTAMP(NANOS) (which Spark's
  * vectorized reader only surfaces as BIGINT nanos via
  * `spark.sql.legacy.parquet.nanosAsLong`), and plain `timestamp[us]`
  * (which Spark surfaces as TIMESTAMP_NTZ when
  * `spark.sql.parquet.inferTimestampNTZ.enabled` is on). The loader
  * normalizes whatever it finds to a session-tz TimestampType at
  * microsecond precision, so every downstream operator and every oracle
  * (`CAST(ts AS TIMESTAMP)` in DuckDB) sees identical values. Sessions
  * here always run with `spark.sql.session.timeZone=UTC`, so the
  * NTZ→timestamp cast is value-preserving. For the nanos form,
  * `ts div 1000` is integer division (double division would lose
  * precision above 2^53 ns), matching DuckDB's truncation.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // NOTE: session-scoped and deliberately NOT restored — the conf is
        // consulted at execution time too, so resetting it after planning
        // would break the lazy scan. It only affects INT64 TIMESTAMP(NANOS)
        // parquet columns; it is inert for the timestamp[us] encoding.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$sfDir/events.parquet")
        import org.apache.spark.sql.types.{LongType, TimestampType}
        raw.schema("ts").dataType match {
          case LongType => // INT64 nanos surfaced as BIGINT
            raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case TimestampType => raw
          case _ => // TIMESTAMP_NTZ (or future variants): session tz is UTC
            raw.withColumn("ts", col("ts").cast(TimestampType))
        }
      case other =>
        spark.read.parquet(s"$sfDir/$other.parquet")
    }
}
