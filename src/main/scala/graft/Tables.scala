package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (`TESTDATA.md`).
  *
  * `events.parquet` stores `ts` as Parquet INT64 TIMESTAMP(NANOS), which
  * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it
  * via `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to micros —
  * the same truncation DuckDB applies — keeping `ts` a proper TimestampType
  * for every downstream operator. `ts div 1000` is integer division (double
  * division would lose precision above 2^53 ns).
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // NOTE: session-scoped and deliberately NOT restored — the conf is
        // consulted at execution time too, so resetting it after planning
        // would break the lazy scan. It only affects INT64 TIMESTAMP(NANOS)
        // parquet columns (events.ts is the sole one in this corpus); any
        // other table acquiring a nanos column should go through this
        // loader as well.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/events.parquet")
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other =>
        spark.read.parquet(s"$sfDir/$other.parquet")
    }
}
