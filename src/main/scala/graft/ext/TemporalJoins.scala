package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference's SQL layer cannot express with an
  * equi-join (SURVEY.md §2.5 notes the reference encodes its only temporal
  * comparison *inside a row*; these generalize it across rows/tables):
  * as-of joins and interval (range) joins.
  *
  * Both are designed around what Spark would otherwise do badly: a raw
  * non-equi join condition degenerates to BroadcastNestedLoopJoin (O(n·m)
  * comparisons and a broadcast requirement). Each operator re-expresses the
  * predicate so the heavy lifting is ONE hash shuffle + local work.
  */
object TemporalJoins {

  /** As-of join: for every probe row, attach the payload of the single
    * build row with the same key and the greatest `buildTime` <=
    * `probeTime` (inclusive; left semantics — unmatched probes keep null
    * payload).
    *
    * Physical shape: union the two sides tagged, ONE shuffle on the key,
    * and a running `last(payload, ignoreNulls)` over (time, side) per key —
    * build rows sort before probe rows at equal times, so "at or before"
    * is exact. O((n+m) log) local sort per partition, no nested loop, no
    * broadcast requirement: this survives a 100 TB probe side because the
    * only shuffle key is `keyCol`, identical to a plain equi-join's.
    * Equal-time build duplicates are broken by payload order so the
    * operator is deterministic on any input.
    *
    * @param payloadCols build columns to carry; emitted as `prefix + name`.
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keyCol: String,
               probeTime: String, buildTime: String,
               payloadCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val payloadStruct = struct(payloadCols.map(col): _*)
    // null-key build rows are dropped: SQL equality never matches null, but
    // Window.partitionBy groups nulls together — without this filter a
    // null-key probe would "match" a null-key build row, diverging from
    // ASOF-join semantics (null-key probes keep left-semantics null payload)
    val buildSide = build
      .filter(col(buildTime).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("_k"), col(buildTime).as("_t"),
        lit(0).as("_side"), payloadStruct.as("_payload"),
        lit(null).cast(structTypeOf(probe)).as("_row"))
    val probeSide = probe.select(col(keyCol).as("_k"), col(probeTime).as("_t"),
      lit(1).as("_side"),
      lit(null).cast(buildSide.schema("_payload").dataType).as("_payload"),
      struct(probe.columns.map(col): _*).as("_row"))

    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc_nulls_first, col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = probeSide.unionByName(buildSide)
      .withColumn("_m", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val probeCols = probe.columns.map(c => col("_row").getField(c).as(c))
    val outCols = payloadCols.map(c => col("_m").getField(c).as(prefix + c))
    matched.select(probeCols ++ outCols: _*)
  }

  private def structTypeOf(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)

  /** Interval (range) join: probe rows whose `probeTime` falls in
    * [startCol, endCol) of an interval row; inner semantics, every
    * qualifying (probe, interval) pair exactly once.
    *
    * Scale path: each interval explodes into the fixed-width time buckets
    * it covers, the probe row computes its single bucket, and the join is
    * an EQUI-join on the bucket plus an exact refine — Catalyst gets a
    * shuffled hash join instead of a nested loop. Bucket fan-out =
    * interval_span / bucketSeconds, so pick a bucket near the typical
    * interval length: day-scale promo windows at the default 1 day cost
    * ~interval_days rows each, once, on the SMALL side.
    */
  def byTimeBuckets(probe: DataFrame, intervals: DataFrame,
                    probeTime: String, startCol: String, endCol: String,
                    bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // NTZ columns (parquet timestamp without tz) go through a cast to LTZ:
    // bucket boundaries then depend on the session timezone, but the
    // probe and interval sides shift identically, so the MATCHING is
    // timezone-independent — only the internal bucket ids move.
    def micros(c: org.apache.spark.sql.Column) =
      unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
    val bStart = floor(micros(col(startCol)) / (bucketSeconds * 1000000L))
    // end is exclusive: an interval ending exactly on a bucket boundary
    // must not claim that bucket
    val bEnd = floor((micros(col(endCol)) - 1L) / (bucketSeconds * 1000000L))
    val exploded = intervals
      .filter(col(startCol).isNotNull && col(endCol).isNotNull &&
        col(endCol) > col(startCol))
      .withColumn("_bucket", explode(sequence(bStart, bEnd)))
    val probeB = probe
      .filter(col(probeTime).isNotNull)
      .withColumn("_bucket",
        floor(micros(col(probeTime)) / (bucketSeconds * 1000000L)))
    probeB.join(exploded, Seq("_bucket"))
      .filter(col(probeTime) >= col(startCol) && col(probeTime) < col(endCol))
      .drop("_bucket")
  }
}
