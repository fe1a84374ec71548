package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the co-located-join layout for fact-fact joins
  * that recur on the same key (SURVEY.md "Partitioning & shuffle").
  *
  * Writing both sides bucketed by the join key with the same bucket count
  * pre-partitions the data ON DISK: Spark's scan reports the bucket
  * HashPartitioning, EnsureRequirements sees both children already
  * distributed by the key, and the sort-merge join runs with NO exchange —
  * at 100 TB that turns every repeated join on the key from a full
  * two-sided shuffle into a local merge. The spec asserts the no-Exchange
  * plan shape.
  *
  * Trade-offs (why this is an opt-in layout, not a default): fixed bucket
  * count must suit both sides, writes pay a clustering sort, and only
  * catalog tables (not bare parquet paths) carry bucket metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table. Sorting within
    * buckets by the key additionally enables the merge join to skip its
    * sort.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    numBuckets: Int = 32): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — shuffle-free by
    * construction (callers can `.explain` to confirm: no Exchange above
    * either scan).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    keyCol: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keyCol)
}
