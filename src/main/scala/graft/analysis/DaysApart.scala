package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship "Days Apart" analysis
  * (`example_queries/days_apart_analysis.sql:1-39`): per requester ×
  * log-family, how long after being *written* are objects *read* — the
  * number that drives S3 lifecycle policy (slides pp. 29-31). Both sides of
  * the temporal comparison are derived from a single scan: the write date is
  * parsed out of the object key path, the read date from the access
  * timestamp — no join.
  */
object DaysApart {

  import PrestoDialect._

  /** DataFrame form, over a frame with the canonical access-log schema.
    *
    * @param threshold the `days_apart >` cut (400 in the reference, which
    *                  "iteratively tunes this number").
    */
  def frame(logs: DataFrame, threshold: Int = 400): DataFrame = {
    val tmp = logs
      .filter(col("operation") === "REST.GET.OBJECT" && col("http_status") < 300)
      .select(
        // strip the EC2 instance-id suffix off assumed-role ARNs (:16)
        regexpReplace(col("requester"), "/i-.*").as("requester"),
        regexpExtract(col("key"), "logs/([^/]*)/.*", 1).as("log_name"),
        dateParse(
          arrayJoin(regexpExtractAll(col("key"), """/(\d+)""", 1), "-"),
          "%Y-%m-%d").as("dt_written"),
        dateTrunc("day", col("request_time")).as("dt_read"),
        col("bytes_sent"))
      .withColumn("days_apart", datediff(to_date(col("dt_read")), to_date(col("dt_written"))))

    tmp.filter(col("days_apart") > threshold)
      .groupBy("requester", "log_name")
      .agg(count(lit(1)).as("access_count"),
           sum("bytes_sent").as("total_bytes"))
      .orderBy(desc("access_count"))
  }

  /** Spark-SQL text form of the same query (the reference query translated
    * per SURVEY.md §2.3), parameterized by table name and threshold.
    */
  def sql(table: String, threshold: Int = 400): String =
    s"""WITH tmp_workspace AS (
       |  SELECT
       |    regexp_replace(requester, '/i-.*', '') AS requester,
       |    nullif(regexp_extract(key, 'logs/([^/]*)/.*', 1), '') AS log_name,
       |    try_to_timestamp(array_join(regexp_extract_all(key, '/(\\\\d+)', 1), '-'), 'yyyy-MM-dd') AS dt_written,
       |    date_trunc('day', request_time) AS dt_read,
       |    datediff(to_date(date_trunc('day', request_time)),
       |             to_date(try_to_timestamp(array_join(regexp_extract_all(key, '/(\\\\d+)', 1), '-'), 'yyyy-MM-dd'))) AS days_apart,
       |    bytes_sent
       |  FROM $table
       |  WHERE operation = 'REST.GET.OBJECT' AND http_status < 300
       |)
       |SELECT requester, log_name,
       |       count(*) AS access_count,
       |       sum(bytes_sent) AS total_bytes
       |FROM tmp_workspace
       |WHERE days_apart > $threshold
       |GROUP BY 1, 2
       |ORDER BY access_count DESC""".stripMargin
}
