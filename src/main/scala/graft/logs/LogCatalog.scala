package graft.logs

import org.apache.spark.sql.SparkSession

/** Catalog/DDL surface of the reference's query layer
  * (`example_queries/create_table.sql`, `load_all_partitions.sql`,
  * `load_partition.sql`), expressed as native Spark SQL against the session
  * catalog. Queries then partition-prune on `dt` via the catalog.
  */
object LogCatalog {

  /** Single-quote-escape a string heading into a SQL literal; dt values
    * are validated as dates outright (they name directories — a quote in
    * one is never legitimate).
    */
  private def sqlLit(s: String): String = s.replace("'", "''")

  private def validDt(dt: String): String = {
    require(dt.matches("""\d{4}-\d{2}-\d{2}"""), s"dt must be YYYY-MM-DD, got '$dt'")
    dt
  }

  /** `CREATE EXTERNAL TABLE` analog (`create_table.sql:13-42`): 19 data
    * columns + `dt string` partition column, Parquet, explicit LOCATION.
    */
  def createAccessLogsTable(spark: SparkSession, table: String,
                            location: String): Unit = {
    val cols = AccessLogSchema.schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(",\n  ")
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table (
         |  $cols
         |)
         |USING PARQUET
         |PARTITIONED BY (dt STRING)
         |LOCATION '${sqlLit(location)}'""".stripMargin)
  }

  /** `MSCK REPAIR TABLE` (`load_all_partitions.sql:6`) — discover every
    * `dt=` directory under the table location.
    */
  def repairTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  /** `ALTER TABLE ... ADD PARTITION` (`load_partition.sql:8-10`) — register
    * a single day without a full listing.
    */
  def addPartition(spark: SparkSession, table: String, dt: String,
                   location: String): Unit =
    spark.sql(
      s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION (dt='${validDt(dt)}') " +
        s"LOCATION '${sqlLit(location)}'")

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
