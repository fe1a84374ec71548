package graft
package gates

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One per-family gate registry: a slice of the driver contract
  * (`SparkEntry.queries` / `SparkEntry.oracleSql`). Families are
  * composed — and checked for duplicate names — in `SparkEntry`.
  */
private[graft] trait GateFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
