package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser

/** Driver contract (SURVEY.md §7): one `queries` entry per implemented
  * operator, with a DuckDB-runnable ANSI oracle in `oracleSql` wherever the
  * operator is SQL-expressible. Column names and types are aligned
  * pair-by-pair (the driver hash-compares after sorting columns by name).
  *
  * Dialect-parity rules used throughout (SURVEY.md §5.4):
  *  - counts are BIGINT on both sides (DuckDB count/sum(int) → HUGEINT is
  *    always CAST AS BIGINT in the oracle);
  *  - sums over doubles go through DECIMAL(18,2) (exact, order-independent)
  *    and back to DOUBLE, so Spark's partition-order-dependent double
  *    addition can never flip a bit vs DuckDB;
  *  - timestamps are micros on both sides (events' TIMESTAMP_NS is
  *    truncated identically by `Tables.load` and `CAST(ts AS TIMESTAMP)`);
  *  - ratios are int/int divisions in DOUBLE — bit-identical IEEE on both.
  */
object SparkEntry {

  import gates.Support.{syntheticLogLines, tbl}

  // -------------------------------------------------------------- flagship

  /** Flagship: synthesize log lines from sf0.001 events, parse them with
    * the native column-expression parser, run the reference's Days Apart
    * analysis (threshold 60 days). Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val events = tbl(spark, "/root/testdata/sf0.001", "events")
    val parsed = LogLineParser.parse(syntheticLogLines(events))
    DaysApart.frame(parsed, threshold = 60)
  }

  // -------------------------------------------------------------- queries

  // ---------------------------------------------------- registries

  /** Per-family gate registries (the `gates` package) — split from
    * the former single-file map in round 11 after the q227/q228
    * process slip showed an 11.6k-line file is where review fails.
    * Order is
    * presentation-only; name collisions are rejected at load.
    */
  private val families: Seq[gates.GateFamily] = Seq(
    gates.ParityGates, gates.RelationalGates, gates.DedupGates,
    gates.SimilarityGates, gates.TextGates, gates.QualityGates,
    gates.WebGraphGates, gates.MultimodalGates, gates.StreamingGates,
    gates.SketchGates, gates.RetrievalGates, gates.SamplingGates,
    gates.FormatGates, gates.PrivacyGates, gates.InfraGates)

  private lazy val mergedQueries: Map[String, (SparkSession, String) => DataFrame] = {
    val maps = families.map(_.queries)
    val merged = maps.reduce(_ ++ _)
    require(merged.size == maps.map(_.size).sum,
      "duplicate gate name across families")
    merged
  }

  private lazy val mergedOracles: Map[String, String] = {
    val maps = families.map(_.oracleSql)
    val merged = maps.reduce(_ ++ _)
    require(merged.size == maps.map(_.size).sum,
      "duplicate oracle name across families")
    require(merged.keySet.subsetOf(mergedQueries.keySet),
      "oracle without a query: " +
        (merged.keySet -- mergedQueries.keySet).toSeq.sorted.mkString(","))
    merged
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = mergedQueries

  def oracleSql: Map[String, String] = mergedOracles
}
