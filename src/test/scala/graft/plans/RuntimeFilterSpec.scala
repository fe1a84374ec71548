package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Runtime row-level filtering (bloom-filter semi-join pruning) — the
  * mechanism that makes selective fact⋈dim joins scan-bounded at 100 TB:
  * the filtered dimension side builds a bloom filter of its join keys at
  * runtime and Spark injects `might_contain(key)` into the fact-side
  * SCAN, so fact rows that cannot join die before the shuffle instead of
  * traveling through it. Verifies the engine's extension stack (custom
  * rules + expressions) does not break Spark's injection, and that
  * results are unchanged with the filter forced on.
  */
class RuntimeFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom filter is injected on a selective dim join and preserves results") {
    // thresholds sized for production scans; lower them so the tiny test
    // frames qualify
    // broadcast joins skip bloom injection (the broadcast hash already
    // prunes pre-shuffle); force the shuffle-join shape the filter exists
    // for — at 100 TB neither side of a fact⋈fact join broadcasts
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // parquet-backed: runtime filters target file scans, not local rels
      val dir = java.nio.file.Files.createTempDirectory("rtf").toString
      (0L until 20000L).map(i => (i, i % 97, s"payload$i"))
        .toDF("id", "k", "payload")
        .write.mode("overwrite").parquet(s"$dir/fact")
      (0L until 97L).map(i => (i, s"dim$i")).toDF("k", "name")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("k") < 3)

      val joined = fact.join(dim, "k").groupBy("name")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("might_contain"),
        s"bloom filter not injected:\n$plan")
      val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 20000 ids over 97 keys: keys 0,1,2 get ceil/floor counts
      assert(rows.keySet == Set("dim0", "dim1", "dim2"))
      assert(rows.values.sum == (0L until 20000L).count(_ % 97 < 3))
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
