package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `private[sql]`-access shim for [[graft.plans.PlanCapture]]: rebuild a
  * lazily-checkpointed DataFrame on the SAME underlying `RDD[InternalRow]`
  * — same output attributes, same physical partitioning, same ordering —
  * but through a FRESH [[LogicalRDD]] that carries NO origin statistics.
  *
  * Why: `Dataset.localCheckpoint` deliberately preserves the child plan's
  * estimated statistics through the cut (`originStats`), so an ITERATIVE
  * operator whose round contains a self-join SQUARES its `sizeInBytes`
  * estimate every round — the estimate reaches 10^(c·2^rounds), and from
  * ~15 rounds on the size-only stats visitor spends minutes multiplying
  * million-digit BigIntegers at every planning (measured: stats digit
  * count exactly doubles per checkpointed self-join round). Nested
  * iterative calls (incremental connected components seeded by a prior
  * fixpoint) inherit an already-huge estimate and die immediately.
  * Resetting to the default estimate per cut keeps every round's stats
  * constant-sized; runtime sizes still drive joins under AQE, and the
  * preserved partitioning keeps the once-partitioned-edges contract of
  * the iterative operators intact.
  */
object GraftStatsReset {

  def freshStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case LogicalRDD(out, rdd, part, ord, streaming, stream) =>
        val session = df.sparkSession.asInstanceOf[CSparkSession]
        CDataset.ofRows(session,
          LogicalRDD(out, rdd, part, ord, streaming, stream)(session))
      case _ => df // not a bare checkpoint frame: nothing to reset
    }
}
