package graft.plans

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Lineage cut (lazy `localCheckpoint`) with a test-visible plan tap.
  *
  * Operators that iterate (connected components) or fan one expensive
  * frame into several consumers (bm25, cooccurrence, containment,
  * incremental dedup, curation) truncate their lineage with lazy local
  * checkpoints. That truncation also blinds plan-level guards: the
  * physical plan of the FINAL frame no longer contains the upstream
  * stages, so a cartesian product hiding before the cut would never be
  * seen by a plan assertion on the result (the round-3 PlanGuardSpec
  * blind spot).
  *
  * `cut` is therefore the single checkpoint chokepoint for all main-code
  * operators: it records the pre-cut physical plan into a thread-local tap
  * when one is installed (tests only — `capturing`), then checkpoints.
  * Production cost of the tap check is one thread-local read per cut;
  * the `sparkPlan` it records is forced by `localCheckpoint` anyway.
  */
object PlanCapture {

  private val tap = new ThreadLocal[ListBuffer[SparkPlan]]()

  /** Lazy local checkpoint of `df`, recording the pre-cut physical plan in
    * the calling thread's tap when one is installed. Thread-local by
    * design: query construction happens on the caller's thread, and suites
    * running concurrently in the same JVM must not see each other's plans.
    */
  def cut(df: DataFrame): DataFrame = {
    val buf = tap.get()
    if (buf != null) buf += df.queryExecution.sparkPlan
    // stats reset: localCheckpoint preserves the child's ESTIMATED
    // statistics through the cut, so iterative self-joining operators
    // square their sizeInBytes estimate every round until the size-only
    // stats visitor grinds on million-digit BigIntegers (digit count
    // measurably doubles per round). The shim rewraps the SAME
    // checkpointed RDD — partitioning and ordering preserved — minus
    // the inherited estimate; AQE's runtime sizes still drive joins.
    org.apache.spark.sql.GraftStatsReset.freshStats(df.localCheckpoint(false))
  }

  /** Run `body` with a plan tap installed on this thread; returns its
    * result plus every pre-cut physical plan recorded during the run —
    * the stages a plan assertion on the final frame cannot see.
    */
  def capturing[A](body: => A): (A, Seq[SparkPlan]) = {
    val prev = tap.get()
    val buf = ListBuffer.empty[SparkPlan]
    tap.set(buf)
    try {
      val r = body
      (r, buf.toList)
    } finally {
      if (prev == null) tap.remove() else tap.set(prev)
    }
  }
}
