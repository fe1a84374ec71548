package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Scale-safety net over the gate surface: every SparkEntry query (minus
  * the two that execute eagerly during construction — see
  * `eagerlyExecuted`) is planned, not executed, against sf0.001 and its
  * physical plan asserted free of `CartesianProduct` — the operator class
  * that silently turns a
  * working sf0.01 query into an n² job at 100 TB. Broadcast nested-loop
  * joins are tolerated only when the broadcast side is a global (no
  * grouping keys) aggregate — the one-row corpus-stats pattern
  * (`crossJoin(broadcast(stats))`), constant-size and scale-safe — or in
  * the explicitly allow-listed ANN queries whose broadcast side is a
  * tiny-by-construction query/centroid set. Anything else nested-loop
  * fails the suite.
  *
  * This is a regression GUARD, not a style check: a refactor that drops a
  * join key, or a rewrite that stops being recognized as an equi-join,
  * fails here before it reaches a cluster.
  */
class PlanGuardSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  // queries whose algorithm intentionally broadcasts a non-single-row side
  // (tiny-by-construction: ANN query sets, IVF centroid tables, and q39's
  // source-level sketch matrix — pairwise over #GROUPS, the whole point of
  // collapsing documents into group sketches first)
  private val allowedBroadcastNl = Set(
    "q15_ann_bruteforce", "q14_dedup_embedding", "q16_ann_lsh", "q28_ann_ivf",
    "q39_group_sketch")

  // connectedComponents EXECUTES during query construction (its iteration
  // runs actions over localCheckpoints), so for q49/q70 `sparkPlan` would
  // be only the post-checkpoint tail — guarding it asserts nothing about
  // the pair generation, and building the frame would execute the whole
  // dedup inside this plan-only suite. Their pair pipeline is exactly
  // q13's (guarded here); the CC loop itself joins on explicit keys and
  // is covered functionally by DedupSpec.
  private val eagerlyExecuted = Set("q49_dedup_components", "q70_dedup_survivors")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
       if !eagerlyExecuted(name)) {
    test(s"$name: no cartesian product; nested-loop only where intended") {
      // sparkPlan = the chosen physical plan pre-AQE-wrapping: traversable,
      // and what AQE starts from
      val plan = fn(spark, dir).queryExecution.sparkPlan

      val cartesians = plan.collect { case c: CartesianProductExec => c }
      assert(cartesians.isEmpty,
        s"$name plans a CartesianProduct — an unkeyed join leaked in:\n$plan")

      if (!allowedBroadcastNl(name)) {
        plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
          val bcastSide = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          val isGlobalAggregate = bcastSide.find {
            case a: BaseAggregateExec => a.groupingExpressions.isEmpty
            case _ => false
          }.isDefined
          assert(isGlobalAggregate,
            s"$name broadcasts a non-constant side through a nested-loop join:\n$plan")
        }
      }
    }
  }
}
