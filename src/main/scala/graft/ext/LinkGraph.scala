package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.PlanCapture

/** Link-graph authority scoring for crawl curation. Domain- and
  * page-level PageRank is the standard crawl-frontier / quality prior
  * (a page linked by many high-rank pages is worth crawling and worth
  * training on); at corpus scale the link graph is billions of edges, so
  * the iteration must move only rank-sized frames, never re-shuffle the
  * edge list, and never collect anything graph-sized.
  *
  * Same machinery family as [[Dedup.connectedComponents]]: edges are
  * hash-partitioned once up front (lineage cuts preserve the
  * partitioning), each round is one join + one skinny aggregate, and the
  * frame that moves carries (id, rank) only.
  */
object LinkGraph {

  /** Fixed-iteration damped PageRank over a directed edge list, in the
    * engine-replayable integer-scaled form (the q87/q129 stance):
    * ranks are bigints scaled by 1e12,
    *
    *   r0(v)   = floor(1e12 / N)
    *   r_k(v)  = floor(teleportE12 / N)
    *             + Σ_{u→v} floor(damping · r_{k-1}(u) / outdeg(u))
    *
    * Every float step is a single multiply/divide of exact integers by a
    * shared literal followed by a floor, so an external SQL engine
    * replays the fixed-point bit-for-bit as k chained CTEs — which the
    * gate oracle does. Integer contributions sum as BIGINT: partition-
    * order independent.
    *
    * `teleportE12` must be (1 − damping) · 1e12 in intent; it is a
    * separate exact-integer parameter (not derived) because
    * `(1-0.85)*1e12` and `0.15*1e12` round to DIFFERENT doubles — the
    * caller states the integer, both engines divide it by N identically.
    *
    * Simplified variant by design: dangling-node mass is not
    * redistributed (rank totals drift below 1e12 — fine for the ranking/
    * prior use; the redistribution term would cost one extra scalar
    * aggregate per round). Multi-edges collapse (`distinct`); a fixed
    * iteration count (default 5) rather than convergence detection keeps
    * the oracle replayable — PageRank's use here is a quality PRIOR, not
    * an eigenvector to machine precision.
    *
    * Per-round shuffle profile: ranks exchange on src to meet the
    * pre-partitioned edges, then (dst, contrib) pairs — 16 bytes/edge —
    * exchange into the sum aggregate (map-side partial sums first). The
    * edge list itself never moves after the initial partition. The only
    * collect is `nodes.count()` — one scalar.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 5,
               damping: Double = 0.85,
               teleportE12: Long = 150000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val e = PlanCapture.cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    val nodes = PlanCapture.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct())
    val n = nodes.count() // the one driver scalar
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val outdeg = PlanCapture.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val base = floor(lit(teleportE12) / lit(n)).cast("long")
    var ranks = PlanCapture.cut(nodes.withColumn("rank",
      floor(lit(1000000000000L) / lit(n)).cast("long")))
    var k = 0
    while (k < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"),
          floor(lit(damping) * col("rank") / col("outdeg"))
            .cast("long").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__cin"))
      ranks = PlanCapture.cut(nodes
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (base + coalesce(col("__cin"), lit(0L))).as("rank")))
      k += 1
    }
    ranks
  }
}
