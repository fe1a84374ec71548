package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic t-digest-style quantile summaries for UNBOUNDED value
  * domains — the mergeable-quantile complement to the HDR histogram
  * family (`FreqSketch.hdrHistogram`), which covers non-negative
  * integers only. A digest is a RELATION of ≤ `delta` + 1 centroid
  * rows `(cluster, weight, sumv, vmin, vmax)` per shard: like every
  * sketch in this library it is bounded by construction, merges by
  * re-clustering summary rows (never re-reading data), and every
  * number it reports is replayable bit-for-bit by an independent
  * engine.
  *
  * Design vs the streaming t-digest (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests"): the classic
  * insertion digest is ORDER-DEPENDENT (cluster boundaries depend on
  * arrival order), which breaks both determinism under Spark's
  * partition racing and any exact cross-engine oracle. This variant
  * clusters by EXACT per-shard rank with the uniform scale function
  * (the paper's k₀): cluster = ⌊rankBefore · δ / N⌋ over values
  * sorted (value asc) with duplicate values pre-aggregated — a pure
  * integer function of the multiset, so the digest is a VALUE of the
  * data. The price is a per-shard sort (rank needs order); at 100 TB
  * the shard column IS the parallelism contract (day / source /
  * bucket), exactly the `mgSummarize` stance, and the artifact worth
  * storing per shard is the ≤ δ+1-row digest.
  *
  * Error contract: each centroid spans < ⌈N/δ⌉ + 1 ranks, so any
  * quantile estimate is bracketed by its centroid's `[vmin, vmax]`
  * and the TRUE quantile value always lies inside that bracket (the
  * bracket is exact, not probabilistic — asserted as data by the
  * gate's `bounds_hold` column).
  */
object TDigest {

  /** Per-shard digest of `valueCol` (any numeric; carried as
    * DECIMAL(28,8) internally so sums are exact and order-free):
    * ≤ `delta` + 1 rows `(shard, cluster, weight, sumv, vmin, vmax)`.
    * NULL values are dropped (a quantile over NULLs is undefined);
    * duplicate values pre-aggregate so the rank window runs over
    * DISTINCT values per shard.
    *
    * `weightCol` (integer multiplicities — request counts, token
    * counts, bytes) makes each row stand for `weight` copies of its
    * value: quantiles then answer over the WEIGHTED multiset (the
    * [[FreqSketch.cmsSketch]] weight convention). Rows with NULL or
    * non-positive weight are dropped — a zero-weight value is not in
    * the multiset, and negative multiplicities have no rank meaning.
    */
  def tdigestSummarize(df: DataFrame, valueCol: String, shardCol: String,
                       delta: Int = 64,
                       weightCol: Option[String] = None): DataFrame = {
    require(delta >= 1, s"delta must be >= 1, got $delta")
    val base = df.filter(col(valueCol).isNotNull)
    val weighted = weightCol match {
      case Some(c) => base
        .filter(col(c).isNotNull && col(c).cast("long") > 0L)
        .select(col(shardCol).as("shard"),
          col(valueCol).cast("decimal(28,8)").as("v"),
          col(c).cast("long").as("__w"))
      case None => base.select(col(shardCol).as("shard"),
        col(valueCol).cast("decimal(28,8)").as("v"),
        lit(1L).as("__w"))
    }
    val w = weighted
      .groupBy(col("shard"), col("v"))
      .agg(sum(col("__w")).as("w"))
    val byShard = Window.partitionBy(col("shard")).orderBy(col("v"))
    val ranked = w
      .withColumn("__cum", sum(col("w")).over(byShard))
      .withColumn("__n", sum(col("w")).over(Window.partitionBy(col("shard"))))
      .withColumn("__before", col("__cum") - col("w"))
      // the k0 scale: equal-weight rank bands. DIV, not `/`: Column./
      // on longs is DOUBLE division, which misbuckets once
      // rank·δ > 2^53 (a 100 TB shard) — DIV is exact BIGINT floor
      // division in both Spark and the DuckDB replay (`//`)
      .withColumn("cluster",
        expr(s"CAST((__before * ${delta}L) DIV __n AS BIGINT)"))
    ranked.groupBy(col("shard"), col("cluster"))
      .agg(sum(col("w")).as("weight"),
        sum(col("v") * col("w")).cast("decimal(28,8)").as("sumv"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"))
  }

  /** Merge digests from any shards into ONE digest of ≤ `delta` + 1
    * rows under a synthetic constant shard: centroid rows (summary-
    * sized — ≤ shards · (δ+1), the registered [[SingleTask.key]]
    * bound) are re-ordered by `(vmin, vmax, weight, sumv)` — a
    * deterministic total order that agrees with mean order within any
    * one digest (clusters don't overlap there) — and re-clustered by
    * cumulative weight with the same k₀ rule. Weights and sums add
    * exactly; `[vmin, vmax]` brackets widen to cover both inputs, so
    * the bracket guarantee SURVIVES merging (bounds add, never
    * compound — the Misra–Gries merge stance).
    */
  def tdigestMerge(digests: Seq[DataFrame], delta: Int = 64): DataFrame = {
    require(delta >= 1, s"delta must be >= 1, got $delta")
    require(digests.nonEmpty, "no digests to merge")
    // canonicalize each input BEFORE the union: summarize outputs carry
    // (shard, cluster) alongside the centroid columns, stored/merged
    // digests carry the centroid columns alone — both merge
    val all = digests.map(_.select(
      col("weight"), col("sumv"), col("vmin"), col("vmax")))
      .reduce(_ unionByName _)
    // frame = the union of input digests, <= shards * (delta+1) rows by
    // construction (each input is a compress output) — summary-sized,
    // never corpus-sized; declared with the registered constant key
    val wOrd = Window.partitionBy(SingleTask.key(col("vmin")))
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
    val ranked = all
      .withColumn("__cum", sum(col("weight")).over(wOrd))
      .withColumn("__n",
        sum(col("weight")).over(Window.partitionBy(SingleTask.key(col("vmax")))))
      .withColumn("__before", col("__cum") - col("weight"))
      .withColumn("cluster",
        expr(s"CAST((__before * ${delta}L) DIV __n AS BIGINT)"))
    ranked.groupBy(col("cluster"))
      .agg(sum(col("weight")).as("weight"),
        sum(col("sumv")).cast("decimal(28,8)").as("sumv"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
  }

  /** Merge per-group digests ACROSS inputs (days, sources, shards of a
    * backfill) PRESERVING the group key — the cross-day accumulation
    * path for [[tdigestQuantilesByGroup]]: daily per-group digests are
    * the artifact worth storing (≤ groups·(δ+1) rows each), and this
    * re-clusters their union WITHIN each group with the same k₀ rule,
    * so monthly per-group quantiles never re-read the days. Weights
    * and sums add exactly; brackets widen soundly per group (the
    * [[tdigestMerge]] guarantee, group-wise). The window partitions on
    * the REAL group key, so merging scales with group cardinality —
    * the frame per group is ≤ inputs·(δ+1) summary rows, never data.
    */
  def tdigestMergeByGroup(digests: Seq[DataFrame],
                          delta: Int = 64): DataFrame = {
    require(delta >= 1, s"delta must be >= 1, got $delta")
    require(digests.nonEmpty, "no digests to merge")
    val all = digests.map(_.select(col("shard"), col("weight"),
      col("sumv"), col("vmin"), col("vmax"))).reduce(_ unionByName _)
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
    val ranked = all
      .withColumn("__cum", sum(col("weight")).over(byShard))
      .withColumn("__n",
        sum(col("weight")).over(Window.partitionBy(col("shard"))))
      .withColumn("__before", col("__cum") - col("weight"))
      .withColumn("cluster",
        expr(s"CAST((__before * ${delta}L) DIV __n AS BIGINT)"))
    ranked.groupBy(col("shard"), col("cluster"))
      .agg(sum(col("weight")).as("weight"),
        sum(col("sumv")).cast("decimal(28,8)").as("sumv"),
        min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"))
  }

  /** Per-GROUP quantile reads straight from a [[tdigestSummarize]]
    * output (the shard column doubling as the group key — the
    * q249/q250 per-group sketch shape for real-valued domains): each
    * group's ≤ δ+1 centroid rows are rank-windowed within the group,
    * the |qs| literal quantile rows replicate against the digest frame
    * (a broadcast of a literal local relation — the frame is
    * groups·(δ+1) rows, digest-sized, never corpus-sized), and the
    * band containment picks each group's answering centroid. Output
    * one row per (shard, qi) with the same exact-bracket columns as
    * [[tdigestQuantiles]].
    */
  def tdigestQuantilesByGroup(digest: DataFrame,
                              qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be within [0, 1], got $qs")
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
    val cum = digest
      .withColumn("__cum", sum(col("weight")).over(byShard))
      .withColumn("__n",
        sum(col("weight")).over(Window.partitionBy(col("shard"))))
      .withColumn("__before", col("__cum") - col("weight"))
    val spark = digest.sparkSession
    import spark.implicits._
    val qdf = qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("qi", "q")
    val r = floor(col("q") * (col("__n") - 1L).cast("double")).cast("long")
    cum.join(broadcast(qdf),
        r.between(col("__before"), col("__cum") - 1L))
      .select(col("shard"), col("qi"), col("q"),
        col("__n").as("n"), r.as("target_rank"),
        col("weight"), col("vmin"), col("vmax"),
        (col("vmin").cast("double") +
          (col("vmax") - col("vmin")).cast("double") *
            ((r - col("__before")).cast("double") /
              greatest(col("weight") - 1L, lit(1L)).cast("double")))
          .as("estimate"))
  }

  /** Quantile reads from one digest (≤ δ+1 rows, shard-free — the
    * [[tdigestMerge]] output): for each q, the target rank is
    * `r = ⌊q·(N−1)⌋` (exact BIGINT), the answering centroid is the one
    * whose `[rankBefore, rankBefore + weight)` contains `r`, and the
    * row reports the exact bracket `[vmin, vmax]` (the true q-quantile
    * value is INSIDE it) plus a linear interpolation estimate. Every
    * column except the final double interpolation is integer/decimal
    * exact; the interpolation itself is a fixed IEEE expression both
    * engines evaluate identically.
    */
  def tdigestQuantiles(digest: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be within [0, 1], got $qs")
    val ordered = Window.partitionBy(SingleTask.key(col("vmin")))
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
    val cum = digest
      .withColumn("__cum", sum(col("weight")).over(ordered))
      .withColumn("__n",
        sum(col("weight")).over(Window.partitionBy(SingleTask.key(col("vmax")))))
      .withColumn("__before", col("__cum") - col("weight"))
    val spark = digest.sparkSession
    import spark.implicits._
    val qdf = qs.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("qi", "q")
    // explicit floor() BEFORE the cast: Spark's double→long cast
    // truncates while DuckDB's rounds — floor-then-cast is identical
    // in both engines (the verified q131 hazard class)
    val r = floor(col("q") * (col("__n") - 1L).cast("double")).cast("long")
    // band-containment theta join of two bounded frames (|qs| literal
    // rows × ≤ δ+1 centroids) — plans as a broadcast nested-loop by
    // design; gate is whitelisted in PlanGuardSpec with this bound
    qdf.join(cum, r.between(col("__before"), col("__cum") - 1L))
      .select(col("qi"), col("q"),
        col("__n").as("n"), r.as("target_rank"),
        col("weight"), col("vmin"), col("vmax"),
        (col("vmin").cast("double") +
          (col("vmax") - col("vmin")).cast("double") *
            ((r - col("__before")).cast("double") /
              greatest(col("weight") - 1L, lit(1L)).cast("double")))
          .as("estimate"))
  }
}
