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
    // cast FIRST, filter on the casted column: a |v| >= 1e20 overflows
    // the DECIMAL(28,8) carrier to NULL (non-ANSI cast), and filtering
    // the raw column would let that NULL flow into the rank window as
    // a corrupt NULL-value centroid. Out-of-carrier-range values are
    // REJECTED (dropped with the NULLs) — by contract, not by accident.
    val weighted = weightCol match {
      case Some(c) => df
        .select(col(shardCol).as("shard"),
          col(valueCol).cast("decimal(28,8)").as("v"),
          col(c).cast("long").as("__w"))
        .filter(col("v").isNotNull && col("__w").isNotNull &&
          col("__w") > 0L)
      case None => df
        .select(col(shardCol).as("shard"),
          col(valueCol).cast("decimal(28,8)").as("v"), lit(1L).as("__w"))
        .filter(col("v").isNotNull)
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
    * exactly, and `[vmin, vmax]` brackets stay SOUND under overlap:
    * each output cluster's bracket covers every input centroid whose
    * rank ENVELOPE intersects the cluster's rank band (see
    * [[reclusterWiden]]), so the true quantile value is inside the
    * reported bracket even when inputs overlap in value space
    * (distribution drift across days/sources). For non-overlapping
    * inputs the envelope is the exact span and brackets stay as tight
    * as the un-merged digest's.
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
    reclusterWiden(all, delta, grpCol = None)
  }

  /** Shared merge kernel: re-cluster the union of input centroids by
    * cumulative weight (k₀ rule), then make each output cluster's
    * `[vmin, vmax]` bracket SOUND under overlap.
    *
    * Why widening is needed: input digests from different days/sources
    * can OVERLAP in value space (distribution drift), and the merged
    * multiset's interleaving is unknown — a cluster's own centroids'
    * min/max can exclude the true value at a rank the cluster answers
    * (shards A = {0, 100×9}, B = {50, 60×9} at δ=2 merge to
    * c1 = [50, 60] answering rank 15, whose true value is 100). The
    * sound bracket: every input centroid `i` occupies merged ranks
    * within its ENVELOPE `[minr_i, maxr_i]` where
    * `minr_i = Σ weight_j over vmax_j < vmin_i` (values guaranteed
    * strictly below all of `i`) and
    * `maxr_i = Σ weight_j over vmin_j ≤ vmax_i − 1` (values possibly
    * ≤ some value of `i`, minus one for zero-based rank). A cluster's
    * bracket widens over every centroid whose envelope intersects the
    * cluster's rank band — the true value at any band rank belongs to
    * one of those centroids, so containment is exact again, and for
    * NON-overlapping inputs the envelope collapses to the exact span
    * and the bracket stays as tight as before.
    *
    * Plan shape: ONE LINEAR CHAIN — no self-joins, no plan forks, so
    * the (possibly corpus-priced) input lineage is computed exactly
    * once (the q245 lesson: a forked summary plan re-derives its
    * upstream per branch, and column pruning below the fork defeats
    * exchange reuse). Each ranked centroid EXPLODES into boundary
    * events; a second summary-sized window computes both envelope rank
    * sums; a third window in RANK space locates the clusters whose
    * bands the envelope touches (bands are contiguous, so the hits are
    * a contiguous cluster-id range); and a final explode over that
    * ≤ δ+1-id range feeds ONE aggregate producing weights, sums, and
    * widened brackets together. Every post-rank stage is summary-sized
    * (≤ 5 rows per input centroid), windows declare their frames with
    * the group key or the registered [[SingleTask.key]] constant.
    *
    * The cumulative-weight window uses a ROWS frame, not the default
    * RANGE: two IDENTICAL centroid rows (two days can summarize to the
    * same centroid) are RANGE-frame peers and would share `__cum`,
    * leaving rank space under the duplicated row covered by no band.
    * Identical rows are interchangeable, so any peer order yields the
    * same relation — determinism holds.
    */
  private def reclusterWiden(all: DataFrame, delta: Int,
                             grpCol: Option[String]): DataFrame = {
    // frame = the union of input digests, <= inputs * (delta+1) rows
    // per group by construction — summary-sized, never corpus-sized;
    // the global case declares it with the registered constant key.
    // The key is materialized ONCE as a column and every downstream
    // window/aggregate partitions on that ATTRIBUTE: anchoring a fresh
    // key expression per stage (the round-12 shape) reads identically
    // but Catalyst cannot prove two anchors equal, so EnsureRequirements
    // priced a full exchange into EVERY stage of the global chain (5
    // exchanges for ≤ inputs·(δ+1) rows — the round-12 t-digest family
    // regression). One shared attribute → one exchange; every later
    // partitionBy/groupBy is a superset of it and pipelines as a sort
    // within the same stage. A plain lit(0) column would NOT work:
    // foldable partition keys get stripped by the optimizer
    // (EliminateWindowPartitions), restoring the banned empty
    // partition spec — the non-foldable registered key is the vehicle.
    val (framed, gname) = grpCol match {
      case Some(g) => (all, g)
      case None =>
        (all.withColumn("__grp", SingleTask.key(col("vmin"))), "__grp")
    }
    val part: Seq[Column] = Seq(col(gname))
    val wOrd = Window.partitionBy(part: _*)
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = framed
      .withColumn("__cum", sum(col("weight")).over(wOrd))
      .withColumn("__n",
        sum(col("weight")).over(Window.partitionBy(part: _*)))
      .withColumn("__before", col("__cum") - col("weight"))
      .withColumn("cluster",
        expr(s"CAST((__before * ${delta}L) DIV __n AS BIGINT)"))
    val idCols = part ++ Seq(col("weight"), col("sumv"), col("vmin"),
      col("vmax"), col("cluster"), col("__before"))
    // boundary events: pass 0 accumulates weight at vmax and reads at
    // vmin with weights EXCLUDED on key ties (kind orders the query
    // first) -> minr; pass 1 accumulates at vmin and reads at vmax
    // with ties INCLUDED (query last) -> maxr + 1. Query rows carry
    // their centroid's identity; __before is unique per centroid
    // within a group (ROWS-frame cum), so it re-keys the collapse.
    def ev(p: Int, key: Column, kd: Int, w: Column) =
      struct(lit(p).as("p"), key.as("k"), lit(kd).as("kd"), w.as("w"))
    val events = ranked.select((idCols :+
      explode(array(
        ev(0, col("vmin"), 0, lit(0L)),
        ev(0, col("vmax"), 1, col("weight")),
        ev(1, col("vmax"), 1, lit(0L)),
        ev(1, col("vmin"), 0, col("weight")))).as("__e")): _*)
      .select((idCols ++ Seq(col("__e.p").as("__pass"),
        col("__e.k").as("__key"), col("__e.kd").as("__kind"),
        col("__e.w").as("__w"))): _*)
    val wEnv = Window
      .partitionBy((part :+ col("__pass")): _*)
      .orderBy(col("__key"), col("__kind"))
    // locate pass, in RANK space: bands are contiguous intervals
    // covering [0, N) (ROWS-frame cum), so the clusters a centroid's
    // envelope [minr, maxr] touches are exactly the ids from the
    // cluster of the row spanning minr to that spanning maxr. Span
    // events (kind 0, ONE per centroid, at its own __before) carry the
    // cluster id; probe events (kind 1) read the last span at or below
    // their rank. The probes are cut straight off the envelope
    // window's query rows — the pass-0 query row knows minr (= its
    // running sum) and emits the span alongside; the pass-1 query row
    // knows maxr — so no intermediate per-centroid collapse is needed.
    def loc(t: Int, key: Column, cl: Column) =
      struct(lit(t).as("t"), key.as("k"), lit(if (t == 0) 0 else 1)
        .as("kd"), cl.as("cl"))
    val nullCl = lit(null).cast("bigint")
    val located = events
      .withColumn("__r", sum(col("__w")).over(wEnv))
      .filter(col("__w") === 0L) // query rows (weights are >= 1)
      .select((idCols :+
        explode(when(col("__pass") === 0,
          array(loc(0, col("__before"), col("cluster")),
            loc(1, col("__r"), nullCl)))
          .otherwise(array(loc(2, col("__r") - 1L, nullCl)))).as("__e")): _*)
      .select((idCols ++ Seq(col("__e.t").as("__t"),
        col("__e.k").as("__key"), col("__e.kd").as("__kind"),
        col("__e.cl").as("__cl"))): _*)
    val wLoc = Window
      .partitionBy(part: _*)
      .orderBy(col("__key"), col("__kind"))
    val ranges = located
      .withColumn("__locc", last(col("__cl"), ignoreNulls = true).over(wLoc))
      .filter(col("__t") > 0) // probes only
      .groupBy((part :+ col("__before")): _*)
      .agg(first(col("weight")).as("weight"), first(col("sumv")).as("sumv"),
        first(col("vmin")).as("vmin"), first(col("vmax")).as("vmax"),
        first(col("cluster")).as("cluster"),
        min(when(col("__t") === 1, col("__locc"))).as("__cmin"),
        max(when(col("__t") === 2, col("__locc"))).as("__cmax"))
    // fan each centroid out to its touched cluster ids (bracket
    // contributions, weight-free) plus ONE weight-bearing row for its
    // own cluster; a single aggregate then produces sums and widened
    // brackets together. Ghost ids (k0 can skip ids) aggregate to
    // all-NULL weight rows and are dropped.
    val vminT = all.schema("vmin").dataType.sql
    val contrib = ranges.select((part :+
      explode(concat(
        array(struct(col("cluster").as("c"),
          lit(null).cast(vminT).as("bvmin"),
          lit(null).cast(vminT).as("bvmax"),
          col("weight").as("w"), col("sumv").as("s"))),
        transform(sequence(col("__cmin"), col("__cmax")),
          c => struct(c.as("c"),
            col("vmin").as("bvmin"), col("vmax").as("bvmax"),
            lit(null).cast("bigint").as("w"),
            lit(null).cast("decimal(28,8)").as("s"))))).as("__x")): _*)
    contrib
      .groupBy((part :+ col("__x.c").as("cluster")): _*)
      .agg(sum(col("__x.w")).as("weight"),
        sum(col("__x.s")).cast("decimal(28,8)").as("sumv"),
        min(col("__x.bvmin")).as("vmin"), max(col("__x.bvmax")).as("vmax"))
      .filter(col("weight").isNotNull)
      .select((grpCol.map(col).toSeq ++ Seq(col("cluster"), col("weight"),
        col("sumv"), col("vmin"), col("vmax"))): _*)
  }

  /** Merge per-group digests ACROSS inputs (days, sources, shards of a
    * backfill) PRESERVING the group key — the cross-day accumulation
    * path for [[tdigestQuantilesByGroup]]: daily per-group digests are
    * the artifact worth storing (≤ groups·(δ+1) rows each), and this
    * re-clusters their union WITHIN each group with the same k₀ rule,
    * so monthly per-group quantiles never re-read the days. Weights
    * and sums add exactly; brackets widen soundly per group via the
    * same rank-envelope rule (the [[tdigestMerge]] guarantee,
    * group-wise — the band join is an equi-join on the group key, no
    * broadcast of the group-cardinality band table). The windows
    * partition on the REAL group key, so merging scales with group
    * cardinality — the frame per group is ≤ inputs·(δ+1) summary rows,
    * never data.
    */
  def tdigestMergeByGroup(digests: Seq[DataFrame],
                          delta: Int = 64): DataFrame = {
    require(delta >= 1, s"delta must be >= 1, got $delta")
    require(digests.nonEmpty, "no digests to merge")
    val all = digests.map(_.select(col("shard"), col("weight"),
      col("sumv"), col("vmin"), col("vmax"))).reduce(_ unionByName _)
    reclusterWiden(all, delta, grpCol = Some("shard"))
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
    // ROWS frame: two centroids of one group CAN be identical rows
    // (uniform data) — RANGE-frame peers would share __cum and leave
    // their low ranks in no band, silently dropping quantile rows
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
    // ROWS frame, not RANGE: identical centroid rows are peers and
    // would share __cum, leaving their rank span in no band (see
    // reclusterWiden) — identical rows are interchangeable, so the
    // relation stays deterministic
    val ordered = Window.partitionBy(SingleTask.key(col("vmin")))
      .orderBy(col("vmin"), col("vmax"), col("weight"), col("sumv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = digest
      .withColumn("__cum", sum(col("weight")).over(ordered))
      .withColumn("__n",
        sum(col("weight")).over(Window.partitionBy(SingleTask.key(col("vmin")))))
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
    // design, with the CONSTANT qs side pinned as the broadcast build
    // (PlanGuard sanctions BNLJ only over constant/global-aggregate
    // builds; left to stats, a windowed store's tiny parquet digest
    // read could win the broadcast instead — the q277 plan-guard trip)
    cum.join(broadcast(qdf), r.between(col("__before"), col("__cum") - 1L))
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
