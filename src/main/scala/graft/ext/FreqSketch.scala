package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count–min sketch (Cormode & Muthukrishnan 2005) as a RELATION — the
  * frequency summary for item spaces too large to count exactly (corpus
  * n-grams, URLs, user agents at 100 TB): a fixed `depth × width` grid
  * of counters, each row of the grid a different hash of the item;
  * estimate = min over the depth cells, which can only OVER-estimate
  * (collisions add, never subtract), so a `est >= threshold` scan has
  * no false negatives.
  *
  * Spark-first shape: the sketch is a DataFrame of at most
  * `depth * width` rows `(j, bucket, cnt)` — one partial+final hash
  * aggregate builds it (map-side combine does the heavy lifting; the
  * shuffle moves at most `depth * width` rows per map task regardless
  * of corpus size), `union + re-aggregate` merges sketches across
  * corpora/batches/days without ever holding the item space, and
  * estimation is a broadcast-sized equi-join. No custom aggregation
  * buffer needed — the relational form IS the mergeable sketch, and
  * Catalyst handles partial aggregation exactly as a hand-written
  * TypedImperativeAggregate would.
  *
  * Hashing: the `depth` bucket indices are consecutive 8-hex-char
  * slices of ONE `md5(item)` per row (slices of a cryptographic digest
  * are independent for this purpose — and one digest per row costs a
  * quarter of four), `% width` each. Deterministic and engine-portable:
  * the oracle replays the same slices via an ascii-fold hex decode.
  *
  * Guarantee: with `N` total weight, `true <= est` always, and
  * `est <= true + e*N/width` per row with probability `1 - (1/e)` per
  * slice — the standard CMS bound, `depth` slices multiplying the
  * failure probability down.
  */
object FreqSketch {

  /** Sketch depth — 4 independent 32-bit slices of one md5 digest. */
  val Depth = 4

  /** The bucket expression for slice `j` — the module's whole contract
    * (and the gate oracle) hard-codes this exact form.
    */
  private[ext] def bucket(item: Column, j: Int, width: Int): Column =
    conv(substring(md5(item.cast("string")), j * 8 + 1, 8), 16, 10)
      .cast("long") % width

  /** Build the sketch relation `(j, bucket, cnt)` over `itemCol`,
    * optionally weighted (token counts, bytes). At most `Depth * width`
    * rows leave the aggregate — the sketch is broadcast-sized by
    * construction for any practical width.
    */
  def cmsSketch(df: DataFrame, itemCol: String, width: Int = 4096,
                weightCol: Option[String] = None): DataFrame = {
    require(width >= 16, s"width must be >= 16, got $width")
    val item = col(itemCol)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.filter(item.isNotNull)
      .select(w.as("__w"), posexplode(
        array((0 until Depth).map(j => bucket(item, j, width)): _*))
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge sketches built with the SAME width: union + re-aggregate —
    * counters add cell-wise, exactly the property that makes CMS the
    * cross-corpus/cross-day accumulator.
    */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for a CANDIDATE item set against an accumulated
    * sketch: explode each candidate to its `Depth` cells, left-join the
    * sketch (absent cell = 0 — the item was never counted there), min
    * across slices. The sketch side is at most `Depth * width` rows, so
    * the join broadcasts; candidates stream through at any scale.
    *
    * This is the intended access pattern: probe a NEW batch's items (or
    * a blocklist, or this round's survivors) against history — probing
    * every distinct item of the same corpus the sketch was built from
    * costs what the exact groupBy costs and buys nothing.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
                  width: Int = 4096): DataFrame = {
    val item = col(itemCol)
    probes.filter(item.isNotNull)
      .select(item.as("item")).distinct()
      .select(col("item"), posexplode(
        array((0 until Depth).map(j => bucket(col("item"), j, width)): _*))
        .as(Seq("j", "bucket")))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Per-GROUP count–min sketch `(grp, j, bucket, cnt)` — one grid per
    * group value (frequencies per tenant / event type / source, the
    * [[hllSketchBy]] convention for frequencies): ≤ groups × Depth ×
    * width rows leave ONE map-side-combined aggregate, and each group's
    * grid carries the full CMS contract independently (cell-wise
    * mergeable, over-count-only estimates bounded by the GROUP's own
    * weight, not the corpus total).
    */
  def cmsSketchBy(df: DataFrame, groupCol: String, itemCol: String,
                  width: Int = 4096,
                  weightCol: Option[String] = None): DataFrame = {
    require(width >= 16, s"width must be >= 16, got $width")
    val item = col(itemCol)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.filter(item.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), w.as("__w"), posexplode(
        array((0 until Depth).map(j => bucket(item, j, width)): _*))
        .as(Seq("j", "bucket")))
      .groupBy(col("grp"), col("j"), col("bucket"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Point estimates for `(group, item)` probe pairs against a
    * per-group sketch ([[cmsSketchBy]] shape): each pair explodes to
    * its Depth cells and meets the sketch in an EQUI-join on
    * `(grp, j, bucket)` — a plain hash join, not a forced broadcast,
    * because the sketch side is groups × Depth × width rows (bounded
    * per group, not globally constant; AQE broadcasts it when the
    * group count is small). Absent cell = 0, min across slices, one
    * row per probe pair.
    */
  def cmsEstimateBy(sketch: DataFrame, probes: DataFrame,
                    groupCol: String, itemCol: String,
                    width: Int = 4096): DataFrame = {
    val item = col(itemCol)
    probes.filter(item.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), item.as("item")).distinct()
      .select(col("grp"), col("item"), posexplode(
        array((0 until Depth).map(j => bucket(col("item"), j, width)): _*))
        .as(Seq("j", "bucket")))
      .join(sketch, Seq("grp", "j", "bucket"), "left")
      .groupBy(col("grp"), col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** One-call heavy-hitters screen: estimates for `probes` and keeps
    * `est >= minCount`. Over-estimation-only means NO false negatives —
    * every true heavy hitter survives; collisions may add light items,
    * which an exact count of the (small) survivor set then settles.
    */
  def heavyHitters(df: DataFrame, itemCol: String, probes: DataFrame,
                   minCount: Long, width: Int = 4096,
                   weightCol: Option[String] = None): DataFrame =
    cmsEstimate(cmsSketch(df, itemCol, width, weightCol), probes,
      itemCol, width)
      .filter(col("est") >= minCount)

  /** Equi-join CARDINALITY estimate from two CMS sketches built with
    * the SAME width over the two sides' join-key columns — the
    * inner-product estimator (Cormode & Muthukrishnan §4.2, the
    * sketch form of the AMS join-size estimate): per depth slice,
    * `dot_j = Σ_bucket cntA(j,b) · cntB(j,b)` equals the true
    * `|A ⋈ B| = Σ_key cntA(k)·cntB(k)` PLUS a nonnegative collision
    * term (colliding keys only add products), so `min_j dot_j` NEVER
    * under-estimates the join size and tightens with depth — the
    * `never_under` column the gate rides along asserts it as data.
    *
    * This is the planner's shape: both inputs are ≤ Depth·width rows
    * by construction, so the estimate costs one sketch-sized hash join
    * — affordable BEFORE committing the real join's shuffle (pick
    * broadcast vs shuffle, pre-size partitions, or refuse a
    * runaway fan-out join), and the sketches themselves are the
    * one-linear-scan, map-side-combined relations [[cmsSketch]] always
    * builds, mergeable across days/corpora with [[cmsMerge]].
    *
    * Caller contract (as for [[cmsMerge]]): both sketches must share
    * `width`. Output: one row per slice `(j, dot, join_size_est)` with
    * the min replicated per row — ≤ [[Depth]] rows total.
    */
  def cmsJoinSize(a: DataFrame, b: DataFrame): DataFrame = {
    val prod = a.select(col("j"), col("bucket"), col("cnt").as("cnt_a"))
      .join(b.select(col("j"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("j", "bucket"))
      .groupBy(col("j"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("dot"))
    // an ABSENT slice means zero bucket overlap there — dot_j = 0, the
    // tightest possible bound (a truly joining key collides with
    // itself in EVERY slice, so any true join populates all Depth
    // rows). Materialize the full slice domain so the min sees it.
    val full = a.sparkSession.range(Depth)
      .select(col("id").cast("int").as("j"))
      .join(prod, Seq("j"), "left")
      .select(col("j"), coalesce(col("dot"), lit(0L)).as("dot"))
    // frame = one row per slice (= Depth rows) by construction;
    // declared with the registered constant key
    full.withColumn("join_size_est",
      min(col("dot")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(SingleTask.key(col("j")))))
  }

  // --------------------------------------------- HyperLogLog as a relation

  /** HyperLogLog (Flajolet et al. 2007) as a RELATION — the distinct-
    * count sibling of [[cmsSketch]]: ≤ 2^p rows `(bucket, rho)` where
    * `rho` is the max leading-zero rank observed in the bucket. The
    * point over `approx_count_distinct` (and over Spark's DataSketches
    * `hll_sketch_agg` binaries): the register TABLE merges across
    * separately materialized sketches (shards, days, snapshots) with a
    * plain `union + max` re-aggregate, and every number is replayable
    * by any engine with md5 — the sketch can live in a parquet table
    * and keep accumulating.
    *
    * Hashing: bucket = top `p` bits of the first 8-hex-char slice of
    * md5(item); rho = leading-zero rank (1-based, capped at 33) of the
    * SECOND 8-hex-char slice — two independent 32-bit words of one
    * digest (the [[bucket]] stance), decoded with integer arithmetic
    * only. The rank is a 32-branch integer CASE ladder, not log2 —
    * floating log is an engine-portability hazard.
    */
  def hllSketch(df: DataFrame, itemCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val item = col(itemCol)
    val hx = md5(item.cast("string"))
    val wordA = conv(substring(hx, 1, 8), 16, 10).cast("long")
    val wordB = conv(substring(hx, 9, 8), 16, 10).cast("long")
    val bucket = expr(s"CAST(__a div ${1L << (32 - p)} AS INT)")
    // leading-zero rank of the 32-bit word, largest threshold first:
    // >= 2^31 → 1, >= 2^30 → 2, …, >= 1 → 32, zero word → 33
    val rho = (1 to 32).foldRight(lit(33): Column) { (i, tail) =>
      when(col("__b") >= lit(1L << (32 - i)), lit(i)).otherwise(tail)
    }
    df.filter(item.isNotNull)
      .select(wordA.as("__a"), wordB.as("__b"))
      .select(bucket.as("bucket"), rho.cast("int").as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge HLL register tables built with the SAME `p`: union + max —
    * registers take the element-wise maximum, exactly the union
    * semantics of the sketch (merge-then-estimate ≡ sketch-the-union).
    */
  def hllMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  // ------------------------------------- HDR histogram (quantile sketch)

  /** floor(log2 v) for v ≥ 2^subBits via an integer comparison ladder —
    * largest threshold first, never float log (an engine-portability
    * hazard; the [[hllSketch]] rho stance).
    */
  private def log2Ladder(v: Column, subBits: Int): Column = {
    var ladder: Column = lit(subBits.toLong)
    for (i <- subBits + 1 to 62)
      ladder = when(v >= lit(1L << i), lit(i.toLong)).otherwise(ladder)
    ladder
  }

  /** HDR-style histogram (Gil Tene's HdrHistogram bucketing as pure
    * integer arithmetic) as a RELATION — the QUANTILE member of the
    * mergeable-sketch trio next to [[cmsSketch]] (frequencies) and
    * [[hllSketch]] (distincts): values below 2^subBits bucket to
    * themselves (exact); above, to
    * `(e − subBits)·2^subBits + (v >> (e − subBits))`, e = floor(log2 v)
    * — monotone, contiguous across octaves, relative bucket width ≤
    * 2^−subBits. At most `(63 − subBits + 1)·2^subBits` rows cover the
    * whole nonnegative BIGINT domain (~1.9k rows at subBits = 5), so
    * histograms of shards/days stored as parquet MERGE with a plain
    * `union + sum` — the thing `approx_percentile` results cannot do
    * (percentiles don't merge from percentiles).
    *
    * Input contract: nonnegative BIGINTs (latencies, byte sizes, token
    * counts); negatives raise in-plan, NULLs are dropped.
    */
  def hdrHistogram(df: DataFrame, valueCol: String,
                   subBits: Int = 5): DataFrame = {
    require(subBits >= 2 && subBits <= 10,
      s"subBits must be in [2, 10], got $subBits")
    val v = col(valueCol).cast("long")
    val b = subBits
    df.filter(v.isNotNull)
      .select(when(v >= 0L, v)
        .otherwise(raise_error(concat(
          lit("hdrHistogram: negative value "), v.cast("string"),
          lit(s" in $valueCol — the bucketing covers nonnegative "),
          lit("BIGINTs; shift or split the domain")))).as("__v"))
      .select(col("__v"), log2Ladder(col("__v"), b).as("__e"))
      .select(when(col("__v") < lit(1L << b), col("__v"))
        .otherwise((col("__e") - b) * lit(1L << b) +
          expr(s"shiftright(__v, CAST(__e - $b AS INT))"))
        .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge HDR histograms built with the SAME subBits: union + sum —
    * counts add bucket-wise (the [[cmsMerge]] property).
    */
  def hdrMerge(hists: Seq[DataFrame]): DataFrame = {
    require(hists.nonEmpty, "no histograms to merge")
    hists.reduce(_ unionByName _)
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile bounds from an HDR histogram: for each q the row
    * `(q, rank, bucket, lo, hi)` where rank = ceil(q·n) and
    * [lo, hi] are the EXACT integer bounds of the first bucket whose
    * cumulative count reaches the rank — the true q-quantile provably
    * lies in [lo, hi], so the answer carries its own error bar
    * (hi − lo < lo·2^−subBits).
    *
    * Scale shape: the histogram frame is ≤ ~2k rows by construction —
    * the running sum is a declared bounded-frame window
    * (`SingleTask.key`) and every join is quantile-count-sized.
    */
  def hdrQuantiles(hist: DataFrame, quantiles: Seq[Double],
                   subBits: Int = 5): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    require(quantiles.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $quantiles")
    val spark = hist.sparkSession
    import spark.implicits._
    val b = subBits
    val n = hist.agg(sum(col("cnt")).as("__n"))
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(SingleTask.key(col("bucket")))
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
    val qs = quantiles.toDF("q").crossJoin(broadcast(n))
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * col("__n")).cast("long")))
    // broadcast the quantile side explicitly: it carries the global
    // count aggregate, the exact shape the plan guard sanctions for a
    // nested-loop broadcast
    val picked = broadcast(qs).join(cum, col("__cum") >= col("rank"))
      .groupBy(col("q"), col("rank"))
      .agg(min(col("bucket")).as("bucket"))
    picked
      .withColumn("__s", expr(s"bucket div ${1L << b}"))
      .withColumn("lo",
        when(col("bucket") < lit(1L << b), col("bucket"))
          .otherwise(expr(s"shiftleft(bucket - (__s - 1) * ${1L << b}, " +
            s"CAST(__s - 1 AS INT))")))
      .withColumn("hi",
        when(col("bucket") < lit(1L << b), col("bucket"))
          .otherwise(expr(s"shiftleft(bucket - (__s - 1) * ${1L << b} + 1, " +
            s"CAST(__s - 1 AS INT)) - 1")))
      .select(col("q"), col("rank"), col("bucket"), col("lo"), col("hi"))
  }

  /** Per-group HDR histogram: ≤ |groups| × ~1.9k rows
    * `(grp, bucket, cnt)` — the per-key percentile shape (latency per
    * endpoint, size per domain) from one map-side-combined aggregate.
    * Same bucket formula as [[hdrHistogram]]; merge across shards/days
    * with [[hdrMergeBy]].
    */
  def hdrHistogramBy(df: DataFrame, groupCol: String, valueCol: String,
                     subBits: Int = 5): DataFrame = {
    require(subBits >= 2 && subBits <= 8,
      s"subBits must be in [2, 8], got $subBits")
    val v = col(valueCol).cast("long")
    val b = subBits
    df.filter(v.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), when(v >= 0L, v)
        .otherwise(raise_error(concat(
          lit("hdrHistogramBy: negative value "), v.cast("string"),
          lit(s" in $valueCol — the bucketing covers nonnegative "),
          lit("BIGINTs; shift or split the domain")))).as("__v"))
      .select(col("grp"), col("__v"), log2Ladder(col("__v"), b).as("__e"))
      .select(col("grp"),
        when(col("__v") < lit(1L << b), col("__v"))
          .otherwise((col("__e") - b) * lit(1L << b) +
            expr(s"shiftright(__v, CAST(__e - $b AS INT))"))
          .as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge per-group HDR histograms built with the SAME subBits. */
  def hdrMergeBy(hists: Seq[DataFrame]): DataFrame = {
    require(hists.nonEmpty, "no histograms to merge")
    hists.reduce(_ unionByName _)
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Per-group quantile bounds from a per-group HDR histogram: one row
    * `(grp, q, rank, bucket, lo, hi)` per (group, quantile) — the
    * [[hdrQuantiles]] pick applied group-wise. The running sum windows
    * over the GROUP's histogram frame (≤ ~1.9k rows by construction —
    * and here the partition key is the real group column, no declared
    * constant needed); quantile fan-out is a literal explode on the
    * group-count relation.
    */
  def hdrQuantilesBy(hist: DataFrame, quantiles: Seq[Double],
                     subBits: Int = 5): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    require(quantiles.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $quantiles")
    val b = subBits
    val n = hist.groupBy(col("grp")).agg(sum(col("cnt")).as("__n"))
    val cum = hist
      .withColumn("__cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)))
    val qs = n
      .select(col("grp"), col("__n"),
        explode(array(quantiles.map(lit): _*)).as("q"))
      .withColumn("rank",
        greatest(lit(1L), ceil(col("q") * col("__n")).cast("long")))
    val picked = qs.join(cum, Seq("grp"))
      .filter(col("__cum") >= col("rank"))
      .groupBy(col("grp"), col("q"), col("rank"))
      .agg(min(col("bucket")).as("bucket"))
    picked
      .withColumn("__s", expr(s"bucket div ${1L << b}"))
      .withColumn("lo",
        when(col("bucket") < lit(1L << b), col("bucket"))
          .otherwise(expr(s"shiftleft(bucket - (__s - 1) * ${1L << b}, " +
            s"CAST(__s - 1 AS INT))")))
      .withColumn("hi",
        when(col("bucket") < lit(1L << b), col("bucket"))
          .otherwise(expr(s"shiftleft(bucket - (__s - 1) * ${1L << b} + 1, " +
            s"CAST(__s - 1 AS INT)) - 1")))
      .select(col("grp"), col("q"), col("rank"), col("bucket"),
        col("lo"), col("hi"))
  }

  // ----------------------------------- Count sketch (signed / unbiased CMS)

  /** Count-sketch depth — 5 estimator rows (odd, single-element
    * median) from disjoint slices of one md5 digest: 5-hex-char
    * (20-bit) bucket slices at chars 1–25, one sign hex char each at
    * chars 26–30.
    */
  val CsDepth = 5

  /** Bucket for count-sketch row `j` — a 20-bit md5 slice mod width. */
  private[ext] def csBucket(item: Column, j: Int, width: Int): Column =
    conv(substring(md5(item.cast("string")), j * 5 + 1, 5), 16, 10)
      .cast("long") % width

  /** Sign for count-sketch row `j` — the parity of one hex char. */
  private[ext] def csSign(item: Column, j: Int): Column =
    conv(substring(md5(item.cast("string")), j + 26, 1), 16, 10)
      .cast("long") % 2L * 2L - 1L

  /** Count sketch (Charikar, Chen & Farach-Colton 2002) as a RELATION
    * — the SIGNED sibling of [[cmsSketch]]: ≤ [[CsDepth]] × `width`
    * rows `(j, bucket, s)` where `s = Σ sign_j(item)·w` over the items
    * landing in the bucket. Colliding items cancel in expectation
    * instead of adding, so the per-item estimate
    * `median_j(sign_j(item) · s_j[bucket_j(item)])` is UNBIASED —
    * CMS can only over-count, count sketch errs symmetrically with
    * variance `F2/width` — at the price of losing CMS's
    * no-false-negative screen. Use CMS to gate "possibly heavy", count
    * sketch when the estimate itself feeds arithmetic (residuals,
    * deltas between corpora — the sketch is LINEAR, so subtracting two
    * corpus sketches estimates per-item count differences).
    *
    * Same 100 TB shape as [[cmsSketch]]: one partial+final aggregate,
    * map-side combine collapses each task to ≤ depth·width rows,
    * merge = union + re-aggregate, estimate = broadcast equi-join.
    */
  def countSketch(df: DataFrame, itemCol: String, width: Int = 2048,
                  weightCol: Option[String] = None): DataFrame = {
    require(width >= 16, s"width must be >= 16, got $width")
    val item = col(itemCol)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.filter(item.isNotNull)
      .select(posexplode(array((0 until CsDepth).map(j =>
        struct(csBucket(item, j, width).as("b"),
          (csSign(item, j) * w).as("t"))): _*)).as(Seq("j", "__e")))
      .select(col("j"), col("__e.b").as("bucket"), col("__e.t").as("__t"))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("__t")).as("s"))
  }

  /** Merge count sketches built with the SAME width: union +
    * re-aggregate (linearity — also how a sketch DIFFERENCE is formed:
    * negate one side's `s` first).
    */
  def csMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("s")).as("s"))
  }

  /** Unbiased point estimates for a probe item set: per slice,
    * `sign_j(item) · s_j[bucket_j(item)]` (absent cell = 0), then the
    * per-item median — element ([[CsDepth]]+1)/2 of the
    * `(value, j)`-sorted 5-element list, a BOUNDED per-item buffer and
    * pure BIGINT arithmetic (counters are longs, signs ±1), so the
    * oracle replays it as a rank pick. Estimates can be negative —
    * that is the unbiasedness, not a bug; clamp at the caller if the
    * quantity is a count.
    */
  def csEstimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
                 width: Int = 2048): DataFrame = {
    val item = col(itemCol)
    probes.filter(item.isNotNull)
      .select(item.as("item")).distinct()
      .select(col("item"), posexplode(array((0 until CsDepth).map(j =>
        struct(csBucket(col("item"), j, width).as("b"),
          csSign(col("item"), j).as("sg"))): _*)).as(Seq("j", "__e")))
      .select(col("item"), col("j"), col("__e.b").as("bucket"),
        col("__e.sg").as("__sg"))
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("item"))
      .agg(sort_array(collect_list(struct(
        (col("__sg") * coalesce(col("s"), lit(0L))).as("v"), col("j"))))
        .as("__l"))
      .select(col("item"),
        element_at(col("__l"), (CsDepth + 1) / 2).getField("v").as("est"))
  }

  // ------------------------- AMS tug-of-war sketch (second moment / join size)

  /** AMS sketch depth — 7 independent sign bits from the 16-bit words
    * of one md5 digest (odd, so the median is a single element).
    */
  val AmsDepth = 7

  /** Sign for estimator `j`: the low bit of 16-bit md5 word `j`,
    * mapped to ±1 — the module [[bucket]] slicing stance.
    */
  private[ext] def amsSign(item: Column, j: Int): Column =
    conv(substring(md5(item.cast("string")), j * 4 + 1, 4), 16, 10)
      .cast("long") % 2L * 2L - 1L

  /** AMS tug-of-war sketch (Alon, Matias & Szegedy 1996) as a
    * RELATION — the JOIN-SIZE member of the mergeable-sketch family:
    * exactly [[AmsDepth]] rows `(j, s)` where `s = Σ sign_j(item)·w`.
    * `median_j(s_j²)` estimates the second frequency moment
    * `F2 = Σ count(item)²` — the self-join size — and
    * `median_j(s_j^A · s_j^B)` the inner product `Σ c_A·c_B` — the
    * equi-join size between two corpora — WITHOUT ever holding the
    * item space. The sketch is LINEAR: counters add component-wise,
    * so shard/day sketches stored as parquet merge by `union + sum`
    * (the [[cmsMerge]] property) and a stream accumulates it batch by
    * batch.
    *
    * One partial+final aggregate builds it: the explode emits
    * [[AmsDepth]] rows per input row but map-side combine collapses
    * each task to ≤ [[AmsDepth]] rows before the shuffle.
    */
  def amsSketch(df: DataFrame, itemCol: String,
                weightCol: Option[String] = None): DataFrame = {
    val item = col(itemCol)
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    df.filter(item.isNotNull)
      .select(posexplode(array((0 until AmsDepth)
        .map(j => amsSign(item, j) * w): _*)).as(Seq("j", "__t")))
      .groupBy(col("j"))
      .agg(sum(col("__t")).as("s"))
  }

  /** Merge AMS sketches: union + component-wise sum — the linearity
    * of the sketch (merge-then-estimate ≡ sketch-the-concatenation).
    */
  def amsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("j"))
      .agg(sum(col("s")).as("s"))
  }

  /** The median element of `valueCol` over the [[AmsDepth]]-row
    * estimator frame — element (AmsDepth+1)/2 of the `(value, j)`-
    * sorted list, deterministic under ties and replayed by the oracle
    * as a rank pick. A GLOBAL collect+sort aggregate is the right
    * physical shape for a frame of exactly [[AmsDepth]] rows: one
    * constant-size buffer, and the one-row result is the sanctioned
    * broadcast side for downstream cross-joins. Products are formed in
    * DOUBLE: counters stay < 2^53 for any realistic corpus, so the
    * double product is the same IEEE number in every engine, and
    * squaring a multi-billion counter can never overflow the way a
    * BIGINT product would. An EMPTY sketch yields one NULL-estimate
    * row.
    */
  private def amsMedian(est: DataFrame, valueCol: String,
                        outCol: String): DataFrame =
    est
      .agg(sort_array(collect_list(struct(col(valueCol).as("v"), col("j"))))
        .as("__l"))
      .select(element_at(col("__l"), (AmsDepth + 1) / 2)
        .getField("v").as(outCol))

  /** Second-moment estimate from an AMS sketch: one row `(f2_est)` =
    * median of the squared counters. Standard guarantee: within
    * `ε·F2` with constant probability per estimator, the median over
    * [[AmsDepth]] driving the failure rate down.
    */
  def amsF2(sketch: DataFrame): DataFrame =
    amsMedian(
      sketch.select(col("j"),
        (col("s").cast("double") * col("s").cast("double")).as("__v")),
      "__v", "f2_est")

  /** Inner-product (equi-join size) estimate between two AMS sketches
    * built with the same depth: one row `(ip_est)` = median of the
    * component-wise counter products. The join is [[AmsDepth]] rows a
    * side.
    */
  def amsInnerProduct(a: DataFrame, b: DataFrame): DataFrame =
    amsMedian(
      a.select(col("j"), col("s").as("__sa"))
        .join(b.select(col("j"), col("s").as("__sb")), Seq("j"))
        .select(col("j"),
          (col("__sa").cast("double") * col("__sb").cast("double"))
            .as("__v")),
      "__v", "ip_est")

  /** The raw HLL estimate from a register table: one row
    * `(n_registers, sum_scaled, estimate)`.
    *
    * Exactness discipline: the harmonic-mean denominator Σ 2^−rho is
    * accumulated as the BIGINT `sum_scaled` = Σ 2^(40−rho) (absent
    * buckets contribute rho = 0 → 2^40 each) — dyadic terms summed as
    * integers, so the only floating step is ONE final division of
    * exact integers, written identically in the SQL oracle:
    * `estimate = (alphaE6·m² / 1e6) · 2^40 / sum_scaled`. This is the
    * RAW estimator (no small/large-range correction — linear counting
    * needs ln, a cross-engine hazard); at n ≳ 2.5·m the raw form is
    * the standard operating regime, and the gate measures its error
    * against the exact count.
    */
  def hllEstimate(sketch: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val m = 1 << p
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val aConst = alphaE6 * m.toLong * m
    sketch
      .agg(count(lit(1)).as("n_registers"),
        coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - rho)")),
          lit(0L)).as("__s"))
      .select(col("n_registers"),
        (col("__s") + (lit(m.toLong) - col("n_registers")) *
          lit(1L << 40)).as("sum_scaled"))
      .withColumn("estimate",
        lit(aConst).cast("double") / lit(1000000.0) *
          lit(1099511627776.0) / col("sum_scaled").cast("double"))
  }

  // ------------------------------------------------- HLL by group

  /** Per-group HLL register table: ≤ |groups| × 2^p rows
    * `(grp, bucket, rho)` — the PRODUCTION shape of distinct counting
    * at 100 TB (distinct users per URL, distinct n-grams per domain):
    * one map-side-combined aggregate keyed on (group, bucket), merge
    * across shards/days via [[hllMergeBy]], estimates per group from
    * the register table alone. Same hashing and integer stance as
    * [[hllSketch]] (which this generalizes — a constant group column
    * reproduces it).
    */
  def hllSketchBy(df: DataFrame, groupCol: String, itemCol: String,
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val item = col(itemCol)
    val hx = md5(item.cast("string"))
    val wordA = conv(substring(hx, 1, 8), 16, 10).cast("long")
    val wordB = conv(substring(hx, 9, 8), 16, 10).cast("long")
    val bucket = expr(s"CAST(__a div ${1L << (32 - p)} AS INT)")
    val rho = (1 to 32).foldRight(lit(33): Column) { (i, tail) =>
      when(col("__b") >= lit(1L << (32 - i)), lit(i)).otherwise(tail)
    }
    df.filter(item.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), wordA.as("__a"), wordB.as("__b"))
      .select(col("grp"), bucket.as("bucket"), rho.cast("int").as("rho"))
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Merge per-group register tables built with the SAME p: union +
    * per-(group, bucket) max — registers OR together exactly as in the
    * global [[hllSketch]] family.
    */
  def hllMergeBy(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("grp"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Per-group raw HLL estimates from a register table: one row
    * `(grp, n_registers, sum_scaled, estimate)` per group — the
    * [[hllEstimate]] integer-exactness discipline (dyadic 2^(40−rho)
    * BIGINT terms, absent buckets at rho 0, ONE final double
    * division), applied group-wise in a single hash aggregate.
    */
  def hllEstimateBy(sketch: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val m = 1 << p
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val aConst = alphaE6 * m.toLong * m
    sketch
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_registers"),
        coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - rho)")),
          lit(0L)).as("__s"))
      .select(col("grp"), col("n_registers"),
        (col("__s") + (lit(m.toLong) - col("n_registers")) *
          lit(1L << 40)).as("sum_scaled"))
      .withColumn("estimate",
        lit(aConst).cast("double") / lit(1000000.0) *
          lit(1099511627776.0) / col("sum_scaled").cast("double"))
  }

  /** Pairwise content-overlap estimates between the GROUPS of one
    * register table: for every unordered group pair `(src_a, src_b)`,
    * the raw HLL estimates of |A|, |B| and |A ∪ B| — the union sketch
    * is the per-bucket register max across the two groups (the
    * [[hllMergeBy]] law, which is exactly the sketch OF the union) —
    * and the inclusion–exclusion Jaccard estimate
    * `(est_a + est_b − est_union) / est_union`, clamped to [0, 1]
    * (inclusion–exclusion can go slightly negative on disjoint sets).
    *
    * Scale shape: the pair matrix is #groups² — the whole point of
    * collapsing a corpus into per-group sketches FIRST (the q39
    * stance); the register join is an equi broadcast join of the
    * ≤ groups × 2^p register table against the exploded pair-member
    * list, never a corpus-sized operation. Same integer discipline as
    * [[hllEstimate]]: dyadic 2^(40−rho) BIGINT sums, one final double
    * division per estimate, so every output column replays bit-for-bit
    * in an independent engine.
    */
  def hllPairwiseOverlap(sketch: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val m = 1 << p
    val alphaE6 = math.floor(0.7213 / (1.0 + 1.079 / m) * 1e6).toLong
    val aConst = alphaE6 * m.toLong * m
    def estimate(nReg: Column, s: Column): Column =
      lit(aConst).cast("double") / lit(1000000.0) *
        lit(1099511627776.0) /
        (s + (lit(m.toLong) - nReg) * lit(1L << 40)).cast("double")
    val groups = sketch.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("src_a"))
      .join(groups.select(col("grp").as("src_b")),
        col("src_a") < col("src_b"))
    // explode each pair into its two member groups so the register
    // join is an EQUI broadcast join (no nested loop on the big side)
    val members = pairs.select(col("src_a"), col("src_b"),
      explode(array(col("src_a"), col("src_b"))).as("grp"))
    val union = sketch.join(broadcast(members), Seq("grp"))
      .groupBy(col("src_a"), col("src_b"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("__n_u"),
        coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - rho)")),
          lit(0L)).as("__s_u"))
    val per = hllEstimateBy(sketch, p).select(col("grp"), col("estimate"))
    union
      .join(broadcast(per.select(col("grp").as("src_a"),
        col("estimate").as("est_a"))), Seq("src_a"))
      .join(broadcast(per.select(col("grp").as("src_b"),
        col("estimate").as("est_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("est_a"), col("est_b"),
        estimate(col("__n_u"), col("__s_u")).as("est_union"))
      .withColumn("est_jaccard",
        least(lit(1.0), greatest(lit(0.0),
          (col("est_a") + col("est_b") - col("est_union")) /
            col("est_union"))))
  }

  // -------------------- Misra–Gries heavy-hitter summary (deterministic)

  /** Deterministic Misra–Gries compress of a per-shard count relation
    * `(shard, item, cnt, theta)`: per shard, `θ_k` = the (k+1)-th
    * largest count (0 when the shard has ≤ k items), keep the rows
    * with `cnt > θ_k` (at most k by construction — ties AT `θ_k` drop),
    * output `(shard, item, lo = cnt − θ_k, theta = theta + θ_k)`.
    * The window frame is the per-shard item set — the vocabulary-sized
    * window stance the BM25 family documents.
    *
    * Theta is carried even when a shard sheds EVERY row (possible when
    * the top k+1 counts all tie at `θ_k`: `cnt > θ_k` then drops each
    * one): such a shard emits a single item-NULL SENTINEL row
    * `(shard, NULL, lo = 0, theta + θ_k)` so downstream merges still
    * sum its theta — without it the documented merged bound
    * `lo ≤ true ≤ lo + theta` breaks for items with mass in that
    * shard. Sentinels keep the ≤ k-rows-per-shard contract (they only
    * exist when 0 items survive) and item readers skip them with
    * `item IS NOT NULL` (the merge does).
    */
  private def mgCompress(counts: DataFrame, k: Int): DataFrame = {
    val itemType = counts.schema("item").dataType
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("cnt").desc, col("item"))
    // θ_k rides the SAME WindowExec as the rank: nth_value over the
    // full frame (NULL → 0 when the shard has ≤ k items). One shuffle
    // + one sort; no θ self-join — the join formulation re-derived the
    // per-shard aggregate + window once per consumer and doubled q245
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = counts
      .withColumn("__rk", row_number().over(w))
      .withColumn("__tk",
        coalesce(nth_value(col("cnt"), k + 1).over(full), lit(0L)))
    // survivors (cnt > θ_k) and the fully-tied-shard theta SENTINEL
    // (zero survivors ⟺ the rank-1 cnt EQUALS θ_k: rank-1 can never be
    // below it, and cnt ≥ 1 > θ_k = 0 covers the ≤ k-item case) are
    // mutually exclusive row kinds — emit both from ONE pass over the
    // window output
    ranked
      .filter(col("cnt") > col("__tk") ||
        (col("__rk") === 1 && col("cnt") === col("__tk")))
      .select(col("shard"),
        when(col("cnt") > col("__tk"), col("item"))
          .otherwise(lit(null).cast(itemType)).as("item"),
        when(col("cnt") > col("__tk"), col("cnt") - col("__tk"))
          .otherwise(lit(0L)).as("lo"),
        (col("theta") + col("__tk")).as("theta"))
  }

  /** Misra–Gries (1982) / Metwally et al. space-saving summary as a
    * RELATION — the DETERMINISTIC heavy-hitter member of the sketch
    * family (no hashing at all): per shard, ≤ k rows
    * `(shard, item, lo, theta)` where `lo` UNDER-estimates the item's
    * shard count by at most `theta` and every item occurring more than
    * `theta` times is GUARANTEED present (the mirror image of CMS,
    * which only ever over-counts). `theta` is shard-constant: the
    * (k+1)-th largest count, i.e. the mass the compress step shaved
    * off every survivor.
    *
    * Spark-first shape: the exact per-shard count is ONE map-side-
    * combined aggregate (what a 100 TB day-shard pass costs anyway);
    * the k-row summary is the artifact worth STORING per shard/day —
    * [[mgMerge]] then combines days without re-reading them, with the
    * error bounds ADDING, never compounding: after the merge,
    * `lo ≤ true ≤ lo + theta`.
    */
  def mgSummarize(df: DataFrame, itemCol: String, shardCol: String,
                  k: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.filter(col(itemCol).isNotNull)
      .groupBy(col(shardCol).as("shard"), col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("theta", lit(0L))
    mgCompress(counts, k)
  }

  /** Merge Misra–Gries summaries (any shards, same item domain): sum
    * the per-item `lo` floors, add up every input shard's `theta`, and
    * re-compress to ≤ k rows under one synthetic shard. For every
    * surviving item `lo ≤ true ≤ lo + theta`, and every item with
    * `true > theta` survives — the cross-shard no-false-negative
    * screen. The final window's frame is ≤ k × (number of input
    * shards) rows — summary-sized, never corpus-sized — declared with
    * the registered [[SingleTask.key]] constant (bound asserted in
    * SingleTaskRegistrySpec).
    */
  def mgMerge(summaries: Seq[DataFrame], k: Int = 64): DataFrame = {
    require(summaries.nonEmpty, "no summaries to merge")
    // tag each input summary BEFORE the union: theta is de-duplicated
    // per (input, shard) below, and two different inputs can carry the
    // same shard value with EQUAL theta (two days of the same shard) —
    // a bare (shard, theta) distinct would collapse them and
    // under-sum the merged bound
    val all = summaries.zipWithIndex
      .map { case (d, i) => d.withColumn("__src", lit(i)) }
      .reduce(_ unionByName _)
    val itemType = all.schema("item").dataType
    // item-NULL rows are per-shard theta SENTINELS (a fully-tied shard
    // whose compress shed every item — see mgCompress): they carry no
    // item mass but their theta MUST still be summed below
    val summed = all.filter(col("item").isNotNull).groupBy(col("item"))
      .agg(sum(col("lo")).as("cnt"))
    val thetaTotal = all.select(col("__src"), col("shard"), col("theta"))
      .distinct()
      .agg(coalesce(sum(col("theta")), lit(0L)).as("__theta_in"))
    val merged = summed
      .join(broadcast(thetaTotal)) // one-row global aggregate side
      .select(SingleTask.key(col("item")).as("shard"), col("item"),
        col("cnt"), col("__theta_in").as("theta"))
    val compressed = mgCompress(merged, k).drop("shard")
    // totality: when EVERY input summary is sentinel-only (no items at
    // all), `merged` is empty and the compress emits nothing — carry
    // theta through a merge-level sentinel so bounds still add across
    // merge-of-merges levels. In-plan (both join sides are one-row
    // global aggregates, the sanctioned broadcast-NL shape).
    val n = compressed.agg(count(lit(1)).as("__n"))
    val fallback = thetaTotal.join(broadcast(n))
      .filter(col("__n") === 0L)
      .select(lit(null).cast(itemType).as("item"), lit(0L).as("lo"),
        col("__theta_in").as("theta"))
    compressed.unionByName(fallback)
  }
}
