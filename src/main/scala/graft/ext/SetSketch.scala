package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-membership and set-cardinality sketches as RELATIONS — the
  * SET members of the mergeable-sketch family next to
  * [[FreqSketch.cmsSketch]] (frequencies), [[FreqSketch.hllSketch]]
  * (distinct counts) and [[FreqSketch.hdrHistogram]] (quantiles):
  *
  *  - a BLOOM FILTER (Bloom 1970) is ≤ `mBits` rows `(bit)` — the set
  *    of positions any of `BloomK` hashes of any member set. Absence
  *    of a bit proves absence of every item hashing there, so a probe
  *    has NO false negatives — the "have we crawled this URL / seen
  *    this doc-hash" screen at 100 TB, where the member set is too
  *    large to join but `mBits` rows broadcast anywhere.
  *  - a KMV sketch (k minimum values — Bar-Yossef et al. 2002, Beyer
  *    et al. 2007) is the ≤ `k` SMALLEST distinct 48-bit hashes of the
  *    members. Beyond distinct-count estimation (k−1 over the k-th
  *    minimum's fraction of the hash space) it supports the SET
  *    OPERATIONS HLL registers cannot: the bottom-k of a union is
  *    computable from the bottom-k's of the parts, and the fraction of
  *    those survivors present in both parts estimates the Jaccard /
  *    intersection size.
  *
  * Spark-first shape: both sketches are small DataFrames produced by
  * one distributed pass (a partial-distinct explode for Bloom; a
  * `TakeOrderedAndProject` for KMV — the k-row top-k that never
  * collects the corpus), merge by `union + distinct` / re-take-k, and
  * probe via a broadcast equi-join. Every number is integer-exact up
  * to ONE final double division (the [[FreqSketch.hllEstimate]]
  * discipline), so a DuckDB oracle replays the sketches bit-for-bit.
  *
  * Hashing: consecutive 8-hex-char (Bloom) / 12-hex-char (KMV) slices
  * of ONE `md5(item)` per row, decoded with integer arithmetic only —
  * the [[FreqSketch.bucket]] stance. Bloom derives its `BloomK`
  * positions from two 32-bit words by double hashing
  * (`h1 + i·h2 mod m`, Kirsch & Mitzenmacher 2006 — two slices buy k
  * independent-enough probes).
  */
object SetSketch {

  /** Bloom hash count — 4 double-hashed probes from two md5 words. */
  val BloomK = 4

  /** 32-bit word `j` of the item's md5 — the [[FreqSketch.bucket]]
    * slice form, shared by sketch build and probe (and the gate
    * oracle's ascii-fold replay).
    */
  private[ext] def word32(item: Column, j: Int): Column =
    conv(substring(md5(item.cast("string")), j * 8 + 1, 8), 16, 10)
      .cast("long")

  /** Bit positions for an item: `(h1 + i·h2) mod m`, i < BloomK. */
  private[ext] def bloomBits(item: Column, mBits: Int): Seq[Column] = {
    val a = word32(item, 0)
    val b = word32(item, 1)
    (0 until BloomK).map(i => pmod(a + lit(i.toLong) * b, lit(mBits.toLong)))
  }

  /** Build the Bloom relation `(bit)` over `itemCol`: ≤ `mBits` rows.
    * One explode + partial-distinct aggregate — each map task emits at
    * most `mBits` rows regardless of corpus size, so the shuffle is
    * constant-bounded exactly like [[FreqSketch.cmsSketch]]'s.
    */
  def bloomSketch(df: DataFrame, itemCol: String,
                  mBits: Int = 8192): DataFrame = {
    require(mBits >= 64, s"mBits must be >= 64, got $mBits")
    val item = col(itemCol)
    df.filter(item.isNotNull)
      .select(explode(array(bloomBits(item, mBits): _*)).as("bit"))
      .distinct()
  }

  /** Merge Bloom relations built with the SAME `mBits`: union +
    * distinct — bit sets OR together, exactly the filter-union
    * semantics (merge-then-probe ≡ sketch-the-union).
    */
  def bloomMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _).distinct()
  }

  /** Membership screen for a probe set against a Bloom relation:
    * explode each distinct probe to its `BloomK` positions, broadcast-
    * join the (≤ `mBits`-row) sketch, count hits; `maybe` iff all
    * `BloomK` bits are set. `maybe = false` is PROOF of absence — the
    * no-false-negative contract that makes the filter a safe crawl/
    * dedup pre-screen (false positives only ever cost a recheck).
    */
  def bloomContains(sketch: DataFrame, probes: DataFrame, itemCol: String,
                    mBits: Int = 8192): DataFrame = {
    val item = col(itemCol)
    probes.filter(item.isNotNull)
      .select(item.as("item")).distinct()
      .select(col("item"),
        explode(array(bloomBits(col("item"), mBits): _*)).as("bit"))
      .join(broadcast(sketch.withColumn("__set", lit(1L))), Seq("bit"), "left")
      .groupBy(col("item"))
      .agg(sum(coalesce(col("__set"), lit(0L))).as("hits"))
      .withColumn("maybe", col("hits") === lit(BloomK.toLong))
  }

  // ------------------------------------------------- KMV distinct sketch

  /** 48-bit item hash — the first 12 hex chars of md5, a uniform
    * BIGINT in [0, 2^48): big enough that gate-scale collisions are
    * negligible, small enough that every engine's BIGINT arithmetic
    * (and `(k−1)·2^48` numerators) stays exact.
    */
  private[ext] def hash48(item: Column): Column =
    conv(substring(md5(item.cast("string")), 1, 12), 16, 10).cast("long")

  /** The KMV relation: the `k` smallest DISTINCT hashes of `itemCol`,
    * one row `(h)` each. Plans as distinct + `TakeOrderedAndProject` —
    * per-partition bottom-k then a k-row merge, never a global sort.
    */
  def kmvSketch(df: DataFrame, itemCol: String, k: Int = 256): DataFrame = {
    require(k >= 16, s"k must be >= 16, got $k")
    val item = col(itemCol)
    df.filter(item.isNotNull)
      .select(hash48(item).as("h")).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Merge KMV relations built with the SAME `k`: the bottom-k of the
    * union of bottom-k's IS the bottom-k of the union of the member
    * sets — the closure property that makes KMV the cross-shard
    * accumulator.
    */
  def kmvMerge(sketches: Seq[DataFrame], k: Int = 256): DataFrame = {
    require(sketches.nonEmpty, "no sketches to merge")
    sketches.reduce(_ unionByName _).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** Distinct-count estimate from a KMV relation: one row
    * `(n_hashes, kth_h, estimate)`. With fewer than `k` hashes the
    * sketch IS the distinct set — the estimate is exact. Otherwise the
    * k-th minimum `h(k)` marks the fraction `h(k)/2^48` of the hash
    * space holding `k` distinct values, so `n ≈ (k−1)·2^48/h(k)` (the
    * unbiased k−1 form). Integer numerator, ONE final double division
    * — the [[FreqSketch.hllEstimate]] exactness discipline.
    */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): DataFrame = {
    val num = (k - 1).toLong << 48
    sketch
      .agg(count(lit(1)).as("n_hashes"),
        coalesce(max(col("h")), lit(0L)).as("kth_h"))
      .withColumn("estimate",
        when(col("n_hashes") < lit(k.toLong), col("n_hashes").cast("double"))
          .otherwise(lit(num.toDouble) / col("kth_h").cast("double")))
  }

  /** Union + intersection estimates for two KMV relations (Beyer et
    * al. 2007): take the union sketch `U` (bottom-k of both), count
    * the survivors present in BOTH sides, and scale: one row
    * `(k_union, n_both, union_est, intersect_est)` with
    * `intersect_est = n_both · union_est / k_union`. Every join is
    * ≤ k rows a side — sketch-sized, broadcast by construction.
    */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame,
                           k: Int = 256): DataFrame =
    kmvSetEstimates(a, b, k)
      .select(col("k_union"), col("n_both"), col("union_est"),
        col("intersect_est"))

  /** Full set-algebra estimates for two KMV relations: one row
    * `(k_union, n_both, n_only_a, n_only_b, union_est, intersect_est,
    * diff_a_est, diff_b_est, jaccard_est)`. The union sketch's
    * survivors are a uniform sample of the union, so the fraction
    * present only in A estimates |A \ B| (Beyer et al. 2007 scaling)
    * and `n_both / k_union` estimates the Jaccard similarity directly
    * — the sketch-resident twin of the exact [[graft.ext.Dedup]]
    * Jaccard operators, for corpora too large to join. Every join is
    * ≤ k rows a side; each estimate is integer counts with one double
    * division chain, replayed identically by the oracle.
    */
  def kmvSetEstimates(a: DataFrame, b: DataFrame,
                      k: Int = 256): DataFrame = {
    val num = (k - 1).toLong << 48
    val u = kmvMerge(Seq(a, b), k)
    val flagged = u
      .join(broadcast(a.withColumn("__ina", lit(1L))), Seq("h"), "left")
      .join(broadcast(b.withColumn("__inb", lit(1L))), Seq("h"), "left")
      .select(col("h"),
        coalesce(col("__ina"), lit(0L)).as("__ina"),
        coalesce(col("__inb"), lit(0L)).as("__inb"))
    flagged
      .agg(count(lit(1)).as("k_union"),
        coalesce(sum(col("__ina") * col("__inb")), lit(0L)).as("n_both"),
        coalesce(sum(col("__ina") * (lit(1L) - col("__inb"))), lit(0L))
          .as("n_only_a"),
        coalesce(sum(col("__inb") * (lit(1L) - col("__ina"))), lit(0L))
          .as("n_only_b"),
        coalesce(max(col("h")), lit(0L)).as("__kth"))
      .withColumn("union_est",
        when(col("k_union") < lit(k.toLong), col("k_union").cast("double"))
          .otherwise(lit(num.toDouble) / col("__kth").cast("double")))
      .withColumn("intersect_est",
        when(col("k_union") === 0L, lit(0.0))
          .otherwise(col("n_both").cast("double") * col("union_est") /
            col("k_union").cast("double")))
      .withColumn("diff_a_est",
        when(col("k_union") === 0L, lit(0.0))
          .otherwise(col("n_only_a").cast("double") * col("union_est") /
            col("k_union").cast("double")))
      .withColumn("diff_b_est",
        when(col("k_union") === 0L, lit(0.0))
          .otherwise(col("n_only_b").cast("double") * col("union_est") /
            col("k_union").cast("double")))
      .withColumn("jaccard_est",
        when(col("k_union") === 0L, lit(0.0))
          .otherwise(col("n_both").cast("double") /
            col("k_union").cast("double")))
      .select(col("k_union"), col("n_both"), col("n_only_a"),
        col("n_only_b"), col("union_est"), col("intersect_est"),
        col("diff_a_est"), col("diff_b_est"), col("jaccard_est"))
  }
}
