package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime join pruning — the standard 100 TB lever for a
  * selective join whose build side is too large to broadcast AS ROWS but
  * whose key membership fits a few hundred kilobytes of bits.
  *
  * The problem it removes: `lineitem JOIN orders-subset` at scale plans as
  * a sort-merge join that shuffles the ENTIRE probe side, even when only a
  * few percent of probe rows have a partner. A Bloom filter of the build
  * keys, broadcast as one row, pre-filters the probe BEFORE its shuffle,
  * so the expensive exchange moves only (matches + false positives).
  * Spark's own runtime row-group filtering applies the same idea inside
  * AQE; this operator makes it an explicit, composable DataFrame op with
  * controllable sizing.
  *
  * Guarantees: a Bloom filter has NO false negatives, so
  * [[prunedJoin]] ≡ the plain inner join, bit for bit — which is exactly
  * what the DuckDB oracle checks. False positives only cost wasted shuffle
  * bytes; with `numBits` = m, `numHashes` = k over n keys the rate is
  * (1 − e^(−kn/m))^k — defaults (2²⁰ bits, 5 hashes) hold ~1% up to
  * n ≈ 10⁵ keys and degrade gracefully, never incorrectly.
  *
  * Plan shape: the bitset is built by ONE aggregation over the build keys
  * (explode to k bit positions, partial-aggregated map-side, OR-folded
  * into 64-bit words, collected into a single map row) and broadcast via
  * the one-row `crossJoin(broadcast(...))` idiom — constant-size,
  * scale-safe, and recognized by PlanGuardSpec's global-aggregate
  * exemption. The probe-side membership test is pure codegen'd column
  * arithmetic (xxhash64 + shift + AND); no UDF, no driver collect.
  */
object BloomJoin {

  /** The k bit positions of `key` in an m-bit filter: slot i =
    * xxhash64(key, i) mod m. Mixing the probe index INTO the hash input
    * (rather than deriving k probes affinely from one hash) keeps the
    * probes independent — the same construction argument as
    * `Dedup.minhashSignature`.
    */
  private def bitPositions(key: Column, numBits: Int, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => pmod(xxhash64(key, i), lit(numBits.toLong)))

  /** xxhash64 hashes the PHYSICAL type: int 7 and long 7 hash differently
    * even though a plain join would coerce and match them. Both sides of
    * [[prunedJoin]] therefore normalize integral keys to long before
    * hashing, so mixed-width integral key pairs keep the no-false-negative
    * guarantee; non-integral key pairs must share one exact type
    * (enforced in [[prunedJoin]]).
    */
  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  private def hashForm(key: Column, dt: org.apache.spark.sql.types.DataType): Column =
    if (isIntegral(dt)) key.cast("long") else key

  /** One-row frame `(__bloom: array<bigint>, __k: int)` — the build side's
    * key membership as a DENSE bitset of numBits/64 words, plus the hash
    * count used to build it. Dense, not a
    * map<word, bits>: `element_at` on a Spark map is a LINEAR scan of the
    * entries array, which turns every probe-row membership test into
    * O(words) work (measured 15× slower on the gate bench); a dense array
    * indexes in O(1) and 2²⁰ bits is still only 128 KB to broadcast.
    * Null build keys are skipped: they can never match an inner join, and
    * hashing them would only add false-positive mass.
    *
    * The sizing travels WITH the bitset (numBits is the array length × 64,
    * numHashes is `__k`), so [[mightContain]] cannot be called with
    * mismatched parameters — a mismatch would silently produce false
    * negatives (probing bit positions mod the wrong m, or more probes than
    * were set), violating the module's core guarantee.
    */
  def buildBits(build: DataFrame, keyCol: String, numBits: Int = 1 << 20,
                numHashes: Int = 5): DataFrame = {
    require(numBits >= 64, s"numBits must be >= 64, got $numBits")
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val words = numBits / 64
    build
      .filter(col(keyCol).isNotNull)
      .select(explode(bitPositions(col(keyCol), numBits, numHashes)).as("__p"))
      .select((col("__p") / lit(64)).cast("int").as("__w"),
        (col("__p") % lit(64)).cast("int").as("__b"))
      .groupBy(col("__w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), __b))").as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits"))))
        .as("__sparse"))
      // densify ONCE on the single aggregate row (words × O(words) map
      // lookups, paid one time at build) so every probe-row lookup is O(1)
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("__sparse"), w.cast("int")), lit(0L)))
        .as("__bloom"))
      .withColumn("__k", lit(numHashes))
  }

  /** Membership test of `key` against a [[buildBits]] row: true iff every
    * probe bit is set. An all-zero filter (empty build side) rejects
    * everything — the correct degenerate answer.
    *
    * Sizing is read FROM the bitset row — numBits = size(bloom)·64, hash
    * count = the `k` column buildBits emitted — never passed by the
    * caller, so it is impossible to probe with parameters that differ from
    * the build (which would be silent false negatives). The derived
    * numBits is per-row column arithmetic on the array length: one `size`
    * call against a broadcast one-row frame, still pure codegen.
    */
  def mightContain(bloom: Column, k: Column, key: Column): Column = {
    val numBits = size(bloom).cast("long") * lit(64L)
    forall(transform(sequence(lit(0), k.cast("int") - lit(1)),
        i => pmod(xxhash64(key, i), numBits)), p =>
      element_at(bloom, (p / lit(64)).cast("int") + lit(1)) // element_at is 1-based on arrays
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % lit(64)).cast("int")))
        =!= lit(0L))
  }

  /** [[prunedJoin]] with the filter sized from the build side itself:
    * one `approx_count_distinct` aggregate (a scalar — the "build the
    * index" step, like IVF's centroid sample) estimates the key count n,
    * then the textbook sizing m = ⌈−n·ln(fpp)/ln²2⌉ bits (rounded up to
    * whole 64-bit words, capped at `maxBits` = 16 MB default) and
    * k = round(m/n·ln 2) hashes. HLL's ±2% error moves the realized
    * false-positive rate, never correctness — there are still no false
    * negatives at any size.
    */
  def prunedJoinAuto(probe: DataFrame, build: DataFrame,
                     probeKey: String, buildKey: String,
                     fpp: Double = 0.01, maxBits: Int = 1 << 27): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = math.max(1L, build.filter(col(buildKey).isNotNull)
      .agg(approx_count_distinct(col(buildKey))).head().getLong(0))
    val ln2 = math.log(2)
    val rawBits = math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    val numBits = math.min(maxBits.toLong,
      math.max(64L, ((rawBits + 63) / 64) * 64)).toInt
    // capped at 16 probes: beyond that the per-row hashing cost outweighs
    // any FP improvement (tiny builds would otherwise ask for ~44 probes)
    val numHashes = math.min(16,
      math.max(1, math.round(numBits.toDouble / n * ln2).toInt))
    prunedJoin(probe, build, probeKey, buildKey, numBits, numHashes)
  }

  /** Inner join with Bloom pre-filtering of the probe side: result is
    * IDENTICAL to `probe.join(build, probeKey === buildKey)`, but the
    * probe rows that reach the join's shuffle are only those whose key
    * passes the membership test (matches + the false-positive fraction).
    * Use when the build side is selective but above the broadcast
    * threshold — if the build side broadcasts anyway, the plain join is
    * already optimal and the filter only adds a scan of its keys.
    *
    * Key-type contract: integral keys of ANY width pair freely (both
    * sides hash as long — see [[hashForm]]); any other combination must
    * share one exact type, because xxhash64 of physically different
    * representations would silently drop matches the coercing plain join
    * keeps. Enforced, not just documented.
    */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    require(
      (isIntegral(pt) && isIntegral(bt)) || pt == bt,
      s"prunedJoin keys must both be integral or share one exact type; " +
        s"got '$probeKey': $pt vs '$buildKey': $bt — cast one side first " +
        "(type-dependent hashing would otherwise drop coerced matches)")
    val bloom = buildBitsTyped(build, buildKey, bt, numBits, numHashes)
    val pruned = probe
      .crossJoin(broadcast(bloom)) // one-row frame: constant-size, scale-safe
      .filter(col(probeKey).isNotNull &&
        mightContain(col("__bloom"), col("__k"), hashForm(col(probeKey), pt)))
      .drop("__bloom", "__k")
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  private def buildBitsTyped(build: DataFrame, keyCol: String,
                             dt: org.apache.spark.sql.types.DataType,
                             numBits: Int, numHashes: Int): DataFrame =
    buildBits(build.select(hashForm(col(keyCol), dt).as(keyCol)),
      keyCol, numBits, numHashes)
}
