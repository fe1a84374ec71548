package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler

/** Record linkage / entity resolution: fuzzy-match two name-ish columns
  * without the all-pairs cartesian that kills naive linkage at scale.
  *
  * Blocking (the classic linkage move): a candidate pair must share a
  * cheap discrete key before the expensive similarity runs. Here the
  * block key is (`blockPrefix`-char name prefix, length bucket):
  * buckets are ⌊len/(band+1)⌋, and |lenA − lenB| ≤ band implies
  * adjacent buckets, so the probe side explodes into its bucket ±1 — a
  * 3× row fan-out on the SMALL probe side buys an equi-join instead of
  * a cartesian. The exact length-band filter then prunes the diagonal
  * stragglers and [[graft.functions.JaroWinkler]] verifies inside
  * whole-stage codegen.
  *
  * Blocking is a stated RECALL CONTRACT, not an approximation accident:
  * a pair whose first `blockPrefix` bytes differ (typo'd initials) or
  * whose lengths differ by more than `lengthBand` is out of scope by
  * definition. The q177 oracle replays the same contract in SQL, so the
  * gate is exact.
  *
  * Scale shape — the part that bites: shuffle keys are (prefix,
  * bucket), and the CANDIDATE VOLUME IS QUADRATIC IN BLOCK OCCUPANCY
  * (a block of c left rows × c right rows scores c² pairs). A hot
  * prefix ("the …" on every row) silently turns a linear join into an
  * n² job — measured: a 1-char prefix over a 50k synthetic corpus put
  * 10k rows in one block (10⁸ pairs, 70× superlinear at 10× data).
  * Blocking keys are a semantic recall/cost lever the CALLER owns, so
  * the defense is (a) `blockPrefix` (default 2) to tighten the key and
  * (b) a loud occupancy guard: the candidate-pair PRODUCT per joined
  * block (probe-side post-explode count × build-side count) is capped
  * at `maxBlockRows`² — per-side caps alone would pass a block with
  * both sides just under the cap, i.e. cap² pairs (one cheap
  * (prefix, bucket)-keyed count join — small next to the quadratic
  * join it prevents; 0 disables). Exceeding it raises with the hot
  * block named, instead of burning a cluster-day.
  */
object Linkage {

  /** Candidate pairs (leftId, rightId, jw) with Jaro–Winkler ≥ threshold
    * under the (`blockPrefix` chars, ±lengthBand) blocking contract.
    * Null or empty names never match (JW of an empty side is 0).
    *
    * COST NOTE — the one eager guard in the library: with
    * `maxBlockRows > 0` (the default), CONSTRUCTING this frame runs
    * one extra bounded Spark job up front (two linear input scans +
    * a tiny (prefix, bucket)-keyed count join) to measure the hottest
    * block's candidate-pair product BEFORE the quadratic join is
    * planned. An in-plan `raise_error` cannot do this — it would fire
    * only after the hot block has already streamed its cap² pairs,
    * the exact cluster-day the guard refuses. Price it accordingly in
    * interactive loops (one extra job per call), or pass
    * `maxBlockRows = 0` to skip the probe — and its job — knowingly.
    */
  def fuzzyJoin(left: DataFrame, leftId: String, leftText: String,
                right: DataFrame, rightId: String, rightText: String,
                threshold: Double = 0.85, lengthBand: Int = 2,
                blockPrefix: Int = 2,
                maxBlockRows: Long = 1000000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(lengthBand >= 0, s"lengthBand must be >= 0, got $lengthBand")
    require(blockPrefix >= 1, s"blockPrefix must be >= 1, got $blockPrefix")
    val w = lengthBand + 1
    val l = left.select(col(leftId).as("id_l"), col(leftText).as("name_l"))
      .filter(col("name_l").isNotNull && length(col("name_l")) > 0)
      .withColumn("blk_c", substring(col("name_l"), 1, blockPrefix))
      .withColumn("len_l", length(col("name_l")))
    // probe explodes into bucket −1/0/+1: |lenL − lenR| ≤ band ⇒ the
    // right bucket is one of the three (w = band+1 makes that exact)
    val lExp = l.withColumn("blk_b",
        explode(array((col("len_l") / w).cast("int") - 1,
          (col("len_l") / w).cast("int"),
          (col("len_l") / w).cast("int") + 1)))
    // Verify work is QUADRATIC in block occupancy while the input is
    // linear, so scan-split parallelism systematically under-provisions
    // this join: when the probe side broadcasts (the common shape), the
    // streamed side's task count is its INPUT split count — a 50 MB
    // parquet file is one split, and the whole candidate volume scores
    // on one core. Round-robin repartition spreads the streamed rows
    // (and with them each hot block's quadratic pair work) across the
    // full parallelism; the shuffle is linear in the corpus, noise next
    // to the verify it provisions. On a real cluster with thousands of
    // input splits the condition no-ops.
    val shufflePartitions = right.sparkSession.sessionState.conf.numShufflePartitions
    val rBase = right.select(col(rightId).as("id_r"), col(rightText).as("name_r"))
      .filter(col("name_r").isNotNull && length(col("name_r")) > 0)
    val rSpread =
      if (rBase.rdd.getNumPartitions < shufflePartitions)
        rBase.repartition(shufflePartitions)
      else rBase
    val r = rSpread
      .withColumn("blk_c", substring(col("name_r"), 1, blockPrefix))
      .withColumn("len_r", length(col("name_r")))
      .withColumn("blk_b", (col("len_r") / w).cast("int"))
    if (maxBlockRows > 0) {
      // the guarded quantity is the PRODUCT per joined block — two
      // per-side caps pass a block with both sides just under the cap
      // (cap² pairs, the exact blowup the guard exists to prevent). The
      // probe side is counted post-explode (its ×3 bucket fan-out is
      // what actually meets the join), the bound is maxBlockRows² pairs
      // per block, and the count join is a tiny (prefix, bucket)-keyed
      // aggregate — cheap next to the quadratic join it prevents.
      // NOTE this is an EAGER driver-side action: constructing the frame
      // runs one extra bounded Spark job (two linear scans + the keyed
      // count join) BEFORE the quadratic join is even planned. Deliberate:
      // a raise_error fused into the join's output would fire only after
      // the hot block starts streaming its cap² candidate pairs — the
      // exact cluster-day this guard exists to refuse. maxBlockRows=0
      // skips the probe (and the extra job) knowingly.
      val lc = lExp.groupBy(col("blk_c"), col("blk_b"))
        .agg(count(lit(1)).as("__cl"))
      val rc = r.groupBy(col("blk_c"), col("blk_b"))
        .agg(count(lit(1)).as("__cr"))
      val hot = lc.join(rc, Seq("blk_c", "blk_b"))
        .select(col("blk_c"), col("blk_b"), col("__cl"), col("__cr"),
          (col("__cl") * col("__cr")).as("__pairs"))
        .orderBy(desc("__pairs")).limit(1).collect()
      val maxPairs = maxBlockRows * maxBlockRows
      if (hot.nonEmpty && hot(0).getLong(4) > maxPairs)
        throw new IllegalArgumentException(
          s"fuzzyJoin block ('${hot(0).get(0)}', ${hot(0).get(1)}) scores " +
            s"${hot(0).getLong(2)} x ${hot(0).getLong(3)} = " +
            s"${hot(0).getLong(4)} candidate pairs (> maxBlockRows^2 = " +
            s"$maxPairs): candidate pairs are quadratic in block " +
            "occupancy — raise blockPrefix (tighter key), pre-split the " +
            "hot prefix, or raise maxBlockRows knowingly")
    }
    val jw = JaroWinkler.jaroWinkler(col("name_l"), col("name_r"))
    // lossless in-block pre-filter: jw ≥ t implies jaro ≥ (t−0.4)/0.6
    // (the ℓ ≤ 4, p = 0.1 Winkler boost inverted), and jaroUpperBound
    // ≥ jaro by construction — so dropping pairs whose BOUND is below
    // minJaro drops only pairs the threshold filter would drop anyway.
    // The bound is O(len) vs the match pass's O(len·window), so a hot
    // block's quadratic candidate volume verifies ~4× cheaper; the 1e-9
    // slack absorbs double rounding on the ratio arithmetic.
    val minJaro = if (threshold > 0.4) (threshold - 0.4) / 0.6 - 1e-9 else 0.0
    val bound = JaroWinkler.jaroUpperBound(col("name_l"), col("name_r"))
    lExp.join(r, Seq("blk_c", "blk_b"))
      .filter(abs(col("len_l") - col("len_r")) <= lengthBand &&
        bound >= minJaro)
      .select(col("id_l"), col("id_r"), jw.as("jw"))
      .filter(col("jw") >= threshold)
  }

  /** Convenience: the raw expression, for scoring without a join. */
  def jaroWinkler(a: Column, b: Column): Column = JaroWinkler.jaroWinkler(a, b)

  /** All pairs within edit distance 1, via SymSpell deletion-
    * neighborhood blocking — LOSSLESS, unlike [[fuzzyJoin]]'s stated
    * recall contract: ed(a, b) ≤ 1 implies the two share a member of
    * their deletion neighborhoods D(x) = {x} ∪ {x minus one char}
    * (substitution: delete the differing position from both; insertion/
    * deletion: the shorter string is itself in the longer one's
    * neighborhood), so an equi-join on the variants finds every true
    * pair and `levenshtein ≤ 1` verifies exactly. The published
    * SymSpell trade: ~(len+1)× row fan-out buys a keyed join instead of
    * a cartesian — the fan-out is the BLOCKING INDEX, built in the
    * scan, never a shuffle of pairs.
    *
    * Output: (id_a, id_b, dist) with id_a < id_b, dist ∈ {0, 1}.
    */
  def editDistanceOneJoin(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        length(col(textCol)) > 0)
      .select(col(idCol).as("__id"), col(textCol).as("__s"))
    // The variant join bands DISTINCT STRINGS, never rows (the
    // multimodal-dedup lesson): a group of g rows sharing one string
    // would otherwise push g copies of its whole variant set through
    // the join and score g² candidate pairs in EVERY bucket before the
    // final distinct collapsed them — quadratic in duplicate-group
    // size, which 10×-replicated corpora hit head-on. Distinct strings
    // band once; identical-string id groups re-enter as two string-
    // keyed equi-joins whose cross products are EXACTLY the answer
    // (distance-0 pairs within a group, distance-1 pairs between
    // neighboring groups) — pure output, no wasted candidates.
    val strings = base.select(col("__s")).distinct()
    // D(s) = {s} ∪ {s with char i deleted}: substr(1..i−1) ‖ substr(i+1..)
    val s = col("__s")
    val deletions = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val withVar = strings.select(col("__s"),
      explode(array_distinct(concat(array(s), deletions))).as("__v"))
    val a = withVar.select(col("__v"), col("__s").as("__sa"))
    val b = withVar.select(col("__v"), col("__s").as("__sb"))
    // bucket-mates can be lev 2 ("ab"/"ba" share deletes "a" and "b")
    // — the levenshtein verify keeps the join exact
    val strPairs = a.join(b, Seq("__v"))
      .filter(col("__sa") < col("__sb"))
      .select(col("__sa"), col("__sb")).distinct()
      .filter(levenshtein(col("__sa"), col("__sb")) <= 1)
    val idsA = base.select(col("__s").as("__sa"), col("__id").as("__ia"))
    val idsB = base.select(col("__s").as("__sb"), col("__id").as("__ib"))
    val across = strPairs
      .join(idsA, Seq("__sa")).join(idsB, Seq("__sb"))
      .filter(col("__ia") =!= col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"),
        lit(1).as("dist"))
    val within = base.select(col("__s"), col("__id").as("id_a"))
      .join(base.select(col("__s"), col("__id").as("id_b")), Seq("__s"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).as("dist"))
    within.union(across).distinct()
  }
}
