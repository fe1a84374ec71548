package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling. `df.sample()` draws per-partition
  * from a seeded RNG, so the chosen ROWS change with partitioning and
  * engine — unusable for reproducible dataset versions or cross-engine
  * gates. Hashing a key instead makes membership a pure function of the
  * row: stable under repartitioning, re-runs, engines, and cluster size —
  * the reference's determinism stance ("Determinism: Easy to replicate
  * prior results", slides_Spark_Summit_2019.pdf "Persistence and
  * structure"; per-day re-runs `scripts/oss_s3_server_side_logging_
  * compacter.py:290-302`) applied to sampling.
  *
  * Mechanics: the first 4 hex chars of md5(key) are uniform over 0..65535;
  * a row is kept when they fall below `rate * 65536` (threshold rendered
  * as a 4-char hex string, so the comparison is a codegen'd string
  * compare — no parse, no UDF). Granularity 1/65536 ≈ 0.0015%.
  */
object Sampling {

  private def hexThreshold(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val t = math.min(65536L, math.round(rate * 65536.0))
    if (t >= 65536L) "g" // > every hex digit: keep all
    else f"$t%04x"
  }

  /** THE bucket expression — the module's whole contract (and the gate's
    * oracle SQL) hard-codes this exact form, and the uniform/stratified
    * nesting property depends on both paths sharing it; one definition.
    */
  private def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 4)

  /** Membership predicate: keep ~`rate` of rows, keyed by `key`'s string
    * form. Pure, partitioning-independent, engine-portable. A NULL key
    * has no stable identity to hash, so null-key rows are kept only at
    * rate 1.0 ("keep all" means ALL) and excluded at every partial rate —
    * explicit, rather than the silent null-comparison drop.
    */
  def hashSampled(key: Column, rate: Double): Column = {
    val threshold = lit(hexThreshold(rate))
    when(key.isNull, threshold === lit("g")).otherwise(hashBucket(key) < threshold)
  }

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashSampled(col(keyCol), rate))

  /** Deterministic named corpus split ("train"/"val"/"test"…): each row
    * gets the FIRST split whose cumulative md5-bucket boundary exceeds
    * its hash position — membership a pure function of the key, stable
    * across runs/engines/partitionings, disjoint and exhaustive by
    * construction (fractions must sum to 1; the LAST split absorbs the
    * 1/65536 boundary residue, so nothing ever falls between splits).
    * Null keys have no stable identity → `split` is NULL, explicitly.
    *
    * This is the RAW-ID split: near-duplicate documents land in
    * whichever split their own id hashes to. For leakage-safe
    * evaluation, split by DEDUP COMPONENT instead
    * ([[Dedup.leakageSafeSplitFromLabels]] / `kFoldSplitFromLabels`) —
    * this operator is the cheap first-cut and the one non-text tables
    * use.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "hashSplit needs at least one split")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names in ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val bucket = hashBucket(col(keyCol))
    // last split unconditionally absorbs the residue above its boundary
    val assigned = splits.init.zip(cum.init).reverse.foldLeft(
      lit(splits.last._1): Column) { case (acc, ((name, _), c)) =>
      when(bucket < lit(hexThreshold(c)), lit(name)).otherwise(acc)
    }
    df.withColumn("split",
      when(col(keyCol).isNull, lit(null).cast("string")).otherwise(assigned))
  }

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample
    * dominant languages, keep the long tail whole — the usual
    * rebalancing move in corpus construction). Strata not in `rates` use
    * `defaultRate`. Evaluated as a when-chain over the stratum column:
    * still a single narrow scan, no shuffle, no join.
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val key = col(keyCol)
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    // same null-key rule as hashSampled: kept only where the stratum's
    // effective rate is 1.0
    df.filter(when(key.isNull, threshold === lit("g"))
      .otherwise(hashBucket(key) < threshold))
  }

  /** Deterministic per-group sample of exactly min(k, |group|) rows: rows
    * rank inside each group by the md5 of their key (ties by the key
    * itself) and the first k survive — a fixed-size cap per source/
    * language/domain, as reproducible as the rate-based samples above
    * (membership is a pure function of the rows present). One window per
    * group; the shuffle is on the group column you were about to
    * aggregate on anyway. Null keys rank after every hash (md5(NULL) is
    * NULL → NULLS LAST), so they survive only in underfull groups —
    * deterministic, and consistent with the null-has-no-identity stance
    * of [[hashSampled]].
    */
  def perGroupSample(df: DataFrame, keyCol: String, groupCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // final tiebreaker: the full-row hash. Without it, rows sharing a
    // DUPLICATE key value tie on both sort keys and row_number picks
    // whichever arrives first — which payload row survives would then
    // change across partitionings, breaking the pure-function contract.
    // Rows identical in every column remain interchangeable (same
    // content either way). MapType columns are excluded from the hash:
    // Spark's hash functions reject maps at analysis (map iteration order
    // is undefined, so a map has no canonical hash) — rows differing ONLY
    // in a map column stay order-dependent, which is the best any
    // engine-portable ordering can do.
    groupRanked(df, keyCol, groupCol)
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** The shared per-group md5 ranking of [[perGroupSample]] and
    * [[temperatureSample]]: `__rk` = row_number over
    * (md5(key) ASC NULLS LAST, key, full-row-hash) within the group.
    */
  private def groupRanked(df: DataFrame, keyCol: String,
                          groupCol: String): DataFrame = {
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
    val tiebreak: Seq[Column] =
      if (hashable.isEmpty) Nil else Seq(xxhash64(hashable: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")).asc_nulls_last +: col(keyCol) +:
        tiebreak: _*)
    df.withColumn("__rk", row_number().over(w))
  }

  /** Temperature-flattened corpus mix: cap each group at
    * `t_g = max(1, floor(sqrt(n_g) · scaleNum / scaleDen))` rows — the
    * α = 0.5 temperature resampling of multilingual / multi-source
    * training-data assembly (head domains are downweighted toward the
    * square root of their size, tail domains keep everything via the
    * floor-to-1), with the same deterministic md5 ranking as
    * [[perGroupSample]] so membership is a pure function of the rows.
    * Every group contributes at least one row — the mixing property a
    * fixed global rate cannot give.
    *
    * Replayability: sqrt is correctly rounded in IEEE (identical in any
    * engine), and the scale factor multiplies as exact small doubles, so
    * an external oracle replays the caps bit-for-bit — the reason the
    * exponent is fixed at 1/2 rather than a free α (pow is NOT
    * correctly-rounded across math libraries).
    *
    * Scale shape: caps are one tiny per-group aggregate joined back
    * (AQE broadcasts when group cardinality fits); ranking is one window
    * partitioned by the group column — the [[perGroupSample]] trade. A
    * corpus whose LARGEST group dwarfs a task should pre-thin with
    * [[hashSampled]] or route through the two-phase bucket/carry
    * machinery ([[tokenBudgetPerGroup]]'s form) instead.
    */
  def temperatureSample(df: DataFrame, keyCol: String, groupCol: String,
                        scaleNum: Long = 1L, scaleDen: Long = 1L): DataFrame = {
    require(scaleNum > 0 && scaleDen > 0,
      s"scale must be positive, got $scaleNum/$scaleDen")
    val src = df.filter(col(keyCol).isNotNull && col(groupCol).isNotNull)
    val caps = src.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        greatest(lit(1L),
          floor(sqrt(col("__n").cast("double"))
            * lit(scaleNum.toDouble) / lit(scaleDen.toDouble)).cast("long"))
          .as("__t"))
    groupRanked(src, keyCol, groupCol)
      .join(caps, Seq(groupCol))
      .filter(col("__rk") <= col("__t"))
      .drop("__rk", "__t")
  }

  /** Rebalance a corpus toward target per-stratum PROPORTIONS — the
    * dataset-mixing step of training-data assembly ("30% code, 60% web,
    * 10% books"). Derives the per-stratum keep-rate from the current
    * counts (one tiny aggregate, collected: #strata rows, not data) and
    * applies [[stratified]]. The realized size is the largest achievable
    * without upsampling: bounded by the scarcest stratum relative to its
    * target share (rate = min over strata of n_s / share_s, then
    * rate_s = that · share_s / n_s ≤ 1). Deterministic end to end —
    * the same corpus and targets reproduce the same row set.
    */
  def rebalance(df: DataFrame, keyCol: String, strataCol: String,
                targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "rebalance needs at least one target share")
    val shareSum = targetShares.values.sum
    require(math.abs(shareSum - 1.0) < 1e-9,
      s"target shares must sum to 1, got $shareSum")
    // String.valueOf (not getString): a numeric strata column arrives as
    // boxed numbers here while the shares map is keyed by strings
    val counts = df.filter(col(strataCol).isin(targetShares.keys.toSeq: _*))
      .groupBy(strataCol).agg(count(lit(1)).as("n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    targetShares.keys.foreach { s =>
      require(counts.getOrElse(s, 0L) > 0L, s"stratum '$s' has no rows")
    }
    // the output size the scarcest stratum allows at its target share
    val totalOut = targetShares.map { case (s, share) => counts(s) / share }.min
    val rates = targetShares.map { case (s, share) =>
      s -> math.min(1.0, totalOut * share / counts(s))
    }
    stratified(df.filter(col(strataCol).isin(targetShares.keys.toSeq: _*)),
      keyCol, strataCol, rates, defaultRate = 0.0)
  }
  /** True when `dt` contains a MapType anywhere (top level or nested):
    * Spark's hash functions reject such columns at analysis time.
    */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case StructType(fields) => fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
  }

  /** Shared id contract of the weighted samplers: the id rides the
    * bounded heap as a LONG and re-joins by equality, so it must be an
    * integral type — a fractional or decimal id would truncate in the
    * heap and silently fail the join-back (rows vanish, no error), and a
    * non-numeric one would cast to null and be skipped entirely.
    *
    * The id must also be UNIQUE per row: the heap holds ids, and the
    * selection re-joins by `left_semi` on the id, so a duplicated id
    * makes one heap slot fan out to every row sharing it — the sampler
    * would return MORE than n rows, silently. Uniqueness is the caller's
    * contract (it cannot be checked without an extra aggregate per call);
    * `Dedup.requireIntegralIds` callers share the same convention.
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val ok = df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"$op requires an integral id; '$idCol' is " +
      s"${df.schema(idCol).dataType} — hash non-integral ids to a surrogate " +
      "(e.g. xxhash64) first")
  }

  /** Deterministic weighted sample WITHOUT replacement of (up to) `n`
    * rows, selection probability increasing with `weightCol` — the
    * quality-weighted corpus draw of training-data assembly ("sample 10M
    * documents, preferring high quality-score"). Efraimidis–Spirakis
    * keys: each row draws u ~ Uniform(0,1] from the md5 of its id (pure
    * function of the row — reproducible across engines, partitionings,
    * and re-runs, like every sampler in this module) and ranks by
    * u^(1/w), here as the monotone-equivalent ln(u)/w; the top n
    * survive. Rows with null id, or null/non-positive weight, are
    * excluded (no identity / no mass — the [[hashSampled]] null stance).
    *
    * Scale shape: the 52-bit uniform and the key are per-row column
    * arithmetic in the scan; selection is the bounded-heap `TopKAgg`
    * GLOBAL aggregate — map tasks pre-reduce to n-row heaps, so the one
    * exchange carries n-row buffers, never the table, and there is no
    * global sort. `idCol` must be INTEGRAL and UNIQUE per row (the heap
    * id; the usual dense doc id — see [[requireIntegralId]]) — hash
    * non-integral ids to a surrogate first.
    *
    * Exactness note: h (52-bit, double-exact), u = (h+1)/2^52 (exact),
    * and the division by w (IEEE, correctly rounded) replicate bit-for-
    * bit in any engine; ln() may differ in final ulps across math
    * libraries, which could in principle flip a selection at the
    * boundary — only if two keys agree to ~1e-15 relative, which hash-
    * derived keys on a fixed corpus do not.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int, seed: String = "graft-ws"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    requireIntegralId(df, idCol, "weightedSample")
    val top = df
      .filter(col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(esKey(idCol, weightCol, seed).as("__k"),
        col(idCol).cast("long").as("__id"))
      .agg(graft.functions.TopKAgg.column(n, col("__k"), -col("__id")).as("t"))
      .select(explode(col("t")).as("s"))
      .select((-col("s.id")).as(idCol))
    df.join(top, Seq(idCol), "left_semi")
  }

  /** Per-group [[weightedSample]]: up to `n` rows PER GROUP, weighted —
    * the domain-capped quality draw ("best 1000 documents per domain").
    * Same E–S key; selection is one TopKAgg aggregate KEYED BY the group,
    * so the exchange carries (group, n-row heap) pairs — compare
    * [[perGroupSample]]'s window, which shuffles every row of every
    * group. Same integral-id contract as [[weightedSample]].
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, weightCol: String,
                             groupCol: String, n: Int,
                             seed: String = "graft-ws"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    requireIntegralId(df, idCol, "weightedSamplePerGroup")
    val top = df
      .filter(col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(groupCol), esKey(idCol, weightCol, seed).as("__k"),
        col(idCol).cast("long").as("__id"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopKAgg.column(n, col("__k"), -col("__id")).as("t"))
      .select(explode(col("t")).as("s"))
      .select((-col("s.id")).as(idCol))
    df.join(top, Seq(idCol), "left_semi")
  }

  /** Weighted draw to per-stratum TARGET counts: exactly
    * min(target, |eligible stratum|) rows per stratum, chosen by the same
    * E–S key — the "assemble the mixture: 30k en, 10k de, keep all of the
    * tail" step, where [[rebalance]] hits target PROPORTIONS by rate and
    * this hits target COUNTS by rank. Strata absent from `targets`
    * contribute nothing. One group-keyed heap of size max(targets) serves
    * every stratum (heaps merge map-side; the per-stratum cut is a rank
    * filter on the exploded heap) — no window, no global sort, and the
    * exchange carries (stratum, heap) pairs. Same integral-and-unique-id contract
    * as [[weightedSample]].
    */
  def weightedSampleTargets(df: DataFrame, idCol: String, weightCol: String,
                            strataCol: String, targets: Map[String, Int],
                            seed: String = "graft-ws"): DataFrame = {
    require(targets.nonEmpty, "weightedSampleTargets needs at least one target")
    require(targets.values.forall(_ > 0),
      s"targets must be positive, got $targets")
    requireIntegralId(df, idCol, "weightedSampleTargets")
    val kMax = targets.values.max
    val targetOf = targets.toSeq.sortBy(_._1).foldLeft(lit(0)) {
      case (acc, (s, n)) => when(col(strataCol) === s, lit(n)).otherwise(acc)
    }
    val top = df
      .filter(col(strataCol).isin(targets.keys.toSeq: _*) &&
        col(idCol).isNotNull && col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(strataCol), esKey(idCol, weightCol, seed).as("__k"),
        col(idCol).cast("long").as("__id"))
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKAgg.column(kMax, col("__k"), -col("__id")).as("t"))
      .select(col(strataCol), posexplode(col("t")).as(Seq("i", "s")))
      .filter(col("i") < targetOf)
      .select((-col("s.id")).as(idCol))
    df.join(top, Seq(idCol), "left_semi")
  }

  /** The Efraimidis–Spirakis ranking key ln(u)/w shared by the weighted
    * samplers — ONE definition, the [[hashBucket]] stance.
    */
  private def esKey(idCol: String, weightCol: String, seed: String): Column = {
    val h = conv(substring(md5(
        concat_ws("|", lit(seed), col(idCol).cast("string"))), 1, 13), 16, 10)
      .cast("double")
    log((h + lit(1.0)) / lit(4503599627370496.0)) / col(weightCol).cast("double")
  }

  /** Greedy TOKEN-budget fill per group — the mixture step real training
    * pipelines run ("2B tokens of web, 500M of code"), where the unit of
    * account is tokens, not documents: within each group, documents are
    * taken in a deterministic order until the group's running token sum
    * would exceed `budget`; a document that crosses the budget is dropped
    * and, this being a greedy PREFIX (not a knapsack), no later document
    * is considered for the remaining gap. Order is md5(id) (a reproducible
    * "random" fill) or, with `priorityCol`, highest-priority-first
    * (quality-weighted fill), ties broken by (md5(id), id) — membership
    * is a pure function of the rows, the module's contract. Rows with
    * null id, null GROUP (no mixture bucket), or null/negative token
    * counts, are excluded (no identity / no mass); zero-token rows cost
    * nothing and always fit. `idCol` must
    * be unique per row (duplicate ids tie the total order and make the
    * survivor partition-dependent).
    *
    * Scale shape: NOT one window per group — a single group can be most
    * of a 100 TB corpus, and `Window.partitionBy(group)` would put it in
    * one task. Two exact phases instead: rows land in one of ~256 order-
    * consistent buckets (a prefix of md5(id), or a `width_bucket` range
    * of the priority — equal priorities share a bucket, so bucket order
    * never contradicts row order); per-(group, bucket) token sums make a
    * TINY frame whose prefix sum over buckets (window over ≤257 rows per
    * group) yields each bucket's carry-in; the fine prefix sum then runs
    * partitioned by (group, BUCKET) — parallelism × #buckets — and a row
    * survives when carry + its within-bucket prefix ≤ budget. Exactly
    * the single-window result (integer sums over a total order), without
    * the single-task group.
    */
  def tokenBudgetPerGroup(df: DataFrame, idCol: String, groupCol: String,
                          tokensCol: String, budget: Long,
                          priorityCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    tokenBudgetImpl(df, idCol, groupCol, tokensCol, lit(budget), priorityCol)
  }

  /** [[tokenBudgetPerGroup]] with per-group budgets — the full mixture
    * spec ("25k tokens en, 10k zh, 8k de; nothing else"). Groups absent
    * from `budgets` contribute no rows.
    */
  def tokenBudgetTargets(df: DataFrame, idCol: String, groupCol: String,
                         tokensCol: String, budgets: Map[String, Long],
                         priorityCol: Option[String] = None): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetTargets needs at least one budget")
    require(budgets.values.forall(_ > 0),
      s"budgets must be positive, got $budgets")
    val budgetOf = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (g, b)) => when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    tokenBudgetImpl(
      df.filter(col(groupCol).isin(budgets.keys.toSeq: _*)),
      idCol, groupCol, tokensCol, budgetOf, priorityCol)
  }

  private def tokenBudgetImpl(df: DataFrame, idCol: String, groupCol: String,
                              tokensCol: String, budget: Column,
                              priorityCol: Option[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val eligible = df.filter(col(idCol).isNotNull && col(groupCol).isNotNull &&
      col(tokensCol).isNotNull && col(tokensCol) >= 0)
    // order-consistent coarse bucket: rows in bucket b sort entirely
    // before rows in bucket b' > b under the fine order below
    val bucket: Column = priorityCol match {
      case None =>
        // first 8 bits of the md5 hex the fine order sorts by
        conv(substring(md5(col(idCol).cast("string")), 1, 2), 16, 10)
          .cast("int")
      case Some(p) =>
        // uniform value ranges of the priority, descending; bounds are a
        // 2-scalar aggregate (bounded driver data, the rebalance stance).
        // Equal priorities always share a bucket, so the (priority desc)
        // fine order is consistent; degenerate min==max -> one bucket.
        val row = eligible.agg(
          min(col(p).cast("double")), max(col(p).cast("double"))).collect()(0)
        if (row.isNullAt(0) || row.getDouble(0) == row.getDouble(1)) lit(0)
        else {
          val (lo, hi) = (row.getDouble(0), row.getDouble(1))
          when(col(p).isNull, lit(256)).otherwise(
            lit(255) - least(width_bucket(col(p).cast("double"),
              lit(lo), lit(hi), lit(255)), lit(255)).cast("int"))
        }
    }
    val fineOrder: Seq[Column] =
      priorityCol.map(p => col(p).desc_nulls_last).toSeq ++
        Seq(md5(col(idCol).cast("string")), col(idCol))
    val rows = eligible.withColumn("__b", bucket)
      .withColumn("__t", col(tokensCol).cast("long"))
    val coarse = rows.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__t")).as("__bt"))
    val carryW = Window.partitionBy(col(groupCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = coarse
      .withColumn("__carry", coalesce(sum(col("__bt")).over(carryW), lit(0L)))
      .select(col(groupCol), col("__b"), col("__carry"))
    val fineW = Window.partitionBy(col(groupCol), col("__b"))
      .orderBy(fineOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.join(carry, Seq(groupCol, "__b"))
      .withColumn("__cum", col("__carry") + sum(col("__t")).over(fineW))
      .filter(col("__cum") <= budget)
      .drop("__b", "__t", "__carry", "__cum")
  }
}
