package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy transforms for log analytics — the step between "we keep
  * access logs" and "analysts may query them": pseudonymize the
  * identifying fields while PRESERVING the join/group structure the
  * analytics actually need. Complements the PII redaction operators
  * (q69/q125), which remove identifiers from free text; these rewrite
  * STRUCTURED identifiers deterministically.
  */
object Privacy {

  /** Prefix-preserving IPv4 pseudonymization (the Crypto-PAn property,
    * keyed-hash construction): octet i of the output depends only on
    * the KEY and octets 1..i of the input — so two addresses sharing a
    * real /8, /16 or /24 prefix share the pseudonymized prefix to the
    * same depth, and subnet-level aggregations (the reason access logs
    * keep IPs at all) still work on the pseudonymized column. Same key
    * ⇒ same mapping across runs and tables (joins survive); without
    * the key the mapping is a keyed one-way hash per prefix.
    *
    * Construction: anon_i = first byte of md5(key ‖ "/i:" ‖
    * octets₁..ᵢ) — pure codegen'd column expressions (md5/concat/conv),
    * no UDF, and externally replayable by any engine with md5 (the
    * oracle recomputes it in SQL). This is the pragmatic keyed-hash
    * variant: full Crypto-PAn preserves prefixes at BIT granularity
    * via AES; octet granularity is what log analytics group by, at a
    * fraction of the cost. Inputs that are not dotted-quad IPv4 return
    * NULL (sentinel '-' and IPv6 route elsewhere).
    */
  def anonymizeIpv4(ip: Column, key: String): Column = {
    require(key.nonEmpty, "key must not be empty")
    val parts = split(ip, "\\.")
    def octet(i: Int): Column = {
      // prefix = octets 1..i joined — the only input the hash sees
      val prefix = array_join(slice(parts, 1, i), ".")
      conv(substring(md5(concat(lit(key), lit(s"/$i:"), prefix)), 1, 2),
        16, 10)
    }
    // octet range check WITHOUT a numeric cast: under ANSI a cast of a
    // non-numeric token would throw even on rows the regex branch
    // rejects (no per-row short-circuit in vectorized eval); zero-padded
    // string comparison is total and equivalent for 1-3 digit tokens
    val valid = ip.rlike("^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$") &&
      !exists(parts, p => lpad(p, 3, "0") > lit("255"))
    when(ip.isNull || !valid, lit(null).cast("string"))
      .otherwise(concat_ws(".", octet(1), octet(2), octet(3), octet(4)))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns —
    * the release gate a dataset must pass before its rows can be
    * shared: every quasi-identifier combination must be carried by at
    * least k rows (k-anonymity, Sweeney 2002), and within each such
    * group the sensitive attribute must take at least l distinct
    * values (distinct l-diversity, Machanavajjhala et al. 2007 — a
    * k-anonymous group whose members all share one diagnosis still
    * leaks it).
    *
    * @param df            the dataset to audit.
    * @param qiCols        quasi-identifier columns (the combination an
    *                      attacker can look up externally). NULL is a
    *                      value like any other: rows with NULL QI
    *                      values form their own groups (an all-NULL
    *                      row is still a linkable signature).
    * @param sensitiveCol  the sensitive attribute for l-diversity;
    *                      None → `l_distinct` is NULL and only the
    *                      k test applies.
    * @param k             minimum group size.
    * @param l             minimum distinct sensitive values per group.
    * @return one row per distinct QI combination: the QI columns,
    *         `group_size`, `l_distinct` (NULL without a sensitive
    *         column), and `at_risk` — true when the group fails
    *         either bar.
    *
    * Scale shape: ONE hash aggregate keyed on the QI columns
    * (map-side combined; count_distinct of the sensitive column is the
    * standard two-phase distinct aggregate) — no window, no join, no
    * driver action. The output is QI-cardinality-sized; callers gate a
    * release on `at_risk` rows (count or anti-join back to suppress).
    */
  def kAnonymity(df: org.apache.spark.sql.DataFrame, qiCols: Seq[String],
                 sensitiveCol: Option[String], k: Long,
                 l: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    require(l >= 1, s"l must be >= 1, got $l")
    val aggs = count(lit(1)).as("group_size") +:
      sensitiveCol.map(s =>
        count_distinct(col(s)).as("l_distinct")).toSeq
    val grouped = df.groupBy(qiCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val withL =
      if (sensitiveCol.isDefined) grouped
      else grouped.withColumn("l_distinct", lit(null).cast("long"))
    withL.withColumn("at_risk",
      col("group_size") < k ||
        (if (sensitiveCol.isDefined) col("l_distinct") < l else lit(false)))
  }

  // ---------------------- differential privacy: discrete-Laplace release

  /** Inverse-CDF thresholds for the discrete Laplace (two-sided
    * geometric) distribution with privacy parameter `epsilon` at unit
    * sensitivity: `P(Z = z) ∝ exp(−ε·|z|)`. Entry i is
    * `floor(P(Z ≤ −B + i) · 2^48)` for i in [0, 2B), with the support
    * clamped to [−B, B] where `B = ⌈48·ln2 / ε⌉ + 1` puts the clipped
    * tail below the 2^−48 resolution of the uniform draw.
    *
    * The thresholds are computed ONCE here in driver Scala and inlined
    * as integer literals into both the Spark plan and the SQL oracle —
    * so any cross-engine `exp`/`pow` rounding is irrelevant: both
    * engines compare the same 48-bit integers.
    */
  def dpThresholds(epsilon: Double): (Int, Array[Long]) = {
    require(epsilon > 0.01 && epsilon <= 10.0,
      s"epsilon must be in (0.01, 10], got $epsilon")
    val p = math.exp(-epsilon)
    val b = math.min(4800, math.ceil(48.0 * math.log(2.0) / epsilon).toInt + 1)
    def cdf(z: Int): Double =
      if (z < 0) math.pow(p, -z) / (1.0 + p)
      else 1.0 - math.pow(p, z + 1) / (1.0 + p)
    val scale = math.pow(2.0, 48)
    (b, (-b until b).map(z => math.floor(cdf(z) * scale).toLong).toArray)
  }

  /** Deterministic discrete-Laplace noise for a group key: the 48-bit
    * uniform is `md5(salt ‖ "|" ‖ key)` (so releases are reproducible
    * and retry-stable — rerunning the release pipeline republishes the
    * SAME noisy numbers instead of spending privacy budget again), and
    * the inverse-CDF walk is `#{thresholds ≤ u} − B` over the inlined
    * [[dpThresholds]] literals — a pure codegen'd filter over a
    * constant array, integer comparisons only.
    *
    * CAVEAT (determinism vs privacy): a keyed-hash draw means anyone
    * holding the salt can recompute the noise; treat the salt like the
    * pseudonymization key — secret, rotated per release epoch.
    */
  def discreteLaplaceNoise(key: Column, epsilon: Double,
                           salt: String = "dp-v1"): Column = {
    require(salt.nonEmpty, "salt must not be empty")
    val (b, th) = dpThresholds(epsilon)
    val u = conv(substring(md5(concat(lit(salt), lit("|"),
      key.cast("string"))), 1, 12), 16, 10).cast("long")
    (IntLadder.countBelow(th, u) - lit(b)).cast("long")
  }

  /** ε-differentially-private group-count release: one hash aggregate
    * keyed on `keyCols` (map-side combined — the k-anonymity shape),
    * then per-group discrete-Laplace noise at unit sensitivity. Counts
    * of disjoint groups form ONE query, so a single ε covers the whole
    * histogram when each underlying record contributes to exactly one
    * group; if an entity can appear in many rows of one group, scale ε
    * by that multiplicity bound upstream (record-level Δ=1 is what
    * this releases).
    *
    * Output: the key columns, `n_noisy` (can be negative — clamping is
    * a post-processing choice the caller makes, it cannot hurt the DP
    * guarantee) and `noise_bound` = B, the clamp radius.
    */
  def dpCounts(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
               epsilon: Double,
               salt: String = "dp-v1"): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "dpCounts needs at least one key column")
    val (b, _) = dpThresholds(epsilon)
    // the noise key must be INJECTIVE over key tuples: concat_ws SKIPS
    // NULL elements entirely (("a", NULL) and (NULL, "a") would both
    // fold to "a" and draw perfectly correlated noise, which the DP
    // histogram analysis -- independent draws per group -- assumes
    // away). Each column therefore carries a \u0000 NULL sentinel
    // before the \u0001 join; for a single non-null key column this
    // reduces to the bare column, so existing single-key releases
    // (and the q246 oracle) are byte-identical.
    val keyStr = concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("n_noisy",
        col("__n") + discreteLaplaceNoise(keyStr, epsilon, salt))
      .withColumn("noise_bound", lit(b.toLong))
      .drop("__n")
  }

  /** The injective string form of a key tuple shared by every DP
    * release in this file: \u0000 NULL sentinel per column, \u0001
    * separator — see the [[dpCounts]] rationale.
    */
  private def dpKeyString(keyCols: Seq[String]): Column =
    concat_ws("\u0001",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)

  /** ε-differentially-private SUM (and mean) release with per-entity
    * contribution clipping — the step [[dpCounts]] cannot take: a raw
    * per-group sum has UNBOUNDED sensitivity (one user with a million
    * events moves it by a million), so no finite noise protects it.
    * The standard fix, applied at the relational level: first total
    * each ENTITY's contribution per group, clip that total into
    * `[clipLo, clipHi]`, then sum the clipped totals — now adding or
    * removing one entity moves the sum by at most
    * Δ = max(|clipLo|, |clipHi|), and discrete-Laplace noise drawn on
    * the Δ-spaced grid (a unit-sensitivity draw at ε_sum scaled BY Δ —
    * sound here because the clipped sum release is post-processed onto
    * that grid, see below) makes the release ε_sum-DP at ENTITY level
    * (not just record level). The entity count per group is released
    * alongside under its own ε_count (sensitivity 1), and
    * `mean_noisy = sum_noisy / max(n_noisy, 1)` is pure
    * post-processing — total privacy cost ε_sum + ε_count by
    * sequential composition.
    *
    * Grid soundness: discrete noise at spacing Δ only covers outputs
    * on one Δ-coset, so the clipped sum itself is SNAPPED to the Δ
    * grid first (`Δ·round(sum/Δ)`, a deterministic post-processing of
    * the clipped relation that changes the true value by ≤ Δ/2 and
    * keeps neighboring datasets' snapped sums within one grid step of
    * each other — the ε analysis then holds exactly on the grid).
    * `sum_snapped` is released so callers see the snap error bound
    * explicitly.
    *
    * The value column must already be INTEGRAL (the grid is the
    * release's resolution — pick it upstream: cents, not dollars).
    * NULL values sum to NULL per entity and clip like any total (an
    * entity present only through NULL values still counts toward
    * `n_noisy`); a NULL entity id is one entity like any other
    * (dropping it silently would under-count).
    *
    * Scale shape: TWO hash aggregates — (keys, entity) then (keys) —
    * both map-side combined, no window, no join, no driver action;
    * output is group-cardinality-sized. The (keys, entity) shuffle is
    * the linear term and is exactly the shuffle any per-entity
    * bounding needs at 100 TB.
    */
  def dpSums(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
             entityCol: String, valueCol: String,
             clipLo: Long, clipHi: Long,
             epsilonSum: Double, epsilonCount: Double,
             salt: String = "dp-v1"): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "dpSums needs at least one key column")
    require(clipLo <= clipHi, s"clipLo $clipLo > clipHi $clipHi")
    val sens = math.max(math.abs(clipLo), math.abs(clipHi))
    require(sens >= 1, "clip range must include a nonzero bound " +
      "(clipLo = clipHi = 0 releases only zeros)")
    val vType = df.schema(valueCol).dataType.typeName
    require(Set("byte", "short", "integer", "long").contains(vType),
      s"value column must be integral (the DP grid), got $vType — " +
        "quantize upstream (e.g. cents, bytes)")
    val (bSum, _) = dpThresholds(epsilonSum)
    val (bN, _) = dpThresholds(epsilonCount)
    val keyStr = dpKeyString(keyCols)
    val perEntity = df
      .groupBy((keyCols.map(col) :+ col(entityCol)): _*)
      .agg(sum(col(valueCol)).as("__c"))
      .withColumn("__clipped",
        greatest(lit(clipLo), least(lit(clipHi),
          coalesce(col("__c"), lit(0L)))))
    val s = lit(sens)
    perEntity.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__clipped")).as("__sum"),
        count(lit(1)).as("__n"))
      // snap to the Δ grid: round-half-up via FLOOR division on the
      // shifted numerator (floor((2x + Δ) / 2Δ) · Δ), exact BIGINT
      // arithmetic. Spark's DIV truncates toward zero while DuckDB's
      // // floors — they disagree on negative numerators (reachable
      // when clipLo < 0) — so the floor is spelled out via pmod, which
      // both engines then replay identically: (a - pmod(a, b)) DIV b.
      .withColumn("sum_snapped",
        expr(s"CAST(((2 * __sum + $sens) - " +
          s"pmod(2 * __sum + $sens, ${2 * sens})) DIV ${2 * sens} " +
          s"* $sens AS BIGINT)"))
      .withColumn("sum_noisy",
        col("sum_snapped") + s *
          discreteLaplaceNoise(keyStr, epsilonSum, s"$salt/sum"))
      .withColumn("n_noisy",
        col("__n") + discreteLaplaceNoise(keyStr, epsilonCount,
          s"$salt/n"))
      .withColumn("mean_noisy",
        col("sum_noisy").cast("double") /
          greatest(col("n_noisy"), lit(1L)).cast("double"))
      .withColumn("noise_bound_sum", lit(sens * bSum.toLong))
      .withColumn("noise_bound_n", lit(bN.toLong))
      .withColumn("sensitivity", lit(sens))
      .drop("__sum", "__n")
  }
}
