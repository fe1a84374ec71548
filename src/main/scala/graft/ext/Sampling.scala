package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling. `df.sample()` draws per-partition
  * from a seeded RNG, so the chosen ROWS change with partitioning and
  * engine — unusable for reproducible dataset versions or cross-engine
  * gates. Hashing a key instead makes membership a pure function of the
  * row: stable under repartitioning, re-runs, engines, and cluster size —
  * the reference's determinism stance ("easy to replicate prior results")
  * applied to sampling.
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
    * form. Pure, partitioning-independent, engine-portable.
    */
  def hashSampled(key: Column, rate: Double): Column =
    hashBucket(key) < lit(hexThreshold(rate))

  /** Uniform deterministic sample. */
  def sample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashSampled(col(keyCol), rate))

  /** Stratified deterministic sample: per-stratum rates (e.g. downsample
    * dominant languages, keep the long tail whole — the usual
    * rebalancing move in corpus construction). Strata not in `rates` use
    * `defaultRate`. Evaluated as a when-chain over the stratum column:
    * still a single narrow scan, no shuffle, no join.
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val hash = hashBucket(col(keyCol))
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(hash < threshold)
  }
}
