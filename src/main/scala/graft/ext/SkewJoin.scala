package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi-join via key salting — the manual fallback for the case
  * AQE's skew-join handling can't fix: a hash-partitioned join where a few
  * hot keys put one partition orders of magnitude above the rest (at
  * 100 TB, one hot requester/user can be 10% of a table).
  *
  * Technique: explode the PROBE side's hot keys into `saltBuckets` salted
  * variants (key, salt) and replicate the BUILD side once per salt, so a
  * hot key's rows spread across `saltBuckets` reducers. Cold keys pass
  * through with salt 0 and no replication — the cost is paid only where
  * the skew is.
  *
  * Prefer AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) when
  * it applies; use this when the skew is in an aggregation-feeding join
  * AQE won't split, or when the hot-key set is known/stable and the
  * replication factor should be explicit and deterministic.
  */
object SkewJoin {

  /** Identify hot keys by approximate frequency: keys whose row count
    * exceeds `hotThreshold`. One cheap pre-pass (count-by-key on the join
    * column only); at scale run it on a sample instead.
    */
  def hotKeys(df: DataFrame, keyCol: String, hotThreshold: Long): DataFrame =
    df.groupBy(keyCol).agg(count(lit(1)).as("n"))
      .filter(col("n") > hotThreshold)
      .select(col(keyCol))

  /** Salted inner equi-join of `big` (skewed, probe) with `small` (build).
    *
    * @param hot  frame of hot key values (one column named `keyCol`);
    *             broadcast to both sides.
    * @return the joined frame with `big`'s and `small`'s columns (join key
    *         once, salt columns dropped).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
                 hot: DataFrame, saltBuckets: Int = 8): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    val hotSet = broadcast(hot.select(col(keyCol)).distinct()
      .withColumn("_is_hot", lit(true)))

    // probe side: hot rows get a salt in [0, saltBuckets) from the
    // per-partition row index — sequential, so even byte-identical
    // duplicate rows (the classic degenerate skew: one key, one payload,
    // millions of copies) round-robin across buckets. Stable within a run;
    // rand() stays banned (a retried task must re-derive the same salts it
    // already shuffled).
    val bigSalted = big
      .join(hotSet, Seq(keyCol), "left")
      .withColumn("_salt",
        when(col("_is_hot").isNotNull,
          pmod(monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
          .otherwise(lit(0)))
      .drop("_is_hot")

    // build side: hot keys replicated once per salt, cold keys salt 0
    // (explode of a conditional array — generators can't nest inside when).
    val smallSalted = small
      .join(hotSet, Seq(keyCol), "left")
      .withColumn("_salts",
        when(col("_is_hot").isNotNull,
          sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salts")))
      .drop("_is_hot", "_salts")

    bigSalted.join(smallSalted, Seq(keyCol, "_salt")).drop("_salt")
  }
}
