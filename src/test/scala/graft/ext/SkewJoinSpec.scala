package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin: result equals plain join, hot keys spread over salts") {
    // key 1 is hot (1000 rows), keys 2..20 cold
    val big = ((1 to 1000).map(i => (1L, s"hot$i")) ++
      (2 to 20).map(k => (k.toLong, s"cold$k"))).toDF("k", "payload")
    val small = (1 to 20).map(k => (k.toLong, s"dim$k")).toDF("k", "attr")

    val hot = SkewJoin.hotKeys(big, "k", hotThreshold = 100)
    assert(hot.as[Long].collect().toSeq == Seq(1L))

    val salted = SkewJoin.saltedJoin(big, small, "k", hot, saltBuckets = 8)
    val plain = big.join(small, "k")
    assert(salted.count() == plain.count())
    val sCounts = salted.groupBy("k").count().as[(Long, Long)].collect().toMap
    val pCounts = plain.groupBy("k").count().as[(Long, Long)].collect().toMap
    assert(sCounts == pCounts)

    // the hot key's rows really carry >1 distinct salt before the join —
    // byte-identical duplicates included (index-based, not content-based)
    val hotSet = broadcast(hot.withColumn("_is_hot", lit(true)))
    val salts = big.join(hotSet, Seq("k"), "left")
      .withColumn("_salt",
        when(col("_is_hot").isNotNull,
          pmod(monotonically_increasing_id(), lit(8)).cast("int"))
          .otherwise(lit(0)))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(salts > 4, s"hot key used only $salts salt buckets")
  }

  test("saltedJoin is deterministic across runs (no rand-based salts)") {
    val big = (1 to 500).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "attr")
    val hot = Seq(1L).toDF("k")
    val a = SkewJoin.saltedJoin(big, small, "k", hot).orderBy("v").collect()
    val b = SkewJoin.saltedJoin(big, small, "k", hot).orderBy("v").collect()
    assert(a.sameElements(b))
  }
}
