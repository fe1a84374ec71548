package graft.ext

import graft.SparkTestBase

class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed fact-fact join runs with NO exchange on either side") {
    val facts = (1L to 2000L).map(i => (i % 100, i, i * 2.0)).toDF("key", "a", "b")
    val dims = (0L until 100L).map(i => (i, s"k$i")).toDF("key", "name")
    Bucketing.writeBucketed(facts, "bkt_facts", "key", numBuckets = 8)
    Bucketing.writeBucketed(dims, "bkt_dims", "key", numBuckets = 8)
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_facts", "bkt_dims", "key")
      // force a sort-merge plan (broadcast would trivially avoid exchanges)
      val smj = joined.hint("merge")
      val plan = spark.table("bkt_facts").join(
        spark.table("bkt_dims").hint("merge"), "key")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, plan was:\n$plan")
      assert(smj.count() == 2000)
      // and the same join over plain (non-bucketed) frames DOES exchange
      val plainPlan = facts.join(dims.hint("merge"), "key")
        .queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }
}
