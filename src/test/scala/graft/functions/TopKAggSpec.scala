package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TopKAggSpec extends SparkTestBase {
  import spark.implicits._

  test("topK == window row_number formulation, best-first order") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(50).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id").repartition(8)

    val viaAgg = df.groupBy("key")
      .agg(TopKAgg.column(3, col("score"), col("id")).as("top"))
      .select(col("key"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("key"), (col("i") + 1).as("rn"),
        col("s.score").as("score"), col("s.id").as("id"))
      .as[(Long, Int, Double, Long)].collect().toSet

    val w = Window.partitionBy("key").orderBy(desc("score"), desc("id"))
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("key"), col("rn"), col("score"), col("id"))
      .as[(Long, Int, Double, Long)].collect().toSet

    assert(viaAgg == viaWindow)
  }

  test("ties on score break by id, deterministically") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 11L), (1L, 5.0, 9L), (1L, 4.0, 99L))
      .toDF("key", "score", "id")
    val top = df.groupBy("key")
      .agg(TopKAgg.column(2, col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("s")).select("s.id")
      .as[Long].collect().toSeq
    assert(top == Seq(11L, 10L), "equal scores rank by id descending")
  }

  test("null score or id rows are skipped, not crashed on") {
    val df = Seq(
      (1L, Some(5.0), Some(10L)),
      (1L, None, Some(11L)),       // null score
      (1L, Some(6.0), None),       // null id
      (1L, Some(4.0), Some(12L))
    ).toDF("key", "score", "id")
    val top = df.groupBy("key")
      .agg(TopKAgg.column(3, col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("s")).select("s.id")
      .as[Long].collect().toSeq
    assert(top == Seq(10L, 12L), "only fully non-null rows rank")
  }

  test("partial aggregation: the exchange carries k-row buffers, not rows") {
    val df = spark.range(1000)
      .select((col("id") % 5).as("key"), col("id").cast("double").as("score"),
        col("id").as("id2"))
    val plan = df.groupBy("key")
      .agg(TopKAgg.column(3, col("score"), col("id2")).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate twice (partial + final) around the exchange is
    // the map-side-combine shape; a window top-n plan has none of this
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs == 2, s"expected partial+final ObjectHashAggregate, got:\n$plan")
    assert(plan.contains("partial_topk") || plan.contains("TopK"),
      s"aggregate must be the TopK udaf:\n$plan")
  }
}
