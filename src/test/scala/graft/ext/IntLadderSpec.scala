package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IntLadderSpec extends SparkTestBase {
  import spark.implicits._

  test("countBelow equals the linear count on random ladders and probes") {
    val rnd = new scala.util.Random(3)
    for (n <- Seq(1, 2, 13, 137, 512)) {
      val arr = Array.fill(n)(rnd.nextLong(1L << 48)).sorted
      val probes = (Array.fill(200)(rnd.nextLong(1L << 48)) ++
        arr.take(20) ++ // exact boundary hits
        Array(0L, (1L << 48) - 1)).toSeq
      val got = probes.toDF("h")
        .select(col("h"),
          IntLadder.countBelow(arr, col("h")).as("le"),
          IntLadder.countBelow(arr, col("h"), strict = true).as("lt"))
        .as[(Long, Int, Int)].collect()
      got.foreach { case (h, le, lt) =>
        assert(le == arr.count(_ <= h), s"n=$n h=$h le")
        assert(lt == arr.count(_ < h), s"n=$n h=$h lt")
      }
    }
  }

  test("countBelow refuses unsorted or empty ladders") {
    intercept[IllegalArgumentException](
      IntLadder.countBelow(Array.empty[Long], lit(0L)))
    intercept[IllegalArgumentException](
      IntLadder.countBelow(Array(5L, 3L), lit(0L)))
  }
}
