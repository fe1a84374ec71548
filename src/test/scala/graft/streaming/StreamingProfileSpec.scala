package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("foreachBatch profile carries state ACROSS micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val received = ListBuffer.empty[(Long, Map[String, (Long, Long, String, String)])]
    val query = StreamingProfile.start(
      mem.toDF().toDF("id", "name"), Seq("id", "name"),
      sink = df => received.synchronized {
        val rows = df.collect().map { r: Row =>
          r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
        }.toMap
        received += ((df.select("batch_id").head().getLong(0), rows))
      })
    try {
      mem.addData((5L, "edgar"), (3L, "ada"))
      query.processAllAvailable()
      mem.addData((9L, null), (1L, "zoe"))
      query.processAllAvailable()

      val byBatch = received.toList.toMap
      assert(byBatch.size == 2)
      // batch 0: only its own rows
      assert(byBatch(0L)("id") == ((2L, 0L, "3", "5")))
      assert(byBatch(0L)("name") == ((2L, 0L, "ada", "edgar")))
      // batch 1 is CUMULATIVE: counts include batch 0, min/max span both,
      // the null name is counted — the cross-batch state in action
      assert(byBatch(1L)("id") == ((4L, 0L, "1", "9")))
      assert(byBatch(1L)("name") == ((4L, 1L, "ada", "zoe")))
    } finally query.stop()
  }

  test("batch replay equals a fresh profile of each cumulative prefix") {
    val docs = Seq(
      (1L, Some("aa")), (2L, Some("bb")), (3L, None),
      (4L, Some("cc")), (5L, Some("dd")), (6L, None)
    ).toDF("id", "t")
    val batches = (0 to 1).map(b => docs.filter(col("id") % 2 === b))
    val out = StreamingProfile.cumulativeByBatch(batches, Seq("id", "t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    // batch 0 = even ids only; batch 1 = everything
    assert(out((0L, "id")) == ((3L, 0L, "2", "6")))
    assert(out((0L, "t")) == ((3L, 1L, "bb", "cc")))
    assert(out((1L, "id")) == ((6L, 0L, "1", "6")))
    assert(out((1L, "t")) == ((6L, 2L, "aa", "dd")))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
