package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.ext.Dedup

class StreamingComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-ccstore").toString + "/labels"

  test("labels accumulate across batches and equal the one-shot fixpoint") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val received = ListBuffer.empty[Map[Long, Long]]
    val query = StreamingComponents.start(
      mem.toDF().toDF("id_a", "id_b"), tmpStore(),
      sink = df => received.synchronized {
        received += df.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      })
    try {
      mem.addData((1L, 2L), (10L, 11L))
      query.processAllAvailable()
      assert(received.last == Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L))
      // merge the two clusters through a bridge, plus a fresh pair
      mem.addData((2L, 10L), (20L, 21L))
      query.processAllAvailable()
      assert(received.last == Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
        20L -> 20L, 21L -> 20L))
    } finally query.stop()
  }

  test("byBatch final state equals full CC; retries and restarts are safe") {
    val store = tmpStore()
    val b1 = Seq((1L, 2L), (10L, 11L), (40L, 41L)).toDF("id_a", "id_b")
    val b2 = Seq((2L, 10L), (0L, 40L)).toDF("id_a", "id_b")
    val streamed = StreamingComponents.byBatch(spark, Seq(b1, b2), store)
      .as[(Long, Long)].collect().toMap
    val oneShot = Dedup.connectedComponents(b1.unionByName(b2))
      .as[(Long, Long)].collect().toMap
    assert(streamed == oneShot)
    // retry: replaying the LAST batch reads the same strictly-prior
    // snapshot and lands on the same state
    val maintainer = new StreamingComponents.ComponentMaintainer(spark, store)
    val retried = maintainer.update(b2, 1L)
      .select("id", "comp").as[(Long, Long)].collect().toMap
    assert(retried == oneShot)
    // restart: a NEW maintainer on the same store continues from disk
    val after = new StreamingComponents.ComponentMaintainer(spark, store)
      .update(Seq((41L, 11L)).toDF("id_a", "id_b"), 2L)
      .select("id", "comp").as[(Long, Long)].collect().toMap
    val expect = Dedup.connectedComponents(
        b1.unionByName(b2).unionByName(Seq((41L, 11L)).toDF("id_a", "id_b")))
      .as[(Long, Long)].collect().toMap
    assert(after == expect)
  }
}
