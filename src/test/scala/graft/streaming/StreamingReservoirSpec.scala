package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

class StreamingReservoirSpec extends SparkTestBase {
  import spark.implicits._

  private def refBottomK(ids: Seq[Long], k: Int): Seq[(Long, String)] = {
    val md = MessageDigest.getInstance("MD5")
    ids.distinct
      .map(i => (i, md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
      .sortBy { case (i, p) => (p, i) }
      .take(k)
  }

  private def run(batches: Seq[DataFrame], k: Int): Seq[(Long, String)] = {
    val store = java.nio.file.Files
      .createTempDirectory("graft-res-spec").toString + "/res"
    StreamingReservoir.byBatch(spark, batches, store, "id", "BIGINT", k)
      .as[(Long, String)].collect()
      .sortBy { case (i, p) => (p, i) }.toSeq
  }

  private val ids = (0L until 1000L).toSeq

  test("streamed reservoir equals the one-shot bottom-k, under ANY batch split") {
    val expected = refBottomK(ids, 50)
    val byResidue = (0 to 2).map(r => ids.filter(_ % 3 == r).toDF("id"))
    assert(run(byResidue, 50) == expected)
    val byRange = Seq(ids.take(100), ids.slice(100, 700), ids.drop(700))
      .map(_.toDF("id"))
    assert(run(byRange, 50) == expected)
    assert(run(Seq(ids.toDF("id")), 50) == expected) // one-shot
  }

  test("state is bounded at k rows per batch, never the stream") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-res-spec2").toString + "/res"
    val acc = new StreamingReservoir.ReservoirSampler(spark, store,
      "id", "BIGINT", k = 10)
    (0 to 2).foreach(r =>
      acc.update(ids.filter(_ % 3 == r).toDF("id"), r.toLong))
    // each batch contributes ≤ k rows, so total state ≤ k·batches no
    // matter how compaction folds the deltas — never the 1000-id stream
    val partRows = acc.storeParts(3L).map(_.count())
    assert(partRows.sum <= 10L * 3, s"unbounded state: $partRows")
    assert(acc.sample(3L).as[(Long, String)].collect().toSeq
      .sortBy(r => (r._2, r._1)) == refBottomK(ids, 10))
  }

  test("a replayed batch overwrites its delta — retries cannot skew the sample") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-res-spec3").toString + "/res"
    val acc = new StreamingReservoir.ReservoirSampler(spark, store,
      "id", "BIGINT", k = 20)
    acc.update(ids.take(500).toDF("id"), 0L)
    acc.update(ids.drop(500).toDF("id"), 1L)
    acc.update(ids.drop(500).toDF("id"), 1L) // retry of batch 1
    assert(acc.sample(2L).as[(Long, String)].collect().toSeq
      .sortBy(r => (r._2, r._1)) == refBottomK(ids, 20))
  }
}
