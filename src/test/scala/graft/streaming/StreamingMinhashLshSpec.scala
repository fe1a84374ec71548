package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

class StreamingMinhashLshSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-slsh-$tag").toString + "/lsh"

  // distinctive per-doc vocabulary: unrelated docs share no words, so
  // the only estimate mass is between a doc and its near-copy
  private def baseText(i: Int): String =
    (0 until 24).map(j => s"w${i}_$j").mkString(" ")
  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
  private def near(i: Int, id: Long): (Long, String) =
    (id, baseText(i) + " zzz end")

  private val b0 = docs((0L to 5L).map(i => (i, baseText(i.toInt))): _*)
  private val b1 = docs(((6L to 11L).map(i => (i, baseText(i.toInt))) ++
    Seq(near(0, 100L), near(1, 101L))): _*)
  private val b2 = docs(near(2, 102L), near(6, 106L))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select("batch_id", "doc_id", "match_id")
      .as[(Long, Long, Long)].collect().toSet

  private val expected = Set(
    (1L, 100L, 0L), (1L, 101L, 1L), (2L, 102L, 2L), (2L, 106L, 6L))

  test("flags near-copies of strictly-prior docs; batch 0 is empty") {
    val out = StreamingMinhashLsh.byBatch(spark, Seq(b0, b1, b2),
      tmp("basic"), "doc_id", "text", estThreshold = 0.5)
    assert(pairs(out) == expected)
    assert(out.filter($"batch_id" === 0L).count() == 0)
    val ests = out.select("est_jaccard").as[Double].collect()
    assert(ests.forall(e => e >= 0.5 && e <= 1.0))
  }

  test("native-hash incremental updates flag the same pairs as the portable replay") {
    val d = new StreamingMinhashLsh.MinhashLshDeduper(spark, tmp("native"),
      "doc_id", "text", estThreshold = 0.5)
    val got = Seq(b0, b1, b2).zipWithIndex.map { case (b, i) =>
      d.update(b, i.toLong).localCheckpoint()
    }.reduce(_ unionByName _)
    assert(pairs(got) == expected,
      "hash family changes candidate sets only through collisions; on a " +
        "distinct-vocabulary corpus both modes must flag exactly the true pairs")
  }

  test("compaction folds preserve matches and bound the store") {
    val store = tmp("fold")
    val d = new StreamingMinhashLsh.MinhashLshDeduper(spark, store,
      "doc_id", "text", estThreshold = 0.5, compactEvery = 2)
    // batches 0..5 carry one original each; batch 6 re-crawls doc 0
    val outs = ((0 to 5).map(i => docs((i.toLong, baseText(i)))) :+
      docs(near(0, 600L))).zipWithIndex.map { case (b, i) =>
      d.update(b, i.toLong).localCheckpoint()
    }
    assert(pairs(outs.reduce(_ unionByName _)) == Set((6L, 600L, 0L)),
      "the fold must carry batch-0 postings into the compacted base")
    // store shape: a compacted base plus at most compactEvery delta dirs
    val fs = new Path(store).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("bands", "sigs").foreach { sub =>
      val names = fs.listStatus(new Path(s"$store/$sub"))
        .map(_.getPath.getName).toSeq
      assert(names.exists(_.startsWith("compacted_upto_")), s"$sub never folded")
      assert(names.count(_.startsWith("batch=")) <= 2, s"$sub deltas unbounded: $names")
    }
  }

  test("keepBatches evicts old postings: matches only within the window") {
    val store = tmp("retain")
    val d = new StreamingMinhashLsh.MinhashLshDeduper(spark, store,
      "doc_id", "text", estThreshold = 0.5, compactEvery = 2, keepBatches = 2)
    // batch 6 re-crawls doc 0 (batch 0, far past the horizon) AND
    // doc 5 (batch 5, inside the window)
    val outs = ((0 to 5).map(i => docs((i.toLong, baseText(i)))) :+
      docs(near(0, 600L), near(5, 605L))).zipWithIndex.map { case (b, i) =>
      d.update(b, i.toLong).localCheckpoint()
    }
    assert(pairs(outs.reduce(_ unionByName _)) == Set((6L, 605L, 5L)),
      "evicted batch-0 postings must not match; in-window batch-5 must")
    assert(d.evictedBefore() == 4L,
      "horizon = latestCompactedUpTo (6) - keepBatches (2)")
  }

  test("a restarted deduper continues from the on-disk store") {
    val store = tmp("restart")
    val a = new StreamingMinhashLsh.MinhashLshDeduper(spark, store,
      "doc_id", "text", estThreshold = 0.5)
    a.update(b0, 0L).localCheckpoint()
    a.update(b1, 1L).localCheckpoint()
    val b = new StreamingMinhashLsh.MinhashLshDeduper(spark, store,
      "doc_id", "text", estThreshold = 0.5)
    val out = b.update(b2, 2L)
    assert(pairs(out) == Set((2L, 102L, 2L), (2L, 106L, 6L)),
      "matches must span the instance boundary (state is the store, not the driver)")
  }

  test("batch-id regression fails fast; a same-id retry is idempotent") {
    val store = tmp("regress")
    val d = new StreamingMinhashLsh.MinhashLshDeduper(spark, store,
      "doc_id", "text", estThreshold = 0.5)
    d.update(b0, 0L).localCheckpoint()
    d.update(b1, 1L).localCheckpoint()
    // retry of the newest batch is allowed and yields the same matches
    assert(pairs(d.update(b1, 1L).localCheckpoint()) ==
      Set((1L, 100L, 0L), (1L, 101L, 1L)))
    val e = intercept[IllegalArgumentException] { d.update(b2, 0L) }
    assert(e.getMessage.contains("checkpointLocation"))
  }

  test("byBatch replay across a compaction fold takes the per-batch checkpoint path") {
    // 9 batches > compactEvery (8): compaction fires mid-replay, so
    // byBatch must checkpoint each batch's matches BEFORE the fold
    // deletes the delta files a lazy frame would still read — and the
    // match against batch 0 proves the fold carried its postings
    val bs = (0 to 7).map(i => docs((i.toLong, baseText(i)))) :+
      docs(near(0, 800L), near(7, 807L))
    val out = StreamingMinhashLsh.byBatch(spark, bs, tmp("longreplay"),
      "doc_id", "text", estThreshold = 0.5)
    assert(pairs(out) == Set((8L, 800L, 0L), (8L, 807L, 7L)))
  }

  test("fan-out guard: repartition only below half the session parallelism") {
    assert(StreamingMinhashLsh.shouldFanOut(1, 32))
    assert(StreamingMinhashLsh.shouldFanOut(15, 32))
    assert(!StreamingMinhashLsh.shouldFanOut(16, 32),
      "at half the parallelism the batch is wide enough — the exchange is not free")
    assert(!StreamingMinhashLsh.shouldFanOut(32, 32))
    assert(!StreamingMinhashLsh.shouldFanOut(Int.MaxValue, Int.MaxValue),
      "the guard must not overflow on extreme partition counts")
  }

  test("store size is documents-linear: bands rows per doc, one sig per doc") {
    val store = tmp("size")
    val d = new StreamingMinhashLsh.MinhashLshDeduper(spark, store,
      "doc_id", "text", estThreshold = 0.5, compactEvery = 2)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      d.update(b, i.toLong).localCheckpoint()
    }
    val nDocs = 6 + 8 + 2
    val postings = spark.read.parquet(s"$store/bands/compacted_upto_2",
      s"$store/bands/batch=2")
    val sigRows = spark.read.parquet(s"$store/sigs/compacted_upto_2",
      s"$store/sigs/batch=2")
    assert(postings.count() == nDocs * 16L, "16 band postings per document")
    assert(sigRows.count() == nDocs.toLong, "one signature row per document")
  }
}
