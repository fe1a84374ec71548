package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

class StreamingMergeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/cdc"

  private def rows(n: Int, seed: Long): Seq[(Long, Long, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    // (key, version, uid, payload) — uid makes (version, uid) unique
    (0 until n).map { i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(40).toLong, i.toLong, s"p$i")
    }
  }

  private def refState(rs: Seq[(Long, Long, Long, String)]): Map[Long, (Long, Long, String)] =
    rs.groupBy(_._1).view.mapValues(_.maxBy(r => (r._2, r._3)))
      .mapValues(r => (r._2, r._3, r._4)).toMap

  private def df(rs: Seq[(Long, Long, Long, String)]): DataFrame =
    rs.toDF("key", "version", "uid", "payload")

  test("final state is independent of the batch split (latest-wins by version)") {
    val all = rows(120, 3L)
    val expect = refState(all)
    val rnd = new scala.util.Random(4)
    for (trial <- 0 until 3) {
      // random assignment of rows to 4 arrival batches — including
      // splits where newer versions arrive EARLIER than older ones
      val tagged = all.map(r => (rnd.nextInt(4), r))
      val batches = (0 until 4).map(b => df(tagged.filter(_._1 == b).map(_._2)))
      val got = StreamingMerge.byBatch(spark, batches, tmpStore(),
          "key", Seq("version", "uid"))
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("a late batch with an older version does not overwrite state") {
    val store = tmpStore()
    val s = new StreamingMerge.StateStore(spark, store, "key",
      Seq("version", "uid"))
    s.update(df(Seq((1L, 10L, 1L, "new"))), 0L)
    s.update(df(Seq((1L, 5L, 2L, "old"), (2L, 1L, 3L, "fresh"))), 1L)
    val got = s.current().as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map(1L -> "new", 2L -> "fresh"))
  }

  test("replaying a batch is idempotent; empty and null-key rows are ignored") {
    val store = tmpStore()
    val s = new StreamingMerge.StateStore(spark, store, "key",
      Seq("version", "uid"))
    val b = df(Seq((1L, 3L, 1L, "a"), (2L, 4L, 2L, "b")))
    s.update(b, 0L)
    val first = s.current().collect().toSet
    s.update(b, 0L) // foreachBatch retry
    assert(s.current().collect().toSet == first)
    s.update(df(Seq.empty), 1L)
    s.update(Seq((Option.empty[Long], 9L, 9L, "x"))
      .toDF("key", "version", "uid", "payload"), 2L)
    assert(s.current().collect().toSet == first)
  }

  test("only touched buckets rewrite; old generations stay intact") {
    val store = tmpStore()
    val s = new StreamingMerge.StateStore(spark, store, "key",
      Seq("version", "uid"), numBuckets = 8)
    s.update(df((0 until 40).map(i =>
      (i.toLong, 1L, i.toLong, s"v$i"))), 0L)
    def bucketDirs(gen: Long): Map[String, Seq[(String, Long)]] = {
      val d = new java.io.File(store + s"/gen-$gen")
      if (!d.exists()) Map.empty
      else d.listFiles().filter(_.getName.startsWith("__bucket="))
        .map(b => b.getName ->
          b.listFiles().map(f => (f.getName, f.lastModified))
            .toSeq.sortBy(_._1)).toMap
    }
    val gen1 = bucketDirs(1L)
    assert(gen1.size == 8, s"expected 8 bucket dirs in gen-1, got ${gen1.keySet}")
    // one key → one bucket touched: the new generation holds ONE bucket
    // and gen-1 is byte-for-byte untouched (never rewritten in place)
    s.update(df(Seq((7L, 2L, 1000L, "upd"))), 1L)
    val gen2 = bucketDirs(2L)
    assert(gen2.size == 1, s"buckets rewritten in gen-2: ${gen2.keySet}")
    assert(bucketDirs(1L) == gen1, "previous generation mutated")
    // and the update took effect
    val got = s.current().filter($"key" === 7L)
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq((7L, 2L, 1000L, "upd")))
  }

  test("snapshot readers survive later updates; vacuum keeps only live gens") {
    val store = tmpStore()
    val s = new StreamingMerge.StateStore(spark, store, "key",
      Seq("version", "uid"), numBuckets = 4)
    s.update(df((0 until 20).map(i => (i.toLong, 1L, i.toLong, s"v$i"))), 0L)
    val snapshot = s.current() // plan pinned to the gen dirs of manifest v1
    s.update(df((0 until 20).map(i => (i.toLong, 2L, 100L + i, s"w$i"))), 1L)
    // the old snapshot still reads the ORIGINAL rows — nothing deleted
    val snapVals = snapshot.as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(snapVals == (0 until 20).map(i => i.toLong -> s"v$i").toMap,
      "pre-update snapshot changed under the reader")
    // vacuum drops gen-1 (fully superseded) and the old manifest
    s.vacuum()
    assert(!new java.io.File(store + "/gen-1").exists(), "gen-1 not vacuumed")
    assert(new java.io.File(store + "/gen-2").exists(), "live gen-2 deleted")
    val cur = s.current().as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(cur == (0 until 20).map(i => i.toLong -> s"w$i").toMap)
  }
}
