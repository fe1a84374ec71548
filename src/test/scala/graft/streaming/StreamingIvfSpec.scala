package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ext.Similarity
import org.apache.spark.sql.functions._

class StreamingIvfSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-sivf-$tag").toString + "/store"

  private def vecs(ids: Seq[Long]) = ids.map { i =>
    (i, Array.tabulate(16)(d => math.sin((i * 13 + d * 5).toDouble).toFloat))
  }.toDF("vec_id", "embedding")

  test("byBatch: appended vectors surface in search as batches land") {
    val all = (0L until 240L)
    val batches = (0 to 2).map(b => vecs(all.filter(_ % 3 == b)))
    val cents = Similarity.ivfCentroids(batches(0), "vec_id", "embedding",
      numCells = 8)
    val qs = vecs(Seq(3L, 7L)).select($"vec_id".as("query_id"), $"embedding")
    val rows = StreamingIvf.byBatch(spark, batches, tmp("run"), "vec_id",
        "embedding", cents, qs, "query_id", k = 5, nprobe = 3)
      .select($"batch_id", $"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    // every state answers every query with k well-formed rows
    (0L to 2L).foreach { b =>
      val st = rows.filter(_._1 == b)
      assert(st.map(_._2).distinct.sorted.toSeq == Seq(3L, 7L), s"batch $b")
      assert(st.groupBy(_._2).values.forall(_.map(_._4).sorted.toSeq == (1 to 5)))
    }
    // after batch 0 only %3==0 ids exist; after batch 2 query 3 finds
    // itself at rank 1 (it arrived in batch 0 — id 3 is %3==0) and
    // query 7 (batch 1) only from state 1 on
    assert(rows.filter(r => r._1 == 0 && r._3 % 3 != 0).isEmpty,
      "state 0 must only contain batch-0 vectors")
    assert(!rows.exists(r => r._1 == 0 && r._2 == 7L && r._3 == 7L))
    assert(rows.exists(r => r._1 == 1 && r._2 == 7L && r._3 == 7L && r._4 == 1))
  }

  test("retry idempotence, restart recovery, quantizer + regression guards") {
    val store = tmp("guards")
    val b0 = vecs(0L until 60L)
    val b1 = vecs(60L until 120L)
    val cents = Similarity.ivfCentroids(b0, "vec_id", "embedding",
      numCells = 8)
    val acc = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", cents)
    acc.update(b0, 0L)
    acc.update(b1, 1L)
    val once = acc.postings().count()
    acc.update(b1, 1L) // foreachBatch retry overwrites its own delta
    assert(acc.postings().count() == once && once == 120L)
    // restart: a new accumulator attaches with NO centroids and reloads
    // the frozen quantizer from the store
    val acc2 = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", Nil)
    assert(acc2.centroids == cents.sortBy(_._1))
    // a DIFFERENT quantizer on the same store is refused
    val other = Similarity.ivfCentroids(b1, "vec_id", "embedding",
      numCells = 8)
    val e1 = intercept[IllegalArgumentException] {
      new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
        "embedding", other)
    }
    assert(e1.getMessage.contains("frozen quantizer"))
    // batch-id regression (restart without checkpoint) fails fast
    val e2 = intercept[IllegalArgumentException] { acc2.update(b0, 0L) }
    assert(e2.getMessage.contains("checkpointLocation"))
    // stats ride the accumulated postings
    val st = acc2.cellStats().select($"n").as[Long].collect()
    assert(st.sum == 120L)
  }

  test("hierarchical segment merging: segment count stays bounded over " +
      "many batches, merged reads byte-identical, prefix reads exact") {
    val store = tmp("hier")
    val cents = Similarity.ivfCentroids(vecs(0L until 60L), "vec_id",
      "embedding", numCells = 4)
    // reference: never folds, never merges
    val plain = new StreamingIvf.IvfAccumulator(spark, tmp("hier-ref"),
      "vec_id", "embedding", cents, compactEvery = 10000)
    val acc = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", cents, compactEvery = 2, maxSegments = 3)
    val nBatches = 60
    (0 until nBatches).foreach { i =>
      val b = vecs(Seq(i * 2L, i * 2L + 1L))
      acc.update(b, i.toLong)
      plain.update(b, i.toLong)
    }
    // file/segment counts bounded by the merge invariant, NOT by the
    // stream's length: ≤ maxSegments live segments + < compactEvery
    // pending deltas after 60 batches (30 folds, ~27 merges)
    val dirs = new java.io.File(store).list().toSeq
    val genDirs = dirs.filter(_.startsWith("gen="))
    assert(genDirs.size <= 3, s"live segments must stay ≤ maxSegments: $dirs")
    assert(dirs.count(_.startsWith("batch=")) < 2,
      s"pending deltas must stay below compactEvery: $dirs")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("neighbor_id").collect().toSeq
    // merged postings byte-equal the never-folded store's
    assert(canon(acc.postings()) == canon(plain.postings()))
    // prefix reads stay exact through merged segments (__batch_id
    // survives every rewrite)
    Seq(1L, 17L, 43L).foreach { upto =>
      assert(canon(acc.postings(upto)) == canon(plain.postings(upto)),
        s"prefix read upto=$upto diverges after merging")
    }
    // a fresh accumulator attaching to the merged store reads the same
    val acc2 = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", Nil, compactEvery = 2, maxSegments = 3)
    assert(canon(acc2.postings()) == canon(plain.postings()))
  }

  test("crash consistency: an unmarked (no _SUCCESS) gen dir neither " +
      "shadows intact deltas nor survives the next update's sweep") {
    val store = tmp("crash")
    val cents = Similarity.ivfCentroids(vecs(0L until 30L), "vec_id",
      "embedding", numCells = 4)
    val acc = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", cents, compactEvery = 100)
    (0 until 3).foreach(i => acc.update(vecs(Seq(i * 10L)), i.toLong))
    assert(acc.postings().count() == 3L)
    // simulate a crash mid segment write: a partial gen dir with data
    // but NO _SUCCESS marker, spanning the intact deltas — before the
    // marker gate, its mere existence raised coveredUpto() to 3 and
    // postings() silently dropped every delta
    val partial = new java.io.File(s"$store/gen=0_3")
    assert(partial.mkdir())
    java.nio.file.Files.write(partial.toPath.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    assert(acc.postings().count() == 3L,
      "an uncommitted segment must not shadow the delta dirs")
    assert(acc.search(vecs(Seq(0L)).select($"vec_id".as("query_id"),
      $"embedding"), "query_id", k = 2).count() > 0)
    // the next update sweeps the leftover
    acc.update(vecs(Seq(30L)), 3L)
    assert(!partial.exists(), "sweep must delete the unmarked gen dir")
    assert(acc.postings().count() == 4L)
    // committed-but-shadowed merge inputs are swept too: fabricate the
    // crash-between-commit-and-cleanup state by marking a NESTED span
    // dir committed alongside a committed cover of the same rows
    val acc2store = tmp("crash2")
    val acc2 = new StreamingIvf.IvfAccumulator(spark, acc2store, "vec_id",
      "embedding", cents, compactEvery = 2, maxSegments = 2)
    (0 until 8).foreach(i => acc2.update(vecs(Seq(100L + i)), i.toLong))
    val live = new java.io.File(acc2store).list().toSeq
      .filter(_.startsWith("gen="))
    // merging down to maxSegments=2 has run at least once; postings
    // stay exactly one copy of every row
    assert(live.size <= 2, s"merge invariant violated: $live")
    assert(acc2.postings().count() == 8L)
  }

  test("legacy store migration: unmarked committed segments are " +
      "backfilled at attach, never swept as crash leftovers") {
    val store = tmp("legacy")
    val cents = Similarity.ivfCentroids(vecs(0L until 30L), "vec_id",
      "embedding", numCells = 4)
    val acc = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", cents, compactEvery = 2)
    (0 until 4).foreach(i => acc.update(vecs(Seq(i.toLong)), i.toLong))
    assert(acc.postings().count() == 4L)
    val gens = new java.io.File(store).list().toSeq.filter(_.startsWith("gen="))
    assert(gens.size == 2, s"fixture needs folded segments: $gens")
    // simulate a store written by pre-marker-discipline code in a
    // session with committer success-markers disabled: no format
    // marker, committed segments without _SUCCESS
    gens.foreach { g =>
      val m = new java.io.File(s"$store/$g/_SUCCESS")
      assert(m.delete(), s"fixture: $g must have carried a marker")
    }
    assert(new java.io.File(s"$store/_graft_ivf_v2").delete())
    // attach: migration must backfill the markers (the dirs hold real
    // parquet, parse as spans, and no wider committed cover exists) —
    // before the fix, postings() under-read to 0 and the first
    // update's sweep permanently deleted both segments
    val acc2 = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", Nil, compactEvery = 2)
    assert(acc2.postings().count() == 4L,
      "unmarked committed segments must be readable after migration")
    acc2.update(vecs(Seq(4L)), 4L) // runs the sweep
    gens.foreach { g =>
      assert(new java.io.File(s"$store/$g").exists(),
        s"sweep must not delete the migrated segment $g")
    }
    assert(acc2.postings().count() == 5L)
    // the store is stamped: on a POST-migration store a genuinely
    // partial gen dir (junk bytes, no marker) is still swept
    val partial = new java.io.File(s"$store/gen=0_9")
    assert(partial.mkdir())
    java.nio.file.Files.write(partial.toPath.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    acc2.update(vecs(Seq(5L)), 5L)
    assert(!partial.exists(),
      "a partial dir on a stamped store is a crash leftover, not legacy")
    assert(acc2.postings().count() == 6L)
  }

  test("generational compaction: folded reads are byte-identical, " +
      "plan fan-in stays bounded, attach-after-many-batches works") {
    val store = tmp("gen")
    val batches = (0 until 7).map(b =>
      vecs((0L until 210L).filter(_ % 7 == b)))
    val cents = Similarity.ivfCentroids(batches(0), "vec_id", "embedding",
      numCells = 8)
    // reference: an UNCOMPACTED accumulator over the same batches
    val plain = new StreamingIvf.IvfAccumulator(spark, tmp("gen-ref"),
      "vec_id", "embedding", cents, compactEvery = 100)
    val acc = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", cents, compactEvery = 3)
    batches.zipWithIndex.foreach { case (b, i) =>
      plain.update(b, i.toLong); acc.update(b, i.toLong)
    }
    // deltas folded into gen segments: at most compactEvery-1 pending
    // delta dirs remain, and segments replace the folded ones
    val dirs = new java.io.File(store).listFiles().map(_.getName).sorted
    val genDirs = dirs.filter(_.startsWith("gen="))
    val deltaDirs = dirs.filter(_.startsWith("batch="))
    assert(genDirs.length == 2, s"expected 2 segments, got ${dirs.toSeq}")
    assert(deltaDirs.length < 3,
      s"pending deltas must stay below compactEvery: ${dirs.toSeq}")
    // full read identical to the uncompacted store's
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"cell", $"neighbor_id", $"vnorm")
        .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(canon(acc.postings()) == canon(plain.postings()))
    // HISTORICAL prefix reads stay exact even where the prefix cuts
    // through a folded segment (batch 1 inside gen=0_3, batch 4 inside
    // gen=3_6)
    Seq(1L, 2L, 4L, 5L, 7L).foreach { upto =>
      assert(canon(acc.postings(upto)) == canon(plain.postings(upto)),
        s"prefix read upto=$upto diverged after compaction")
    }
    // attach-after-many-batches: a fresh accumulator sees the same
    // relation and the regression guard still knows the frontier from
    // segments alone
    val acc2 = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", Nil, compactEvery = 3)
    assert(canon(acc2.postings()) == canon(plain.postings()))
    val e = intercept[IllegalArgumentException] {
      acc2.update(batches(0), 3L) // ids up to 6 are on disk (in segments)
    }
    assert(e.getMessage.contains("checkpointLocation"))
    // retry of the LATEST batch stays idempotent after folds
    acc2.update(batches(6), 6L)
    assert(canon(acc2.postings()) == canon(plain.postings()))
    // search answers from folded segments
    val q = vecs(Seq(13L)).select($"vec_id".as("query_id"), $"embedding")
    val top = acc2.search(q, "query_id", k = 1, nprobe = 3)
      .select($"neighbor_id").as[Long].head()
    assert(top == 13L)
  }

  test("drift-triggered rebuild: imbalance trigger fires only past the " +
      "threshold, rebuild restores balance and recall, stream resumes") {
    // DRIFTED fixture: the initial corpus clusters around one direction
    // (dim 0 dominant), the appended batch around an orthogonal one
    // (dim 8 dominant) — every appended vector crowds the same frozen
    // cell, so the hottest-cell imbalance spikes
    def cluster(ids: Seq[Long], dom: Int) = ids.map { i =>
      (i, Array.tabulate(16)(d =>
        (if (d == dom) 10f else 0f) +
          math.sin((i * 13 + d * 5).toDouble).toFloat * 0.3f))
    }.toDF("vec_id", "embedding")
    val initial = cluster(0L until 120L, dom = 0)
    val drifted = cluster(120L until 360L, dom = 8)
    val cents = Similarity.ivfCentroids(initial, "vec_id", "embedding",
      numCells = 8)
    val store = tmp("drift")
    val acc = new StreamingIvf.IvfAccumulator(spark, store, "vec_id",
      "embedding", cents, compactEvery = 2)
    acc.update(initial, 0L)
    // balanced so far: no rebuild below the threshold
    val before = acc.imbalance()
    assert(acc.rebuildIfDrifted(tmp("no"), threshold = before + 1).isEmpty,
      "must not rebuild below the threshold")
    acc.update(drifted, 1L)
    acc.update(cluster(360L until 420L, dom = 8), 2L)
    val hot = acc.imbalance()
    assert(hot > 3.0, s"drifted fixture must trip the FAISS-folklore " +
      s"threshold, got $hot")
    // the trigger fires; the rebuilt index is balanced again
    val rebuiltPath = tmp("rebuilt")
    val acc2 = acc.rebuildIfDrifted(rebuiltPath, threshold = 3.0)
      .getOrElse(fail("rebuild must fire past the threshold"))
    assert(acc2.imbalance() < hot,
      s"rebuild must reduce imbalance: $hot -> ${acc2.imbalance()}")
    assert(acc2.postings().count() == acc.postings().count())
    // prefix reads carry over (original batch ids preserved)
    assert(acc2.postings(1L).count() == acc.postings(1L).count())
    // recall non-regression via the q263 harness, at MATCHED candidate
    // budget: the drifted index "recalls" perfectly at nprobe=1 only
    // because its one hot cell holds the whole drifted cluster — a
    // brute-force scan in disguise, the exact cost the rebuild removes.
    // The honest comparison gives both indexes the same scan fraction:
    // old probes 1 of 8 cells but that cell is ~75% of the corpus, so
    // the rebuilt index gets 6 of its 8 (balanced) cells
    val corpus = acc.postings().select($"neighbor_id".as("vec_id"),
      $"vec".as("embedding"))
    val qs = cluster(Seq(130L, 200L, 350L), dom = 8)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(corpus, qs, "vec_id",
      "embedding", "query_id", k = 5)
    def macroRecall(a: StreamingIvf.IvfAccumulator, nprobe: Int): Double = {
      val per = graft.ext.Retrieval.annRecall(
        a.search(qs, "query_id", k = 5, nprobe = nprobe), exact,
        "query_id", "neighbor_id", "rank", k = 5)
      per.agg((sum($"recall_e6").cast("double") /
        (count(lit(1)) * 1000000L).cast("double")).as("m"))
        .as[Double].head()
    }
    val (rOld, rNew) = (macroRecall(acc, 1), macroRecall(acc2, 6))
    assert(rNew >= rOld,
      s"rebuild must not regress recall at matched scan budget: " +
        s"$rOld -> $rNew")
    assert(rNew > 0.9, s"rebuilt index must answer drifted queries: $rNew")
    // the stream resumes appending at the same frontier under the NEW
    // quantizer; a stale id still fails fast
    val e = intercept[IllegalArgumentException] {
      acc2.update(cluster(Seq(999L), 8), 1L)
    }
    assert(e.getMessage.contains("checkpointLocation"))
    acc2.update(cluster(420L until 460L, dom = 8), 3L)
    assert(acc2.postings().count() == 460L)
    // same-path rebuild is refused
    val e2 = intercept[IllegalArgumentException] {
      acc2.rebuildInto(rebuiltPath, numCells = 8)
    }
    assert(e2.getMessage.contains("NEW storePath"))
  }

  test("live stream: foreachBatch accumulates and searches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val base = vecs(0L until 80L)
    val cents = Similarity.ivfCentroids(base, "vec_id", "embedding",
      numCells = 8)
    val (query, acc) = StreamingIvf.start(
      input.toDF().withColumnRenamed("_1", "vec_id")
        .withColumnRenamed("_2", "embedding"),
      tmp("live"), "vec_id", "embedding", cents, queryName = "sivf-spec")
    try {
      def batch(ids: Seq[Long]): Seq[(Long, Array[Float])] = ids.map { i =>
        (i, Array.tabulate(16)(d =>
          math.sin((i * 13 + d * 5).toDouble).toFloat))
      }
      input.addData(batch(0L until 40L): _*)
      query.processAllAvailable()
      input.addData(batch(40L until 80L): _*)
      query.processAllAvailable()
      assert(acc.postings().count() == 80L)
      val q = base.filter($"vec_id" === 55L)
        .select($"vec_id".as("query_id"), $"embedding")
      val top = acc.search(q, "query_id", k = 1, nprobe = 2)
        .select($"neighbor_id").as[Long].head()
      assert(top == 55L, "batch-2 vector must be searchable")
    } finally query.stop()
  }
}
