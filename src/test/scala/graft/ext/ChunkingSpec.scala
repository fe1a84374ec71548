package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkByTokens: strides, overlap, short tail, empty doc survives") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, chunk 4 overlap 1 -> stride 3
      (2L, "x y"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 1)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getLong(3))))
      .toMap
    // doc 1: starts 0,3,6,9 -> 4 chunks, overlap of 1 token between them
    assert(out((1L, 0)) == (("a b c d", 4L)))
    assert(out((1L, 1)) == (("d e f g", 4L)))
    assert(out((1L, 2)) == (("g h i j", 4L)))
    assert(out((1L, 3)) == (("j", 1L)))
    assert(out((2L, 0)) == (("x y", 2L)))
    // empty doc: one empty chunk, not a dropped row
    assert(out((3L, 0))._2 == 1L)
    assert(out.size == 6)
  }

  test("chunkByTokens: null text emits NO chunk (no phantom token counts)") {
    val docs = Seq((1L, "a b c"), (2L, null: String)).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(docs, "doc_id", "text", chunkTokens = 4)
      .collect()
    // greatest()/least() skip NULLs, so an unfiltered null row would emit
    // one chunk claiming chunkTokens tokens with a null text
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    assert(out.map(_.getLong(3)).sum == 3L)
  }

  test("packGreedy: sequences fill in order, straddlers overflow, shards independent") {
    val docs = Seq(
      (1L, 0L, 30), (2L, 0L, 30), (3L, 0L, 30), (4L, 0L, 10), // shard 0
      (5L, 1L, 70), (6L, 1L, 5)                               // shard 1
    ).map { case (id, sh, n) => (id, sh, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "shard", "text")
    val out = Chunking.packGreedy(docs, "doc_id", "text",
        seqTokens = 64, shardCol = "shard")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // shard 0: cum-before = 0,30,60,90 -> seq 0,0,0,1 (doc 3 straddles
    // the 64 boundary but STARTED inside seq 0)
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 0L && out(4L) == 1L)
    // shard 1: 70-token doc fills seq 0 alone (overflow); next starts seq 1
    assert(out(5L) == 0L && out(6L) == 1L)
  }

  test("packConcat: exact windows, boundary straddling, eos accounting") {
    // shard stream: x y z <eos> p q <eos> m <eos>  (9 tokens, L = 4)
    val docs = Seq((1L, "a", "x y z"), (2L, "a", "p q"), (3L, "a", "m"),
      (9L, "b", ""), (10L, "b", null.asInstanceOf[String]))
      .toDF("doc_id", "shard", "text")
    val got = Chunking.packConcat(docs, "doc_id", "text",
        seqTokens = 4, shardCol = "shard")
      .as[(String, Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("a", 0L)) == (("x y z <eos>", 4L)))
    assert(got(("a", 1L)) == (("p q <eos> m", 4L)),
      "doc 3 must straddle into window 1")
    assert(got(("a", 2L)) == (("<eos>", 1L)), "short final window")
    // empty doc contributes only its eos; null doc contributes nothing
    assert(got(("b", 0L)) == (("<eos>", 1L)))
    assert(got.size == 4)
    // partition invariance: in-row slice assembly, not partition order
    val again = Chunking.packConcat(docs.repartition(5), "doc_id", "text",
        seqTokens = 4, shardCol = "shard")
      .as[(String, Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(again == got)
    intercept[IllegalArgumentException](
      Chunking.packConcat(docs, "doc_id", "text", 4, "shard", eosToken = "a b"))
  }

  test("packConcat conservation laws on random corpora") {
    val rnd = new scala.util.Random(31)
    val words = Array("alpha", "b", "ce", "dd", "eee", "f0")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(12)
      (i.toLong, s"s${i % 5}",
        (0 until n).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "shard", "text")
    for (l <- Seq(3, 16, 64)) {
      val out = Chunking.packConcat(docs, "doc_id", "text", l, "shard")
        .as[(String, Long, String, Long)].collect()
      // token conservation: every token + one eos per doc lands somewhere
      val expectTokens = docs.collect().map { r =>
        r.getString(2).split("\\s+").count(_.nonEmpty) + 1 }.sum.toLong
      assert(out.map(_._4).sum == expectTokens, s"L=$l")
      // every window except each shard's last is EXACTLY l tokens, and
      // seq_text token count matches n_seq_tokens
      val byShard = out.groupBy(_._1)
      byShard.foreach { case (_, ws) =>
        val maxIdx = ws.map(_._2).max
        ws.foreach { case (_, idx, text, n) =>
          assert(text.split(" ").length.toLong == n)
          if (idx < maxIdx) assert(n == l.toLong, s"L=$l window $idx has $n")
        }
        // windows are dense 0..max
        assert(ws.map(_._2).sorted.toSeq == (0L to maxIdx))
      }
    }
  }
}
