package graft.ext

import graft.SparkTestBase

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain-Scala reference BPE learner: same normalization, same
    * end-of-word marker, same (count, l, r) argmax tiebreak.
    */
  private def refLearn(words: Map[String, Long], numMerges: Int,
                       minPairCount: Long): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.map { case (w, n) =>
      val cs = w.map(_.toString).toVector
      (cs.init :+ (cs.last + Bpe.EndOfWord)) -> n
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continueLoop = true
    while (continueLoop && out.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) continueLoop = false
      else {
        val ((l, r), c) = counts.maxBy { case ((l, r), c) => (c, l, r) }
        if (c < minPairCount) continueLoop = false
        else {
          out += ((l, r, c))
          vocab = vocab.map { case (syms, n) =>
            val ns = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                ns += l + r; i += 2
              } else { ns += syms(i); i += 1 }
            }
            ns.toVector -> n
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    out.toSeq
  }

  private def refWordCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.toLowerCase.replaceAll("\\s+", " ").trim
      .split(" ").filter(_.nonEmpty))
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("learn: classic corpus matches the reference, tiebreak included") {
    val texts = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learn(df, "text", numMerges = 8)
      .map(m => (m.left, m.right, m.pair_count))
    val want = refLearn(refWordCounts(texts), 8, 2L)
    assert(got == want)
    // (e,s) and (s,t</w>) tie at 9; the (count, l, r) max picks (s,t</w>)
    assert(got.head == (("s", "t" + Bpe.EndOfWord, 9L)))
  }

  test("learn: randomized corpus matches reference; early stop honored") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    val texts = (0 until 150).map { _ =>
      (0 until (1 + rnd.nextInt(4))).map { _ =>
        (0 until (1 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.learn(df, "text", numMerges = 20, minPairCount = 5L)
      .map(m => (m.left, m.right, m.pair_count))
    assert(got == refLearn(refWordCounts(texts), 20, 5L))
    assert(got.forall(_._3 >= 5L))
    // determinism under repartitioning
    val again = Bpe.learn(df.repartition(9), "text", 20, 5L)
      .map(m => (m.left, m.right, m.pair_count))
    assert(again == got)
  }

  test("tokenize: lossless reconstruction, rank-greedy encoding, exact counts") {
    val texts = Seq.fill(4)("the cat sat") ++ Seq.fill(3)("the mat") ++
      Seq("a thematic cast")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Bpe.learn(df, "text", numMerges = 10, minPairCount = 2L)
    val out = Bpe.tokenize(df, "doc_id", "text", merges)
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    val rank = merges.map(m => (m.left, m.right) -> m.rank).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val words = t.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").filter(_.nonEmpty)
      val expected = words.toSeq.flatMap(w => Bpe.encodeWord(w, rank))
      val (_, toks, n) = out(i.toLong)
      assert(toks == expected, s"doc $i")
      assert(n == toks.length.toLong)
      // dropping markers and concatenating reconstructs the words
      assert(toks.mkString.replace(Bpe.EndOfWord, "") == words.mkString)
    }
  }

  test("learn: empty and degenerate corpora stop cleanly") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.learn(empty, "text", 5) == Nil)
    // single-char words have no adjacent pairs after the marker fuses
    val single = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(Bpe.learn(single, "text", 5, minPairCount = 1L) == Nil)
  }

  test("learn: a k-merge vocabulary is an exact prefix of a larger one") {
    // greedy learning is sequential, so gates sharing one learn (q112's
    // 25 rules, q119 tokenizing with the first 10) see identical rules
    val texts = Seq("low lower lowest", "new newer newest lowest",
      "wide wider widest new low", "the newest widest lower low")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val big = Bpe.learn(df, "text", numMerges = 12, minPairCount = 1L)
    (1 to 12).foreach { k =>
      assert(Bpe.learn(df, "text", numMerges = k, minPairCount = 1L)
        == big.take(k), s"prefix broken at k=$k")
    }
  }
}
