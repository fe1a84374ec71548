package graft.ext

import graft.SparkTestBase

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force best segmentation under the spec'd preference order:
    * max Σ logp, then fewer pieces, then — matching the Viterbi
    * backward tie-break (longer LAST piece, recursing toward the front)
    * — the lexicographically greatest REVERSED piece-length sequence.
    * Enumerated exhaustively.
    */
  private def bruteBest(word: String, vocab: Map[String, Long],
                        maxLen: Int): Seq[String] = {
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        if (vocab.contains(p) || l == 1)
          segs(w.substring(l)).map(p +: _)
        else Seq.empty
      }
    def score(s: Seq[String]): Long =
      s.map(p => vocab.getOrElse(p, UnigramLm.UnkLogpE12)).sum
    val all = segs(word)
    all.max(Ordering.by((s: Seq[String]) =>
      (score(s), -s.size, s.reverse.map(_.length.toLong).toVector)
    )(Ordering.Tuple3(Ordering.Long, Ordering.Int,
      Ordering.Implicits.seqOrdering[Vector, Long])))
  }

  test("encodeWord equals exhaustive search on randomized vocabularies") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abc"
    for (trial <- 0 until 30) {
      val pieces = (0 until 12).map { _ =>
        val len = 1 + rnd.nextInt(3)
        (0 until len).map(_ => alphabet(rnd.nextInt(3))).mkString
      }.distinct
      val vocab = pieces.map(p => p -> (-1000000000000L * (1 + rnd.nextInt(20)))).toMap
        // ensure all single chars present so brute/viterbi share coverage
        .++(alphabet.map(c => c.toString -> -15000000000000L))
      val word = (0 until (3 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      val got = UnigramLm.encodeWord(word, vocab, maxPieceLen = 3)
      val want = bruteBest(word, vocab, 3)
      assert(got.mkString("|") == want.mkString("|"),
        s"trial $trial word=$word got=$got want=$want")
      assert(got.mkString == word, "pieces must concatenate to the word")
    }
  }

  test("encodeWord: OOV chars fall back to single-char UNK pieces") {
    val vocab = Map("ab" -> -1000000000000L, "a" -> -2000000000000L,
      "b" -> -2000000000000L)
    val got = UnigramLm.encodeWord("axb", vocab, 4)
    assert(got == Seq("a", "x", "b"))
  }

  test("learnFrame: hand corpus — counts, char coverage, total order") {
    val docs = Seq((1L, "aa ab"), (2L, "aa"), (3L, "AA  ab")).toDF("id", "text")
    // words: aa ×3, ab ×2 → substrings (maxLen 2):
    //   a: from aa (2 per word ×3) + ab (1 ×2) = 8; aa: 3; ab: 2; b: 2
    val got = UnigramLm.learnFrame(docs, "text", vocabSize = 10,
        maxPieceLen = 2, minCount = 2L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("a", "b", "aa", "ab"))
    assert(got("a")._1 == 8L && got("aa")._1 == 3L &&
      got("ab")._1 == 2L && got("b")._1 == 2L)
    val total = 8L + 3L + 2L + 2L
    def s(x: Long) = math.floor(math.log(x.toDouble) * 1e12).toLong
    got.foreach { case (p, (c, lp)) =>
      assert(lp == s(c) - s(total), s"piece $p")
    }
    // vocabSize below the char count still keeps chars first
    val tiny = UnigramLm.learnFrame(docs, "text", vocabSize = 2,
        maxPieceLen = 2, minCount = 2L)
      .collect().map(_.getString(0)).toSet
    assert(tiny == Set("a", "b"), s"chars must be force-included first: $tiny")
  }

  test("tokenize: pieces re-concatenate per word; memo path consistent") {
    val docs = Seq((1L, "banana band"), (2L, "banana banana band"))
      .toDF("doc_id", "text")
    val vocab = UnigramLm.learn(docs, "text", vocabSize = 30,
      maxPieceLen = 3, minCount = 1L)
    val out = UnigramLm.tokenize(docs, "doc_id", "text", vocab, maxPieceLen = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (w1, p1, s1) = out(1L)
    assert(w1 == 2L)
    assert(s1.split(" ").mkString == "bananaband")
    // doc 2 repeats doc 1's words: the memo path must produce the same
    // piece stream (plus one extra banana)
    val lookup = vocab.map(p => p.piece -> p.logp_e12).toMap
    val direct = Seq("banana", "banana", "band")
      .flatMap(w => UnigramLm.encodeWord(w, lookup, 3))
    assert(out(2L)._2 == direct.size.toLong)
    assert(out(2L)._3 == direct.mkString(" "))
    assert(p1 > 0)
  }
}
