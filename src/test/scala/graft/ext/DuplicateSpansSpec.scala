package graft.ext

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DuplicateSpansSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference implementation: same canonicalization, postings, dup-gram
    * set, and interval merge, in plain Scala — the ground truth the
    * distributed operator is compared against, including on random input.
    */
  private def bruteSpans(docs: Seq[(Long, String)], k: Int,
                         minDocs: Int): Set[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ", -1).toSeq
    }
    val grams = toks.flatMap { case (id, ts) =>
      if (ts.size >= k) (0 to ts.size - k).map(p => (id, p, ts.slice(p, p + k).mkString(" ")))
      else Nil
    }
    val dup = grams.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= minDocs).keySet
    grams.filter(g => dup(g._3)).groupBy(_._1).toSeq.flatMap { case (id, gs) =>
      var spans = List.empty[(Int, Int, Int)] // start, end, nGrams (reversed)
      for (p <- gs.map(_._2).sorted) spans match {
        case (s, e, n) :: rest if p <= e + 1 =>
          spans = (s, math.max(e, p + k - 1), n + 1) :: rest
        case _ => spans = (p, p + k - 1, 1) :: spans
      }
      spans.map { case (s, e, n) => (id, s.toLong, e.toLong, n.toLong) }
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int = 5,
                  minDocs: Int = 2): Set[(Long, Long, Long, Long)] =
    Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k, minDocs)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("shared run → one merged maximal span per doc") {
    val shared = "one two three four five six seven"
    val docs = Seq(
      1L -> s"alpha beta $shared gamma delta epsilon",
      2L -> s"$shared something else entirely here now")
    // doc 1: run occupies tokens 2..8 → windows at 2,3,4 merge to [2,8]
    // doc 2: run occupies tokens 0..6 → windows at 0,1,2 merge to [0,6]
    assert(run(docs) == Set((1L, 2L, 8L, 3L), (2L, 0L, 6L, 3L)))
  }

  test("duplicated regions split by a unique token stay separate spans") {
    val a = "red orange yellow green blue"    // span A (5 tokens, 1 window)
    val b = "cyan teal navy indigo violet"    // span B
    val docs = Seq(
      1L -> s"$a gap1 $b",
      2L -> s"$a gap2 $b")
    assert(run(docs) == Set(
      (1L, 0L, 4L, 1L), (1L, 6L, 10L, 1L),
      (2L, 0L, 4L, 1L), (2L, 6L, 10L, 1L)))
  }

  test("no cross-document duplication → empty") {
    val docs = Seq(
      1L -> "entirely unique first document with own words",
      2L -> "second text sharing nothing longer than fragments")
    assert(run(docs).isEmpty)
  }

  test("minDocs raises the bar: a 2-doc gram is not enough at minDocs=3") {
    val shared = "w1 w2 w3 w4 w5"
    val docs = Seq(1L -> s"$shared a b", 2L -> s"$shared c d", 3L -> "other stuff here entirely unrelated")
    assert(run(docs, minDocs = 3).isEmpty)
    assert(run(docs, minDocs = 2).nonEmpty)
  }

  test("short (<k tokens) and null docs are ignored") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c")
    assert(run(docs, k = 5).isEmpty)
    val withNull = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(withNull, "doc_id", "text").count() == 0)
  }

  test("within-doc repetition alone does not flag (distinct docs counted)") {
    val run5 = "p q r s t"
    val docs = Seq(1L -> s"$run5 x $run5", 2L -> "unrelated words that never repeat anywhere")
    assert(run(docs).isEmpty)
  }

  test("matches the reference implementation on random corpora") {
    val rnd = new Random(7)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val docs = (1L to 12L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val k = 2 + rnd.nextInt(3)
      assert(run(docs, k) == bruteSpans(docs, k, 2), s"trial $trial (k=$k)")
    }
  }

  test("hashGrams scale path produces identical spans to the string path") {
    val rnd = new Random(11)
    val vocab = Vector("u", "v", "w", "x", "y")
    val docs = (1L to 15L).map { id =>
      id -> Seq.fill(4 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val hashed = Dedup.duplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 3, minDocs = 2, hashGrams = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(hashed == run(docs, k = 3))
  }

  test("duplicateSpansAgainst: only batch windows present in the corpus flag") {
    val corpus = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta",
      11L -> "unrelated corpus content goes right here").toDF("doc_id", "text")
    val batch = Seq(
      1L -> "alpha beta gamma delta epsilon NEW TAIL TOKENS",
      2L -> "nothing from the corpus appears here at all").toDF("doc_id", "text")
    val out = Dedup.duplicateSpansAgainst(batch, corpus, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // batch doc 1 copies corpus tokens 0..4 → exactly one window at pos 0
    assert(out == Set((1L, 0L, 4L, 1L)))
  }

  test("duplicateSpansAgainst: batch never compares against itself") {
    val corpus = Seq(10L -> "totally different corpus text here").toDF("doc_id", "text")
    val dup = "one two three four five six"
    val batch = Seq(1L -> dup, 2L -> dup).toDF("doc_id", "text") // intra-batch dup only
    assert(Dedup.duplicateSpansAgainst(batch, corpus, "doc_id", "text", k = 5).count() == 0)
  }

  test("duplicateSpansAgainst: short corpus docs cannot fake a k-gram") {
    val corpus = Seq(10L -> "tiny doc").toDF("doc_id", "text") // < k tokens
    val batch = Seq(1L -> "tiny doc padded out to five tokens minimum").toDF("doc_id", "text")
    assert(Dedup.duplicateSpansAgainst(batch, corpus, "doc_id", "text", k = 5).count() == 0)
  }

  test("duplicateSpansAgainst: hashGrams path identical to string path") {
    val corpus = Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta",
      11L -> "more corpus filler words beyond the shared part").toDF("doc_id", "text")
    val batch = Seq(
      1L -> "x alpha beta gamma delta epsilon zeta y",
      2L -> "more corpus filler words beyond anything else").toDF("doc_id", "text")
    def spans(h: Boolean) =
      Dedup.duplicateSpansAgainst(batch, corpus, "doc_id", "text", k = 5, hashGrams = h)
        .as[(Long, Long, Long, Long)].collect().toSet
    val s = spans(false)
    assert(s == spans(true) && s.nonEmpty)
  }

  test("stripDuplicateSpans removes exactly the flagged tokens") {
    val shared = "one two three four five six seven"
    val docs = Seq(
      1L -> s"alpha beta $shared gamma",
      2L -> s"$shared tail words here")
    val out = Dedup.stripDuplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha beta gamma")
    assert(out(2L) == "tail words here")
  }

  test("stripDuplicateSpans: fully-duplicated doc → empty; untouched doc → canonical; null → null") {
    val docs = Seq(
      (1L, "Same  Five TOKENS here now"),
      (2L, "same five tokens here now"),
      (3L, "an unrelated document left alone"),
      (4L, null: String)).toDF("doc_id", "text")
    val out = Dedup.stripDuplicateSpans(docs, "doc_id", "text")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(out(1L) == "" && out(2L) == "")
    assert(out(3L) == "an unrelated document left alone")
    assert(out(4L) == null)
  }
}
