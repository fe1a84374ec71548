package graft.ext

import graft.SparkTestBase

class CurationSpec extends SparkTestBase {
  import spark.implicits._

  test("curate: gates junk, merges exact dups, drops near dups, keeps heads") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away today"),
      (2L, "the quick brown fox jumps over the lazy dog and runs away today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy dog and runs away now"),   // near dup
      (4L, "a completely different story about the spark engine and its optimizer"),
      (5L, "!!!"),                                  // junk: fails quality gate
      (6L, "zzz qqq xxx yyy www vvv uuu ttt sss")   // no stopwords → gated at 0.8
    ).toDF("doc_id", "text")
    val kept = Curation.curate(docs, "doc_id", "text",
        minQuality = 0.8, jaccardThreshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 4L)),
      s"kept ${kept.mkString(",")}: 2 exact-dup, 3 near-dup, 5/6 gated")
  }

  test("curateForTraining: every stage's contract holds end-to-end") {
    val base = "the quick brown fox jumps over the lazy dog and runs away"
    val docs = Seq(
      (1L, s"$base today in the field"),
      (2L, s"$base today in the field"),          // exact dup of 1 -> merged
      (3L, s"$base today in the big field"),      // near dup of 1 (>= 0.6) -> same split side if kept
      (4L, "a completely different story about the spark engine and its optimizer"),
      (5L, "!!!"),                                // junk -> gated
      (6L, "this document quotes the held out benchmark words verbatim and at length")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "quotes the held out benchmark words"))
      .toDF("doc_id", "text")
    val out = Curation.curateForTraining(docs, "doc_id", "text",
      benchmark = Some(bench), minQuality = 0.5, dedupThreshold = 0.95,
      splitPairThreshold = 0.5, decontaminateMinShared = 2L,
      testFraction = 0.5, chunkTokens = 6, overlapTokens = 2)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(4)))
    val ids = rows.map(_._1).toSet
    assert(!ids.contains(2L), "exact dup must merge into doc 1")
    assert(!ids.contains(5L), "junk must be gated")
    assert(!ids.contains(6L), "benchmark quote must be decontaminated")
    assert(ids.contains(1L) && ids.contains(3L) && ids.contains(4L))
    // leakage safety: 1 and 3 are near-twins kept by the 0.95 dedup
    // threshold — they MUST land on the same split side
    val side = rows.filter(r => r._1 == 1L || r._1 == 3L).map(_._2).distinct
    assert(side.length == 1, s"near-twins split across sides: $side")
    // chunk budget respected
    assert(rows.forall(_._4 <= 6L))
    // deterministic composition
    val again = Curation.curateForTraining(docs.repartition(5), "doc_id", "text",
      benchmark = Some(bench), minQuality = 0.5, dedupThreshold = 0.95,
      splitPairThreshold = 0.5, decontaminateMinShared = 2L,
      testFraction = 0.5, chunkTokens = 6, overlapTokens = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(4)))
    assert(rows.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("curateForTraining: span trim cuts boilerplate before dedup judges uniqueness") {
    // two documents share a 7-token boilerplate footer but have unique
    // bodies long enough to pass the gates; a third is pure boilerplate
    val footer = "subscribe to our newsletter for all the latest updates today"
    val docs = Seq(
      (1L, s"a genuinely unique first story about the forest and the river $footer"),
      (2L, s"an entirely different account of the mountain and the valley $footer"),
      (3L, s"$footer")
    ).toDF("doc_id", "text")
    val out = Curation.curateForTraining(docs, "doc_id", "text",
      minQuality = 0.5, spanTrimK = Some(5), dedupThreshold = 0.8,
      splitPairThreshold = 0.6, testFraction = 0.5,
      chunkTokens = 32, overlapTokens = 0)
    val byDoc = out.collect()
      .map(r => r.getLong(0) -> r.getString(3)).groupBy(_._1)
    // both unique-body docs survive, with the footer trimmed out of
    // their chunk text
    assert(byDoc.contains(1L) && byDoc.contains(2L))
    assert(!byDoc.values.flatten.exists(_._2.contains("subscribe")),
      "boilerplate span must be trimmed from chunk text")
    // the pure-boilerplate doc trims to empty and is dropped
    assert(!byDoc.contains(3L))
    // without the trim, the shared footer is near-dup signal: the same
    // corpus must keep all three docs (no trim) with footer intact
    val untrimmed = Curation.curateForTraining(docs, "doc_id", "text",
      minQuality = 0.5, dedupThreshold = 0.8,
      splitPairThreshold = 0.6, testFraction = 0.5,
      chunkTokens = 32, overlapTokens = 0)
    assert(untrimmed.collect().exists(_.getString(3).contains("subscribe")))
  }

  test("curate is deterministic across runs") {
    val docs = (1L to 50L).map(i =>
      (i, s"the document number ${i % 7} talks about the data and the engine ${i % 3}"))
      .toDF("doc_id", "text")
    val a = Curation.curate(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    val b = Curation.curate(docs, "doc_id", "text").select("doc_id")
      .as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.length < 50) // the %7 templates near-dup heavily
  }
}
