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
