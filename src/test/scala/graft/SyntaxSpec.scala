package graft

import org.apache.spark.sql.functions._

import graft.syntax._

class SyntaxSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3L, "completely different text about spark engines and columnar formats here"),
    (4L, "short")
  ).toDF("doc_id", "text")

  test("postfix ops forward to the canonical object API") {
    assert(docs.dedupExact("doc_id", "text").count() ==
      ext.Dedup.exact(docs, "doc_id", "text").count())
    assert(docs.nearDupPairs("doc_id", "text").count() ==
      ext.Dedup.minhashDuplicates(docs, "doc_id", "text").count())
    assert(docs.jaccardPairs("doc_id", "text").collect().toSeq ==
      ext.Dedup.ngramJaccardPairs(docs, "doc_id", "text").collect().toSeq)
    assert(docs.withTextStats().columns.toSet ==
      ext.TextStats.withStats(docs).columns.toSet)
    assert(docs.curate("doc_id", "text").count() ==
      ext.Curation.curate(docs, "doc_id", "text").count())
  }

  test("chained pipeline composes: stats → exact dedup → near pairs") {
    val out = docs.withTextStats()
      .dedupExact("doc_id", "text")
    assert(out.count() == 3)            // 1 ≡ 2 exact dup
    assert(out.columns.contains("n_tokens"))
  }

  test("round-3 postfix ops forward to the canonical object API") {
    assert(docs.profile("doc_id", "text").count() == 2)
    assert(docs.hashSample("doc_id", 1.0).count() == docs.count())
    val withStratum = docs.withColumn("s",
      org.apache.spark.sql.functions.lit("a"))
    assert(withStratum.rebalance("doc_id", "s", Map("a" -> 1.0)).count() ==
      docs.count())
    val upd = docs.limit(1)
    assert(docs.upsert(upd, Seq("doc_id")).count() == docs.count())
    assert(docs.dedupSurvivors("doc_id", "text").count() ==
      ext.Dedup.clusterSurvivors(docs, "doc_id", "text",
        ext.Dedup.minhashDuplicates(docs, "doc_id", "text", threshold = 0.8)
          .select("id_a", "id_b")).count())
  }

  test("round-4 postfix ops forward to the canonical object API") {
    assert(docs.duplicateSpans("doc_id", "text").collect().toSet ==
      ext.Dedup.duplicateSpans(docs, "doc_id", "text").collect().toSet)
    assert(docs.stripDuplicateSpans("doc_id", "text")
      .columns.contains("clean_text"))
    val corpus = docs.filter($"doc_id" === 1L)
    assert(docs.duplicateSpansAgainst(corpus, "doc_id", "text").collect().toSet ==
      ext.Dedup.duplicateSpansAgainst(docs, corpus, "doc_id", "text").collect().toSet)
    val build = docs.select($"doc_id".as("k")).limit(2)
    assert(docs.bloomPrunedJoin(build, "doc_id", "k").count() ==
      docs.join(build, $"doc_id" === $"k").count())
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7 + d).toFloat))
    }.toDF("vec_id", "embedding")
    assert(vecs.semanticJoin(vecs, "vec_id", "vec_id", "embedding",
        k = 3, bits = 4, dim = 8).collect().toSet ==
      ext.Similarity.lshTopKJoin(vecs, vecs, "vec_id", "vec_id", "embedding",
        k = 3, bits = 4, dim = 8).collect().toSet)
  }

  test("fuzzyJoin postfix op forwards (and maxBlockRows = 0 skips probe)") {
    val names = Seq((1L, "jonathan smith"), (2L, "johnathan smith"),
      (3L, "maria garcia")).toDF("id", "name")
    val viaSyntax = names.fuzzyJoin(names, "id", "name", "id", "name",
      threshold = 0.9, maxBlockRows = 0L).collect().toSet
    val direct = ext.Linkage.fuzzyJoin(names, "id", "name",
      names, "id", "name", threshold = 0.9).collect().toSet
    assert(viaSyntax == direct)
    assert(viaSyntax.nonEmpty)
  }

  test("parseAccessLogs on raw lines") {
    val raw = Seq(
      """o b [06/Feb/2019:00:00:38 +0000] ip r rid REST.GET.OBJECT k "GET / HTTP/1.1" 200 - 1 2 3 4 "-" "ua" -""",
      "  ")
      .toDF("value")
    val parsed = raw.parseAccessLogs()
    assert(parsed.count() == 1)
    assert(parsed.select("operation").head().getString(0) == "REST.GET.OBJECT")
  }
}
