package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class QualityFiltersSpec extends SparkTestBase {
  import spark.implicits._

  private val goodDoc =
    (1 to 60).map(i => s"word$i").mkString(" ") +
      " the and of that have with be to"

  test("gopher rules: each rule fires on its crafted violator") {
    val docs = Seq(
      (1L, goodDoc), // passes everything
      (2L, "too short but the and of it"), // n_words < 50
      (3L, (1 to 60).map(_ => "a").mkString(" ") + " the of"), // mean len < 3
      (4L, goodDoc + " " + (1 to 20).map(_ => "#").mkString(" ")), // symbols
      (5L, (1 to 10).map(i => s"\u2022 bullet item $i longer the of")
        .mkString("\n")), // > 90% bullet lines
      (6L, (1 to 10).map(i => s"line number $i trails off the of...")
        .mkString("\n")), // > 30% ellipsis lines
      (7L, (1 to 60).map(_ => "12345").mkString(" ") + " the of"), // alpha
      (8L, (1 to 60).map(i => s"word$i").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val out = QualityFilters.withGopherRules(docs)
      .select("doc_id", "gopher_pass").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "the clean doc must pass")
    (2L to 8L).foreach(id => assert(!out(id), s"doc $id must fail"))
  }

  test("gopher rule columns carry the audit metrics") {
    val out = QualityFilters.withGopherRules(
        Seq((1L, "aa bb the of\n\u2022 x\ny ends\u2026")).toDF("doc_id", "text"))
      .select("n_words", "bullet_frac", "ellipsis_frac", "stop_hits")
      .head()
    assert(out.getLong(0) == 8)
    assert(out.getDouble(1) == 1.0 / 3)
    assert(out.getDouble(2) == 1.0 / 3)
    assert(out.getLong(3) == 2)
  }

  test("c4 clean: line predicate, order preservation, document gate") {
    val text = Seq(
      "This line has the five words needed.", // kept
      "short one.", // < 5 words
      "no terminal punctuation on this line here", // no punct
      "Please enable JavaScript to view this page.", // javascript
      "A second kept line stays in order!",
      "And a third survives the cut?").mkString("\n")
    val out = QualityFilters.withC4Clean(Seq((1L, text)).toDF("doc_id", "text"))
      .select("clean_text", "n_lines", "n_kept", "keep_doc").head()
    assert(out.getString(0) == Seq(
      "This line has the five words needed.",
      "A second kept line stays in order!",
      "And a third survives the cut?").mkString("\n"))
    assert(out.getLong(1) == 6 && out.getLong(2) == 3)
    assert(out.getBoolean(3), "3 kept lines and no brace → keep")
  }

  test("c4 document gate drops brace and lorem ipsum pages whole") {
    val keptLines = Seq(
      "This line has the five words needed.",
      "A second kept line stays in order!",
      "And a third survives the cut?")
    val out = QualityFilters.withC4Clean(Seq(
        (1L, (keptLines :+ "code { margin: 0; }").mkString("\n")),
        (2L, (keptLines :+ "Lorem Ipsum dolor sit amet.").mkString("\n")),
        (3L, "Only two good lines exist here.\nSo the page must go away now.")
      ).toDF("doc_id", "text"))
      .select("doc_id", "keep_doc").as[(Long, Boolean)].collect().toMap
    assert(!out(1L) && !out(2L) && !out(3L))
  }

  test("stripBoilerplate: frequent lines go everywhere, unique lines stay") {
    val docs = Seq(
      (1L, "alpha unique one\nSubscribe now!\nbody text one"),
      (2L, "beta unique two\nSubscribe   NOW!\nbody text two"), // ws+case variant
      (3L, "gamma unique three\nSubscribe now!\nbody text three"),
      (4L, "delta unique four\nno plug here\nbody text four")
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "clean_text", "n_paras", "n_kept")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    // the subscribe line (normalized: case+whitespace folded) hit 3 docs →
    // ALL occurrences dropped, including the variant spelling
    assert(out(0).getString(1) == "alpha unique one\nbody text one")
    assert(out(1).getString(1) == "beta unique two\nbody text two")
    assert(out(2).getString(1) == "gamma unique three\nbody text three")
    // doc 4 had no boilerplate: untouched
    assert(out(3).getString(1) ==
      "delta unique four\nno plug here\nbody text four")
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((3L, 2L), (3L, 2L), (3L, 2L), (3L, 3L)))
  }

  test("stripBoilerplate: blank separator lines are never boilerplate") {
    val docs = Seq(
      (1L, "a\n\nshared line\n\nz"),
      (2L, "b\n\nshared line\n\n"),
      (3L, "c\n\nshared line")
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").select("clean_text").as[String].collect()
    // 'shared line' goes; the empty lines (in >= 3 docs too) survive
    assert(out.toSeq == Seq("a\n\n\nz", "b\n\n\n", "c\n"))
  }

  test("stripBoilerplate: a doc that is pure boilerplate disappears") {
    val docs = Seq(
      (1L, "the plug"), (2L, "the plug"), (3L, "the plug"),
      (4L, "the plug\nbut also content")
    ).toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(docs, "doc_id", "text", minDocs = 3)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(4L))
    assert(out.select("clean_text").as[String].head() == "but also content")
  }

  test("withDomainQuality: per-domain count and floored integer mean") {
    val docs = Seq(
      (1L, "https://www.example.com/a", 100L),
      (2L, "https://blog.example.com/b", 201L),
      (3L, "https://other.net/c", 7L)
    ).toDF("doc_id", "url", "q")
    val out = WebUrl.withDomainQuality(docs, "url", "q")
      .select("doc_id", "reg_domain", "domain_docs", "domain_mean_scaled")
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, "example.com", 2L, 150L))
    assert(out(1) == Row(2L, "example.com", 2L, 150L))
    assert(out(2) == Row(3L, "other.net", 1L, 7L))
  }
}
