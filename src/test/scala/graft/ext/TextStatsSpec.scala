package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).collect()(0).get(0)

  test("unigramLogProbScore: common prose scores above rare-token soup") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat again"),
      (2L, "the cat sat on the mat and the dog sat there"),
      (3L, "zxqv jkwp mntb vrgh qplx wzfy")  // every token unique -> rare
    ).toDF("doc_id", "text")
    val out = TextStats.unigramLogProbScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 == 11L && out(3L)._1 == 6L)
    // docs 1/2 reuse corpus-frequent tokens; doc 3 is all hapax tokens
    // with p = 1/N each -> mean ln p = ln(1/N), the floor of the scale
    assert(out(3L)._2 < out(1L)._2 && out(3L)._2 < out(2L)._2)
    val n = 11 + 11 + 6
    assert(math.abs(out(3L)._2 - math.log(1.0 / n)) < 1e-9)
    // deterministic across repartitionings (the integer-sum contract)
    val re = TextStats.unigramLogProbScore(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.forall { case (k, (_, v)) => re(k) == v })
  }

  test("stripHtml: blocks dropped, tags space out, entities decode ONE level") {
    def strip(t: String) = one(TextStats.stripHtml(col("t")), t).asInstanceOf[String]
    assert(strip("<p>hello</p><p>world</p>") == "hello world",
      "adjacent block tags must not glue words")
    assert(strip("a<script>var s = '<b>x</b>';</script>b") == "a b",
      "script contents (even holding tags) are not text")
    assert(strip("<STYLE>p{}</STYLE>keep") == "keep", "case-insensitive blocks")
    assert(strip("x<!-- note -->y") == "x y")
    assert(strip("&amp;amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end")
      == "&amp; <tag> \"q\" 's' end",
      "exactly one decode level; double-encoded stays encoded once")
  }

  test("repetition signals: duplicate n-gram fractions and top-token share") {
    def d2(t: String) = one(TextStats.duplicateNgramFraction(col("t"), 2), t)
      .asInstanceOf[Double]
    def top(t: String) = one(TextStats.topTokenShare(col("t")), t)
      .asInstanceOf[Double]
    // "a a a a": 3 bigram windows, 1 distinct -> 2/3 duplicated; top 1.0
    assert(math.abs(d2("a a a a") - 2.0 / 3) < 1e-12)
    assert(top("a a a a") == 1.0)
    // all-distinct prose: nothing duplicated, top token share = 1/n
    assert(d2("w x y z") == 0.0)
    assert(top("w x y z") == 0.25)
    // "spam spam ham spam": 3 distinct bigrams of 3 windows -> 0; top 3/4
    assert(d2("spam spam ham spam") == 0.0)
    assert(top("spam spam ham spam") == 0.75)
  }

  test("wordCount / bpeish token count") {
    assert(one(TextStats.wordCount(col("t")), "a bb  ccc") == 3)
    // letters run + digits run + punct singles: [hello][123][!][!]
    assert(one(TextStats.bpeishTokenCount(col("t")), "hello123!!") == 4)
  }

  test("punctRatio counts declared punctuation class only") {
    val r = one(TextStats.punctRatio(col("t")), "ab,.!?").asInstanceOf[Double]
    assert(math.abs(r - 4.0 / 6.0) < 1e-12)
    assert(one(TextStats.punctRatio(col("t")), "").asInstanceOf[Double] == 0.0)
  }

  test("stopwordRatio on known mix") {
    val r = one(TextStats.stopwordRatio(col("t")), "the cat and dog")
      .asInstanceOf[Double]
    assert(math.abs(r - 0.5) < 1e-12) // the, and of 4 tokens
  }

  test("meanWordLength") {
    val r = one(TextStats.meanWordLength(col("t")), "ab abcd").asInstanceOf[Double]
    assert(math.abs(r - 3.0) < 1e-12)
  }

  test("qualityScore: good prose scores 1.0, garbage scores low") {
    val good = "the quick brown fox jumps over the lazy dog and runs far away today"
    val punct = "!!! ??? ... ;;; ,,, (((" // all punctuation
    assert(one(TextStats.qualityScore(col("t")), good) == 1.0)
    // garbage keeps only the length + word-length points (5/10)
    assert(one(TextStats.qualityScore(col("t")), punct)
      .asInstanceOf[Double] <= 0.5)
  }

  test("langId: marker words dominate; und when no markers") {
    assert(one(TextStats.langId(col("t")), "the cat is in the house") == "en")
    assert(one(TextStats.langId(col("t")), "el gato y la casa de los perros") == "es")
    assert(one(TextStats.langId(col("t")), "der hund ist nicht von hier") == "de")
    assert(one(TextStats.langId(col("t")), "zzz qqq xxx") == "und")
  }

  test("langIdCharNgram: trigram profiles identify language, und on noise") {
    assert(one(TextStats.langIdCharNgram(col("t")),
      "the weather is that of the north with the wind") == "en")
    assert(one(TextStats.langIdCharNgram(col("t")),
      "los perros de las casas del que") == "es")
    // inflected/partial forms still hit boundary trigrams (" de", "der"…)
    assert(one(TextStats.langIdCharNgram(col("t")),
      "kindern dieser nichts istig") == "de")
    assert(one(TextStats.langIdCharNgram(col("t")), "zzzz qqqq") == "und")
  }

  test("langId tie-break: first language in marker order wins") {
    // 'la' is a marker for both es and fr → es (earlier) must win a pure tie
    assert(one(TextStats.langId(col("t")), "la la") == "es")
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    val a = one(TextStats.fingerprint(col("t")), "Hello  World")
    val b = one(TextStats.fingerprint(col("t")), "hello world")
    val c = one(TextStats.fingerprint(col("t")), "hello worlds")
    assert(a == b && a != c)
  }

  test("winnowing fingerprints: stable under edits far away") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val edited = base + " extra"
    val fa = one(TextStats.winnowingFingerprints(col("t")), base)
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    val fb = one(TextStats.winnowingFingerprints(col("t")), edited)
      .asInstanceOf[scala.collection.Seq[Long]].toSet
    val overlap = (fa & fb).size.toDouble / fa.size
    assert(overlap > 0.7, s"overlap $overlap") // local edit ≠ global change
  }

  test("withStats appends the full column set") {
    val out = TextStats.withStats(Seq((1L, "the cat")).toDF("doc_id", "text"))
    val cols = out.columns.toSet
    assert(Set("n_tokens", "n_bpeish_tokens", "punct_ratio", "stopword_ratio",
      "mean_word_len", "quality_score", "lang_pred", "fingerprint")
      .subsetOf(cols))
  }

  test("redactPii scrubs emails, IPv4, digit runs — in that pass order") {
    val in = "mail bob.smith+x@corp.example.org from 192.168.1.200, acct 1234567890, v1.2"
    val out = one(TextStats.redactPii(col("t")), in).asInstanceOf[String]
    assert(out == "mail <EMAIL> from <IP>, acct <NUM>, v1.2")
    // IP octets are consumed by the IP pass, never by the digit-run pass;
    // short digit runs survive
    val ipOnly = one(TextStats.redactPii(col("t")), "ip 10.0.0.1 build 12345")
      .asInstanceOf[String]
    assert(ipOnly == "ip <IP> build 12345")
  }

  test("piiCount audits match counts per pattern") {
    val in = "a@b.co and c@d.org via 10.0.0.1"
    assert(one(TextStats.piiCount(col("t"), TextStats.EmailPattern), in) == 2L)
    assert(one(TextStats.piiCount(col("t"), TextStats.Ipv4Pattern), in) == 1L)
  }

  test("bm25PerTerm: saturation and length normalization rank as expected") {
    val docs = Seq(
      (1L, "spark spark spark spark engine"),             // high tf, short
      (2L, "spark engine " + Seq.fill(50)("filler").mkString(" ")), // tf=1, long
      (3L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val out = TextStats.bm25PerTerm(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out.keySet == Set(1L, 2L)) // doc 3 has no query term
    // higher tf in a shorter doc must outscore tf=1 in a padded doc
    assert(out(1L) > out(2L))
    // saturation: quadrupling tf must not quadruple the score
    val tf = TextStats.bm25PerTerm(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tf(1L) == 4L && tf(2L) == 1L && out(1L) < 4.0 * out(2L))
  }

  test("vocabCoverage: ranks by count desc, cumulative share reaches 1") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b z")).toDF("doc_id", "text")
    val out = TextStats.vocabCoverage(docs).orderBy("rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", 4L), ("b", 3L), ("c", 1L), ("z", 1L))) // tie c<z lexicographic
    assert(out.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(math.abs(out.last._4 - 1.0) < 1e-15)
    assert(out.map(_._4).toSeq == out.map(_._4).sorted.toSeq) // monotone
  }

  test("cooccurrenceLift: terms always together get lift > independent pairs") {
    // x and y co-occur in every doc; x and q co-occur in half of x's docs
    val docs = Seq(
      (1L, "x y filler1"), (2L, "x y filler2"),
      (3L, "x y q"), (4L, "x y q"),
      (5L, "q alone here"), (6L, "q alone there")
    ).toDF("doc_id", "text")
    val out = TextStats.cooccurrenceLift(docs, "doc_id", "text", minPairs = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    // x,y: n_ab=4, n_a=n_b=4, n=6 -> lift = 24/16 = 1.5
    assert(out(("x", "y")) == 1.5)
    // q,x: n_ab=2, n_q=4, n_x=4 -> lift = 12/16 = 0.75 (less associated)
    assert(out(("q", "x")) == 0.75)
    assert(out(("x", "y")) > out(("q", "x")))
  }

  test("bigramLogProbScore: hand-computed interpolated transitions") {
    def S(p: Double): Long = math.floor(math.log(p) * 1e12).toLong
    val docs = Seq((1L, "a b a b"), (2L, "b c"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = TextStats.bigramLogProbScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // N=7; c2: a 2, b 3, c 2; bigrams doc1 (a,b)×2 (b,a), doc2 (b,c);
    // c12: (a,b) 2, (b,a) 1, (b,c) 1; c1: a 2, b 2
    val pab = 0.75 * (2.0 / 2.0) + 0.25 * (3.0 / 7.0)
    val pba = 0.75 * (1.0 / 2.0) + 0.25 * (2.0 / 7.0)
    val pbc = 0.75 * (1.0 / 2.0) + 0.25 * (2.0 / 7.0)
    assert(out(1L) == ((3L, (2 * S(pab) + S(pba)).toDouble / 1e12 / 3L)))
    assert(out(2L) == ((1L, S(pbc).toDouble / 1e12 / 1L)))
    assert(!out.contains(3L), "single-token doc has no transitions")
    // rare transition of common words scores BELOW a common transition
    assert(S(pba) < S(pab))
  }

  test("naiveBayesScore: hand-computed llr, unseen tokens, null hygiene") {
    def S(x: Double): Long = math.floor(math.log(x) * 1e12).toLong
    val seed = Seq(
      (Some(true), "good clean prose"), (Some(true), "clean text"),
      (Some(false), "spam spam buy"), (Some(false), "buy now"),
      (None, "zz zz zz"),                      // null label: ignored entirely
      (Some(true), null.asInstanceOf[String])  // null text: ignored
    ).toDF("label", "text")
    val docs = Seq(
      (1L, "clean spam"), (2L, "clean clean"), (3L, "zz unseen"),
      (4L, "good clean prose"), (5L, "spam buy now"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextStats.naiveBayesScore(docs, seed, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // balanced seed: prior = S(2)-S(2) = 0; totals (5+7) vs (5+7): denom = 0
    assert(out.size == 5) // null-text doc dropped
    assert(out(1L) == ((2L, 0.0)))          // w(clean)=S(3), w(spam)=-S(3): cancel
    assert(out(2L)._2 == 2 * S(3.0) / 1e12) // 2 × (S(3)−S(1))
    assert(out(3L) == ((2L, 0.0)))          // unseen (null-label tokens excluded)
    assert(out(4L)._2 > 0 && out(5L)._2 < 0)
  }

  test("naiveBayesScore: unbalanced classes use exact prior and denominators") {
    def S(x: Double): Long = math.floor(math.log(x) * 1e12).toLong
    val seed = Seq(
      (true, "a b"), (false, "a"), (false, "c c c")
    ).toDF("label", "text")
    // totals: pos tokens 2, neg tokens 4, vocab {a,b,c} → V=3;
    // prior = S(1)−S(2), denom = S(5)−S(7)
    val prior = S(1.0) - S(2.0)
    val denom = S(5.0) - S(7.0)
    val docs = Seq((1L, "z"), (2L, "")).toDF("doc_id", "text")
    val out = TextStats.naiveBayesScore(docs, seed, "doc_id", "text", "label")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // unseen token: score = (prior + 0 − 1·denom)/1e12
    assert(out(1L) == ((1L, (prior - denom) / 1e12)))
    // empty text = the single empty token, itself unseen here
    assert(out(2L) == ((1L, (prior - denom) / 1e12)))
  }

  test("encodingQuality: the three mojibake signals count independently") {
    val docs = Seq(
      (1L, "caf\u00c3\u00a9 and \u00c3\u00a8"), // two UTF-8-as-latin1 digraphs
      (2L, "x\ufffd\ufffdy"),                     // two replacement chars
      (3L, "a\u0085b\u0092"),                     // two C1 controls
      (4L, "perfectly clean ascii"),
      (5L, ""),                                 // empty: ratio 0, no div-by-zero
      (6L, null.asInstanceOf[String])           // null: filtered
    ).toDF("doc_id", "text")
    val out = TextStats.encodingQuality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 5)
    assert(out(1L).getAs[Long]("n_latin1_utf8") == 2
      && out(1L).getAs[Long]("n_replacement") == 0)
    assert(out(2L).getAs[Long]("n_replacement") == 2)
    assert(out(3L).getAs[Long]("n_c1_controls") == 2)
    assert(out(4L).getAs[Double]("bad_ratio") == 0.0)
    assert(out(5L).getAs[Double]("bad_ratio") == 0.0)
    assert(out(2L).getAs[Double]("bad_ratio") == 2.0 / 4.0)
    // the © continuation codepoint is NOT independently a C1 hit
    assert(out(1L).getAs[Long]("n_c1_controls") == 0)
    // uppercase-accent mojibake ("Ã" + C1 continuation) is ONE event:
    // it hits both the C1 and digraph patterns, and the ratio subtracts
    // the overlap so it weighs the same as a lowercase digraph
    val upper = TextStats.encodingQuality(
      Seq((9L, "xÃy")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(upper.getAs[Long]("n_c1_controls") == 1)
    assert(upper.getAs[Long]("n_latin1_utf8") == 1)
    assert(upper.getAs[Double]("bad_ratio") == 1.0 / 4.0)
  }

  test("scriptProfile: counts, first-wins dominant, exact mixed flag") {
    val docs = Seq(
      (1L, "hello world"),                    // pure latin
      (2L, "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"), // pure cyrillic
      (3L, "hello \u043c\u0438\u0440 \u4f60\u597d"), // latin 5, cyr 3, cjk 2
      (4L, "\u0645\u0631\u062d\u0628\u0627 hi"),     // arabic 5, latin 2
      (5L, "12345 ... !!"),                   // no script chars at all
      (6L, "aaaaaaaaa \u0431")               // 9 latin, 1 cyr: exactly 10% -> mixed
    ).toDF("doc_id", "text")
    val out = TextStats.scriptProfile(docs, "doc_id", "text")
      .select("doc_id", "n_latin", "n_cyrillic", "n_arabic", "n_cjk",
        "script_chars", "dominant_script", "is_mixed")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(6) == "latin" && !out(1L).getBoolean(7))
    assert(out(2L).getLong(2) == 9L &&
      out(2L).getString(6) == "cyrillic" && !out(2L).getBoolean(7))
    assert(out(3L).getLong(1) == 5L && out(3L).getLong(2) == 3L &&
      out(3L).getLong(4) == 2L && out(3L).getLong(5) == 10L)
    assert(out(3L).getString(6) == "latin" && out(3L).getBoolean(7))
    assert(out(4L).getString(6) == "arabic" && out(4L).getBoolean(7))
    assert(out(5L).getLong(5) == 0L &&
      out(5L).getString(6) == "none" && !out(5L).getBoolean(7))
    // exactly-at-the-10%-boundary minority: (10-9)*10 >= 10 -> mixed
    assert(out(6L).getBoolean(7))
    // just UNDER the boundary: 1 of 11 (9.1%) stays pure
    val under = TextStats.scriptProfile(
        Seq((8L, "aaaaaaaaaa \u0431")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("is_mixed").collect()(0).getBoolean(0)
    assert(!under)
    // ties resolve to the EARLIEST script in ScriptRanges order
    val tie = TextStats.scriptProfile(
        Seq((7L, "ab \u0431\u0432")).toDF("doc_id", "text"), "doc_id", "text")
      .select("dominant_script").collect()(0).getString(0)
    assert(tie == "latin")
  }

  test("trigramLogProbScore: broken trigrams score below real phrases") {
    // "of the" / "the of" bigrams all exist, but doc 3's TRIGRAMS are
    // unseen elsewhere only in order - the trigram term must separate it
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat on the mat"),
      (2L, "the cat sat on the mat and the dog sat on the rug"),
      (3L, "on the on the on the on the on the on the")
    ).toDF("doc_id", "text")
    val out = TextStats.trigramLogProbScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._2 > out(3L)._2, s"$out")
    // score_e6 is the floored e6-scaled mean of the same quantity
    out.values.foreach { case (e6, lp) =>
      assert(math.abs(e6 - math.floor(lp * 1e6)) <= 1.0) }
    // < 3 tokens: no transitions, no row
    val tiny = TextStats.trigramLogProbScore(
      Seq((9L, "two words"), (10L, "three word doc")).toDF("doc_id", "text"),
      "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(tiny == Set(10L))
    // weights must be positive and sum to 1
    intercept[IllegalArgumentException](
      TextStats.trigramLogProbScore(docs, "doc_id", "text", 0.5, 0.5, 0.5))
  }

  test("sentenceStats: segmentation, exact counts, floor-scaled mean") {
    val in = Seq(
      (1L, "one two three. four five! six?"),
      (2L, "no terminator at all"),
      (3L, "..."),
      (4L, "a!!b"))
      .toDF("doc_id", "text")
    val got = TextStats.sentenceStats(in, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(1L) == (3L, 6L, 3L, 2000000L))
    assert(got(2L) == (1L, 4L, 4L, 4000000L), "unterminated text is one sentence")
    assert(got(3L) == (0L, 0L, 0L, 0L), "punctuation-only text has none")
    assert(got(4L) == (2L, 2L, 1L, 1000000L), "terminator runs collapse")
  }

  test("hashedTermCounts: sparse triples, default hash in range, custom hash") {
    val docs = Seq((1L, "aa bb aa"), (2L, "cc")).toDF("doc_id", "text")
    val fixed = TextStats.hashedTermCounts(docs, "doc_id", "text", 8,
        Some(t => length(t) % 8))
      .as[(Long, Int, Long)].collect().toSet
    // aa and bb both hash to len 2 % 8 = 2 → counts merge in the bucket
    assert(fixed == Set((1L, 2, 3L), (2L, 2, 1L)))
    val dft = TextStats.hashedTermCounts(docs, "doc_id", "text", 8)
      .as[(Long, Int, Long)].collect()
    assert(dft.forall(r => r._2 >= 0 && r._2 < 8), "xxhash64 dims in range")
    assert(dft.map(r => (r._1, r._3)).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap == Map(1L -> 3L, 2L -> 1L),
      "counts conserved across buckets")
  }

  test("aucExact: hand-checked values — separable, ties, degenerate") {
    def auc(rows: Seq[(Double, Boolean)]): Option[Long] = {
      val r = TextStats.aucExact(rows.toDF("score", "label"),
        "score", "label").collect()(0)
      if (r.isNullAt(2)) None else Some(r.getLong(2))
    }
    // perfectly separable → 1.0
    assert(auc(Seq((0.9, true), (0.8, true), (0.2, false))) == Some(1000000L))
    // perfectly inverted → 0.0
    assert(auc(Seq((0.1, true), (0.9, false))) == Some(0L))
    // all scores tied → 0.5 exactly (half credit)
    assert(auc(Seq((0.5, true), (0.5, false), (0.5, false))) == Some(500000L))
    // one discordant pair of four: AUC = 3.5/4... compute: pos .9/.4,
    // neg .6/.1 → pairs: (.9>.6),(.9>.1),(.4<.6),(.4>.1) → 3/4
    assert(auc(Seq((0.9, true), (0.4, true), (0.6, false), (0.1, false)))
      == Some(750000L))
    // degenerate: single class → null
    assert(auc(Seq((0.9, true), (0.1, true))) == None)
  }

  test("cohensKappa: hand-checked confusion, perfect and chance-level") {
    def kappa(rows: Seq[(String, String)]): (Long, Long, Long, Double) = {
      val r = TextStats.cohensKappa(rows.toDF("a", "b"), "a", "b").collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }
    val (n1, d1, _, k1) = kappa(Seq(("x", "x"), ("y", "y"), ("x", "x")))
    assert(n1 == 3L && d1 == 3L && k1 == 1.0, "perfect agreement")
    // the classic textbook 2x2: a=20,b=5,c=10,d=15 → kappa = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val (_, _, _, k2) = kappa(rows)
    // D=35, N=50, S=rowY*colY+rowN*colN=25*30+25*20=1250;
    // kappa=(35*50-1250)/(2500-1250)=500/1250=0.4
    assert(k2 == 0.4)
  }

  test("calibrationBins: bin edges, exact rates, top bin inclusive") {
    val rows = Seq((0.05, true), (0.05, false), (0.05, false),
      (0.95, true), (1.0, true))
    val got = TextStats.calibrationBins(rows.toDF("score", "label"),
        "score", "label", bins = 10)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got(0) == (3L, 1L, 333333L, 50000L))
    // score 1.0 clamps into bin 9, not a phantom bin 10
    assert(got(9) == (2L, 2L, 1000000L, 975000L))
  }

  test("phraseMatch: consecutive only, overlapping counted, multi-word") {
    val docs = Seq(
      (1L, "a b c a b"),     // "a b" twice
      (2L, "a c b"),          // non-adjacent: no match
      (3L, "a a a a"),        // "a a" overlapping: 3 matches
      (4L, "x y z"),
      (5L, "a b c d"))        // 3-word phrase target
      .toDF("doc_id", "text")
    val ab = TextStats.phraseMatch(docs, "doc_id", "text", "a b")
      .as[(Long, Long)].collect().toMap
    assert(ab == Map(1L -> 2L, 5L -> 1L))
    val aa = TextStats.phraseMatch(docs, "doc_id", "text", "a a")
      .as[(Long, Long)].collect().toMap
    assert(aa == Map(3L -> 3L), "overlapping matches all count")
    val abc = TextStats.phraseMatch(docs, "doc_id", "text", "A B C")
      .as[(Long, Long)].collect().toMap
    assert(abc == Map(1L -> 1L, 5L -> 1L), "case-folded 3-word phrase")
    intercept[IllegalArgumentException](
      TextStats.phraseMatch(docs, "doc_id", "text", "single"))
  }

  test("sentenceStats: null ids dropped; text column not in output") {
    val in = Seq((Some(1L), "x."), (None, "y."))
      .toDF("doc_id", "text")
    val out = TextStats.sentenceStats(in, "doc_id", "text")
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_sentences", "total_words", "max_words", "mean_words_e6"))
    assert(out.count() == 1L)
  }

  test("scorePercentiles: strictly-below counts, ties share, exact floors") {
    val d = Seq((1L, 0.2), (2L, 0.5), (3L, 0.5), (4L, 0.9), (5L, 0.1))
      .toDF("id", "s")
    val got = TextStats.scorePercentiles(d, "id", "s")
      .select("id", "n_below", "pct_e6")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(5L) == ((0L, 0L)))
    assert(got(1L) == ((1L, 200000L)))
    assert(got(2L) == ((2L, 400000L)) && got(3L) == got(2L), "ties share")
    assert(got(4L) == ((4L, 800000L)))
    // null scores/ids drop, don't count
    val withNull = Seq((Option(1L), Option(0.3)), (Option(2L), None),
      (Option.empty[Long], Option(0.1))).toDF("id", "s")
    assert(TextStats.scorePercentiles(withNull, "id", "s").count() == 1L)
  }

  test("scorePercentiles/aucExact: two-phase bucket/carry matches a " +
      "direct rank on a high-distinct continuous score") {
    // 20k rows, ~20k DISTINCT doubles (the regime where the old
    // unpartitioned vocabulary window became a corpus-sized single-task
    // sort), plus planted exact ties; reference computed locally
    val rnd = new scala.util.Random(11)
    val rows = (0 until 20000).map { i =>
      val s = if (i % 97 == 0) 0.5 else rnd.nextDouble()
      (i.toLong, s, rnd.nextBoolean())
    }
    val df = rows.toDF("id", "s", "y")
    val out = TextStats.scorePercentiles(df, "id", "s")
    // plan shape: every window is partitioned (constant-key carry over
    // the ≤1026-row bucket frame included)
    val unpart = out.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpart.isEmpty, "scorePercentiles plans an unpartitioned window")
    val got = out.select("id", "n_below", "pct_e6")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val sorted = rows.map(_._2).sorted
    val expectBelow = rows.map { case (id, s, _) =>
      id -> sorted.indexWhere(_ >= s).toLong // strictly-below count
    }.toMap
    rows.foreach { case (id, _, _) =>
      assert(got(id)._1 == expectBelow(id), s"n_below for id $id")
      assert(got(id)._2 == expectBelow(id) * 1000000L / rows.size,
        s"pct_e6 for id $id")
    }
    // AUC on the same frame: exact tie-aware Mann-Whitney reference
    val pos = rows.filter(_._3).map(_._2)
    val neg = rows.filterNot(_._3).map(_._2)
    val negSorted = neg.sorted
    def countBelow(x: Double): (Long, Long) = {
      val lo = negSorted.indexWhere(_ >= x) match {
        case -1 => negSorted.size; case k => k
      }
      val hi = negSorted.indexWhere(_ > x) match {
        case -1 => negSorted.size; case k => k
      }
      (lo.toLong, (hi - lo).toLong) // (strictly below, tied)
    }
    val u2 = pos.iterator.map { x =>
      val (b, t) = countBelow(x); 2L * b + t
    }.sum
    val expectAuc = u2 * 1000000L / (2L * pos.size * neg.size)
    val aucRow = TextStats.aucExact(df, "s", "y").collect()(0)
    assert(aucRow.getLong(0) == pos.size.toLong &&
      aucRow.getLong(1) == neg.size.toLong)
    assert(aucRow.getLong(2) == expectAuc, "auc_e6 mismatch vs reference")
  }

  test("readability: hand-checked counts and score; degenerate null") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),   // 6 words, 2 sentences
      (2L, "word"),                        // 1 word, 1 sentence
      (3L, "...!!!")                       // no words, no sentences
    ).toDF("doc_id", "text")
    val got = TextStats.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    // canon doc1: "the cat sat. the dog ran!" -> vowel groups:
    // e,a,a,e,o,a = 6
    assert(got(1L)._1 == 6L && got(1L)._2 == 2L && got(1L)._3 == 6L)
    val expect1 = math.floor(1000.0 *
      (206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))).toLong
    assert(got(1L)._4 == Some(expect1))
    assert(got(2L)._1 == 1L && got(2L)._2 == 1L && got(2L)._3 == 1L)
    assert(got(3L)._1 == 1L || got(3L)._1 == 0L) // "...!!!" has no spaces
    assert(got(3L)._2 == 0L && got(3L)._4.isEmpty, "no sentences -> null")
  }

  test("kneserNeyBigramScore: hand-checked probabilities and floors") {
    // cvw: (a,b)=1, (c,b)=1, (d,d)=3; cv: a=1, c=1, d=3;
    // n1v: all 1; n1w: b=2, d=1; nall=3
    val docs = Seq((1L, "a b"), (2L, "c b"), (3L, "d d d d"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextStats.kneserNeyBigramScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def lp(p: Double): Long = math.floor(math.log(p) * 1e12).toLong
    def scoreE6(lps: Seq[Long]): Long =
      math.floor(lps.sum.toDouble / lps.size / 1e6).toLong
    // P(b|a) = (1-.75)/1 + (.75·(1/1))·(2/3); continuation (2/3) is what
    // raw-unigram backoff would NOT give b (freq 2 of 8 tokens)
    val pAB = ((1.0 - 0.75) / 1.0) + ((0.75 * (1.0 / 1.0)) * (2.0 / 3.0))
    assert(pAB == 0.75)
    val pDD = ((3.0 - 0.75) / 3.0) + ((0.75 * (1.0 / 3.0)) * (1.0 / 3.0))
    assert(got(1L)._1 == 1L && got(1L)._2 == scoreE6(Seq(lp(pAB))))
    assert(got(3L)._1 == 3L &&
      got(3L)._2 == scoreE6(Seq(lp(pDD), lp(pDD), lp(pDD))))
    assert(!got.contains(4L), "single-token doc emits no row")
    assert(got(1L)._3 == lp(pAB).toDouble / 1e12, "mean_lp exact")
    intercept[IllegalArgumentException](
      TextStats.kneserNeyBigramScore(docs, "doc_id", "text", discount = 1.0))
  }

  test("repetitionSignals: hand-checked line/gram masses, ties, flags") {
    // doc 1: "a b a b a b" → 2-grams: "a b"×3, "b a"×2 → top2 = 3·3 = 9
    //        text_chars = 11; lines: one line, no dups
    // doc 2: dup lines ("x" twice of 3 lines) + blank/whitespace lines
    // doc 3: a 5-gram repeated twice (12 words: w1..w5 w1..w5 u v)
    // doc 4: empty text
    val d3 = "p q r s t p q r s t u v"
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "x\n  \nx\t\ny\n"),
      (3L, d3),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextStats.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getAs[Long]("n_words") == 6L && r1.getAs[Long]("text_chars") == 11L)
    assert(r1.getAs[Long]("n_lines") == 1L && r1.getAs[Long]("dup_line_count") == 0L)
    assert(r1.getAs[Long]("top_gram_chars_2") == 9L, "top 2-gram 'a b'x3 = 9 chars")
    // "a b a" ×2 → top3 = 2·5 = 10; "a b a b"×2 ... 4-gram: "a b a b"×2? grams:
    // positions: (a b a b),(b a b a),(a b a b) → top4 = 2·7 = 14
    assert(r1.getAs[Long]("top_gram_chars_3") == 10L)
    assert(r1.getAs[Long]("top_gram_chars_4") == 14L)
    assert(r1.getAs[Boolean]("flag_top_2gram"), "9·100 > 11·20")

    val r2 = out(2L)
    assert(r2.getAs[Long]("n_lines") == 3L, "blank/whitespace lines dropped")
    assert(r2.getAs[Long]("dup_line_count") == 2L &&
      r2.getAs[Long]("dup_line_chars") == 2L)
    assert(r2.getAs[Long]("line_chars_total") == 3L)
    assert(r2.getAs[Boolean]("flag_dup_line"), "2/3 > 0.30")
    assert(r2.getAs[Boolean]("flag_dup_line_char"), "2/3 > 0.20")

    val r3 = out(3L)
    // dup 5-grams: "p q r s t" ×2 (9 chars) → 2·9 = 18; text_chars = 23
    assert(r3.getAs[Long]("dup_gram_chars_5") == 18L)
    assert(r3.getAs[Long]("dup_gram_chars_6") == 0L)
    assert(r3.getAs[Boolean]("flag_dup_5gram"), "18·100 > 23·15")

    val r4 = out(4L)
    assert(r4.getAs[Long]("n_words") == 0L && r4.getAs[Long]("text_chars") == 0L)
    assert(r4.getAs[Long]("n_lines") == 0L)
    assert((2 to 4).forall(n => r4.getAs[Long](s"top_gram_chars_$n") == 0L))
    assert(!r4.getAs[Boolean]("flag_dup_line") && !r4.getAs[Boolean]("flag_top_2gram"),
      "zero denominators never flag")
  }

  test("mixedLanguageProfile: per-paragraph langId, argmax ties, empty paras") {
    val en = "the quick brown fox and the lazy dog"
    val de = "der schnelle braune fuchs und der hund"
    val docs = Seq(
      (1L, s"$en\n\n$de\n\n$en"),         // mixed, en dominant 2-1
      (2L, s"$en\n\n$en"),                // pure
      (3L, s"$en\n\n$de"),                // 1-1 tie → lexicographically
                                          // smaller tag wins
      (4L, s"$en\n\n   \n\n$de"),         // blank paragraph dropped
      (5L, "zzz qqq xxx")                 // no markers → und
    ).toDF("id", "text")
    val got = TextStats.mixedLanguageProfile(docs, "id", "text")
      .as[(Long, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3L, 2L, "en", true)))
    assert(got(2L) == ((2L, 1L, "en", false)))
    val tie = got(3L)
    assert(tie._1 == 2L && tie._2 == 2L && tie._4)
    assert(tie._3 == Seq("de", "en").min, "tie must break to the smallest tag")
    assert(got(4L) == ((2L, 2L, "de", true)))
    assert(got(5L)._3 == "und")
  }

  test("importanceWeights: in-memory replay; on-target docs score higher") {
    val raw = Seq(
      (1L, "solar panels convert sunlight into power"),
      (2L, "solar panels power the grid"),
      (3L, "cats chase laser dots all day"),
      (4L, "dogs chase cats around the yard"),
      (5L, "solar power beats coal power today")).toDF("doc_id", "text")
    val target = Seq(
      (10L, "solar panels power homes"),
      (11L, "solar power is clean power")).toDF("doc_id", "text")
    val dims = 16
    val got = TextStats.importanceWeights(raw, target, "doc_id", "text",
        dims = dims, n = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // in-memory reference with the same xxhash bucketing read back from
    // the engine's own gram hash (bucketing is shared; the ln/floor
    // arithmetic is what this test replays independently)
    def grams(t: String): Seq[String] = {
      val toks = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      if (toks.length <= 2) Seq(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val hashOf: Map[String, Int] = {
      val all = (Seq(raw, target).flatMap(df =>
        df.as[(Long, String)].collect().flatMap(r => grams(r._2)))).distinct
      val hdf = all.toDF("g")
        .select($"g", pmod(xxhash64($"g"), lit(dims.toLong)).cast("int").as("d"))
        .as[(String, Int)].collect()
      hdf.toMap
    }
    def counts(df: Seq[(Long, String)]): Map[(Long, Int), Long] =
      df.flatMap { case (id, t) => grams(t).filter(_.nonEmpty).map(g => (id, hashOf(g))) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rawRows = raw.as[(Long, String)].collect().toSeq
    val tgtRows = target.as[(Long, String)].collect().toSeq
    val rawC = counts(rawRows)
    val tDist = counts(tgtRows).groupBy(_._1._2).map { case (d, m) => d -> m.values.sum }
    val rDist = rawC.groupBy(_._1._2).map { case (d, m) => d -> m.values.sum }
    val (tt, tr) = (tDist.values.sum, rDist.values.sum)
    def s(x: Long): Long = math.floor(math.log(x.toDouble) * 1e12).toLong
    val expect = rawRows.map(_._1).map { id =>
      val mine = rawC.filter(_._1._1 == id)
      val lw = mine.map { case ((_, d), c) =>
        c * (s(tDist.getOrElse(d, 0L) + 1) - s(tt + dims) -
          s(rDist(d) + 1) + s(tr + dims))
      }.sum
      id -> ((mine.values.sum, lw))
    }.toMap
    assert(got == expect, s"got=$got expect=$expect")
    // semantic sanity: the solar docs outrank the cat/dog docs
    val lwOf = got.view.mapValues(_._2).toMap
    assert(Seq(1L, 2L, 5L).map(lwOf).min > Seq(3L, 4L).map(lwOf).max,
      s"on-target docs must outscore off-target: $lwOf")
  }
}
