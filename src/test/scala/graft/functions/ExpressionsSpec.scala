package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.logs.LogLineParser

/** Unit tests for the custom Catalyst expressions — each is exercised both
  * through the interpreted eval path (collect on tiny data hits codegen;
  * fallback covered via the helper directly) and end-to-end in a query.
  */
class ExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  test("VectorDot: float/double/mixed, null array, null elements") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val ff = df.select(VectorFunctions.vecDot($"f", $"f")).as[Double].collect()(0)
    assert(math.abs(ff - 14.0) < 1e-12)
    val fd = df.select(VectorFunctions.vecDot($"f", $"d")).as[Double].collect()(0)
    assert(math.abs(fd - 32.0) < 1e-12)
    val withNull = Seq((Option.empty[Array[Float]], Array(1.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.vecDot($"a", $"b")).collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("VectorDot: length mismatch uses common prefix") {
    val d = Seq((Array(1.0f, 2.0f, 9.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.vecDot($"a", $"b")).as[Double].collect()(0)
    assert(math.abs(d - 11.0) < 1e-12)
  }

  test("vecNorm / vecCosine") {
    val df = Seq((Array(3.0f, 4.0f), Array(6.0f, 8.0f))).toDF("a", "b")
    assert(math.abs(df.select(VectorFunctions.vecNorm($"a"))
      .as[Double].collect()(0) - 5.0) < 1e-12)
    assert(math.abs(df.select(VectorFunctions.vecCosine($"a", $"b"))
      .as[Double].collect()(0) - 1.0) < 1e-12)
  }

  test("ParseLogLine: one-pass struct matches the documented example line") {
    // the example line shape from FIXTURES.md / the reference slides
    val line = "79a5 example-bucket [06/Feb/2019:00:00:38 +0000] 192.0.2.3 " +
      "arn:aws:iam::123456789012:user/alice 3E57427F3EXAMPLE REST.GET.VERSIONING " +
      "awsexamplebucket \"GET /awsexamplebucket?versioning HTTP/1.1\" 200 - 113 - 7 " +
      "- \"-\" \"S3Console/0.4\" -"
    val parsed = LogLineParser.parse(Seq(line).toDF("value")).collect()(0)
    assert(parsed.getAs[String]("bucket_owner") == "79a5")
    assert(parsed.getAs[String]("s3_bucket") == "example-bucket")
    assert(parsed.getAs[java.sql.Timestamp]("request_time").toString
      == "2019-02-06 00:00:38.0")
    assert(parsed.getAs[String]("operation") == "REST.GET.VERSIONING")
    assert(parsed.getAs[Int]("http_status") == 200)
    assert(parsed.isNullAt(parsed.fieldIndex("error_code")))   // '-'
    assert(parsed.getAs[Long]("bytes_sent") == 113)
    assert(parsed.isNullAt(parsed.fieldIndex("object_size")))  // '-'
    assert(parsed.isNullAt(parsed.fieldIndex("referrer")))     // '"-"'
    assert(parsed.getAs[String]("user_agent") == "\"S3Console/0.4\"")
    assert(parsed.isNullAt(parsed.fieldIndex("version_id")))   // '-'
    assert(parsed.isNullAt(parsed.fieldIndex("error_line")))
  }

  test("ParseLogLine: miss → null struct → corrupt row") {
    val r = LogLineParser.parse(Seq("not a log line").toDF("value")).collect()(0)
    (0 until 18).foreach(i => assert(r.isNullAt(i), s"field $i"))
    assert(r.getAs[String]("error_line") == "not a log line")
  }

  test("MinHashSignature: deterministic, identical sets agree, length k") {
    val df = Seq(
      Seq("a b c", "b c d", "c d e"),
      Seq("a b c", "b c d", "c d e"),
      Seq("x y z", "y z w", "q r s")
    ).toDF("sh").select(SketchFunctions.minhashSignature($"sh", 32).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0).length == 32)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("SimHash: identical arrays equal; disjoint arrays far") {
    val df = Seq(
      Seq("alpha", "beta", "gamma", "delta"),
      Seq("alpha", "beta", "gamma", "delta"),
      Seq("one", "two", "three", "four")
    ).toDF("t").select(SketchFunctions.simhash($"t").as("sk"))
    val sk = df.as[Long].collect()
    assert(sk(0) == sk(1))
    assert(java.lang.Long.bitCount(sk(0) ^ sk(2)) > 10)
  }

  test("WordNgrams: windows, distinct, short input") {
    val out = Seq(Seq("a", "b", "c", "d"), Seq("a"), Seq("a", "b", "a", "b"))
      .toDF("t").select(SketchFunctions.wordNgrams($"t", 2).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c", "c d"))
    assert(out(1) == Seq("a"))
    assert(out(2) == Seq("a b", "b a")) // dup "a b" removed, order kept
  }

  test("MarkerCounts: multiplicity and multi-set membership") {
    val sets = Seq(Seq("la", "el"), Seq("la", "le"))
    val out = Seq(Seq("la", "la", "el", "zzz"))
      .toDF("t").select(SketchFunctions.markerCounts($"t", sets).as("c"))
      .as[Seq[Int]].collect()(0)
    assert(out == Seq(3, 2)) // set0: la,la,el; set1: la,la
  }

  test("MultiPatternCounts: matches a brute-force overlapping count exactly") {
    // every occurrence at every position, per pattern (overlapping incl.)
    def brute(text: String, p: String): Long =
      (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    val patterns = Seq("he", "she", "his", "hers", "aa")
    val texts = Seq(
      "ushers",          // classic: she, he, hers all end inside 'ushers'
      "aaaa",            // self-overlap: 'aa' occurs 3 times
      "hishershis",
      "no match here!?", // 'he' twice ('here'); others 0
      "")
    val got = texts.toDF("t")
      .select(MultiMatchFunctions.multiPatternCounts($"t", patterns))
      .as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, counts) =>
      assert(counts == patterns.map(p => brute(t, p)), s"text '$t'")
    }
    // null text stays null
    val n = Seq(Option.empty[String]).toDF("t")
      .select(MultiMatchFunctions.multiPatternCounts($"t", patterns))
      .collect()(0)
    assert(n.isNullAt(0))
    // empty pattern list / empty pattern fail loudly at construction
    intercept[IllegalArgumentException](new AhoCorasick(Nil))
    intercept[IllegalArgumentException](new AhoCorasick(Seq("ok", "")))
  }

  test("MultiPatternRedact: regexp_replace alternation semantics exactly") {
    // reference: Java regex alternation replaceAll — the same
    // leftmost-start, then-alternation-order, resume-after-match
    // semantics RE2's regexp_replace(…, 'g') uses for literal patterns
    def ref(text: String, pats: Seq[String], mask: String): String =
      java.util.regex.Pattern
        .compile(pats.map(java.util.regex.Pattern.quote).mkString("|"))
        .matcher(text)
        .replaceAll(java.util.regex.Matcher.quoteReplacement(mask))
    val patterns = Seq("she", "he", "hers", "aa", "then")
    val texts = Seq(
      "ushers",        // 'she' (leftmost) beats the 'he'/'hers' inside it
      "aaaa",          // non-overlap: two masks, not three
      "he then hers",  // 'he' inside 'then' vs list order: 'he' is first
      "xyz", "", "hehehe")
    for (mask <- Seq("[X]", "")) {
      val got = texts.toDF("t")
        .select(MultiMatchFunctions.multiPatternRedact($"t", patterns, mask))
        .as[String].collect()
      texts.zip(got).foreach { case (t, r) =>
        assert(r == ref(t, patterns, mask), s"text '$t' mask '$mask'")
      }
    }
    // a longer pattern can START earlier than an already-found shorter
    // one — selection is global, not end-order-greedy
    val g = Seq("xabcd").toDF("t")
      .select(MultiMatchFunctions.multiPatternRedact(
        $"t", Seq("bc", "abcd"), "#")).as[String].collect()(0)
    assert(g == "x#", "'abcd' (leftmost start) wins over earlier-ending 'bc'")
    // unicode masks and patterns survive the byte-level walk
    val u = Seq("caf\u00e9 bar").toDF("t")
      .select(MultiMatchFunctions.multiPatternRedact(
        $"t", Seq("caf\u00e9"), "\u2588")).as[String].collect()(0)
    assert(u == "\u2588 bar")
    // null text stays null
    val n = Seq(Option.empty[String]).toDF("t")
      .select(MultiMatchFunctions.multiPatternRedact($"t", Seq("x"), "y"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("UnicodeNormalize: all four forms match java.text.Normalizer") {
    val samples = Seq(
      "e\u0301clair",          // combining acute: NFC joins to precomposed
      "\u00e9clair",           // precomposed: NFC no-op, NFD decomposes
      "\uFF28\uFF25llo",       // full-width HE: NFKC folds to ASCII
      "\uFB01le",              // fi ligature: NFKC folds to "file"
      "plain ascii", "")
    val df = samples.toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = df.select(
        TextNormalizeFunctions.unicodeNormalize($"s", form)).as[String].collect()
      val want = samples.map(s =>
        java.text.Normalizer.normalize(s, UnicodeNormalize.formOf(form)))
      assert(got.toSeq == want, s"form $form")
    }
    // NFC joins the combining pair; NFKC folds width and ligature
    val nfc = df.select(TextNormalizeFunctions.unicodeNormalize($"s"))
      .as[String].collect()
    assert(nfc(0) == "\u00e9clair")
    val nfkc = df.select(TextNormalizeFunctions.unicodeNormalize($"s", "NFKC"))
      .as[String].collect()
    assert(nfkc(2) == "HEllo" && nfkc(3) == "file")
    // nulls pass through; bad form fails at construction
    val withNull = Seq(Option.empty[String]).toDF("s")
      .select(TextNormalizeFunctions.unicodeNormalize($"s")).collect()(0)
    assert(withNull.isNullAt(0))
    intercept[IllegalArgumentException](
      TextNormalizeFunctions.unicodeNormalize($"s", "NFX"))
  }

  test("FixMojibake: repairs misreads, never touches clean text") {
    def moji(s: String): String =
      new String(s.getBytes("UTF-8"), "ISO-8859-1")
    val cases = Seq(
      // (input, expected)
      moji("café") -> "café",
      moji("don’t — “quotes” …") -> "don’t — “quotes” …",
      moji("世界 test") -> "世界 test",
      "café" -> "café",                 // REAL Latin-1 é: é alone is
                                        // not valid UTF-8 → untouched
      "plain ascii" -> "plain ascii",   // fast path
      "" -> "",
      "Ã" -> "Ã",                       // truncated multibyte → untouched
      "naïve déjà-vu" -> "naïve déjà-vu", // genuine accents, no misread
      "ሴ high char" -> "ሴ high char", // >FF can't be a misread
      moji(moji("é")) -> moji("é")      // ONE generation per call
    )
    val got = cases.map(_._1).zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "s")
      .select($"i", TextNormalizeFunctions.fixMojibake($"s").as("f"))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    cases.map(_._2).zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(g == want, s"case $i: got ${g.toList} want ${want.toList}")
    }
    // idempotent on already-repaired text
    val once = moji("é")
    assert(FixMojibake.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("é")).toString == "é")
    val _ = once
  }
}
