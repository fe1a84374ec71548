package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. North-star extensions beyond the reference's surface
  * (SURVEY.md §2 extensions); the reference itself is regex-over-log-lines
  * (`scripts/oss_s3_server_side_logging_compacter.py:21-25`), and these
  * reuse the same native-column-expression discipline: no UDFs, everything
  * whole-stage-codegen'd, embarrassingly parallel per-row (no shuffle), so
  * the operators scale linearly with input splits on a 100 TB corpus.
  */
object TextStats {

  /** Whitespace tokenization, shared by every op here. Trimmed first so
    * padding doesn't mint empty tokens that skew counts/ratios. (A fully
    * empty text still yields one empty token — identically in Spark and
    * DuckDB, which is what keeps the oracle parity exact.)
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** GPT2-ish pre-tokenizer: runs of letters | runs of digits | single
    * non-space-non-alnum. A deliberately regex-only stand-in for BPE —
    * counts within ~10% of a real BPE tokenizer on prose, at full codegen
    * speed with zero vocab lookup.
    */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  def wordCount(text: Column): Column = size(tokens(text))

  /** Punctuation chars / total chars. Explicit char class (not \p{Punct})
    * so Java-regex (Spark) and RE2 (DuckDB oracle) agree byte-for-byte.
    */
  val PunctClass = "[.,!?;:'\"()\\[\\]{}_-]"

  def punctRatio(text: Column): Column =
    size(regexp_extract_all(text, lit(PunctClass), lit(0))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Tiny English stopword list used for the stopword-ratio quality signal.
    * Fixed and ordered — part of the operator's contract (determinism).
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val stopArr = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stopArr, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  def meanWordLength(text: Column): Column = {
    val toks = tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1] — the C4/Gopher-style cheap filter:
    * reasonable length, not all punctuation, some stopwords (a proxy for
    * "natural language" vs tables/code/boilerplate), sane mean word length.
    * Weights are part of the contract; tune via config, not code edits.
    * Computed as an INTEGER score out of 10 divided once at the end, so the
    * value is engine-portable (no float accumulation-order dependence).
    */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(20, 100000), 1L).otherwise(0L)
    val punctOk = when(punctRatio(text) < 0.3, 1L).otherwise(0L)
    val stopOk = when(stopwordRatio(text) > 0.05, 1L).otherwise(0L)
    val wordOk = when(meanWordLength(text).between(2.0, 12.0), 1L).otherwise(0L)
    (lenOk * 3 + punctOk * 2 + stopOk * 3 + wordOk * 2).cast("double") / lit(10)
  }

  /** Per-language marker (stop)words for the n-gram/marker-word heuristic
    * language ID. Deliberately small: language ID at corpus scale is a
    * counting problem, not a modeling one.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et", "une", "dans", "que", "pour"),
    "it" -> Seq("il", "di", "che", "la", "per", "non", "una", "sono", "con", "del")
  )

  /** Score of `text` against one language's marker set = count of tokens
    * that are markers (token multiplicity counts, like a real n-gram LM).
    */
  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(lower(text))
    val arr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(arr, t)))
  }

  /** Argmax language with deterministic tie-break (first in `LangMarkers`
    * order wins; all-zero scores → "und" [undetermined], BCP-47 style).
    * All K languages are scored in ONE pass over the tokens via the native
    * `MarkerCounts` kernel (word → language-bitmask lookup); the argmax is
    * a cheap fold over the K counts.
    */
  def langId(text: Column): Column = {
    val counts = graft.functions.SketchFunctions.markerCounts(
      tokens(lower(text)), LangMarkers.map(_._2))
    // argmax with FIRST-wins tie-break via array_max over (score, -index)
    // structs: struct ordering compares score first, then -index, so ties
    // resolve to the earliest language in LangMarkers order. (A when-chain
    // fold duplicates the accumulator per step — 2^K expression nodes.)
    val entries = LangMarkers.indices.map { i =>
      struct(element_at(counts, i + 1).as("score"), lit(-i).as("nidx"))
    }
    val best = array_max(array(entries: _*))
    val langNames = array(LangMarkers.map(m => lit(m._1)): _*)
    when(best.getField("score") > 0,
      element_at(langNames, -best.getField("nidx") + 1)).otherwise(lit("und"))
  }

  /** Character-trigram profiles per language, derived deterministically
    * from the marker words (space-padded, so word boundaries contribute
    * their own trigrams — " th", "he " etc. — the signal real char-n-gram
    * language ID lives on).
    */
  lazy val LangTrigramProfiles: Seq[(String, Seq[String])] =
    LangMarkers.map { case (lang, words) =>
      lang -> words.flatMap { w =>
        val padded = s" $w "
        (0 to padded.length - 3).map(i => padded.substring(i, i + 3))
      }.distinct
    }

  /** Char-n-gram language ID: score = count of the text's trigrams (with
    * multiplicity) found in each language's trigram profile; argmax with
    * first-wins tie-break, "und" when nothing matches. More robust than
    * the marker-WORD variant on inflected/partial tokens; one pass per row
    * via the CharNgrams + MarkerCounts native kernels.
    */
  def langIdCharNgram(text: Column): Column = {
    val grams = graft.functions.SketchFunctions.charNgrams(
      concat(lit(" "), Dedup.canonicalize(text), lit(" ")), 3)
    val counts = graft.functions.SketchFunctions.markerCounts(
      grams, LangTrigramProfiles.map(_._2))
    val entries = LangTrigramProfiles.indices.map { i =>
      struct(element_at(counts, i + 1).as("score"), lit(-i).as("nidx"))
    }
    val best = array_max(array(entries: _*))
    val langNames = array(LangTrigramProfiles.map(m => lit(m._1)): _*)
    when(best.getField("score") > 0,
      element_at(langNames, -best.getField("nidx") + 1)).otherwise(lit("und"))
  }

  /** Canonical-form document fingerprint: md5 of lowercased,
    * whitespace-collapsed, trimmed text. Identical content modulo spacing
    * and case → identical fingerprint. md5 (not xxhash64) so external
    * engines (the DuckDB oracle, any warehouse) can reproduce it.
    */
  def fingerprint(text: Column): Column =
    md5(Dedup.canonicalize(text))

  /** Winnowing-style robust fingerprint (Schleimer et al., SIGMOD'03):
    * k-gram character shingles → hash → min-hash per sliding window of w →
    * distinct kept mins = the document's fingerprint set. Local (per-row,
    * no shuffle); used by near-dup pipelines that tolerate edits.
    */
  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column = {
    val canon = Dedup.canonicalize(text)
    val n = length(canon)
    // char k-grams: canon.substr(i, k) for i in 1..n-k+1
    val grams = transform(
      sequence(lit(1), greatest(n - (k - 1), lit(1))),
      i => canon.substr(i, lit(k)))
    val hashes = transform(grams, g => xxhash64(g))
    // sliding windows of w over hashes, take min of each window
    val mins = transform(
      sequence(lit(0), greatest(size(hashes) - w, lit(0))),
      i => array_min(slice(hashes, i + 1, lit(w))))
    array_distinct(mins)
  }

  // -------------------------------------------------------- PII redaction

  /** Email addresses; RE2/Java-regex portable (no lookaround). */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 literals, word-bounded so version strings like
    * "1.2.3.4.5" still match their leading quad the way log scrubbers
    * expect.
    */
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Long digit runs (9+): account numbers, phone numbers without
    * separators. Applied AFTER the IP pass so quads don't feed it.
    */
  val DigitRunPattern: String = "\\d{9,}"

  /** Count of PII matches of one pattern — the audit metric that goes in
    * the curation report next to the redacted corpus.
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Scrub PII from free text: emails → `<EMAIL>`, IPv4 → `<IP>`, long
    * digit runs → `<NUM>`, in that order (emails can contain digit runs;
    * IPs must be consumed before the digit pass sees their octets).
    * Pure per-row column expression — no shuffle, streams unchanged.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      DigitRunPattern, "<NUM>")

  // ------------------------------------------------------- BM25 retrieval

  /** Per-(doc, term) BM25 partial scores for a fixed query-term set — the
    * ranked-retrieval upgrade of the linear-idf TF-IDF pipeline: term
    * saturation (k1) and length normalization (b).
    *
    * Shuffles: (doc, term) for tf, term for df — identical profile to
    * TF-IDF; corpus stats (N, avgdl) come from a broadcast one-row
    * aggregate, never a driver-side collect. The query-term filter lands
    * right after tokenization, so only matching postings shuffle.
    *
    * Determinism: linear idf ((N - df + 0.5)/(df + 0.5) — one division,
    * no ln(): libm last-ulp drift would make near-tie rankings
    * engine-dependent) and a fixed operation order, so scores are
    * bit-identical across engines and partitionings. Summing per-doc is
    * left to the caller (order-sensitive in IEEE); ranking by per-term
    * score tuples is exact.
    */
  def bm25PerTerm(df: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k1: Double = 1.2,
                  b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25PerTerm needs at least one query term")
    // the token frame feeds BOTH the postings path and the corpus stats:
    // without a lineage cut each reference re-scans and re-tokenizes the
    // whole corpus (the re-evaluation trap Curation/minhashDuplicates
    // already guard against). Lazy checkpoint: materialized once on first
    // action, reused by both consumers.
    val toks = graft.plans.PlanCapture.cut(
      df.select(col(idCol), canonicalTokens(col(textCol)).as("__toks")))
    val dl = toks.select(col(idCol), size(col("__toks")).cast("double").as("dl"),
      explode(col("__toks")).as("term"))
    val tf = dl.groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val matched = tf.filter(col("term").isin(queryTerms: _*))
    val dfreq = matched.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(size(col("__toks")).cast("long")).cast("double") /
        count(lit(1))).as("avgdl"))
    matched.join(dfreq, "term").crossJoin(broadcast(stats))
      .select(col(idCol), col("term"),
        col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
        // fixed association order, mirrored verbatim by the SQL oracle
        (((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))))
          .as("score"))
  }

  /** Canonical tokenization shared by BM25, vocabulary, and co-occurrence:
    * split of [[Dedup.canonicalize]] (lowercase, collapsed whitespace,
    * trimmed) on single spaces. ONE definition, for the same reason
    * canonicalize itself has one — a drifted copy would silently make
    * retrieval scores and dedup fingerprints disagree about what a token
    * is. (The q47/q68/q74/q76 oracles mirror this exact expression.)
    */
  def canonicalTokens(text: Column): Column =
    split(Dedup.canonicalize(text), " ")

  // ------------------------------------------------- HTML extraction

  /** Strip HTML down to visible text: script/style blocks and comments
    * removed, tags replaced by spaces (so `</p><p>` does not glue words),
    * the six ubiquitous entities decoded (`&amp;` LAST, so a
    * double-encoded `&amp;lt;` decodes exactly one level), whitespace
    * collapsed. The crude-but-deterministic extraction pass every crawl
    * pipeline runs before its text gates — boilerplate REMOVAL (menus,
    * footers) is the containment/near-dup layer's job, not a regex's.
    * Patterns are RE2-safe (no backreferences, inline `(?is)` flags
    * only), so external engines can replicate the pass bit-for-bit.
    * Pure per-row column expressions: no shuffle, streams unchanged.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) =>
      // entity strings contain no regex metacharacters — usable verbatim
      // in both Java regex and RE2 (\Q..\E quoting would break RE2)
      regexp_replace(c, ent, ch)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  // ----------------------------------------------- repetition signals

  /** Fraction of word n-gram occurrences that are repeats of an earlier
    * occurrence within the SAME document: `1 − distinct/total` over the
    * document's n-gram multiset. The classic web-crawl quality signal
    * (boilerplate loops, keyword stuffing, decoding glitches all push it
    * up); thresholding on the 2-/3-gram variants is the standard
    * repetition gate in large-pipeline curation. Pure per-row column
    * math over the shared canonical tokenization — no shuffle; empty
    * docs score 0.
    */
  def duplicateNgramFraction(text: Column, n: Int = 3): Column = {
    val toks = canonicalTokens(text)
    // the WordNgrams kernel emits DISTINCT grams; the occurrence total is
    // the window count max(len − n + 1, 1), so no second (multiset) gram
    // array is ever materialized
    val total = greatest(size(toks) - lit(n - 1), lit(1))
    val distinctGrams =
      size(graft.functions.SketchFunctions.wordNgrams(toks, n))
    when(size(toks) > 0,
      lit(1.0) - distinctGrams.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Flesch reading-ease readability — the classic
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` score
    * the curation literature still thresholds on (graded-reader
    * filtering, textbook-vs-forum routing). Deliberately the
    * REPLAYABLE variant: sentences are the [[sentenceStats]] regex
    * segments, words the canonical tokens, and syllables the VOWEL-GROUP
    * count (`[aeiouy]+` runs over the canonical text — spaces break
    * groups, so the corpus-level count equals the per-word sum without
    * materializing per-word arrays). A dictionary-grade syllabifier is
    * a model, not an analytics operator (the sentence-segmentation
    * stance). Pure per-row expressions; `flesch_e3` is the e3-floored
    * score in ONE fixed double shape, NULL when a document has no
    * sentence or no word.
    */
  def readability(df: DataFrame, idCol: String,
                  textCol: String = "text"): DataFrame = {
    val canon = Dedup.canonicalize(col(textCol))
    val sents = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    val nW = size(filter(split(canon, " "), t => length(t) > 0)).cast("long")
    val nS = size(sents).cast("long")
    val nSy = size(call_function("regexp_extract_all",
      canon, lit("[aeiouy]+"), lit(0))).cast("long")
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), nW.as("n_words"), nS.as("n_sentences"),
        nSy.as("n_syllables"))
      .withColumn("flesch_e3",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          floor(lit(1000.0) * (lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double") /
              col("n_words").cast("double")))).cast("long"))
          .otherwise(lit(null).cast("long")))
  }

  /** Gopher repetition-filter signals (§A1.1 of the paper), char-weighted
    * and EXACT-INTEGER: per document, the duplicate-line occurrence/char
    * counts, the most-frequent-n-gram char mass for n = 2..4, and the
    * duplicated-n-gram char mass for n = 5..10, plus the denominators
    * (n_lines / line_chars_total / text_chars). One per-row kernel pass
    * ([[graft.functions.RepetitionStats]]) fused into the scan — the
    * explode formulation would push ~9× the corpus token count through
    * an exchange to compute numbers that never leave the row.
    *
    * `flags = true` additionally applies the paper's thresholds as
    * boolean columns via integer cross-multiplication (frac > θ ⟺
    * 100·chars > θ₁₀₀·total — no floats, so the flags replay exactly):
    * dup_line_frac > 0.30, dup_line_char_frac > 0.20, top 2/3/4-gram
    * char frac > 0.20/0.18/0.16, dup 5..10-gram char frac >
    * 0.15/0.14/0.13/0.12/0.11/0.10. Flags, not filters (the
    * QualityFilters stance): curation audits what a rule would drop
    * before committing.
    */
  def repetitionSignals(df: DataFrame, idCol: String,
                        textCol: String = "text",
                        flags: Boolean = true): DataFrame = {
    val struct = graft.functions.RepetitionStatsFunctions
      .repetitionStats(col(textCol), canonicalTokens(col(textCol)))
    val fields = graft.functions.RepetitionStats.Schema.fieldNames
    val base = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .withColumn("__r", struct)
      .select(col(idCol) +: fields.toIndexedSeq.map(f => col(s"__r.$f").as(f)): _*)
    if (!flags) base
    else {
      // integer cross-multiplied thresholds; zero denominators never flag
      def over(num: Column, den: Column, pct: Int): Column =
        den > 0 && num * 100L > den * pct.toLong
      base
        .withColumn("flag_dup_line",
          over(col("dup_line_count"), col("n_lines"), 30))
        .withColumn("flag_dup_line_char",
          over(col("dup_line_chars"), col("line_chars_total"), 20))
        .withColumn("flag_top_2gram",
          over(col("top_gram_chars_2"), col("text_chars"), 20))
        .withColumn("flag_top_3gram",
          over(col("top_gram_chars_3"), col("text_chars"), 18))
        .withColumn("flag_top_4gram",
          over(col("top_gram_chars_4"), col("text_chars"), 16))
        .withColumn("flag_dup_5gram",
          over(col("dup_gram_chars_5"), col("text_chars"), 15))
        .withColumn("flag_dup_6gram",
          over(col("dup_gram_chars_6"), col("text_chars"), 14))
        .withColumn("flag_dup_7gram",
          over(col("dup_gram_chars_7"), col("text_chars"), 13))
        .withColumn("flag_dup_8gram",
          over(col("dup_gram_chars_8"), col("text_chars"), 12))
        .withColumn("flag_dup_9gram",
          over(col("dup_gram_chars_9"), col("text_chars"), 11))
        .withColumn("flag_dup_10gram",
          over(col("dup_gram_chars_10"), col("text_chars"), 10))
    }
  }

  /** Share of the document's tokens taken by its single most frequent
    * token (1.0 = the document is one word repeated) — the companion
    * dominance signal to [[duplicateNgramFraction]]. Native kernel
    * (graft.functions.TokenModeCount): one hash-count pass per row — the
    * composed distinct×filter fold was O(distinct × tokens) of
    * interpreted lambda dispatch and dominated the q83 bench. The heavy
    * corpus-aggregate alternative (explode + groupBy) is what
    * [[vocabCoverage]] already provides corpus-wide.
    */
  def topTokenShare(text: Column): Column = {
    val toks = canonicalTokens(text)
    val top = graft.functions.SketchFunctions.tokenModeCount(toks)
    when(size(toks) > 0, top.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  // ------------------------------------------- corpus-LM quality scoring

  /** Corpus-unigram language-model score per document: the mean over the
    * document's token OCCURRENCES of `ln p(t)`, where `p(t)` = corpus
    * frequency / corpus token total — the classic LM quality filter
    * (gibberish and OOV-heavy documents score far below prose; threshold
    * on the low tail). Self-scored against the corpus itself: no external
    * model, two aggregates and one join.
    *
    * Determinism: per-token `ln` values are quantized to integers
    * (`floor(ln(n_t)·10¹²)` — exact IEEE multiply + floor, identical on
    * every engine) and summed as BIGINT, then ONE double division chain
    * per document: mean_lp = (Σ/10¹²)/n − ln(N). A raw double sum would
    * drift with partition order, and a double→decimal cast drifts by an
    * ulp ACROSS ENGINES (they convert via different routes); integer
    * summation is exact and engine-portable. The 10⁻¹² per-token
    * quantization sits three orders below any quality-threshold
    * granularity. JVM and external libm `ln` agree bit-for-bit (probed).
    *
    * Scale shape: token explode → (term) hash aggregate (vocabulary-
    * sized) → join back (AQE broadcasts the vocab when it fits) → one
    * (doc) hash aggregate. The corpus total rides as a broadcast one-row
    * aggregate.
    */
  def unigramLogProbScore(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    // token frame feeds frequencies, the total, AND the per-doc join —
    // cut so the scan+tokenize runs once (the cooccurrence stance)
    val toks = graft.plans.PlanCapture.cut(
      df.select(col(idCol), explode(canonicalTokens(col(textCol))).as("term")))
    val freq = toks.groupBy("term").agg(count(lit(1)).as("n_t"))
    val total = toks.agg(count(lit(1)).cast("double").as("n_total"))
    val lnScaled =
      floor(log(col("n_t").cast("double")) * lit(1e12)).cast("long")
    toks.join(freq, "term")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(lnScaled).as("__slp"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tokens"),
        (col("__slp").cast("double") / lit(1e12) / col("n_tokens")
          - log(col("n_total"))).as("mean_lp"))
  }

  /** Interpolated bigram language-model score per document — the
    * KenLM-shaped upgrade of [[unigramLogProbScore]]: mean over the
    * document's bigram TRANSITIONS of
    * `ln( λ·p(w₂|w₁) + (1−λ)·p(w₂) )`, with `p(w₂|w₁) = c₁₂/c₁` the
    * corpus MLE conditional and `p(w₂) = c₂/N` the unigram backoff.
    * Catches what a unigram model cannot: common words in gibberish
    * ORDER ("the of and the of") score high on unigrams but their
    * transitions are rare. Self-scored against the corpus; 0 < λ < 1
    * keeps every seen transition's probability positive.
    *
    * Determinism: the interpolated probability is computed in one fixed
    * double-arithmetic shape (λ·(c₁₂/c₁) + (1−λ)·(c₂/N), each count cast
    * to double exactly), then quantized (`floor(ln·10¹²)`) and summed as
    * BIGINT — the [[unigramLogProbScore]] stance, so external engines
    * replay scores bit-for-bit.
    *
    * Documents with fewer than 2 tokens have no transitions and produce
    * NO row — left-join on the source for outer semantics (the
    * [[Dedup.paragraphDedup]] stance). Returns
    * (idCol, n_bigrams, mean_lp).
    *
    * Scale shape: the tokenized-array frame is cut once (one corpus
    * scan); bigram and token explodes are map-side; c₁₂/c₁/c₂ are
    * (bi)gram-vocabulary-sized aggregates AQE broadcasts when they fit;
    * the corpus total rides as a one-row broadcast; one final per-doc
    * aggregate. Never a corpus×corpus join, never a window.
    */
  def bigramLogProbScore(df: DataFrame, idCol: String, textCol: String,
                         lambda: Double = 0.75): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"lambda must be in (0, 1), got $lambda")
    val arr = graft.plans.PlanCapture.cut(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol), canonicalTokens(col(textCol)).as("__t")))
    val bi = arr.filter(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(col("__t")) - 2), i =>
          struct(element_at(col("__t"), i + 1).as("w1"),
            element_at(col("__t"), i + 2).as("w2")))).as("__b"))
      .select(col(idCol), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val toks = arr.select(explode(col("__t")).as("term"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("__c12"))
    val c1 = bi.groupBy("w1").agg(count(lit(1)).as("__c1"))
    val c2 = toks.groupBy("term").agg(count(lit(1)).as("__c2"))
    val total = toks.agg(count(lit(1)).cast("double").as("__n"))
    val p = lit(lambda)
      .multiply(col("__c12").cast("double") / col("__c1").cast("double"))
      .plus(lit(1.0 - lambda)
        .multiply(col("__c2").cast("double") / col("__n")))
    bi.join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(c2, col("w2") === col("term"))
      .crossJoin(broadcast(total))
      .select(col(idCol), lnScaled(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
      .select(col(idCol), col("n_bigrams"),
        (col("__slp").cast("double") / lit(1e12) / col("n_bigrams"))
          .as("mean_lp"))
  }

  /** Interpolated TRIGRAM language-model score per document — one order
    * above [[bigramLogProbScore]], the depth at which the KenLM-style
    * quality filters of published crawl pipelines actually run: mean
    * over the document's trigram transitions of
    * `ln( λ₃·p(w₃|w₁w₂) + λ₂·p(w₃|w₂) + λ₁·p(w₃) )` with corpus-MLE
    * conditionals (`c₁₂₃/ctx₁₂` over trigram windows, `c₂₃/c₂ᵇ` over
    * bigram transitions, `c₃/N` unigrams). A trigram model separates
    * plausible phrases from locally-plausible word salad the bigram
    * can't ("of the of the" has fine bigrams, broken trigrams). Weights
    * must be positive and sum to 1, keeping every seen transition's
    * probability positive.
    *
    * Same determinism and shape contract as the bigram form: one fixed
    * double-arithmetic shape per probability, `floor(ln·10¹²)` BIGINT
    * sums (partition-order independent, replayed bit-for-bit by the
    * oracle); the tokenized frame is cut once, counts are vocabulary-
    * sized aggregates, one final per-doc aggregate — never corpus ×
    * corpus, never a window. Documents with fewer than 3 tokens emit no
    * row. Returns (idCol, n_trigrams, mean_lp).
    */
  def trigramLogProbScore(df: DataFrame, idCol: String, textCol: String,
                          l3: Double = 0.6, l2: Double = 0.3,
                          l1: Double = 0.1): DataFrame = {
    require(l3 > 0.0 && l2 > 0.0 && l1 > 0.0 &&
      math.abs(l3 + l2 + l1 - 1.0) < 1e-12,
      s"interpolation weights must be positive and sum to 1, got $l3/$l2/$l1")
    val arr = graft.plans.PlanCapture.cut(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol), canonicalTokens(col(textCol)).as("__t")))
    val tri = arr.filter(size(col("__t")) >= 3)
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(col("__t")) - 3), i =>
          struct(element_at(col("__t"), i + 1).as("w1"),
            element_at(col("__t"), i + 2).as("w2"),
            element_at(col("__t"), i + 3).as("w3")))).as("__g"))
      .select(col(idCol), col("__g.w1").as("w1"), col("__g.w2").as("w2"),
        col("__g.w3").as("w3"))
    val bi = arr.filter(size(col("__t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("__t")) - 2), i =>
        struct(element_at(col("__t"), i + 1).as("b1"),
          element_at(col("__t"), i + 2).as("b2")))).as("__b"))
      .select(col("__b.b1").as("b1"), col("__b.b2").as("b2"))
    val toks = arr.select(explode(col("__t")).as("term"))
    val c123 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("__c123"))
    val ctx12 = tri.groupBy("w1", "w2").agg(count(lit(1)).as("__ctx12"))
    val c23 = bi.groupBy("b1", "b2").agg(count(lit(1)).as("__c23"))
    val c2b = bi.groupBy("b1").agg(count(lit(1)).as("__c2b"))
    val c3 = toks.groupBy("term").agg(count(lit(1)).as("__c3"))
    val total = toks.agg(count(lit(1)).cast("double").as("__n"))
    val p = lit(l3)
      .multiply(col("__c123").cast("double") / col("__ctx12").cast("double"))
      .plus(lit(l2)
        .multiply(col("__c23").cast("double") / col("__c2b").cast("double")))
      .plus(lit(l1).multiply(col("__c3").cast("double") / col("__n")))
    tri.join(c123, Seq("w1", "w2", "w3"))
      .join(ctx12, Seq("w1", "w2"))
      .join(c23, col("w2") === col("b1") && col("w3") === col("b2"))
      .join(c2b.withColumnRenamed("b1", "__d1"), col("w2") === col("__d1"))
      .join(c3, col("w3") === col("term"))
      .crossJoin(broadcast(total))
      .select(col(idCol), lnScaled(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("__lp")).as("__slp"))
      // score_e6 coarsens the mean to 1e-6 nats: `ln` is not correctly
      // rounded across math libraries, so ~1-in-1e4 quantized terms sit
      // on a floor boundary and flip ±1 between engines — a per-doc sum
      // off by a unit is invisible at 1e-6 granularity (it moves the
      // mean by ~1e-12/n), which is what makes this column, unlike the
      // raw mean, bit-replicable by an external engine. Filters should
      // threshold on score_e6; mean_lp stays for diagnostics.
      .select(col(idCol), col("n_trigrams"),
        floor(col("__slp").cast("double") / col("n_trigrams") / lit(1e6))
          .cast("long").as("score_e6"),
        (col("__slp").cast("double") / lit(1e12) / col("n_trigrams"))
          .as("mean_lp"))
  }

  /** Interpolated Kneser–Ney bigram LM score — the standard n-gram
    * smoothing (the one real LM toolkits default to): instead of
    * backing off to RAW unigram frequency (which overrates words that
    * are frequent but appear in few contexts — "Francisco" follows only
    * "San"), the lower-order distribution is the CONTINUATION
    * probability N1+(·w)/N1+(··) — how many distinct contexts a word
    * follows. Absolute discount `discount` (default 0.75, the classic
    * value) carves probability mass off every seen bigram and
    * redistributes it through that continuation distribution:
    *
    *   P(w|v) = (c(vw) − D)/c(v·) + (D · N1+(v·)/c(v·)) · N1+(·w)/N1+(··)
    *
    * Every count is a vocabulary-sized aggregate of the corpus's own
    * bigrams (self-scoring, the q87/q124/q142 stance), all per-instance
    * scores come from the seen-bigram joins (c(vw) ≥ 1 > D keeps the
    * first term positive), and the double-arithmetic SHAPE of P is
    * fixed term-by-term so the oracle replays it bit-for-bit;
    * `floor(ln·10¹²)` BIGINT sums make the per-doc totals
    * partition-order independent, and `score_e6` coarsens the mean
    * past math-library ln differences (the q142 note). Documents with
    * fewer than 2 tokens emit no row. Returns
    * (idCol, n_bigrams, score_e6, mean_lp).
    */
  def kneserNeyBigramScore(df: DataFrame, idCol: String, textCol: String,
                           discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val arr = graft.plans.PlanCapture.cut(
      df.filter(col(textCol).isNotNull)
        .select(col(idCol), canonicalTokens(col(textCol)).as("__t")))
    val bi = arr.filter(size(col("__t")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(col("__t")) - 2), i =>
          struct(element_at(col("__t"), i + 1).as("v"),
            element_at(col("__t"), i + 2).as("w")))).as("__b"))
      .select(col(idCol), col("__b.v").as("v"), col("__b.w").as("w"))
    val cvw = bi.groupBy("v", "w").agg(count(lit(1)).as("__cvw"))
    val cv = bi.groupBy("v").agg(count(lit(1)).as("__cv"))
    val n1v = cvw.groupBy("v").agg(count(lit(1)).as("__n1v"))
    val n1w = cvw.groupBy("w").agg(count(lit(1)).as("__n1w"))
    val nAll = cvw.agg(count(lit(1)).cast("double").as("__nall"))
    // fixed shape, replayed verbatim by the oracle: no reassociation
    val p = ((col("__cvw").cast("double") - lit(discount)) /
        col("__cv").cast("double")) +
      ((lit(discount) * (col("__n1v").cast("double") / col("__cv").cast("double"))) *
        (col("__n1w").cast("double") / col("__nall")))
    bi.join(cvw, Seq("v", "w"))
      .join(cv, Seq("v"))
      .join(n1v, Seq("v"))
      .join(n1w, Seq("w"))
      .crossJoin(broadcast(nAll))
      .select(col(idCol), lnScaled(p).as("__lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp")).as("__slp"))
      .select(col(idCol), col("n_bigrams"),
        floor(col("__slp").cast("double") / col("n_bigrams") / lit(1e6))
          .cast("long").as("score_e6"),
        (col("__slp").cast("double") / lit(1e12) / col("n_bigrams"))
          .as("mean_lp"))
  }

  /** Integer-scaled natural log: `floor(ln(x)·10¹²)` as BIGINT — the
    * quantization that makes log-sums exact and engine-portable (see
    * [[unigramLogProbScore]]'s determinism note).
    */
  private def lnScaled(x: Column): Column =
    floor(log(x.cast("double")) * lit(1e12)).cast("long")

  /** Seed-bootstrapped quality classifier: multinomial Naive Bayes with
    * add-one smoothing, the classic crawl-filter stage (train token
    * log-likelihood ratios from a small labeled seed — positive = known
    * -good text such as a curated reference corpus, negative = raw crawl
    * — then score the whole corpus and keep the high tail; the published
    * CCNet / GPT-3 data-pipeline recipe, re-expressed relationally).
    *
    * Model = per-token integer-scaled weights over the seed vocabulary:
    * w(t) = S(c⁺(t)+1) − S(c⁻(t)+1) with S(x) = floor(ln(x)·10¹²) as
    * BIGINT. A document's score is then
    *   nb_llr = (prior + Σ_occurrences w(t) − n_tokens·denom) / 10¹²,
    * prior = S(docs⁺) − S(docs⁻), denom = S(tokens⁺+V) − S(tokens⁻+V):
    * exactly ln P(doc|+)−ln P(doc|−)+ln P(+)/P(−) under add-one
    * smoothing, quantized per token so the per-document sum is a BIGINT
    * — partition-order independent and bit-replicable by an external
    * engine. Tokens outside the seed vocabulary contribute S(1)−S(1)=0,
    * so the left join's null weight coalesces to the mathematically
    * correct value, not an approximation.
    *
    * Seed rows with null text or null label are ignored. Both classes
    * must be non-empty (a one-class seed makes ln(0) null, nulling every
    * score — a loud failure, not a silent bias). Returns
    * (idCol, n_tokens, nb_llr). Empty text canonicalizes to the single
    * empty token (the convention every token op here shares), so such
    * documents score like a one-token document, not null.
    *
    * Scale shape: the seed is tokenized ONCE (lineage cut) and collapses
    * to a vocabulary-sized weight frame plus two one-row scalar frames;
    * the corpus explodes map-side, equi-joins the vocab (AQE broadcasts
    * it when it fits), and aggregates once per document. The corpus is
    * never shuffled at document width and never joins corpus×corpus.
    */
  def naiveBayesScore(docs: DataFrame, seed: DataFrame,
                      idCol: String, textCol: String,
                      labelCol: String): DataFrame = {
    val seedClean = seed
      .filter(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("boolean").as("__pos"), col(textCol))
    // tokenized seed feeds the weights AND the class token totals — cut
    // so the scan+tokenize runs once
    val stoks = graft.plans.PlanCapture.cut(
      seedClean.select(col("__pos"),
        explode(canonicalTokens(col(textCol))).as("term")))
    val weights = stoks.groupBy("term")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("__cn"))
      .select(col("term"),
        (lnScaled(col("__cp") + 1) - lnScaled(col("__cn") + 1)).as("__w"))
    val tokTotals = stoks.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__tp"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("__tn"),
      count_distinct(col("term")).as("__v"))
    val docTotals = seedClean.agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("__dp"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("__dn"))
    val consts = broadcast(tokTotals.crossJoin(docTotals).select(
      (lnScaled(col("__dp")) - lnScaled(col("__dn"))).as("__prior"),
      (lnScaled(col("__tp") + col("__v"))
        - lnScaled(col("__tn") + col("__v"))).as("__denom")))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(canonicalTokens(col(textCol))).as("term"))
      .join(weights, Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__w"), lit(0L))).as("__sw"))
      .crossJoin(consts)
      .select(col(idCol), col("n_tokens"),
        ((col("__prior") + col("__sw") - col("n_tokens") * col("__denom"))
          .cast("double") / lit(1e12)).as("nb_llr"))
  }

  // --------------------------------------------------- corpus vocabulary

  /** Vocabulary coverage: global term frequencies ranked by count (ties
    * to lexicographic term), with each rank's CUMULATIVE share of all
    * tokens — the curve that sizes a tokenizer vocab ("how many terms
    * cover 95% of the corpus"). The heavy work (token counts) is a plain
    * hash aggregate; the ranking window runs over the DISTINCT-TERM
    * frame, which is vocabulary-sized, not corpus-sized — the single
    * unpartitioned window is over ~10^5 rows even at 100 TB of text.
    * Share = one BIGINT-exact cumulative sum and one double division:
    * bit-identical across engines.
    */
  def vocabCoverage(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = df.select(explode(canonicalTokens(col(textCol))).as("term"))
    val counts = toks.groupBy("term").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("n_total"))
    // vocabulary-sized frame by construction — the constant partition
    // key states the single-task intent
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(SingleTask.key(col("term")))
      .orderBy(col("n").desc, col("term"))
    counts.crossJoin(broadcast(total))
      .select(col("term"), col("n"),
        row_number().over(w).cast("long").as("rank"),
        (sum(col("n")).over(w).cast("double") / col("n_total").cast("double"))
          .as("cum_share"))
  }

  /** Term co-occurrence lift: for term pairs sharing a document,
    * lift = P(a,b) / (P(a)·P(b)) — the log-free PMI used to mine
    * collocations / build co-occurrence matrices for embedding training.
    * Computed as one integer-exact product ratio (counts are small enough
    * that BIGINT products are exact; ONE double division at the end), so
    * values are engine-identical. Work is bounded by Σ_doc (distinct
    * terms/doc)² — per-document, not corpus-quadratic; `minPairs` prunes
    * the long tail before the stats joins.
    */
  def cooccurrenceLift(df: DataFrame, idCol: String, textCol: String,
                       minPairs: Long = 10L): DataFrame = {
    // referenced three times (both self-join sides + term frequencies):
    // lineage cut so the scan+tokenize+explode runs once, not three times
    val dt = graft.plans.PlanCapture.cut(
      df.select(col(idCol).as("__doc"),
        explode(array_distinct(canonicalTokens(col(textCol)))).as("term")))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val tf = dt.groupBy("term").agg(count(lit(1)).as("n_t"))
    val a = dt.select(col("__doc"), col("term").as("term_a"))
    val b = dt.select(col("__doc"), col("term").as("term_b"))
    val pairs = a.join(b, "__doc").filter(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(tf.select(col("term").as("term_a"), col("n_t").as("n_a")), "term_a")
      .join(tf.select(col("term").as("term_b"), col("n_t").as("n_b")), "term_b")
      .crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        ((col("n_ab") * col("n_docs")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }

  /** Encoding-quality audit — the mojibake detector of a web-corpus
    * quality gate. Three independent signals, all pure per-row regex
    * counts (no shuffle, codegen'd):
    *   - `n_replacement`: U+FFFD replacement characters (a decoder
    *     already gave up);
    *   - `n_c1_controls`: C1 control characters U+0080–U+009F (classic
    *     cp1252-bytes-decoded-as-latin1 smart quotes land here);
    *   - `n_latin1_utf8`: Ã followed by a U+0080–U+00BF continuation-
    *     byte codepoint (UTF-8 bytes decoded as latin-1/cp1252 — "Ã©"
    *     for é).
    * `bad_ratio` weighs each mojibake EVENT once — a digraph whose
    * continuation codepoint falls in the C1 range (uppercase-accent
    * mojibake like "Ã" for È) matches both the C1 and the digraph
    * pattern, so that overlap is counted and subtracted (RE2 has no
    * lookbehind, so exclusion-by-subtraction is the form both engines
    * can replay) — then normalized by codepoint length (0 for empty
    * text); gate on it like [[qualityScore]]. Patterns use \x{hhhh}
    * classes, valid in both Java regex and RE2 — the oracle replays
    * them verbatim.
    */
  def encodingQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = col(textCol)
    df.filter(s.isNotNull)
      .select(col(idCol),
        regexp_count(s, lit("\\x{fffd}")).cast("long").as("n_replacement"),
        regexp_count(s, lit("[\\x{0080}-\\x{009f}]")).cast("long")
          .as("n_c1_controls"),
        regexp_count(s, lit("\\x{00c3}[\\x{0080}-\\x{00bf}]")).cast("long")
          .as("n_latin1_utf8"),
        regexp_count(s, lit("\\x{00c3}[\\x{0080}-\\x{009f}]")).cast("long")
          .as("__overlap"),
        length(s).cast("long").as("n_chars"))
      .withColumn("bad_ratio",
        (col("n_replacement") + col("n_c1_controls") + col("n_latin1_utf8")
          - col("__overlap"))
          .cast("double") / greatest(col("n_chars"), lit(1L)).cast("double"))
      .drop("__overlap")
  }

  /** Major Unicode script ranges as RE2-safe character classes (name →
    * class). Codepoint classes only — no properties like \p{Script=...},
    * which RE2 spells differently than Java — so BOTH engines replay the
    * counts verbatim. `cjk` folds Han + kana + Hangul: for corpus triage
    * the split that matters is script family, not language.
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00c0}-\\x{024f}]",
    "cyrillic" -> "[\\x{0400}-\\x{04ff}]",
    "greek" -> "[\\x{0370}-\\x{03ff}]",
    "arabic" -> "[\\x{0600}-\\x{06ff}]",
    "hebrew" -> "[\\x{0590}-\\x{05ff}]",
    "devanagari" -> "[\\x{0900}-\\x{097f}]",
    "cjk" -> "[\\x{3040}-\\x{30ff}\\x{4e00}-\\x{9fff}\\x{ac00}-\\x{d7af}]")

  /** Unicode script profile — the triage pass a multilingual corpus runs
    * before language ID: per-script codepoint counts, the dominant
    * script (first-wins argmax over [[ScriptRanges]] order, the
    * [[langId]] tie-break stance; `none` when no script chars at all),
    * and an exact-integer mixed-script flag
    * (`(script_chars − dominant) · 10 ≥ script_chars`, i.e. ≥10% of
    * script codepoints outside the dominant script — the spam/mojibake
    * signal script-mixing detectors key on). Scan-only per-row column
    * expressions; digits/punctuation/whitespace count in no script.
    */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = col(textCol)
    val counted = df.filter(s.isNotNull).select(
      (col(idCol) +:
        ScriptRanges.map { case (n, p) =>
          regexp_count(s, lit(p)).cast("long").as(s"n_$n")
        }) :+ length(s).cast("long").as("n_chars"): _*)
    val counts = ScriptRanges.map { case (n, _) => col(s"n_$n") }
    val total = counts.reduce(_ + _)
    val maxC = greatest(counts: _*)
    val dominant = ScriptRanges.tail.foldLeft(
      when(total === 0L, lit("none"))
        .when(col(s"n_${ScriptRanges.head._1}") === maxC,
          lit(ScriptRanges.head._1))) { case (acc, (n, _)) =>
      acc.when(col(s"n_$n") === maxC, lit(n))
    }.otherwise(lit("none"))
    counted
      .withColumn("script_chars", total)
      .withColumn("dominant_script", dominant)
      .withColumn("is_mixed", (total - maxC) * 10L >= total && total > 0L)
  }

  /** One-call frame transformer: append the full stats column set. */
  def withStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", wordCount(t))
      .withColumn("n_bpeish_tokens", bpeishTokenCount(t))
      .withColumn("punct_ratio", punctRatio(t))
      .withColumn("stopword_ratio", stopwordRatio(t))
      .withColumn("mean_word_len", meanWordLength(t))
      .withColumn("quality_score", qualityScore(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("fingerprint", fingerprint(t))
  }

  /** Hashing-trick term features — the fixed-width featurization every
    * cheap text classifier / clusterer ingests: each term maps to
    * `dims` buckets by a hash and the document becomes per-bucket
    * counts. Emitted SPARSE — (id, dim, n) triples — which is the
    * scale-right form: dense vectors materialize dims columns per row
    * whether or not they're touched; the sparse frame shuffles only
    * what exists and densifies at the consumer if it must.
    *
    * `hashDim` maps a lowercased term column to its bucket. The default
    * is `xxhash64 % dims` (fast, well-mixed — the production choice);
    * the gate uses a portable arithmetic hash instead so an external
    * SQL engine can replay the bucketing exactly. One explode + one
    * (id, dim) partial-agg exchange; nothing else moves.
    */
  def hashedTermCounts(df: DataFrame, idCol: String, textCol: String,
                       dims: Int,
                       hashDim: Option[Column => Column] = None): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val h: Column => Column = hashDim.getOrElse(t =>
      pmod(xxhash64(t), lit(dims.toLong)).cast("int"))
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("__term"))
      .filter(col("__term") =!= "")
      .select(col(idCol), h(col("__term")).as("dim"))
      .groupBy(col(idCol), col("dim"))
      .agg(count(lit(1)).cast("long").as("n"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed word-n-gram features
    * are under a small TARGET corpus (curated, in-domain) than under
    * the raw corpus itself —
    *   log w(doc) = Σ_features count·[ln p̂_target(b) − ln p̂_raw(b)]
    * with add-one smoothing over the `dims` hash buckets. Feed the
    * result to the weighted samplers (q100 family) for the resampling
    * half.
    *
    * Integer-log stance (the NB/q121 idiom): each bucket weight is a
    * BIGINT of floored e12-scaled lns, so per-document sums are
    * order-free and external-engine-replayable. Plan shape: features
    * hash-aggregate to (doc, bucket) counts; both corpus distributions
    * collapse to ≤ dims rows; the weight table (dims rows) BROADCASTS
    * into the scoring join — the raw corpus is scanned, never shuffled
    * by anything wider than its own (doc, bucket) pairs. Buckets absent
    * from the raw corpus need no weight (they can never be probed);
    * buckets absent from the target get the smoothed ct=0 weight.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        dims: Int = 128, n: Int = 2,
                        hashDim: Option[Column => Column] = None): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(n >= 1, s"n must be >= 1, got $n")
    val h: Column => Column = hashDim.getOrElse(g =>
      pmod(xxhash64(g), lit(dims.toLong)).cast("int"))
    // raw sliding n-grams WITH duplicates (Dedup.shingles dedups to set
    // semantics — right for Jaccard, wrong here: DSIR weights multiply
    // by occurrence counts); short docs yield their single partial gram.
    // The codegen'd native kernel builds grams 6× faster than a
    // transform/slice higher-order-function chain (measured at sf0.1).
    def feats(df: DataFrame): DataFrame = {
      val toks = split(Dedup.canonicalize(col(textCol)), " ")
      val grams = graft.functions.SketchFunctions.wordNgramsAll(toks, n)
      df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
        .select(col(idCol), explode(grams).as("__g"))
        .filter(col("__g") =!= "")
        .select(col(idCol), h(col("__g")).as("dim"))
        .groupBy(col(idCol), col("dim"))
        .agg(count(lit(1)).cast("long").as("__c"))
    }
    // the raw feature frame feeds BOTH the corpus distribution and the
    // scoring join — cut so the tokenize+hash scan runs once, not twice
    val rawFeats = graft.plans.PlanCapture.cut(feats(raw))
    val tDist = feats(target).groupBy("dim").agg(sum(col("__c")).as("__ct"))
    val rDist = rawFeats.groupBy("dim").agg(sum(col("__c")).as("__cr"))
    val tTot = tDist.agg(coalesce(sum(col("__ct")), lit(0L)).as("__tt"))
    val rTot = rDist.agg(coalesce(sum(col("__cr")), lit(0L)).as("__tr"))
    val weights = rDist.join(tDist, Seq("dim"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("dim"),
        (lnScaled(coalesce(col("__ct"), lit(0L)) + lit(1L))
          - lnScaled(col("__tt") + lit(dims.toLong))
          - lnScaled(col("__cr") + lit(1L))
          + lnScaled(col("__tr") + lit(dims.toLong))).as("__w"))
    rawFeats.join(broadcast(weights), Seq("dim"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).cast("long").as("n_feats"),
        sum(col("__c") * col("__w")).cast("long").as("logw_e12"))
  }

  /** Mixed-language detection — a curation signal the whole-document
    * langId misses by construction: a page that is half English boiler-
    * plate and half German content argmaxes to ONE language and slips
    * through language filters, then pollutes both monolingual corpora.
    * Split on blank lines (the paragraphDedup convention), langId each
    * paragraph, and report per document: paragraph count, distinct
    * predicted languages, the dominant language (paragraph-count argmax,
    * ties to the lexicographically smallest tag — a total order), and
    * the mixed flag.
    *
    * Plan shape: explode map-side → two vocabulary-bounded hash
    * aggregates ((doc, lang) counts, then per-doc argmax as one
    * struct-max) — no window, nothing wider than (doc, lang) shuffles.
    */
  def mixedLanguageProfile(df: DataFrame, idCol: String,
                           textCol: String): DataFrame = {
    val paras = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), "\n\n")).as("__p"))
      .filter(length(trim(col("__p"))) > 0)
    val perLang = paras
      .select(col(idCol), langId(col("__p")).as("__lang"))
      .groupBy(col(idCol), col("__lang"))
      .agg(count(lit(1)).cast("long").as("__n"))
    perLang.groupBy(col(idCol))
      .agg(sum(col("__n")).cast("long").as("n_paragraphs"),
        count(lit(1)).cast("long").as("n_langs"),
        // argmax by count; ties break to the SMALLEST tag: negate the
        // tag ordering by maxing the struct with the count first and a
        // reverse-ordered key — max_by on (n, reversed) is not
        // expressible, so min_by on (-n, lang) gives the same total order
        min_by(col("__lang"), struct((-col("__n")).as("a"),
          col("__lang").as("b"))).as("dominant_lang"))
      .withColumn("is_mixed", col("n_langs") > 1)
  }

  /** Exact corpus percentile of a score column — turn "quality ≥ 0.6"
    * (a threshold that means something different on every corpus) into
    * "top 20% of THIS corpus" (the form mixture specs and tail filters
    * are actually written in). pct_e6 = ⌊10⁶ · |strictly below| / N⌋,
    * an exact integer.
    *
    * The AUC stance on ranking: rows never rank. Scores collapse to the
    * per-distinct-score count frame, the running below-count comes from
    * the two-phase bucket/carry machinery ([[runningBelow]] — a
    * CONTINUOUS score makes the distinct-score frame corpus-sized, so
    * no unpartitioned window ever touches it), and docs join their
    * percentile back by score — a corpus-sized single-task sort never
    * happens.
    */
  def scorePercentiles(df: DataFrame, idCol: String,
                       scoreCol: String): DataFrame = {
    val clean = df.filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
    val perScore = clean.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"))
    val withBelow = runningBelow(perScore, clean, scoreCol, "__n")
    val total = clean.agg(count(lit(1)).as("__tot"))
    clean.select(col(idCol), col(scoreCol))
      .join(withBelow.withColumnRenamed("__s", scoreCol), Seq(scoreCol))
      .crossJoin(broadcast(total))
      .select(col(idCol), col(scoreCol),
        col("__below").cast("long").as("n_below"),
        expr("CAST(__below * 1000000L div __tot AS BIGINT)").as("pct_e6"))
  }

  /** Number of coarse score-range buckets the running-below machinery
    * spreads the per-distinct-score frame over. 1024 keeps the coarse
    * carry frame trivially small while bounding any single fine-window
    * task to ~1/1024 of the score range.
    */
  private val ScoreBuckets = 1024

  /** Exclusive running sum of `weightCol` over the per-distinct-score
    * frame `perScore` (columns `__s` + weights), in ascending `__s`
    * order — WITHOUT an unpartitioned window. A continuous score makes
    * the distinct-score "vocabulary" corpus-sized, so a bare
    * `Window.orderBy(__s)` would be a single-task sort of the corpus;
    * instead this is the two-phase bucket/carry form (the
    * [[Sampling.tokenBudgetPerGroup]] machinery):
    *
    *  1. scores coarse-bucket by uniform value range (bounds are a
    *     2-scalar aggregate of `source` — the rebalance stance; the
    *     double cast is monotone for every numeric type, and equal
    *     doubles just share a bucket, which the fine phase untangles);
    *  2. per-bucket totals (≤ [[ScoreBuckets]]+2 rows BY CONSTRUCTION)
    *     take their exclusive prefix via a constant-partitioned window
    *     — a single task is the CORRECT plan for a frame this small,
    *     and `partitionBy(lit(0))` states that intent;
    *  3. the fine running sum windows WITHIN each bucket
    *     (`partitionBy(__b)`), so no task ever sorts more than one
    *     bucket's worth of distinct scores.
    *
    * NaN scores sort above every numeric in Spark's ordering, so they
    * pin to a dedicated top bucket. Output: `perScore` plus `__below`.
    */
  private def runningBelow(perScore: DataFrame, source: DataFrame,
                           scoreCol: String, weightCols: String*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(weightCols.nonEmpty, "runningBelow needs at least one weight")
    val dt = source.schema(scoreCol).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"score column '$scoreCol' must be numeric, got ${dt.simpleString}")
    val row = source
      .agg(min(col(scoreCol).cast("double")), max(col(scoreCol).cast("double")))
      .collect()(0)
    val bucket: Column =
      if (row.isNullAt(0) || row.getDouble(0) == row.getDouble(1)) lit(0)
      else {
        val (lo, hi) = (row.getDouble(0), row.getDouble(1))
        coalesce(
          least(width_bucket(col("__s").cast("double"), lit(lo), lit(hi),
            lit(ScoreBuckets)), lit(ScoreBuckets)),
          lit(ScoreBuckets + 1L)).cast("int") // NaN → top bucket
      }
    val scored = perScore.withColumn("__b", bucket)
    val carryW = Window.partitionBy(SingleTask.key(col("__b")))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fineW = Window.partitionBy(col("__b")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketSums = weightCols.map(w => sum(col(w)).as(s"__bt_$w"))
    val carry = scored.groupBy(col("__b"))
      .agg(bucketSums.head, bucketSums.tail: _*)
      .select(col("__b") +: weightCols.map(w =>
        coalesce(sum(col(s"__bt_$w")).over(carryW), lit(0L))
          .as(s"__carry_$w")): _*)
    val joined = scored.join(broadcast(carry), Seq("__b"))
    weightCols.foldLeft(joined) { (acc, w) =>
      acc.withColumn(if (weightCols.size == 1) "__below" else s"__below_$w",
        col(s"__carry_$w") +
          coalesce(sum(col(w)).over(fineW), lit(0L)))
    }.drop("__b" +: weightCols.map(w => s"__carry_$w"): _*)
  }

  /** Exact tie-aware ROC AUC of a score column against a boolean label
    * — the eval metric a quality-filter pipeline reports at corpus
    * scale. Computed WITHOUT ranking rows: scores collapse to a
    * per-distinct-score (n_pos, n_neg) frame first, and the running
    * negatives-below count comes from [[runningBelow]]'s two-phase
    * bucket/carry (never an unpartitioned window — a continuous score
    * makes the distinct-score frame corpus-sized); ties are handled by
    * the standard half-credit (Mann-Whitney) convention.
    *
    * Exact integer throughout: auc_e6 = floor(1e6 · Σ_s nPos(s) ·
    * (2·negBelow(s) + nNeg(s)) / (2·P·N)). One row out; degenerate
    * inputs (P = 0 or N = 0) yield null.
    */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val clean = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
    val perScore = clean
      .groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol).cast("long")).as("__np"),
        sum(lit(1L) - col(labelCol).cast("long")).as("__nn"))
    runningBelow(perScore, clean, scoreCol, "__nn")
      .withColumnRenamed("__below", "__negBelow")
      .agg(sum(col("__np")).cast("long").as("n_pos"),
        sum(col("__nn")).cast("long").as("n_neg"),
        sum(col("__np") * (lit(2L) * col("__negBelow") + col("__nn")))
          .cast("long").as("__u2"))
      .selectExpr("n_pos", "n_neg",
        """CASE WHEN n_pos > 0 AND n_neg > 0
          |  THEN (__u2 * 1000000L) div (2L * n_pos * n_neg)
          |  ELSE NULL END AS auc_e6""".stripMargin)
  }

  /** Cohen's kappa between two categorical labelers — the
    * inter-annotator / heuristic-vs-model agreement check a labeling
    * pipeline runs before trusting either. Exact confusion counts (one
    * (a, b) aggregate), then kappa = (D·N − S)/(N² − S) where D =
    * agreements and S = Σ_c rowTotal(c)·colTotal(c) — ONE double
    * division of exact BIGINTs at the end, identical on any engine.
    */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val rowT = cells.groupBy(col("__a").as("__k"))
      .agg(sum(col("__c")).as("__rt"))
    val colT = cells.groupBy(col("__b").as("__k"))
      .agg(sum(col("__c")).as("__ct"))
    val s = rowT.join(colT, Seq("__k"))
      .agg(coalesce(sum(col("__rt") * col("__ct")), lit(0L))
        .cast("long").as("chance_mass"))
    cells
      .agg(sum(col("__c")).cast("long").as("n_total"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(lit(0L)))
          .cast("long").as("n_agree"))
      .crossJoin(s)
      .selectExpr("n_total", "n_agree", "chance_mass",
        """CASE WHEN n_total * n_total <> chance_mass
          |  THEN CAST(n_agree * n_total - chance_mass AS DOUBLE)
          |       / CAST(n_total * n_total - chance_mass AS DOUBLE)
          |  ELSE NULL END AS kappa""".stripMargin)
  }

  /** Calibration reliability bins — is a [0,1] score PROBABILITY-shaped?
    * Scores bucket into `bins` equal-width bins; each bin reports its
    * count, positive count, exact-integer positive rate and mean score
    * (floor-e6 per row BEFORE averaging, so the mean is a pure integer
    * div both engines replay). One partial-agg exchange on the bin key;
    * the reliability-diagram consumer plots bins, never rows.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
          .as("bin"),
        col(labelCol).cast("long").as("__y"),
        floor(col(scoreCol) * 1000000L).cast("long").as("__s6"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__y")).cast("long").as("n_pos"),
        sum(col("__s6")).cast("long").as("__ssum"))
      .selectExpr("bin", "n", "n_pos",
        "(n_pos * 1000000L) div n AS pos_rate_e6",
        "__ssum div n AS mean_score_e6")
  }

  /** Exact phrase search via positional postings — the inverted-index
    * primitive BM25 lacks: find documents containing the words of
    * `phrase` consecutively, with the match COUNT (overlapping matches
    * included — the postings semantics, which substring replace-counting
    * gets wrong).
    *
    * The scan explodes to (doc, pos) for ONLY the phrase's terms (the
    * postings for everything else never materialize), then each
    * adjacent pair joins on (doc, pos+i) — n−1 hash equi-joins whose
    * sides are term-selectivity-sized, never corpus-sized. A real
    * engine keeps the postings as a table; here they build in-scan,
    * same join shape.
    */
  def phraseMatch(df: DataFrame, idCol: String, textCol: String,
                  phrase: String): DataFrame = {
    val terms = phrase.trim.toLowerCase.split("\\s+").toSeq
    require(terms.size >= 2, "phrase must have at least 2 words")
    val toks = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")))
      .select(col(idCol), col("pos"), col("col").as("__t"))
      .filter(col("__t").isin(terms.distinct: _*))
    val first = toks.filter(col("__t") === terms.head)
      .select(col(idCol), col("pos"))
    val matched = terms.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(toks.filter(col("__t") === t)
            .select(col(idCol), (col("pos") - i).as("pos")),
          Seq(idCol, "pos"), "left_semi")
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_matches"))
  }

  /** Per-document sentence segmentation stats — the document-structure
    * signal quality pipelines threshold on (wall-of-text pages have few,
    * very long "sentences"; listicles/boilerplate have many 2-word
    * ones). A sentence is a non-empty trimmed run between `[.!?]+`
    * terminator groups — deliberately regex-simple and RE2-safe (no
    * lookbehind, no abbreviation dictionary) so an external engine
    * replays the segmentation bit-for-bit; the NLP-grade segmenter is a
    * model, not an analytics operator.
    *
    * All four outputs are exact integers (`mean_words_e6` is the
    * floor-scaled mean, the q87/q124 stance — no doubles to drift):
    * `n_sentences`, `total_words`, `max_words`, `mean_words_e6`.
    * Pure per-row array expressions inside the scan — codegen'd, no
    * shuffle, no explode: the sentence array never leaves the row.
    */
  def sentenceStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sents = filter(
      transform(split(col(textCol), "[.!?]+"), s => trim(s)),
      s => length(s) > 0)
    val wordsPer = transform(sents, s => size(split(s, "\\s+")).cast("long"))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), col(textCol),
        size(sents).cast("long").as("n_sentences"),
        coalesce(aggregate(wordsPer, lit(0L), (a, x) => a + x), lit(0L))
          .as("total_words"),
        coalesce(array_max(wordsPer), lit(0L)).as("max_words"))
      .withColumn("mean_words_e6",
        when(col("n_sentences") > 0L,
          expr("(total_words * 1000000) div n_sentences"))
          .otherwise(lit(0L)))
      .drop(textCol)
  }
}
