package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — text analysis: language-ID, tokenization (BPE/unigram), LM scoring, entropy/repetition/readability, encoding repair, chunk/pack.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object TextGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext text — token counts, ratios, quality score, fingerprint.
    "q17_text_stats" -> ((s, dir) => {
      val t = col("text")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextStats.wordCount(t).cast("long").as("n_tokens"),
        TextStats.bpeishTokenCount(t).cast("long").as("n_bpeish"),
        TextStats.punctRatio(t).as("punct_ratio"),
        TextStats.stopwordRatio(t).as("stopword_ratio"),
        TextStats.meanWordLength(t).as("mean_word_len"),
        TextStats.qualityScore(t).as("quality_score"),
        TextStats.fingerprint(t).as("fingerprint"))
    }),

    // ext text — marker-word language identification.
    "q18_text_langid" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred"))
    }),

    // ext text — char-trigram language ID (the n-gram-profile variant).
    "q37_langid_ngram" -> ((s, dir) => {
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextStats.langIdCharNgram(col("text")).as("lang_pred"))
    }),

    // ext text — TF-IDF top terms per document. Linear idf (N/df, one
    // correctly-rounded IEEE division) instead of log-idf: ln() differs in
    // the last ulp across libm implementations, which would make scores —
    // and near-tie rankings — engine-dependent. Shuffles: (doc, term) then
    // term; corpus size joins in via a broadcast 1-row aggregate, not a
    // driver-side count.
    "q47_tfidf_topterms" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").filter(col("doc_id") < 100)
      val toks = docs.select(col("doc_id"),
        explode(split(Dedup.canonicalize(col("text")), " ")).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val score = col("tf") * (col("n_docs").cast("double") / col("df"))
      val w = Window.partitionBy("doc_id").orderBy(desc("score"), col("term"))
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score"), col("rank"))
        .orderBy("doc_id", "rank")
    }),

    // ext text — BM25 ranked retrieval (term saturation + length
    // normalization over q47's TF-IDF shuffle profile); per-term partial
    // scores, linear idf for cross-engine bit-identity.
    "q68_bm25" -> ((s, dir) => {
      TextStats.bm25PerTerm(tbl(s, dir, "documents"), "doc_id", "text",
          Seq("hash", "merge", "scan"))
        .orderBy("doc_id", "term")
    }),

    // ext text — vocabulary coverage curve (terms ranked by frequency,
    // cumulative token share): the tokenizer-vocab sizing query.
    "q76_vocab_coverage" -> ((s, dir) => {
      TextStats.vocabCoverage(tbl(s, dir, "documents"))
        .filter(col("rank") <= 200)
        .orderBy("rank")
    }),

    // ext bpe — tokenization with the learned vocabulary. Oracle-gated
    // since round 12: the rank-greedy per-word merge replay IS
    // SQL-expressible as a recursive CTE (lowest-rank leftmost pair per
    // step); BpeSpec additionally pins losslessness and the rank-greedy
    // order against encodeWord.
    "q119_bpe_tokenize" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val merges = bpeMerges25(s, dir).take(10)
      ext.Bpe.tokenize(
          docs.filter(col("doc_id").isNotNull && col("text").isNotNull),
          "doc_id", "text", merges)
        .select(col("doc_id"), col("n_tokens"),
          array_join(slice(col("tokens"), 1, 5), " ").as("head_tokens"))
        .orderBy("doc_id")
    }),

    // ext functions — Aho–Corasick multi-pattern scan (ONE pass per row
    // whatever the pattern count — the scalable blocklist/marker scan;
    // automaton ships as a codegen reference object): per-pattern
    // occurrence counts over the corpus. The gate's patterns have no
    // self-overlap, so DuckDB's non-overlapping regexp_extract_all
    // counts replay the automaton's all-occurrences semantics exactly.
    "q120_multi_pattern_scan" -> ((s, dir) => {
      val pats = Seq("data", "row", "table", "the")
      val counts = graft.functions.MultiMatchFunctions
        .multiPatternCounts(col("text"), pats)
      tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), counts.as("c"))
        .select(col("doc_id"),
          element_at(col("c"), 1).as("n_data"),
          element_at(col("c"), 2).as("n_row"),
          element_at(col("c"), 3).as("n_table"),
          element_at(col("c"), 4).as("n_the"))
        .withColumn("total",
          col("n_data") + col("n_row") + col("n_table") + col("n_the"))
        .orderBy("doc_id")
    }),

    // ext text — interpolated bigram LM score (the KenLM-shaped upgrade
    // of q87): mean ln(0.75·p(w2|w1) + 0.25·p(w2)) per transition,
    // self-scored against the corpus; integer-scaled logs replayed by
    // the oracle. Catches common words in gibberish ORDER, which
    // unigrams cannot.
    "q124_bigram_logprob" -> ((s, dir) => {
      TextStats.bigramLogProbScore(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext text — encoding-quality audit (mojibake detection): ids cycle
    // through an injected UTF-8-as-latin1 digraph / replacement char /
    // C1 control / clean; three pure per-row regex counts + ratio, the
    // oracle replays the same \x{hhhh} patterns in RE2.
    "q116_encoding_quality" -> ((s, dir) => {
      val marker = when(col("doc_id") % 4 === 0, lit("\u00c3\u00a9"))
        .when(col("doc_id") % 4 === 1, lit("\ufffd"))
        .when(col("doc_id") % 4 === 2, lit("\u0085\u00c3\u0088"))
        .otherwise(lit(""))
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat(marker, col("text")).as("text"))
      ext.TextStats.encodingQuality(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext functions — Unicode NFC normalization (codegen'd JDK
    // Normalizer expression, the pre-dedup canonicalization pass):
    // even ids get a DECOMPOSED e+combining-acute spliced into their
    // text (NFC joins it, length shrinks by 1), odd ids the precomposed
    // char (NFC no-op); the oracle replays with DuckDB nfc_normalize.
    "q114_unicode_nfc" -> ((s, dir) => {
      val raw = concat(substring(col("text"), 1, 10),
        when(col("doc_id") % 2 === 0, lit("e\u0301")).otherwise(lit("\u00e9")),
        substring(col("text"), 11, 10))
      tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.TextNormalizeFunctions.unicodeNormalize(raw)
            .as("nfc_text"),
          length(raw).cast("bigint").as("n_raw"),
          length(graft.functions.TextNormalizeFunctions.unicodeNormalize(raw))
            .cast("bigint").as("n_nfc"))
        .orderBy("doc_id")
    }),

    // ext bpe — BPE vocabulary induction over the corpus. Oracle-gated
    // since round 12: the 25-round merge loop unrolls in SQL (the q213
    // iterative-replay stance) with the deterministic (count, l, r)
    // struct-argmax tiebreak replaying identically in both engines;
    // BpeSpec additionally pins a plain-Scala reference.
    // Learning never iterates over the corpus: one (word, count)
    // aggregate, then vocab-frame rounds.
    "q112_bpe_vocab" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      bpeMerges25(s, dir)
        .toDF()
        .select(col("rank").cast("int"), col("left"), col("right"),
          col("pair_count").cast("bigint"))
        .orderBy("rank")
    }),

    // ext chunking — context-length chunking: overlapping token windows
    // (chunk 12, overlap 4 → stride 8), the split-long-documents half of
    // sequence shaping; pure per-row explode.
    "q89_chunk_documents" -> ((s, dir) => {
      ext.Chunking.chunkByTokens(tbl(s, dir, "documents"),
          "doc_id", "text", chunkTokens = 12, overlapTokens = 4)
        .orderBy("doc_id", "chunk_index")
    }),

    // ext chunking — greedy sequence packing: fill 64-token sequences in
    // (shard, id) order, one running-sum window per shard (the shard is
    // the parallelism lever at scale).
    "q90_pack_sequences" -> ((s, dir) => {
      ext.Chunking.packGreedy(
          tbl(s, dir, "documents").withColumn("shard", pmod(col("doc_id"), lit(8L))),
          "doc_id", "text", seqTokens = 64, shardCol = "shard")
        .orderBy("doc_id")
    }),

    // ext text — corpus-unigram LM quality score (the perplexity-style
    // low-tail filter): mean ln p(token) per document, self-scored
    // against the corpus unigram distribution; decimal-summed so the
    // value is partition-order independent.
    "q87_unigram_logprob" -> ((s, dir) => {
      TextStats.unigramLogProbScore(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext text — repetition/quality signals (the Gopher-style curation
    // gate): within-document duplicate 2-/3-gram fractions and top-token
    // dominance, all pure per-row column math over the shared canonical
    // tokenization.
    "q83_text_repetition" -> ((s, dir) => {
      val t = col("text")
      tbl(s, dir, "documents").select(
        col("doc_id"),
        TextStats.duplicateNgramFraction(t, 2).as("dup_2gram_frac"),
        TextStats.duplicateNgramFraction(t, 3).as("dup_3gram_frac"),
        TextStats.topTokenShare(t).as("top_token_share"))
        .orderBy("doc_id")
    }),

    // functions — character-distribution entropy as a scan-only native
    // expression (the built-in alternative is explode+groupBy: one
    // shuffled row PER CHARACTER of the corpus). Integer-scaled floored
    // terms (the q87 lnScaled stance) make the histogram sum replayable
    // by the oracle in any iteration order; a unicode tail on mod 4
    // pins codepoint (not byte/UTF-16) semantics.
    "q129_char_entropy" -> ((s, dir) => {
      import graft.functions.CharEntropyFunctions._
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" h\u00e9llo w\u00f6rld \u2026")))
            .otherwise(col("text")).as("text"))
      shaped.select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          charLnSumScaled(col("text")).as("ln_sum_e9"),
          charEntropyE9(col("text")).as("entropy_e9"))
        .orderBy("doc_id")
    }),

    // ext text — interpolated TRIGRAM LM score (one order above q124):
    // λ₃·p(w₃|w₁w₂) + λ₂·p(w₃|w₂) + λ₁·p(w₃), corpus-MLE conditionals,
    // floor(ln·1e12) BIGINT sums — the oracle replays every probability
    // in the same double-arithmetic shape.
    "q142_trigram_logprob" -> ((s, dir) => {
      // gate on score_e6, the engine-portable column: the raw double
      // mean is one ulp of ln() away from hash-diverging (see the
      // operator's coarsening note)
      ext.TextStats.trigramLogProbScore(
          tbl(s, dir, "documents")
            .filter(col("lang") === "en" && col("text").isNotNull),
          "doc_id", "text")
        .select("doc_id", "n_trigrams", "score_e6")
        .orderBy("doc_id")
    }),

    // ext text — Unicode script profile (the multilingual triage pass):
    // per-script codepoint counts over RE2-safe ranges, first-wins
    // dominant script, exact-integer ≥10%-minority mixed flag. Shaping
    // by doc_id mod 4 plants pure-Cyrillic, Latin+CJK-mixed, and
    // Arabic-dominant docs among the English base.
    "q138_script_profile" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val shaped = d.select(col("doc_id"),
        when(col("doc_id") % 4 === 1,
          lit("привет мир" +
            " как дела"))
          .when(col("doc_id") % 4 === 2,
            concat(col("text"),
              lit(" 你好世界" +
                " こんにちは")))
          .when(col("doc_id") % 4 === 3,
            lit("مرحبا" +
              " بالعالم ok"))
          .otherwise(col("text")).as("text"))
      ext.TextStats.scriptProfile(shaped, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext text — sentence segmentation stats: boundaries are injected
    // deterministically (the corpus has no punctuation — every
    // table/fast/stream occurrence gains a '.'), then the RE2-safe
    // segmenter splits on [.!?]+ runs and emits exact-integer counts
    // with the floor-scaled mean. Pure in-scan array exprs, no explode.
    "q153_sentences" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
        .select(col("doc_id"),
          regexp_replace(col("text"), "(table|fast|stream)", "$1.")
            .as("text"))
      ext.TextStats.sentenceStats(d, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext search — exact positional phrase match ("table value"):
    // postings materialize for the phrase's terms only, adjacency is a
    // (doc, pos+i) semi-join chain, and overlapping matches count — the
    // oracle checks via an independent position-list join.
    "q173_phrase_match" -> ((s, dir) => {
      ext.TextStats.phraseMatch(
          tbl(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", "table value")
        .orderBy("doc_id")
    }),

    // ext multimodal — charset sniffing over binary payloads: BOM
    // dispatch + exact RFC 3629 UTF-8 well-formedness as a hex regex,
    // pure codegen'd column expressions (no decode attempt — the router
    // that must run BEFORE ANSI decode()). Payload mix per doc id covers
    // every label; the oracle derives labels closed-form.
    "q181_charset_sniff" -> ((s, dir) => {
      val id = col("doc_id")
      val utf8 = encode(col("text"), "UTF-8")
      def bytesLit(bs: Int*): Column = lit(bs.map(_.toByte).toArray)
      val payload = when(id % 5 === 0,
          concat(bytesLit(0xEF, 0xBB, 0xBF), utf8))
        .when(id % 5 === 1, concat(bytesLit(0xFF, 0xFE), utf8))
        .when(id % 5 === 2, concat(bytesLit(0xFE, 0xFF), utf8))
        .when(id % 5 === 3, concat(bytesLit(0xA9), utf8))
        .when(id % 10 === 4, encode(concat(col("text"), lit("é")), "UTF-8"))
        .otherwise(utf8)
      tbl(s, dir, "documents")
        .filter(id.isNotNull && col("text").isNotNull)
        .select(id, ext.Multimodal.sniffCharset(payload).as("charset"))
        .orderBy("doc_id")
    }),

    // ext tokenizer — unigram-LM (SentencePiece-family) vocabulary:
    // substring counts over the DISTINCT-WORD frame (never the corpus),
    // chars force-included for coverage, (count DESC, piece ASC) total
    // order, e12 log-probs. Unlike BPE's sequential merges this learn
    // is fully SQL-replayable — the oracle re-runs the whole selection.
    "q186_unigram_vocab" -> ((s, dir) => {
      ext.UnigramLm.learnFrame(tbl(s, dir, "documents"), "text",
        vocabSize = 200, maxPieceLen = 4, minCount = 2L)
    }),

    // ext tokenizer — exact Viterbi tokenization under the q186
    // vocabulary (shared through the gate memo — the q112/q119 lesson):
    // integer e12 scores, ties to fewer pieces then longer last piece.
    // Oracle-gated since round 12: the all-integer DP unrolls as a
    // recursive CTE with a sliding 4-slot window (the q145 state-chain
    // stance); UnigramLmSpec additionally pins the segmentation laws.
    "q187_unigram_tokenize" -> ((s, dir) => {
      ext.UnigramLm.tokenize(
          tbl(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", unigramVocab200(s, dir), maxPieceLen = 4)
        .orderBy("doc_id")
    }),

    // ext capstone — perplexity-bucketed mixture curation (the DoReMi/
    // CCNet shape): corpus-LM score each en document (q124's exact
    // machinery), bucket by fluency band, then fill each band to a
    // fixed token budget with the exact two-phase sampler (q108's
    // machinery). The oracle chains the stage oracles; bucket cuts are
    // safe because the oracle replays the identical double expression
    // tree, not because the cuts dodge the data.
    "q191_perplexity_mix" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val scored = ext.TextStats.bigramLogProbScore(
        docs.filter(col("lang") === "en"), "doc_id", "text")
      val base = scored
        .join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
        .withColumn("bucket",
          when(col("mean_lp") >= -3.35, "high")
            .when(col("mean_lp") >= -3.40, "mid")
            .otherwise("low"))
      ext.Sampling.tokenBudgetPerGroup(base, "doc_id", "bucket", "n_chars",
          budget = 6000L)
        .select("doc_id", "bucket", "n_chars")
        .orderBy("doc_id")
    }),

    // functions — mojibake repair (ftfy's core move as a codegen'd
    // expression): %3==0 docs arrive as UTF-8-read-as-Latin-1 wrecks
    // (built by encode/decode right in the plan), %3==1 docs carry a
    // REAL Latin-1 é that must survive untouched, the rest are clean
    // ASCII. The structural test repairs exactly the first class; the
    // oracle states the intended text closed-form.
    "q197_fix_mojibake" -> ((s, dir) => {
      val id = col("doc_id")
      val intended = when(id % 3 === 0, concat(col("text"), lit(" café")))
        .when(id % 3 === 1, concat(col("text"), lit(" café")))
        .otherwise(col("text"))
      val arrived = when(id % 3 === 0,
          decode(encode(intended, "UTF-8"), "ISO-8859-1"))
        .otherwise(intended)
      tbl(s, dir, "documents")
        .filter(id.isNotNull && col("text").isNotNull)
        .select(id,
          graft.functions.TextNormalizeFunctions.fixMojibake(arrived)
            .as("fixed"),
          (graft.functions.TextNormalizeFunctions.fixMojibake(arrived)
            === intended).as("recovered"))
        .orderBy("doc_id")
    }),

    // ext text — mixed-language detection: groups of 3 docs join into
    // one multi-paragraph page (blank-line separated, doc_id order), the
    // per-paragraph langId argmax aggregates to paragraph/distinct-lang
    // counts + the dominant tag. The oracle replays langId per original
    // doc (each paragraph IS one doc's text) and the same argmax.
    "q200_mixed_language" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val pages = d
        .groupBy(expr("doc_id div 3").as("page_id"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s.getField("text")), "\n\n").as("page_text"))
      ext.TextStats.mixedLanguageProfile(pages, "page_id", "page_text")
        .orderBy("page_id")
    }),

    // ext quality — Gopher repetition signals (§A1.1): duplicate-line
    // occurrence/char masses, most-frequent-n-gram char mass (n=2..4)
    // and duplicated-n-gram char mass (n=5..10) as EXACT integers from
    // ONE per-row kernel pass (these are per-document numbers — the
    // explode formulation would shuffle ~9× the corpus token count to
    // compute values that never leave the row), plus the paper's
    // thresholds as integer-cross-multiplied boolean flags. The oracle
    // rebuilds every field from unnested lines/grams.
    "q210_repetition_signals" -> ((s, dir) => {
      ext.TextStats.repetitionSignals(tbl(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext text — interpolated Kneser–Ney bigram LM (the standard
    // smoothing: continuation counts, not raw unigram frequency, carry
    // the backed-off mass; absolute discount 0.75): self-scored over
    // the English slice, e12-floored ln terms, e6-coarsened mean (the
    // q142 determinism scheme). Oracle rebuilds every count frame and
    // replays the fixed probability shape.
    "q215_kneser_ney" -> ((s, dir) => {
      ext.TextStats.kneserNeyBigramScore(
          tbl(s, dir, "documents").filter(col("lang") === "en"),
          "doc_id", "text")
        .select("doc_id", "n_bigrams", "score_e6")
        .orderBy("doc_id")
    }),

    // ext text — Flesch reading ease, the replayable variant: regex
    // sentence segments, canonical-token words, vowel-group syllables;
    // one fixed double shape floored at e3. Exact counts + the score.
    "q218_readability" -> ((s, dir) => {
      ext.TextStats.readability(tbl(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext shaping — GPT-style concat-and-slice packing: per shard, docs
    // + one <eos> each concatenate into a token stream sliced into
    // EXACT 128-token sequences, documents straddling boundaries. The
    // engine emits one row per (doc, window) slice and assembles
    // windows in-row; the oracle replays per TOKEN (fine at sf) —
    // identical text only if start offsets, slicing, and offset-ordered
    // assembly all agree.
    "q220_pack_concat" -> ((s, dir) => {
      ext.Chunking.packConcat(
          tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
            .withColumn("shard", (col("doc_id") % 8).cast("int")),
          "doc_id", "text", seqTokens = 128, shardCol = "shard")
        .orderBy("shard", "seq_index")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q37_langid_ngram" -> LangIdNgramOracle,

    // Viterbi tokenize replay (q187): the q186 vocab CTEs verbatim,
    // then the EXACT integer Viterbi as a recursive CTE over word
    // positions carrying a sliding 4-slot DP window (scores are e12
    // BIGINTs - no float hazard) and the growing segmentation string;
    // the candidate argmax is a struct max over (score, -pieces,
    // last-piece-length), the engine's total preference order, which is
    // tie-free on real candidates (distinct lengths differ in ll).
    // Terminal states reassemble per document in word order.
    "q187_unigram_tokenize" ->
      """WITH RECURSIVE w AS (
        |  SELECT word, CAST(sum(1) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL) t
        |  WHERE word <> '' GROUP BY word),
        |subs AS (
        |  SELECT substr(word, u.i, v.l) AS piece, CAST(sum(n) AS BIGINT) AS cnt
        |  FROM w,
        |    unnest(generate_series(1, length(word))) AS u(i),
        |    unnest(generate_series(1, least(4, length(word) - u.i + 1))) AS v(l)
        |  GROUP BY piece),
        |kept AS (SELECT * FROM subs WHERE cnt >= 2 OR length(piece) = 1),
        |rk AS (
        |  SELECT piece, cnt FROM kept
        |  ORDER BY (CASE WHEN length(piece) = 1 THEN 1 ELSE 0 END) DESC,
        |    cnt DESC, piece ASC
        |  LIMIT 200),
        |tot AS (SELECT CAST(greatest(sum(cnt), 1) AS BIGINT) AS t FROM rk),
        |voc AS (
        |  SELECT piece,
        |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e12) AS BIGINT)
        |      - CAST(floor(ln(CAST(tot.t AS DOUBLE)) * 1e12) AS BIGINT) AS lp
        |  FROM rk, tot),
        |mpt AS MATERIALIZED (SELECT map(list(piece), list(lp)) AS mp FROM voc),
        |dwords AS MATERIALIZED (SELECT DISTINCT word FROM w),
        |dp AS (
        |  SELECT word, CAST(0 AS BIGINT) AS i, length(word) AS n,
        |    CAST(0 AS BIGINT) AS s0, 0 AS p0, '' AS g0,
        |    CAST(-100000000000000000 AS BIGINT) AS s1, 0 AS p1, '' AS g1,
        |    CAST(-100000000000000000 AS BIGINT) AS s2, 0 AS p2, '' AS g2,
        |    CAST(-100000000000000000 AS BIGINT) AS s3, 0 AS p3, '' AS g3
        |  FROM dwords
        |  UNION ALL
        |  SELECT word, i + 1 AS i, n,
        |    best.sc AS s0, -best.np AS p0, best.sg AS g0,
        |    s0 AS s1, p0 AS p1, g0 AS g1,
        |    s1 AS s2, p1 AS p2, g1 AS g2,
        |    s2 AS s3, p2 AS p3, g2 AS g3
        |  FROM (
        |    SELECT *, list_aggregate(list_filter(
        |      [CASE WHEN i + 1 - 1 >= 0 AND s0 > -100000000000000000
        |          AND (map_extract(mp, substr(word, i + 2 - 1, 1))[1] IS NOT NULL
        |               OR true)
        |        THEN struct_pack(
        |          sc := s0 + coalesce(map_extract(mp, substr(word, i + 2 - 1, 1))[1],
        |            CAST(-50000000000000 AS BIGINT)),
        |          np := -(p0 + 1),
        |          ll := 1,
        |          sg := CASE WHEN g0 = '' THEN substr(word, i + 2 - 1, 1)
        |                ELSE g0 || ' ' || substr(word, i + 2 - 1, 1) END)
        |        ELSE NULL END,
        |       CASE WHEN i + 1 - 2 >= 0 AND s1 > -100000000000000000
        |          AND (map_extract(mp, substr(word, i + 2 - 2, 2))[1] IS NOT NULL
        |               )
        |        THEN struct_pack(
        |          sc := s1 + coalesce(map_extract(mp, substr(word, i + 2 - 2, 2))[1],
        |            CAST(-100000000000000000 AS BIGINT)),
        |          np := -(p1 + 1),
        |          ll := 2,
        |          sg := CASE WHEN g1 = '' THEN substr(word, i + 2 - 2, 2)
        |                ELSE g1 || ' ' || substr(word, i + 2 - 2, 2) END)
        |        ELSE NULL END,
        |       CASE WHEN i + 1 - 3 >= 0 AND s2 > -100000000000000000
        |          AND (map_extract(mp, substr(word, i + 2 - 3, 3))[1] IS NOT NULL
        |               )
        |        THEN struct_pack(
        |          sc := s2 + coalesce(map_extract(mp, substr(word, i + 2 - 3, 3))[1],
        |            CAST(-100000000000000000 AS BIGINT)),
        |          np := -(p2 + 1),
        |          ll := 3,
        |          sg := CASE WHEN g2 = '' THEN substr(word, i + 2 - 3, 3)
        |                ELSE g2 || ' ' || substr(word, i + 2 - 3, 3) END)
        |        ELSE NULL END,
        |       CASE WHEN i + 1 - 4 >= 0 AND s3 > -100000000000000000
        |          AND (map_extract(mp, substr(word, i + 2 - 4, 4))[1] IS NOT NULL
        |               )
        |        THEN struct_pack(
        |          sc := s3 + coalesce(map_extract(mp, substr(word, i + 2 - 4, 4))[1],
        |            CAST(-100000000000000000 AS BIGINT)),
        |          np := -(p3 + 1),
        |          ll := 4,
        |          sg := CASE WHEN g3 = '' THEN substr(word, i + 2 - 4, 4)
        |                ELSE g3 || ' ' || substr(word, i + 2 - 4, 4) END)
        |        ELSE NULL END],
        |      x -> x IS NOT NULL), 'max') AS best
        |    FROM dp CROSS JOIN mpt
        |    WHERE i < n) t
        |),
        |term AS MATERIALIZED (
        |  SELECT word, g0 AS seg, p0 AS np FROM dp WHERE i = n),
        |docs AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(lower(text),
        |      '\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |dw AS (
        |  SELECT doc_id, u.i AS wi, ws[u.i] AS word, len(ws) AS n_words
        |  FROM docs, unnest(generate_series(1, len(ws))) u(i)),
        |agg AS (
        |  SELECT dw.doc_id, max(dw.n_words) AS n_words,
        |    CAST(sum(t.np) AS BIGINT) AS n_pieces,
        |    string_agg(t.seg, ' ' ORDER BY dw.wi) AS pieces
        |  FROM dw JOIN term t USING (word)
        |  GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
        |  CAST(coalesce(a.n_pieces, 0) AS BIGINT) AS n_pieces,
        |  coalesce(a.pieces, '') AS pieces
        |FROM docs d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // BPE induction replay (q112): the full 25-round merge loop
    // unrolled ([[Support.bpeLearnSql]]) — pair counts, struct argmax
    // with the engine's (count, l, r) tiebreak, list_reduce merge
    // application — so the learned vocabulary replays bit-for-bit.
    "q112_bpe_vocab" ->
      s"""WITH $BpeTokCte,
         |${bpeLearnSql(25)}
         |SELECT rank, "left", "right", pair_count FROM mm
         |ORDER BY rank""".stripMargin,

    // BPE tokenization replay (q119): the 10-round learn (the first 10
    // rows of q112's table — the prefix property) plus the rank-greedy
    // per-word encoder as a RECURSIVE CTE: per step, the lowest-rank
    // adjacent pair (leftmost on ties — list_position finds the first
    // min) fuses, until no learned pair applies; terminal states
    // reassemble per document in word order.
    "q119_bpe_tokenize" ->
      s"""WITH RECURSIVE $BpeTokCte,
         |${bpeLearnSql(10)},
         |mpt AS MATERIALIZED (
         |  SELECT map(list("left" || chr(9) || "right" ORDER BY rank),
         |             list(rank ORDER BY rank)) AS mp FROM mm),
         |enc AS (
         |  SELECT word, syms FROM w0
         |  UNION ALL
         |  SELECT word,
         |    array_to_string(list_concat(list_concat(ss[:bi - 1],
         |      [ss[bi] || ss[bi + 1]]), ss[bi + 2:]), chr(9)) AS syms
         |  FROM (
         |    SELECT word, ss, list_position(rks, list_min(rks)) AS bi,
         |      list_min(rks) AS br
         |    FROM (
         |      SELECT word, ss,
         |        list_transform(generate_series(1, len(ss) - 1),
         |          i -> coalesce(map_extract(mp,
         |            ss[i] || chr(9) || ss[i + 1])[1], 999999)) AS rks
         |      FROM (SELECT word, string_split(syms, chr(9)) AS ss
         |            FROM enc)
         |        CROSS JOIN mpt) t) t2
         |  WHERE br < 999999),
         |term AS MATERIALIZED (
         |  SELECT word, ss FROM (
         |    SELECT word, ss,
         |      list_min(list_transform(generate_series(1, len(ss) - 1),
         |        i -> coalesce(map_extract(mp,
         |          ss[i] || chr(9) || ss[i + 1])[1], 999999))) AS br
         |    FROM (SELECT word, string_split(syms, chr(9)) AS ss FROM enc)
         |      CROSS JOIN mpt) t
         |  WHERE br IS NULL OR br = 999999),
         |docs AS MATERIALIZED (
         |  SELECT doc_id,
         |    list_filter(string_split(trim(regexp_replace(lower(text),
         |      '\\s+', ' ', 'g')), ' '), x -> x <> '') AS ws
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |dw AS (
         |  SELECT doc_id, u.i AS wi, ws[u.i] AS word
         |  FROM docs, unnest(generate_series(1, len(ws))) u(i)),
         |flat AS (
         |  SELECT dw.doc_id, flatten(list(t.ss ORDER BY dw.wi)) AS toks
         |  FROM dw JOIN term t USING (word)
         |  GROUP BY 1)
         |SELECT d.doc_id, CAST(coalesce(len(f.toks), 0) AS BIGINT) AS n_tokens,
         |  coalesce(array_to_string(f.toks[:5], ' '), '') AS head_tokens
         |FROM docs d LEFT JOIN flat f USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // the four patterns have no border (prefix = suffix), so
    // non-overlapping counts == all-occurrence counts per pattern
    "q120_multi_pattern_scan" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, 'data')) AS BIGINT) AS n_data,
        |  CAST(len(regexp_extract_all(text, 'row')) AS BIGINT) AS n_row,
        |  CAST(len(regexp_extract_all(text, 'table')) AS BIGINT) AS n_table,
        |  CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the,
        |  CAST(len(regexp_extract_all(text, 'data'))
        |     + len(regexp_extract_all(text, 'row'))
        |     + len(regexp_extract_all(text, 'table'))
        |     + len(regexp_extract_all(text, 'the')) AS BIGINT) AS total
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // interpolated bigram probability in ONE fixed double-arithmetic
    // shape, quantized and BIGINT-summed (the q87 replay stance)
    "q124_bigram_logprob" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |bi AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |toks AS (SELECT unnest(t) AS term FROM d),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |c2 AS (SELECT term, count(*) AS c2 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |sc AS (
        |  SELECT b.doc_id,
        |    CAST(floor(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
        |      + 0.25 * (CAST(c2.c2 AS DOUBLE) / n)) * 1e12) AS BIGINT) AS lp
        |  FROM bi b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |    JOIN c2 ON b.w2 = c2.term CROSS JOIN tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(lp) AS DOUBLE) / 1e12 / count(*) AS mean_lp
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // chr(195)||chr(169) = a lowercase-accent mojibake digraph,
    // chr(65533) = U+FFFD, chr(133)||chr(195)||chr(136) = a bare C1
    // control plus an UPPERCASE-accent digraph whose continuation is
    // itself C1 (the overlap the ratio subtracts); DuckDB
    // regexp_extract_all + len counts matches
    "q116_encoding_quality" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    concat(CASE WHEN doc_id % 4 = 0 THEN chr(195) || chr(169)
        |                WHEN doc_id % 4 = 1 THEN chr(65533)
        |                WHEN doc_id % 4 = 2 THEN chr(133) || chr(195) || chr(136)
        |                ELSE '' END, text) AS t
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(t, '\x{fffd}')) AS BIGINT)
        |      AS n_replacement,
        |    CAST(len(regexp_extract_all(t, '[\x{0080}-\x{009f}]')) AS BIGINT)
        |      AS n_c1_controls,
        |    CAST(len(regexp_extract_all(t, '\x{00c3}[\x{0080}-\x{00bf}]')) AS BIGINT)
        |      AS n_latin1_utf8,
        |    CAST(len(regexp_extract_all(t, '\x{00c3}[\x{0080}-\x{009f}]')) AS BIGINT)
        |      AS ovl,
        |    CAST(length(t) AS BIGINT) AS n_chars
        |  FROM base)
        |SELECT doc_id, n_replacement, n_c1_controls, n_latin1_utf8, n_chars,
        |  CAST(n_replacement + n_c1_controls + n_latin1_utf8 - ovl AS DOUBLE)
        |    / greatest(n_chars, 1) AS bad_ratio
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // chr(769) = U+0301 combining acute, chr(233) = U+00E9 precomposed;
    // DuckDB length() counts code points like Spark's
    "q114_unicode_nfc" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    concat(substr(text, 1, 10),
        |      CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769) ELSE chr(233) END,
        |      substr(text, 11, 10)) AS raw
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |SELECT doc_id, nfc_normalize(raw) AS nfc_text,
        |  CAST(length(raw) AS BIGINT) AS n_raw,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc
        |FROM base
        |ORDER BY doc_id""".stripMargin,

    "q89_chunk_documents" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((s - 1) // 8 AS INT) AS chunk_index,
        |  array_to_string(list_slice(toks, s, s + 11), ' ') AS chunk_text,
        |  CAST(least(len(toks) - s + 1, 12) AS BIGINT) AS n_chunk_tokens
        |FROM t, unnest(generate_series(1, greatest(len(toks), 1), 8)) AS u(s)
        |ORDER BY doc_id, chunk_index""".stripMargin,

    "q90_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT shard, doc_id, n_tokens,
        |  CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        - n_tokens) // 64 AS BIGINT) AS seq_index
        |FROM t
        |ORDER BY doc_id""".stripMargin,

    "q87_unigram_logprob" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM d),
        |freq AS (SELECT term, count(*) AS n_t FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM toks)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CAST(floor(ln(CAST(f.n_t AS DOUBLE)) * 1e12) AS BIGINT)) AS DOUBLE)
        |    / 1e12 / count(*) - ln(n_total) AS mean_lp
        |FROM toks t JOIN freq f USING (term) CROSS JOIN tot
        |GROUP BY t.doc_id, n_total
        |ORDER BY t.doc_id""".stripMargin,

    "q17_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextStats.BpeishPattern}')) AS BIGINT) AS n_bpeish,
         |  CAST(len(regexp_extract_all(text, '[.,!?;:''"()\\[\\]{}_-]')) AS DOUBLE)
         |    / greatest(length(text), 1) AS punct_ratio,
         |  CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |      x -> list_contains(${TextStats.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS DOUBLE)
         |    / greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) AS stopword_ratio,
         |  CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> length(x))) AS DOUBLE)
         |    / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) AS mean_word_len,
         |  CAST((CASE WHEN length(text) BETWEEN 20 AND 100000 THEN 3 ELSE 0 END)
         |    + (CASE WHEN CAST(len(regexp_extract_all(text, '[.,!?;:''"()\\[\\]{}_-]')) AS DOUBLE) / greatest(length(text), 1) < 0.3 THEN 2 ELSE 0 END)
         |    + (CASE WHEN CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
         |          x -> list_contains(${TextStats.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")}, x))) AS DOUBLE)
         |          / greatest(len(regexp_split_to_array(trim(lower(text)), '\\s+')), 1) > 0.05 THEN 3 ELSE 0 END)
         |    + (CASE WHEN CAST(list_sum(list_transform(regexp_split_to_array(trim(text), '\\s+'), x -> length(x))) AS DOUBLE)
         |          / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1) BETWEEN 2.0 AND 12.0 THEN 2 ELSE 0 END) AS DOUBLE) / 10 AS quality_score,
         |  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
         |FROM documents""".stripMargin,

    "q18_text_langid" -> LangIdOracle,

    "q47_tfidf_topterms" ->
      """WITH d AS (SELECT * FROM documents WHERE doc_id < 100),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM d),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM d)
        |SELECT doc_id, term, tf, df,
        |  tf * (n_docs / df) AS score,
        |  CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tf * (n_docs / df) DESC, term) AS INT) AS rank
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |QUALIFY rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    // same association order as bm25PerTerm: every op is one
    // correctly-rounded IEEE step, so scores are bit-identical
    "q68_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |    CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
        |  FROM toks),
        |t AS (
        |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, term, dl, CAST(count(*) AS DOUBLE) AS tf
        |  FROM t WHERE term IN ('hash', 'merge', 'scan') GROUP BY 1, 2, 3),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
        |    * ((tf * CAST(2.2 AS DOUBLE))
        |      / (tf + CAST(1.2 AS DOUBLE)
        |        * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (dl / avgdl)))) AS score
        |FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        |ORDER BY doc_id, term""".stripMargin,

    "q76_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |c AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
        |SELECT term, n,
        |  CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank,
        |  CAST(sum(n) OVER (ORDER BY n DESC, term) AS DOUBLE)
        |    / CAST(n_total AS DOUBLE) AS cum_share
        |FROM c CROSS JOIN t
        |QUALIFY rank <= 200
        |ORDER BY rank""".stripMargin,

    "q83_text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |    len(list_distinct(list_transform(
        |      generate_series(1, greatest(len(toks) - 1, 1)),
        |      i -> array_to_string(list_slice(toks, i, i + 1), ' ')))) AS d2,
        |    len(list_distinct(list_transform(
        |      generate_series(1, greatest(len(toks) - 2, 1)),
        |      i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS d3
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(1 AS DOUBLE) - CAST(d2 AS DOUBLE) / CAST(greatest(len(toks) - 1, 1) AS DOUBLE)
        |  ELSE 0.0 END AS dup_2gram_frac,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(1 AS DOUBLE) - CAST(d3 AS DOUBLE) / CAST(greatest(len(toks) - 2, 1) AS DOUBLE)
        |  ELSE 0.0 END AS dup_3gram_frac,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_max(list_transform(list_distinct(toks),
        |      u -> len(list_filter(toks, x -> x = u)))) AS DOUBLE)
        |      / CAST(len(toks) AS DOUBLE)
        |  ELSE 0.0 END AS top_token_share
        |FROM g
        |ORDER BY doc_id""".stripMargin,

    // rebuilds the per-codepoint histogram and the floored-term sum
    // S = sum(c * floor(ln(c)*1e9)) — order-independent by construction —
    // then the same two floored derivations as the expression's callers
    "q129_char_entropy" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 4 = 0
        |      THEN text || ' h' || chr(233) || 'llo w' || chr(246) || 'rld ' || chr(8230)
        |      ELSE text END AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |ch AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
        |    i -> substr(text, i, 1))) AS c
        |  FROM base),
        |cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2),
        |s AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN n < 2 THEN 0
        |        ELSE n * CAST(floor(ln(n) * 1e9) AS BIGINT) END) AS ln_sum,
        |    CAST(sum(n) AS BIGINT) AS n_chars
        |  FROM cnt GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(coalesce(s.n_chars, 0) AS BIGINT) AS n_chars,
        |  CAST(coalesce(s.ln_sum, 0) AS BIGINT) AS ln_sum_e9,
        |  CAST(floor(ln(greatest(coalesce(s.n_chars, 0), 1)) * 1e9) AS BIGINT)
        |    - CAST(floor(CAST(coalesce(s.ln_sum, 0) AS DOUBLE)
        |        / greatest(coalesce(s.n_chars, 0), 1)) AS BIGINT) AS entropy_e9
        |FROM base b LEFT JOIN s ON b.doc_id = s.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // q124's replay one order up: trigram windows + bigram transitions +
    // unigrams, interpolated in the identical double-arithmetic shape.
    // STAGED CTEs (j1/j2/sc, one-ON-join steps) rather than q124's flat
    // six-relation join: the flat form trips a DuckDB join-planner cliff
    // (minutes on 11k rows); the staged probabilities are the same IEEE
    // doubles, so values are unchanged
    "q142_trigram_logprob" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |tri AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2, u.w3 AS w3
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
        |          i -> {'w1': t[i], 'w2': t[i + 1], 'w3': t[i + 2]})) AS u
        |        FROM d WHERE len(t) >= 3)),
        |bi AS (
        |  SELECT u.b1 AS b1, u.b2 AS b2
        |  FROM (SELECT unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'b1': t[i], 'b2': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |toks AS (SELECT unnest(t) AS term FROM d),
        |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri GROUP BY 1, 2, 3),
        |ctx12 AS (SELECT w1, w2, count(*) AS ctx12 FROM tri GROUP BY 1, 2),
        |c23 AS (SELECT b1, b2, count(*) AS c23 FROM bi GROUP BY 1, 2),
        |c2b AS (SELECT b1, count(*) AS c2b FROM bi GROUP BY 1),
        |c3 AS (SELECT term, count(*) AS c3 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |u3 AS (SELECT term, CAST(c3 AS DOUBLE) / (SELECT n FROM tot) AS p3 FROM c3),
        |j1 AS (
        |  SELECT g.doc_id, g.w2, g.w3,
        |    CAST(c123.c123 AS DOUBLE) / CAST(ctx12.ctx12 AS DOUBLE) AS p1
        |  FROM tri g JOIN c123 USING (w1, w2, w3) JOIN ctx12 USING (w1, w2)),
        |j2 AS (
        |  SELECT j1.doc_id, j1.w3, j1.p1,
        |    CAST(c23.c23 AS DOUBLE) / CAST(c2b.c2b AS DOUBLE) AS p2
        |  FROM j1 JOIN c23 ON j1.w2 = c23.b1 AND j1.w3 = c23.b2
        |    JOIN c2b ON j1.w2 = c2b.b1),
        |sc AS (
        |  SELECT j2.doc_id,
        |    CAST(floor(ln(0.6 * j2.p1 + 0.3 * j2.p2 + 0.1 * u3.p3) * 1e12)
        |      AS BIGINT) AS lp
        |  FROM j2 JOIN u3 ON j2.w3 = u3.term)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1e6) AS BIGINT)
        |    AS score_e6
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // per-script counts via regexp_extract_all over the same RE2 classes,
    // dominant via greatest + first-wins CASE, mixed flag exact-integer
    "q138_script_profile" -> {
      val ranges = TextStats.ScriptRanges
      val countCols = ranges.map { case (n, p) =>
        s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$n"
      }.mkString(",\n        |    ")
      val names = ranges.map { case (n, _) => s"n_$n" }
      val total = names.mkString(" + ")
      val cases = ranges.map { case (n, _) =>
        s"WHEN n_$n = mx THEN '$n'"
      }.mkString(" ")
      s"""WITH shaped AS (
        |  SELECT doc_id, CASE
        |    WHEN doc_id % 4 = 1 THEN 'привет мир как дела'
        |    WHEN doc_id % 4 = 2 THEN text || ' 你好世界 こんにちは'
        |    WHEN doc_id % 4 = 3 THEN 'مرحبا بالعالم ok'
        |    ELSE text END AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id,
        |    $countCols,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM shaped),
        |t AS (
        |  SELECT *, CAST($total AS BIGINT) AS script_chars,
        |    greatest(${names.mkString(", ")}) AS mx
        |  FROM c)
        |SELECT doc_id, ${names.mkString(", ")}, n_chars, script_chars,
        |  CASE WHEN script_chars = 0 THEN 'none' $cases
        |       ELSE 'none' END AS dominant_script,
        |  ((script_chars - mx) * 10 >= script_chars
        |    AND script_chars > 0) AS is_mixed
        |FROM t ORDER BY doc_id""".stripMargin
    },

    // the same punctuation injection (RE2 '\1', global flag) and
    // [.!?]+ segmentation replayed over DuckDB list ops
    "q153_sentences" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_replace(text, '(table|fast|stream)', '\1.', 'g') AS text
        |  FROM documents WHERE doc_id IS NOT NULL),
        |s AS (SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(x)), x -> x <> '') AS sents
        |  FROM t),
        |w AS (SELECT doc_id, sents,
        |    list_transform(sents,
        |      x -> CAST(len(regexp_split_to_array(x, '\s+')) AS BIGINT)) AS wp
        |  FROM s)
        |SELECT doc_id,
        |  CAST(len(sents) AS BIGINT) AS n_sentences,
        |  CAST(coalesce(list_sum(wp), 0) AS BIGINT) AS total_words,
        |  CAST(coalesce(list_max(wp), 0) AS BIGINT) AS max_words,
        |  CAST(CASE WHEN len(sents) > 0
        |    THEN (coalesce(list_sum(wp), 0) * 1000000) // len(sents)
        |    ELSE 0 END AS BIGINT) AS mean_words_e6
        |FROM w ORDER BY doc_id""".stripMargin,

    // independent replay: full position lists + an adjacency join
    "q173_phrase_match" ->
      """WITH arr AS (
        |  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |pos AS (
        |  SELECT doc_id, u.i, a[u.i] AS t
        |  FROM arr, unnest(generate_series(1, len(a))) u(i))
        |SELECT p1.doc_id, CAST(count(*) AS BIGINT) AS n_matches
        |FROM pos p1 JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i = p1.i + 1
        |WHERE p1.t = 'table' AND p2.t = 'value'
        |GROUP BY p1.doc_id
        |ORDER BY p1.doc_id""".stripMargin,

    // label derivation closed-form: BOM branches by id, the 0xA9 branch
    // is structurally invalid UTF-8, 'é' forces the multibyte branch,
    // and ascii-vs-utf8 falls out of octet-vs-char length
    "q181_charset_sniff" ->
      """SELECT doc_id,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'utf-8-bom'
        |    WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'utf-16be'
        |    WHEN 3 THEN 'binary'
        |    ELSE CASE
        |      WHEN doc_id % 10 = 4 THEN 'utf-8'
        |      WHEN octet_length(encode(text)) = length(text) THEN 'ascii'
        |      ELSE 'utf-8' END
        |  END AS charset
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // the full selection replay: distinct-word substring counts,
    // char-exempt minCount cut, chars-first ranked LIMIT, e12 log-probs
    // against the selected-vocab total
    "q186_unigram_vocab" ->
      """WITH w AS (
        |  SELECT word, CAST(sum(1) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
        |    FROM documents WHERE text IS NOT NULL) t
        |  WHERE word <> '' GROUP BY word),
        |subs AS (
        |  SELECT substr(word, u.i, v.l) AS piece, CAST(sum(n) AS BIGINT) AS cnt
        |  FROM w,
        |    unnest(generate_series(1, length(word))) AS u(i),
        |    unnest(generate_series(1, least(4, length(word) - u.i + 1))) AS v(l)
        |  GROUP BY piece),
        |kept AS (SELECT * FROM subs WHERE cnt >= 2 OR length(piece) = 1),
        |ranked AS (
        |  SELECT piece, cnt FROM kept
        |  ORDER BY (CASE WHEN length(piece) = 1 THEN 1 ELSE 0 END) DESC,
        |    cnt DESC, piece ASC
        |  LIMIT 200),
        |tot AS (SELECT CAST(greatest(sum(cnt), 1) AS BIGINT) AS t FROM ranked)
        |SELECT piece, cnt AS count,
        |  CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e12) AS BIGINT)
        |    - CAST(floor(ln(CAST(tot.t AS DOUBLE)) * 1e12) AS BIGINT)
        |    AS logp_e12
        |FROM ranked, tot
        |ORDER BY count DESC, piece ASC""".stripMargin,

    // chains q124's scoring replay (identical double tree → identical
    // buckets) into q108's per-group budget window
    "q191_perplexity_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |bi AS (
        |  SELECT doc_id, u.w1 AS w1, u.w2 AS w2
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |toks AS (SELECT unnest(t) AS term FROM d),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
        |c2 AS (SELECT term, count(*) AS c2 FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks),
        |sc AS (
        |  SELECT b.doc_id,
        |    CAST(floor(ln(0.75 * (CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
        |      + 0.25 * (CAST(c2.c2 AS DOUBLE) / n)) * 1e12) AS BIGINT) AS lp
        |  FROM bi b JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |    JOIN c2 ON b.w2 = c2.term CROSS JOIN tot),
        |m AS (
        |  SELECT doc_id, CAST(sum(lp) AS DOUBLE) / 1e12 / count(*) AS mean_lp
        |  FROM sc GROUP BY doc_id),
        |bk AS (
        |  SELECT m.doc_id,
        |    CASE WHEN m.mean_lp >= -3.35 THEN 'high'
        |         WHEN m.mean_lp >= -3.40 THEN 'mid'
        |         ELSE 'low' END AS bucket,
        |    doc.n_chars
        |  FROM m JOIN documents doc ON doc.doc_id = m.doc_id)
        |SELECT doc_id, bucket, n_chars FROM (
        |  SELECT doc_id, bucket, n_chars,
        |    sum(n_chars) OVER (PARTITION BY bucket
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM bk
        |  WHERE doc_id IS NOT NULL AND bucket IS NOT NULL
        |    AND n_chars IS NOT NULL AND n_chars >= 0)
        |WHERE cum <= 6000
        |ORDER BY doc_id""".stripMargin,

    // langId replay per ORIGINAL doc (each paragraph is one doc's
    // text), grouped to pages with the same count-then-tag argmax
    "q200_mixed_language" -> {
      s"""WITH pred AS ($LangIdOracle),
         |d AS (
         |  SELECT p.doc_id, p.lang_pred
         |  FROM pred p JOIN documents doc ON doc.doc_id = p.doc_id
         |  WHERE doc.text IS NOT NULL AND length(trim(doc.text)) > 0),
         |c AS (
         |  SELECT doc_id // 3 AS page_id, lang_pred,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM d GROUP BY 1, 2),
         |dom AS (
         |  SELECT page_id, lang_pred AS dominant_lang
         |  FROM (SELECT page_id, lang_pred,
         |          row_number() OVER (PARTITION BY page_id
         |            ORDER BY n DESC, lang_pred ASC) AS rn
         |        FROM c)
         |  WHERE rn = 1)
         |SELECT c.page_id, CAST(sum(c.n) AS BIGINT) AS n_paragraphs,
         |  CAST(count(*) AS BIGINT) AS n_langs,
         |  any_value(dom.dominant_lang) AS dominant_lang,
         |  (count(*) > 1) AS is_mixed
         |FROM c JOIN dom ON dom.page_id = c.page_id
         |GROUP BY c.page_id
         |ORDER BY c.page_id""".stripMargin
    },

    // the INTENDED text in closed form: mojibake rows repair to it,
    // genuine Latin-1 rows already carry it, recovered is true for all
    "q197_fix_mojibake" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN text || ' café'
        |       ELSE text END AS fixed,
        |  true AS recovered
        |FROM documents
        |WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // every field rebuilt from unnested lines/grams; binary string
    // order on gram ties matches the kernel's UTF-8 byte compare
    "q210_repetition_signals" -> {
      def gramCtes(n: Int): String =
        s"""g$n AS (
           |  SELECT doc_id, array_to_string(list_slice(toks, u.i, u.i + ${n - 1}), ' ') AS g
           |  FROM w, unnest(generate_series(1, len(toks) - ${n - 1})) AS u(i)
           |  WHERE len(toks) >= $n),
           |gc$n AS (
           |  SELECT doc_id, g, count(*) AS c, length(g) AS glen
           |  FROM g$n GROUP BY doc_id, g)""".stripMargin
      val tops = (2 to 4).map { n =>
        s"""t$n AS (
           |  SELECT doc_id, CAST(c * glen AS BIGINT) AS top_gram_chars_$n
           |  FROM (SELECT doc_id, c, glen,
           |          row_number() OVER (PARTITION BY doc_id
           |            ORDER BY c DESC, g ASC) AS rn
           |        FROM gc$n) WHERE rn = 1)""".stripMargin
      }
      val dups = (5 to 10).map { n =>
        s"""u$n AS (
           |  SELECT doc_id,
           |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * glen END), 0)
           |      AS BIGINT) AS dup_gram_chars_$n
           |  FROM gc$n GROUP BY doc_id)""".stripMargin
      }
      def flag(num: String, den: String, pct: Int, name: String): String =
        s"($den > 0 AND $num * 100 > $den * $pct) AS $name"
      s"""WITH d AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
         |w AS (
         |  SELECT doc_id, list_filter(
         |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
         |    x -> x <> '') AS toks
         |  FROM d),
         |base AS (
         |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         |    CAST(CASE WHEN len(toks) = 0 THEN 0
         |      ELSE list_sum(list_transform(toks, x -> length(x)))
         |           + len(toks) - 1 END AS BIGINT) AS text_chars
         |  FROM w),
         |rawlines AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(u.l, '^[ \\t\\f\\r]+', ''),
         |      '[ \\t\\f\\r]+$$', '') AS line
         |  FROM d, unnest(string_split(text, chr(10))) AS u(l)),
         |lc AS (
         |  SELECT doc_id, line, count(*) AS c, length(line) AS llen
         |  FROM rawlines WHERE line <> '' GROUP BY doc_id, line),
         |lagg AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c END), 0) AS BIGINT)
         |      AS dup_line_count,
         |    CAST(coalesce(sum(CASE WHEN c >= 2 THEN c * llen END), 0) AS BIGINT)
         |      AS dup_line_chars,
         |    CAST(sum(c * llen) AS BIGINT) AS line_chars_total
         |  FROM lc GROUP BY doc_id),
         |${gramCtes(2)}, ${gramCtes(3)}, ${gramCtes(4)},
         |${gramCtes(5)}, ${gramCtes(6)}, ${gramCtes(7)},
         |${gramCtes(8)}, ${gramCtes(9)}, ${gramCtes(10)},
         |${tops.mkString(",\n")},
         |${dups.mkString(",\n")}
         |SELECT b.doc_id, b.n_words, b.text_chars,
         |  coalesce(l.n_lines, 0) AS n_lines,
         |  coalesce(l.dup_line_count, 0) AS dup_line_count,
         |  coalesce(l.dup_line_chars, 0) AS dup_line_chars,
         |  coalesce(l.line_chars_total, 0) AS line_chars_total,
         |  ${(2 to 4).map(n => s"coalesce(t$n.top_gram_chars_$n, 0) AS top_gram_chars_$n").mkString(",\n         |  ")},
         |  ${(5 to 10).map(n => s"coalesce(u$n.dup_gram_chars_$n, 0) AS dup_gram_chars_$n").mkString(",\n         |  ")},
         |  ${flag("coalesce(l.dup_line_count, 0)", "coalesce(l.n_lines, 0)", 30, "flag_dup_line")},
         |  ${flag("coalesce(l.dup_line_chars, 0)", "coalesce(l.line_chars_total, 0)", 20, "flag_dup_line_char")},
         |  ${flag("coalesce(t2.top_gram_chars_2, 0)", "b.text_chars", 20, "flag_top_2gram")},
         |  ${flag("coalesce(t3.top_gram_chars_3, 0)", "b.text_chars", 18, "flag_top_3gram")},
         |  ${flag("coalesce(t4.top_gram_chars_4, 0)", "b.text_chars", 16, "flag_top_4gram")},
         |  ${flag("coalesce(u5.dup_gram_chars_5, 0)", "b.text_chars", 15, "flag_dup_5gram")},
         |  ${flag("coalesce(u6.dup_gram_chars_6, 0)", "b.text_chars", 14, "flag_dup_6gram")},
         |  ${flag("coalesce(u7.dup_gram_chars_7, 0)", "b.text_chars", 13, "flag_dup_7gram")},
         |  ${flag("coalesce(u8.dup_gram_chars_8, 0)", "b.text_chars", 12, "flag_dup_8gram")},
         |  ${flag("coalesce(u9.dup_gram_chars_9, 0)", "b.text_chars", 11, "flag_dup_9gram")},
         |  ${flag("coalesce(u10.dup_gram_chars_10, 0)", "b.text_chars", 10, "flag_dup_10gram")}
         |FROM base b
         |LEFT JOIN lagg l USING (doc_id)
         |${(2 to 4).map(n => s"LEFT JOIN t$n USING (doc_id)").mkString("\n         |")}
         |${(5 to 10).map(n => s"LEFT JOIN u$n USING (doc_id)").mkString("\n         |")}
         |ORDER BY doc_id""".stripMargin
    },

    // count frames + the verbatim fixed probability shape:
    // (c−D)/cv + (D·(n1v/cv))·(n1w/nall)
    "q215_kneser_ney" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents WHERE lang = 'en' AND text IS NOT NULL),
        |bi AS (
        |  SELECT doc_id, u.v AS v, u.w AS w
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |          i -> {'v': t[i], 'w': t[i + 1]})) AS u
        |        FROM d WHERE len(t) >= 2)),
        |cvw AS (SELECT v, w, count(*) AS cvw FROM bi GROUP BY 1, 2),
        |cv AS (SELECT v, count(*) AS cv FROM bi GROUP BY 1),
        |n1v AS (SELECT v, count(*) AS n1v FROM cvw GROUP BY 1),
        |n1w AS (SELECT w, count(*) AS n1w FROM cvw GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS nall FROM cvw),
        |sc AS (
        |  SELECT bi.doc_id,
        |    CAST(floor(ln(
        |      ((CAST(cvw.cvw AS DOUBLE) - 0.75) / CAST(cv.cv AS DOUBLE))
        |      + ((0.75 * (CAST(n1v.n1v AS DOUBLE) / CAST(cv.cv AS DOUBLE)))
        |         * (CAST(n1w.n1w AS DOUBLE) / (SELECT nall FROM tot)))
        |    ) * 1e12) AS BIGINT) AS lp
        |  FROM bi JOIN cvw USING (v, w) JOIN cv USING (v)
        |    JOIN n1v USING (v) JOIN n1w USING (w))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(floor(CAST(sum(lp) AS DOUBLE) / count(*) / 1e6) AS BIGINT)
        |    AS score_e6
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // same segmentation/token/vowel-group counts; the score shape
    // replayed verbatim
    "q218_readability" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS canon
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(canon, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_words,
        |    CAST(len(list_filter(list_transform(
        |        string_split_regex(text, '[.!?]+'),
        |        s -> trim(s)), s -> s <> '')) AS BIGINT) AS n_sentences,
        |    CAST(len(regexp_extract_all(canon, '[aeiouy]+', 0)) AS BIGINT)
        |      AS n_syllables
        |  FROM d)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words > 0 AND n_sentences > 0 THEN
        |    CAST(floor(1000.0 * (206.835
        |      - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
        |      - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
        |      AS BIGINT)
        |  END AS flesch_e3
        |FROM c ORDER BY doc_id""".stripMargin,

    // per-token replay: same starts, same stream order, same windows
    "q220_pack_concat" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
        |    list_append(list_filter(
        |      string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      x -> x <> ''), '<eos>') AS t
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |st AS (
        |  SELECT *, sum(len(t)) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - len(t) AS strt
        |  FROM d),
        |tok AS (
        |  SELECT shard, strt + u.i - 1 AS pos, t[u.i] AS tok
        |  FROM st, unnest(generate_series(1, len(t))) AS u(i))
        |SELECT shard, CAST(pos // 128 AS BIGINT) AS seq_index,
        |  string_agg(tok, ' ' ORDER BY pos) AS seq_text,
        |  CAST(count(*) AS BIGINT) AS n_seq_tokens
        |FROM tok GROUP BY 1, 2
        |ORDER BY shard, seq_index""".stripMargin,
  )
}
