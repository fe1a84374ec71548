package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Published heuristic document filters for web-crawl training corpora —
  * the rule families from Gopher (Rae et al. 2021, arXiv:2112.11446,
  * table A1) and C4 (Raffel et al. 2020, arXiv:1910.10683, §2.2),
  * re-expressed as per-row column expressions over built-in functions.
  *
  * These are the first gate of every large-scale text pipeline: they run
  * BEFORE dedup/decontamination because they are the cheapest stage (pure
  * scan, no shuffle, codegen'd end-to-end) and typically drop 30-70% of a
  * raw crawl, shrinking everything downstream. Keeping them scan-only is
  * the 100 TB design requirement; every predicate here is a higher-order
  * function over one `split`, so whole-stage codegen fuses the lot into
  * the parquet scan.
  *
  * Ratios are a single double division of two integer counts — exactly
  * replayable by an external SQL engine (the oracle does) — and every
  * regex is RE2-compatible (no lookaround; unicode escaped `\uXXXX` here,
  * `\x{XXXX}` on the RE2 side).
  */
object QualityFilters {

  /** Gopher's stopword-presence list (table A1: "contains at least two of
    * the following English words").
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Non-empty whitespace tokens — `split` then drop `""` so leading/
    * trailing/repeated whitespace doesn't mint phantom words.
    */
  private def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** Gopher quality-rule columns for `textCol`, appended to `df`:
    *
    *  - `n_words`, `mean_word_len` — rule: 50 <= n <= 100k, 3 <= len <= 10
    *  - `symbol_ratio` — `#` or ellipsis per word, <= 0.1
    *  - `bullet_frac` — lines starting with a bullet, <= 0.9
    *  - `ellipsis_frac` — lines ending in an ellipsis, <= 0.3
    *  - `alpha_frac` — words containing an alphabetic char, >= 0.8
    *  - `stop_hits` — how many of [[GopherStopwords]] appear, >= 2
    *  - `gopher_pass` — the conjunction
    *
    * Thresholds are the paper's (table A1), exposed so callers can tune;
    * the flag is emitted rather than filtered so callers can audit WHAT
    * a rule drops before they drop it (the usual first step when tuning
    * filters against a new crawl).
    */
  def withGopherRules(df: DataFrame, textCol: String = "text",
                      minWords: Int = 50, maxWords: Int = 100000,
                      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                      maxSymbolRatio: Double = 0.1,
                      maxBulletFrac: Double = 0.9,
                      maxEllipsisFrac: Double = 0.3,
                      minAlphaFrac: Double = 0.8,
                      minStopHits: Int = 2): DataFrame = {
    val text = col(textCol)
    val w = words(text)
    val wLower = words(lower(text))
    val nw = size(w).cast("long")
    val ge1 = greatest(nw, lit(1L))
    val lines = split(text, "\n")
    val nl = greatest(size(lines), lit(1)).cast("long")
    // '#' and '...'/'…' per word (Gopher's "symbol-to-word ratio"; both
    // engines count non-overlapping matches left to right)
    val symbols = regexp_count(text, lit("#")) +
      regexp_count(text, lit("(\\.\\.\\.|\\u2026)"))
    val bullets = size(filter(lines,
      l => l.rlike("^\\s*[\\u2022\\u2023\\u25B6*-]")))
    val ellipses = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|\\u2026)\\s*$")))
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]")))
    val meanLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / ge1
    val stopHits = GopherStopwords
      .map(s => when(array_contains(wLower, s), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    df.withColumn("n_words", nw)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbols.cast("double") / ge1)
      .withColumn("bullet_frac", bullets.cast("double") / nl)
      .withColumn("ellipsis_frac", ellipses.cast("double") / nl)
      .withColumn("alpha_frac", alphaWords.cast("double") / ge1)
      .withColumn("stop_hits", stopHits)
      .withColumn("gopher_pass",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("alpha_frac") >= minAlphaFrac &&
          col("stop_hits") >= minStopHits)
  }

  /** C4's line-level cleaning + document gate, appended to `df`:
    *
    *  - `clean_text` — only lines that end in terminal punctuation, have
    *    >= `minLineWords` words, and don't mention "javascript"
    *  - `n_lines` / `n_kept` — before/after line counts
    *  - `keep_doc` — >= `minKeptLines` surviving lines and the document
    *    contains neither "lorem ipsum" nor `{` (C4 drops templated/code
    *    pages whole; the curly-brace rule is the paper's)
    *
    * Line order is preserved (a `filter` over the split array keeps
    * relative order), so `clean_text` is the original document minus the
    * dropped lines — no re-sorting, no shuffle, scan-only.
    */
  def withC4Clean(df: DataFrame, textCol: String = "text",
                  minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val text = col(textCol)
    val lines = split(text, "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"']\\s*$") &&
        size(filter(split(trim(l), "\\s+"), t => t =!= "")) >= minLineWords &&
        !lower(l).contains("javascript"))
    df.withColumn("clean_text", array_join(kept, "\n"))
      .withColumn("n_lines", size(lines).cast("long"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("keep_doc",
        size(kept) >= minKeptLines &&
          !lower(text).contains("lorem ipsum") &&
          !text.contains("{"))
  }
}
