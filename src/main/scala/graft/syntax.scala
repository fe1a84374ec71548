package graft

import org.apache.spark.sql.DataFrame

import graft.ext.{Chunking, Curation, Dedup, Funnel, Layout, Linkage, Merge, Profile, Sampling, TextStats}
import graft.logs.LogLineParser

/** Chainable user-facing syntax for the engine's document/log operators:
  *
  * {{{
  * import graft.syntax._
  *
  * spark.read.format("accesslog").load(dir)     // typed 19-column frame
  *
  * rawLines.parseAccessLogs()
  *   .transform(df => DaysApart.frame(df, 400))
  *
  * docs.withTextStats()                         // +tokens/quality/lang cols
  *   .dedupExact("doc_id", "text")              // content-hash survivors
  *   .dedupNear("doc_id", "text")               // MinHash-LSH survivors
  *
  * docs.nearDupPairs("doc_id", "text")          // (id_a, id_b, est_jaccard)
  * docs.jaccardPairs("doc_id", "text", 0.8)     // exact, prefix-filtered
  *
  * facts.zorderWrite(Seq("dt", "requester"), numFiles = 64, dest)
  * }}}
  *
  * Thin forwarding only — every method delegates to the `graft.ext` /
  * `graft.logs` object API (which remains the canonical surface); this
  * class exists so exploratory sessions compose operators with the same
  * postfix flow as native `Dataset` methods.
  */
object syntax {

  implicit final class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // ------------------------------------------------------------- logs
    /** Raw one-string-column lines → canonical 19-column access-log frame. */
    def parseAccessLogs(lineCol: String = "value"): DataFrame =
      LogLineParser.parse(LogLineParser.dropBlankLines(df, lineCol), lineCol)

    // ------------------------------------------------------------ dedup
    /** Exact content dedup (canonicalized md5 groups, min-id survivor). */
    def dedupExact(idCol: String, textCol: String): DataFrame =
      Dedup.exact(df, idCol, textCol)

    /** Near-dedup via MinHash+LSH: drops the larger id of each near-pair. */
    def dedupNear(idCol: String, textCol: String,
                  threshold: Double = 0.7): DataFrame =
      Dedup.minhashDedup(df, idCol, textCol, threshold = threshold)

    /** Near-duplicate candidate pairs with MinHash-estimated Jaccard. */
    def nearDupPairs(idCol: String, textCol: String,
                     threshold: Double = 0.7): DataFrame =
      Dedup.minhashDuplicates(df, idCol, textCol, threshold = threshold)

    /** EXACT all-pairs n-gram Jaccard ≥ threshold (prefix-filtered). */
    def jaccardPairs(idCol: String, textCol: String,
                     threshold: Double = 0.8, n: Int = 3): DataFrame =
      Dedup.ngramJaccardPairs(df, idCol, textCol, n, threshold)

    /** Maximal duplicated-substring spans across this corpus (token
      * offsets; see [[ext.Dedup.duplicateSpans]]).
      */
    def duplicateSpans(idCol: String, textCol: String, k: Int = 5,
                       minDocs: Int = 2): DataFrame =
      Dedup.duplicateSpans(df, idCol, textCol, k, minDocs)

    /** This frame plus `clean_text` with duplicated spans trimmed out. */
    def stripDuplicateSpans(idCol: String, textCol: String, k: Int = 5,
                            minDocs: Int = 2): DataFrame =
      Dedup.stripDuplicateSpans(df, idCol, textCol, k, minDocs)

    /** Spans of THIS batch already present anywhere in `corpus` —
      * incremental span dedup / span-level decontamination.
      */
    def duplicateSpansAgainst(corpus: DataFrame, idCol: String,
                              textCol: String, k: Int = 5): DataFrame =
      Dedup.duplicateSpansAgainst(df, corpus, idCol, textCol, k)

    // ------------------------------------------------------------- join
    /** Inner join with Bloom pre-filtering of this (probe) frame —
      * identical result to the plain join, pruned probe shuffle.
      */
    def bloomPrunedJoin(build: DataFrame, probeKey: String,
                        buildKey: String): DataFrame =
      ext.BloomJoin.prunedJoin(df, build, probeKey, buildKey)

    /** Top-k cosine neighbors in `right` for EVERY row of this frame
      * (both sides large; LSH bucket equi-join + bounded-heap top-k).
      */
    def semanticJoin(right: DataFrame, leftIdCol: String, rightIdCol: String,
                     vecCol: String, k: Int = 10, bits: Int = 12,
                     dim: Int = 64): DataFrame =
      ext.Similarity.lshTopKJoin(df, right, leftIdCol, rightIdCol, vecCol,
        k, bits, dim)

    // ------------------------------------------------------------- text
    /** Append token/quality/language/fingerprint stat columns. */
    def withTextStats(textCol: String = "text"): DataFrame =
      TextStats.withStats(df, textCol)

    /** Gopher repetition signals + threshold flags (per-row kernel). */
    def repetitionSignals(idCol: String, textCol: String = "text"): DataFrame =
      TextStats.repetitionSignals(df, idCol, textCol)

    /** Flesch reading ease (replayable vowel-group variant). */
    def readability(idCol: String, textCol: String = "text"): DataFrame =
      TextStats.readability(df, idCol, textCol)

    /** GPT-style concat-and-slice packing into exact token windows. */
    def packConcat(idCol: String, textCol: String, seqTokens: Int,
                   shardCol: String): DataFrame =
      Chunking.packConcat(df, idCol, textCol, seqTokens, shardCol)

    /** Quality-gate + exact-dedup + near-dedup curation pipeline. */
    def curate(idCol: String, textCol: String,
               minQuality: Double = 0.5): DataFrame =
      Curation.curate(df, idCol, textCol, minQuality)

    /** Per-near-dup-cluster survivor labels (longest text, min-id ties). */
    def dedupSurvivors(idCol: String, textCol: String,
                       threshold: Double = 0.8): DataFrame =
      Dedup.clusterSurvivors(df, idCol, textCol,
        Dedup.minhashDuplicates(df, idCol, textCol, threshold = threshold)
          .select("id_a", "id_b"))

    // --------------------------------------------------------- QA / mix
    /** Long-form per-column QA profile (exact distinct counts). */
    def profile(cols: String*): DataFrame =
      Profile.columnProfile(df, cols)

    /** Per-key load audit for skew decisions (keys ≥ ratio × mean). */
    def skewAudit(keyCol: String, ratio: Double = 2.0): DataFrame =
      Profile.skewAudit(df, keyCol, ratio)

    /** Deterministic hash sample (membership a pure function of the key). */
    def hashSample(keyCol: String, rate: Double): DataFrame =
      Sampling.sample(df, keyCol, rate)

    /** Deterministic weighted sample of up to n rows (E–S keys). */
    def weightedSample(idCol: String, weightCol: String, n: Int): DataFrame =
      Sampling.weightedSample(df, idCol, weightCol, n)

    /** Rebalance strata to target proportions (no upsampling). */
    def rebalance(keyCol: String, strataCol: String,
                  shares: Map[String, Double]): DataFrame =
      Sampling.rebalance(df, keyCol, strataCol, shares)

    /** Latest-wins CDC upsert of `updates` over this frame. */
    def upsert(updates: DataFrame, keys: Seq[String]): DataFrame =
      Merge.upsert(df, updates, keys)

    /** Ordered-step funnel over an event frame. */
    def funnel(entityCol: String, tsCol: String, typeCol: String,
               steps: Seq[String]): DataFrame =
      Funnel.funnel(df, entityCol, tsCol, typeCol, steps)

    // ----------------------------------------------------------- layout
    /** Z-order-clustered parquet write over `zCols` (see [[ext.Layout]]). */
    def zorderWrite(zCols: Seq[String], numFiles: Int, dest: String,
                    bits: Int = 8): Unit =
      Layout.zorderWrite(df, zCols, numFiles, dest, bits)

    /** Fuzzy record linkage: Jaro–Winkler ≥ `threshold` candidate pairs
      * under [[graft.ext.Linkage.fuzzyJoin]]'s blocking contract
      * ((`blockPrefix`-char prefix, ±length band) key — pairs outside
      * the key are out of scope by definition, not missed).
      *
      * NOTE: with the default `maxBlockRows`, building this frame runs
      * ONE EXTRA EAGER Spark job up front — the hot-block occupancy
      * probe that refuses a quadratic blowup before it is planned.
      * Pass `maxBlockRows = 0` to skip the probe (and its job) when
      * the blocking key is known-safe for your data.
      */
    def fuzzyJoin(right: DataFrame, leftId: String, leftText: String,
                  rightId: String, rightText: String,
                  threshold: Double = 0.85,
                  maxBlockRows: Long = 1000000L): DataFrame =
      Linkage.fuzzyJoin(df, leftId, leftText, right, rightId, rightText,
        threshold, maxBlockRows = maxBlockRows)
  }
}
