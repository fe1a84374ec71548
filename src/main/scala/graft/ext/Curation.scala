package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline, composed from this
  * package's operators in the order that minimizes work at 100 TB:
  *
  *   1. quality gate  — cheapest test first: per-row column expressions,
  *                      no shuffle, drops the bulk of the junk before
  *                      anything pays a hash or a join;
  *   2. exact dedup   — one digest shuffle over the survivors;
  *   3. near dedup    — MinHash + LSH banding, the only stage with a
  *                      pairwise component, now over the smallest set.
  *
  * Deterministic end to end (fixed sketch seeds, min-id survivor policy):
  * re-running the pipeline over the same corpus yields byte-identical
  * output — the property that makes dataset versions reproducible.
  */
object Curation {

  /** Quality predicate: TextStats.qualityScore ≥ minQuality. Exposed so
    * callers can inspect/adjust the gate independently of the pipeline.
    */
  def qualityGate(textCol: Column, minQuality: Double): Column =
    TextStats.qualityScore(textCol) >= minQuality

  /** The COMPLETE corpus→training-sequences assembly, one call — the
    * capstone composition of this package (each stage is also an
    * independently gated operator): quality + repetition gates →
    * duplicate-span trim → exact dedup → near-dedup → benchmark
    * decontamination → leakage-safe train/test split → context-length
    * chunking.
    *
    * Span trim (`spanTrimK = Some(k)`) runs BETWEEN the per-row gates
    * and dedup — the order real pipelines use: boilerplate passages
    * (shared k-gram runs, `Dedup.stripDuplicateSpans`) are cut out of
    * otherwise-unique documents first, so the dedup stages judge the
    * UNIQUE remainder rather than matching documents on their shared
    * boilerplate. Documents left empty by the trim (pure boilerplate)
    * are dropped. Trimmed text is the canonicalized token sequence —
    * every downstream stage already canonicalizes, so the pipeline
    * output is unchanged for untrimmed documents.
    *
    * Stage order is the 100 TB cost order: per-row gates first (no
    * shuffle), then one digest shuffle, then the ONE pairwise stage —
    * near-dup pairs are computed ONCE at `splitPairThreshold` and serve
    * both dedup (drop the larger id of pairs ≥ `dedupThreshold`) and the
    * split (connected components over the FULL pair graph, so two
    * moderate near-twins that dedup kept — and even clusters chained
    * through a dropped intermediate — still land on the same side of the
    * eval boundary). Decontamination anti-joins survivors against the
    * benchmark's n-gram postings (benchmark side broadcasts). Exact pair
    * path (`ngramJaccardPairs`): zero false negatives, fully
    * deterministic; swap in the MinHash path via [[curate]] when the
    * corpus is web-scale and sketch recall is acceptable.
    *
    * Returns one row per chunk: (idCol, split, chunk_index, chunk_text,
    * n_chunk_tokens).
    */
  def curateForTraining(df: DataFrame, idCol: String, textCol: String,
                        benchmark: Option[DataFrame] = None,
                        minQuality: Double = 0.5,
                        maxDup3gramFraction: Double = 0.6,
                        spanTrimK: Option[Int] = None,
                        spanTrimMinDocs: Int = 2,
                        dedupThreshold: Double = 0.8,
                        splitPairThreshold: Double = 0.6,
                        decontaminateMinShared: Long = 2L,
                        testFraction: Double = 0.1,
                        chunkTokens: Int = 512,
                        overlapTokens: Int = 0): DataFrame = {
    require(splitPairThreshold <= dedupThreshold,
      "splitPairThreshold must not exceed dedupThreshold (pairs are " +
        "computed once at the lower threshold and reused for both stages)")
    val t = col(textCol)
    val gated = df.filter(qualityGate(t, minQuality) &&
      TextStats.duplicateNgramFraction(t, 3) <= maxDup3gramFraction)
    // span trim: cut boilerplate passages out of gated documents, keep
    // the unique remainder; cut because the span stage reads the gated
    // frame twice (postings + trim join)
    val trimmed = spanTrimK match {
      case Some(k) => graft.plans.PlanCapture.cut(
        Dedup.stripDuplicateSpans(gated, idCol, textCol, k, spanTrimMinDocs)
          .filter(length(col("clean_text")) > 0)
          .drop(textCol)
          .withColumnRenamed("clean_text", textCol))
      case None => gated
    }
    val exact = graft.plans.PlanCapture.cut(Dedup.exact(trimmed, idCol, textCol))
    // ONE pairwise pass at the split threshold; jaccard column reused
    val pairs = graft.plans.PlanCapture.cut(
      Dedup.ngramJaccardPairs(exact, idCol, textCol,
        n = 3, threshold = splitPairThreshold))
    val dropNear = pairs.filter(col("jaccard") >= dedupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val afterNear = exact.join(dropNear, Seq(idCol), "left_anti")
    val decont = benchmark match {
      case Some(b) => afterNear.join(
        Dedup.ngramOverlapAcross(afterNear, b, idCol, textCol,
            n = 3, minShared = decontaminateMinShared)
          .select(col(idCol)),
        Seq(idCol), "left_anti")
      case None => afterNear
    }
    // cut: withSplit is consumed TWICE below (chunk input + split join);
    // without the cut the decontamination anti-join and the split's
    // component labeling re-execute per consumer
    val withSplit = graft.plans.PlanCapture.cut(
      Dedup.leakageSafeSplit(decont, idCol, textCol,
        pairs.select("id_a", "id_b"), testFraction))
    Chunking.chunkByTokens(withSplit.select(col(idCol), col(textCol)),
        idCol, textCol, chunkTokens, overlapTokens)
      .join(withSplit.select(col(idCol), col("split")), Seq(idCol))
      .select(col(idCol), col("split"), col("chunk_index"),
        col("chunk_text"), col("n_chunk_tokens"))
  }

  /** Curate a document corpus: returns the surviving rows of `df`
    * (original columns), quality-gated, exact-deduped, near-deduped.
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5,
             jaccardThreshold: Double = 0.8,
             numHashes: Int = 64, bands: Int = 32,
             shingleSize: Int = 3): DataFrame = {
    val gated = df.filter(qualityGate(col(textCol), minQuality))
    // Lineage cut: the near-dedup stage references its input many times
    // (signatures, banding, candidate verify, the final anti-join), and
    // each reference would re-run the quality gate + exact dedup from the
    // scan. The cut (lazy localCheckpoint) materializes the exact-dedup
    // survivors once, on first action, and hands downstream a short lineage.
    val exact = graft.plans.PlanCapture.cut(Dedup.exact(gated, idCol, textCol))
    Dedup.minhashDedup(exact, idCol, textCol,
      numHashes = numHashes, bands = bands,
      shingleSize = shingleSize, threshold = jaccardThreshold)
  }
}
