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
