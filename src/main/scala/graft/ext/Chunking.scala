package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shaping documents into training sequences — the last mile of an LLM
  * data pipeline: split long documents into overlapping token windows
  * (context-length chunking) and pack short ones into fixed-budget
  * sequences (so a batch wastes no padding).
  *
  * Both operators are deterministic by construction: chunk boundaries are
  * pure per-row arithmetic over the shared canonical tokenization, and
  * packing assignments are a running sum in an explicit (shard, id)
  * order — same inputs, same sequences, on any engine or partitioning.
  */
object Chunking {

  /** Split each document into token windows of `chunkTokens`, overlapping
    * by `overlapTokens` (stride = chunk − overlap; the final window may be
    * shorter). Returns (idCol, chunk_index, chunk_text, n_chunk_tokens).
    * Pure per-row explode — no shuffle; a 100 TB corpus chunks in the
    * scan stage. Empty/whitespace documents yield one empty chunk rather
    * than disappearing (the PERMISSIVE stance: losing rows silently is
    * how a pipeline miscounts its corpus).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"overlapTokens must be in [0, chunkTokens), got $overlapTokens")
    val stride = chunkTokens - overlapTokens
    val toks = TextStats.canonicalTokens(col(textCol))
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride))
    // null text is dropped EXPLICITLY: greatest()/least() skip NULL
    // operands, so a null-text row would otherwise emit one phantom chunk
    // whose n_chunk_tokens reports a full chunkTokens with a null
    // chunk_text — inflating every downstream token count
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"),
        posexplode(starts).as(Seq("chunk_index", "__start")))
      .select(col(idCol), col("chunk_index"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(size(col("__toks")) - col("__start"), lit(chunkTokens))
          .cast("long").as("n_chunk_tokens"))
  }

  /** Greedy sequence packing: documents are laid out in (shard, id) order
    * and a document starts a new sequence whenever the tokens packed
    * BEFORE it cross a `seqTokens` boundary — the standard first-fit-in-
    * order packing (a straddling document overflows its sequence rather
    * than being split; compose with [[chunkByTokens]] first if documents
    * can exceed the budget). Returns (shardCol, idCol, n_tokens,
    * seq_index) with seq_index dense within each shard.
    *
    * Scale shape: ONE running-sum window per shard. The shard column is
    * the parallelism lever — packing is inherently sequential within a
    * shard (each assignment depends on every predecessor), so a 100 TB
    * corpus shards first (e.g. by hash(id) % k) and packs shards
    * independently; an UNSHARDED call is a single-partition sort and
    * belongs only on small frames.
    */
  def packGreedy(df: DataFrame, idCol: String, textCol: String,
                 seqTokens: Int, shardCol: String): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive, got $seqTokens")
    val n = size(TextStats.canonicalTokens(col(textCol))).cast("long")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(shardCol), col(idCol), n.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .select(col(shardCol), col(idCol), col("n_tokens"),
        // floor, explicitly: truncate-vs-round casts differ across engines
        floor((col("__cum") - col("n_tokens")) / seqTokens).cast("long")
          .as("seq_index"))
  }
}
