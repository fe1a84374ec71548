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

  /** Concat-and-slice packing — the GPT-style pretraining layout
    * [[packGreedy]] deliberately is not: documents (plus one `eosToken`
    * after each) concatenate into one token stream per shard, and the
    * stream slices into EXACT `seqTokens`-length sequences, documents
    * STRADDLING window boundaries (zero padding waste; only each
    * shard's final window may be short). Returns
    * (shardCol, seq_index, seq_text, n_seq_tokens).
    *
    * Scale shape — the part that matters: the obvious formulation
    * explodes one row per corpus TOKEN through a shuffle; this one
    * emits one row per (document, WINDOW-IT-TOUCHES) — O(docs +
    * windows), each row carrying its in-window slice — then one hash
    * aggregate per (shard, window) assembles slices by offset inside
    * the row (array_sort, the sessionPaths stance). Document start
    * offsets are ONE running-sum window per shard (the packGreedy
    * contract: the shard column is the parallelism lever; pack shards
    * independently).
    */
  def packConcat(df: DataFrame, idCol: String, textCol: String,
                 seqTokens: Int, shardCol: String,
                 eosToken: String = "<eos>"): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive, got $seqTokens")
    require(eosToken.nonEmpty && !eosToken.contains(" "),
      s"eosToken must be a single non-empty token, got '$eosToken'")
    val L = seqTokens.toLong
    val toks = filter(TextStats.canonicalTokens(col(textCol)),
      t => length(t) > 0)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withStart = df.filter(col(textCol).isNotNull)
      .select(col(shardCol), col(idCol),
        concat(toks, array(lit(eosToken))).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("__start", sum(col("__n")).over(w) - col("__n"))
    val slices = withStart
      .select(col(shardCol), col("__t"), col("__n"), col("__start"),
        explode(sequence(
          floor(col("__start") / L).cast("long"),
          floor((col("__start") + col("__n") - 1) / L).cast("long")))
          .as("seq_index"))
      .select(col(shardCol), col("seq_index"),
        greatest(col("__start") - col("seq_index") * L, lit(0L))
          .as("__offset"),
        // slice of THIS doc that lands in THIS window (1-based slice)
        slice(col("__t"),
          (greatest(col("seq_index") * L - col("__start"), lit(0L)) + 1L)
            .cast("int"),
          (least((col("seq_index") + 1L) * L - col("__start"), col("__n"))
            - greatest(col("seq_index") * L - col("__start"), lit(0L)))
            .cast("int")).as("__slice"))
    slices.groupBy(col(shardCol), col("seq_index"))
      .agg(
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("__offset").as("o"),
            col("__slice").as("s")))),
          x => x.getField("s"))), " ").as("seq_text"),
        sum(size(col("__slice"))).cast("long").as("n_seq_tokens"))
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
