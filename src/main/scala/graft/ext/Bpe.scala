package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.PlanCapture

/** Byte-pair-encoding vocabulary induction and tokenization — the
  * tokenizer-training step of a training-data pipeline, learned from the
  * corpus the engine just curated. Public algorithm (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units"):
  * start from characters, repeatedly merge the most frequent adjacent
  * symbol pair.
  *
  * Scale stance: learning NEVER iterates over the corpus. The corpus is
  * read ONCE into a (word, count) table — the classic trick: merge
  * counts depend only on word frequencies, and the distinct-word table
  * is orders of magnitude smaller than a 100 TB corpus — and the merge
  * loop then runs over that vocab-sized frame: per round, one
  * explode/aggregate for pair counts, one 1-row collect (the argmax —
  * bounded driver data, the [[Sampling.rebalance]] stance), one map to
  * apply the merge, lineage cut per round like
  * [[Dedup.connectedComponents]]. Ties on count break by the pair
  * itself (lexicographic), so the learned vocabulary is a pure function
  * of the corpus — deterministic across partitionings, engines, re-runs.
  *
  * Tokenization applies learned merges per word in rank order (lowest
  * rank first — the HF/sentencepiece convention) in a typed
  * mapPartitions batch over a broadcast rank map: per-row iterative
  * string work, exactly the codec-batch shape of [[Multimodal]], with a
  * per-word memo inside each partition (Zipf reuse makes the hot words
  * hit the memo).
  */
object Bpe {

  /** End-of-word marker appended to each word's final symbol so merges
    * cannot cross word boundaries and suffix units stay distinct from
    * infix units (the original BPE formulation).
    */
  val EndOfWord = "</w>"

  /** Internal vocab-frame row (public: Dataset encoder codegen must be
    * able to construct it from generated code).
    */
  final case class WordSyms(word: String, n: Long, syms: Seq[String])

  /** One learned merge: `rank` is the order it was learned (0 first),
    * `left`/`right` the merged pair, `pair_count` the weighted count
    * that won the round.
    */
  final case class Merge(rank: Int, left: String, right: String,
                         pair_count: Long)

  /** Whitespace word counts of a text column — the ONE corpus-sized
    * aggregate of BPE learning (shuffle carries (word, partial count)
    * pairs with map-side combine).
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(split(trim(regexp_replace(lower(col(textCol)),
        "\\s+", " ")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("n"))

  /** Learn `numMerges` BPE merges from a text column. Returns the merge
    * table (rank, left, right, pair_count), rank-ordered. Stops early
    * when the best remaining pair's weighted count falls below
    * `minPairCount` (or no pair remains).
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] =
    learnFromWordCounts(wordCounts(df, textCol), numMerges, minPairCount)

  /** [[learn]] from a precomputed (word, n) table — reuse when several
    * vocabularies are induced from one corpus scan.
    */
  def learnFromWordCounts(counts: DataFrame, numMerges: Int,
                          minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val spark = counts.sparkSession
    import spark.implicits._
    var words: Dataset[WordSyms] = counts
      .filter(col("word").isNotNull && col("word") =!= "")
      .select(col("word").cast("string"), col("n").cast("long"))
      .as[(String, Long)]
      .map { case (w, n) =>
        val chars = w.map(_.toString)
        WordSyms(w, n, chars.init :+ (chars.last + EndOfWord))
      }
    // the vocab frame is distinct-word-sized — orders of magnitude below
    // the corpus; a handful of partitions keeps the ~numMerges rounds of
    // tiny per-round jobs from paying 32-task scheduling overhead each.
    // Coalesce AFTER the checkpoint: before it, the no-shuffle coalesce
    // would propagate up and throttle the corpus-sized word-count
    // aggregation itself to 8 tasks.
    words = PlanCapture.cut(words.toDF()).as[WordSyms].coalesce(8)

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // weighted adjacent-pair counts over the vocab frame; argmax with
      // lexicographic tiebreak = one struct-max aggregate, 1-row collect
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(slice(syms, 1, size(syms) - 1), " +
            "(s, i) -> named_struct('l', s, 'r', syms[i + 1]))"))
          .as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum(col("n")).as("c"))
        .agg(max(struct(col("c"), col("l"), col("r"))).as("m"))
        .select(col("m.c"), col("m.l"), col("m.r"))
        .collect()
      if (best.isEmpty || best(0).isNullAt(0) ||
        best(0).getLong(0) < minPairCount) {
        exhausted = true
      } else {
        val (c, l, r) = (best(0).getLong(0), best(0).getString(1),
          best(0).getString(2))
        merges += Merge(round, l, r, c)
        words = words.map(w => w.copy(syms = mergeOnce(w.syms, l, r)))
        words = PlanCapture.cut(words.toDF()).as[WordSyms]
        round += 1
      }
    }
    merges.toSeq
  }

  /** Apply one (l, r) merge to a symbol sequence, left to right. */
  private def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toSeq
  }

  /** Greedy rank-order BPE of one word (lowest-rank applicable merge
    * first — the HF convention; identical to replaying the learned
    * merges in order).
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Nil
    val chars = word.map(_.toString)
    var syms: Seq[String] = chars.init :+ (chars.last + EndOfWord)
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else syms = syms.patch(bestIdx, Seq(syms(bestIdx) + syms(bestIdx + 1)), 2)
    }
    syms
  }

  /** Tokenize a text column with learned merges: adds `tokens`
    * (array<string>) and `n_tokens` (bigint). The merge table broadcasts
    * (it is numMerges rows); per-word results are memoized per partition
    * — Zipf reuse makes hot words hit the memo, so the per-row cost
    * approaches one hash lookup per word.
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    val rows = df.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankB.value
        val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
        it.map { case (id, text) =>
          val words = text.toLowerCase.replaceAll("\\s+", " ").trim
            .split(" ").filter(_.nonEmpty)
          val toks = words.toSeq.flatMap(w =>
            memo.getOrElseUpdate(w, encodeWord(w, rank)))
          (id, toks, toks.length.toLong)
        }
      }
    rows.toDF(idCol, "tokens", "n_tokens")
  }
}
