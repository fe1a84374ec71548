package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer — the OTHER real-world tokenizer family
  * next to [[Bpe]] (Kudo 2018, "Subword Regularization"; the algorithm
  * behind SentencePiece's default model): a vocabulary of PIECES with
  * probabilities, and tokenization as the maximum-likelihood
  * segmentation under that unigram model (Viterbi over word positions),
  * rather than BPE's greedy merge replay.
  *
  * This implementation is the deterministic core of the family:
  *
  *  - VOCABULARY: all word substrings up to `maxPieceLen`, weighted by
  *    word frequency, ranked (count DESC, piece ASC — a total order, so
  *    selection is a pure function of the corpus) and cut to
  *    `vocabSize` — with every single CHARACTER seen in the corpus
  *    force-included first, the SentencePiece coverage rule that makes
  *    every word tokenizable. Full EM piece-pruning refines these
  *    counts in the original; the substring-count seed IS the
  *    standard EM initialization, kept as the deterministic,
  *    oracle-replayable form (the learn half gates with a full SQL
  *    oracle, unlike BPE's inherently sequential merges).
  *  - SCALE: the corpus is read ONCE into the (word, count) frame (the
  *    [[Bpe.wordCounts]] trick); the substring explode runs over
  *    DISTINCT WORDS × O(len·maxPieceLen) — vocabulary-sized, not
  *    corpus-sized — and the ranked cut is an orderBy/limit over an
  *    aggregated frame a few times the final vocab.
  *  - TOKENIZE: per-word Viterbi in a typed mapPartitions batch over
  *    the broadcast vocabulary with a per-partition word memo (the
  *    [[Bpe.tokenize]] shape). Scores are integer e12 log-probs
  *    (S(count) − S(total), the lnScaled idiom), summed in BIGINT, so
  *    the argmax is exact — ties break to FEWER pieces, then to the
  *    LONGER last piece (both pinned in the spec against a plain
  *    reference). Characters outside the vocabulary (possible only for
  *    corpora disjoint from the training corpus) fall back to
  *    single-char pieces at [[UnkLogpE12]].
  */
object UnigramLm {

  /** Fallback log-prob for out-of-vocabulary single characters: far
    * below any real piece (ln p = −50) but finite, so unknown text
    * degrades instead of failing.
    */
  val UnkLogpE12: Long = -50L * 1000000000000L

  /** One vocabulary entry: substring piece, its corpus-weighted count,
    * and the e12-floored log-probability under the unigram model.
    */
  final case class Piece(piece: String, count: Long, logp_e12: Long)

  /** Learned vocabulary as a DataFrame (piece, count, logp_e12),
    * ordered by (count DESC, piece ASC). See the object doc for the
    * selection rule; `minCount` prunes the substring long tail BEFORE
    * ranking (single chars are exempt — coverage beats frequency).
    */
  def learnFrame(docs: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 4, minCount: Long = 2L): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val words = Bpe.wordCounts(docs, textCol)
    // one row per (word, start, len) — bounded by distinct words ×
    // word length × maxPieceLen, never by corpus size
    val subs = words
      .select(col("word"), col("n"),
        posexplode(expr(s"""flatten(transform(
          sequence(1, length(word)),
          i -> transform(
            sequence(1, least($maxPieceLen, length(word) - i + 1)),
            l -> substring(word, i, l))))"""))
          .as(Seq("__pos", "piece")))
      .groupBy("piece")
      .agg(sum(col("n")).cast("long").as("count"))
    val kept = subs.filter(col("count") >= minCount || length(col("piece")) === 1)
    // force-include single chars: rank them first (they also compete on
    // count among themselves so the output order stays total)
    val ranked = kept
      .withColumn("__chr", (length(col("piece")) === 1).cast("int"))
      .orderBy(col("__chr").desc, col("count").desc, col("piece").asc)
      .limit(vocabSize)
    val total = ranked.agg(coalesce(sum(col("count")), lit(0L)))
    val totalCount = math.max(total.head().getLong(0), 1L)
    ranked.select(col("piece"), col("count"),
        (floor(log(col("count").cast("double")) * lit(1e12)).cast("long")
          - lit(math.floor(math.log(totalCount.toDouble) * 1e12).toLong))
          .as("logp_e12"))
      .orderBy(col("count").desc, col("piece").asc)
  }

  /** Collected vocabulary for the tokenizer. */
  def learn(docs: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 4, minCount: Long = 2L): Seq[Piece] =
    learnFrame(docs, textCol, vocabSize, maxPieceLen, minCount)
      .collect()
      .map(r => Piece(r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq

  /** Exact Viterbi segmentation of one word under the vocabulary.
    * dp over end positions maximizing (Σ logp_e12, fewer pieces,
    * longer last piece) — a total preference order, so the
    * segmentation is unique and engine-independent.
    */
  def encodeWord(word: String,
                 vocab: Map[String, Long],
                 maxPieceLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Seq.empty
    // dp(i): best (score, pieces, lastLen) for word prefix of length i
    val score = new Array[Long](n + 1)
    val nPieces = new Array[Int](n + 1)
    val lastLen = new Array[Int](n + 1)
    java.util.Arrays.fill(score, Long.MinValue)
    score(0) = 0L; nPieces(0) = 0
    var i = 1
    while (i <= n) {
      val maxL = math.min(i, math.max(maxPieceLen, 1))
      var l = 1
      while (l <= maxL) {
        val from = i - l
        if (score(from) != Long.MinValue) {
          val piece = word.substring(from, i)
          val lp = vocab.get(piece) match {
            case Some(v) => Some(v)
            case None if l == 1 => Some(UnkLogpE12)
            case None => None
          }
          lp.foreach { v =>
            val cand = score(from) + v
            val candPieces = nPieces(from) + 1
            val better = cand > score(i) ||
              (cand == score(i) && (candPieces < nPieces(i) ||
                (candPieces == nPieces(i) && l > lastLen(i))))
            if (better) {
              score(i) = cand; nPieces(i) = candPieces; lastLen(i) = l
            }
          }
        }
        l += 1
      }
      i += 1
    }
    // walk back
    var out = List.empty[String]
    var pos = n
    while (pos > 0) {
      val l = lastLen(pos)
      out = word.substring(pos - l, pos) :: out
      pos -= l
    }
    out
  }

  /** Tokenize a text column under a learned vocabulary: one row per doc
    * with (id, n_words, n_pieces, pieces) — pieces space-joined in
    * order, words separated implicitly (pieces never span words).
    */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               vocab: Seq[Piece], maxPieceLen: Int = 4): DataFrame = {
    require(vocab.nonEmpty, "vocabulary must not be empty")
    val spark = df.sparkSession
    import spark.implicits._
    val lookup = vocab.map(p => p.piece -> p.logp_e12).toMap
    val bc = spark.sparkContext.broadcast(lookup)
    val maxL = maxPieceLen
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast("long"),
        split(trim(regexp_replace(lower(col(textCol)), "\\s+", " ")), " ")
          .as("__w"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Seq[String]]()
        val v = bc.value
        it.map { case (id, ws) =>
          val words = ws.filter(_.nonEmpty)
          val pieces = words.flatMap { w =>
            var enc = memo.get(w)
            if (enc == null) {
              enc = encodeWord(w, v, maxL)
              memo.put(w, enc)
            }
            enc
          }
          (id, words.size.toLong, pieces.size.toLong, pieces.mkString(" "))
        }
      }
      .toDF(idCol, "n_words", "n_pieces", "pieces")
  }
}
