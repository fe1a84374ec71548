package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial top-k per group: the scale path for "top N rows per key".
  *
  * The window-function formulation (`row_number().over(partitionBy(key)
  * .orderBy(...)) <= k`, q08) shuffles EVERY row to its key's partition and
  * sorts it, even though all but k rows per key are discarded — at 100 TB
  * the exchange is the job. This Aggregator keeps a bounded k-element
  * buffer per key, so Spark's standard partial aggregation applies: each
  * map task pre-reduces to <= k rows per key it has seen, and the shuffle
  * carries k-row buffers, not the table. Wire cost drops from O(rows) to
  * O(distinct keys x k) per map task — the same partial/final split a
  * sum() gets, applied to top-k.
  *
  * Ordering is total — (score, id) descending — so results are
  * deterministic under any merge order; ties cannot be split ambiguously.
  *
  * Buffer is a size-bounded min-heap: insert is O(log k) and eviction
  * drops the smallest, merge is heap-union truncated to k. The buffer
  * serializes as a plain Seq for shuffle transport.
  */
object TopKAgg {

  /** One scored row: the ordering key pair (score desc, id desc). */
  final case class Scored(score: Double, id: Long)

  /** Boxed input row so null score/id survive the encoder: rows with a
    * null component are SKIPPED, standard aggregate null semantics (like
    * sum/max). Note the window row_number formulation instead ranks null
    * scores LAST — the two differ only when a key has fewer than k
    * non-null rows.
    */
  final case class In(score: java.lang.Double, id: java.lang.Long)

  private implicit val scoredOrd: Ordering[Scored] =
    Ordering.by((s: Scored) => (s.score, s.id))

  final class TopK(k: Int) extends Aggregator[In, Seq[Scored], Seq[Scored]] {
    require(k > 0, "k must be positive")

    override def zero: Seq[Scored] = Seq.empty

    private def bound(heap: mutable.PriorityQueue[Scored]): Seq[Scored] = {
      while (heap.size > k) heap.dequeue() // drops the SMALLEST (min-heap)
      heap.toSeq
    }

    override def reduce(buf: Seq[Scored], in: In): Seq[Scored] = {
      if (in.score == null || in.id == null) return buf
      val row = Scored(in.score, in.id)
      // fast path: buffer full and the row can't displace the current min
      if (buf.size >= k && scoredOrd.lteq(row, buf.min)) buf
      else bound(mutable.PriorityQueue(buf: _*)(scoredOrd.reverse) += row)
    }

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else bound(mutable.PriorityQueue(a ++ b: _*)(scoredOrd.reverse))

    override def finish(buf: Seq[Scored]): Seq[Scored] =
      buf.sorted(scoredOrd.reverse) // rank order: best first

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: `topK(3)(struct-compatible score, id)` →
    * array<struct<score,id>> ordered best-first.
    */
  def column(k: Int, score: Column, id: Column): Column =
    udaf(new TopK(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[In]())
      .apply(score, id)
}
