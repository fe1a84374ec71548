package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MinHash-UNION aggregator (the custom `Aggregator[IN,BUF,OUT]` SURVEY.md
  * §2.9 reserves for the sketch extensions): the signature of a GROUP of
  * documents is the elementwise minimum of the row signatures — exactly
  * the MinHash signature of the union of their shingle sets, because
  * min(min(A), min(B)) = min(A ∪ B) per slot.
  *
  * This turns row-level sketches into corpus-level ones with one ordinary
  * aggregation: per-source/per-day signatures whose pairwise agreement
  * estimates content overlap between whole partitions of the corpus —
  * at 100 TB the only way to compare datasets without joining them.
  * Commutative + associative merge ⇒ partial aggregation (map-side
  * combine) applies like any builtin agg; the shuffled payload is one
  * k-slot array per group per partition.
  */
object MinHashUnionAgg extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty

  private def merge2(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"signature length mismatch: ${a.length} vs ${b.length}")
    val out = new Array[Long](a.length)
    var i = 0
    while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  override def reduce(buf: Array[Long], row: Seq[Long]): Array[Long] =
    merge2(buf, if (row == null) Array.empty else row.toArray)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = merge2(a, b)

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()

  /** Column form: `MinHashUnionAgg.column(sigCol)` inside any
    * groupBy().agg(...).
    */
  lazy val column: Column => Column = {
    val u = udaf(MinHashUnionAgg, ExpressionEncoder[Seq[Long]]())
    (c: Column) => u(c)
  }
}
