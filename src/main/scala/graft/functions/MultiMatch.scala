package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Aho–Corasick automaton (public algorithm, Aho & Corasick
  * 1975): matches ALL patterns against a text in ONE left-to-right pass,
  * counting every occurrence of every pattern — including occurrences
  * that overlap each other or themselves. The scalable form of the
  * blocklist/marker scan: a regex alternation re-scans per alternative
  * and a per-pattern `instr` loop is O(patterns × text), while this is
  * O(text + matches) whatever the pattern count.
  *
  * The automaton is built once on the driver from the pattern list and
  * ships to executors as a codegen reference object (the
  * NearestCentroids pattern) — per row, generated code makes one call
  * into [[countArray]].
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "AhoCorasick needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty patterns are not matchable")

  val numPatterns: Int = patterns.length

  // trie (goto function); a HashMap per node keeps the build simple —
  // the walk below does at most one failed lookup per fail-link hop
  private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val ends = mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var cur = 0
    p.foreach { ch =>
      cur = children(cur).getOrElseUpdate(ch, {
        children += mutable.HashMap.empty
        ends += Nil
        children.length - 1
      })
    }
    ends(cur) = pi :: ends(cur)
  }

  // BFS failure links; out(n) = patterns ending at n OR at any node on
  // its fail chain (precomputed, so the walk never chases suffix links
  // to report matches)
  private val fail = new Array[Int](children.length)
  private val out = new Array[List[Int]](children.length)
  locally {
    out(0) = ends(0)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach { c =>
      fail(c) = 0
      out(c) = ends(c) ::: out(0)
      queue += c
    }
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      children(n).foreach { case (ch, c) =>
        var f = fail(n)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(c) = children(f).getOrElse(ch, 0) match {
          case `c` => 0 // a root child transitioning to itself
          case other => other
        }
        out(c) = ends(c) ::: out(fail(c))
        queue += c
      }
    }
  }

  /** Per-pattern occurrence counts over `s` (overlapping included). */
  def countArray(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new Array[Long](numPatterns)
    var cur = 0
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      while (cur != 0 && !children(cur).contains(ch)) cur = fail(cur)
      cur = children(cur).getOrElse(ch, 0)
      var o = out(cur)
      while (o.nonEmpty) { counts(o.head) += 1L; o = o.tail }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

/** Count every occurrence of every pattern in one pass:
  * array<bigint> of per-pattern counts, index-aligned with `patterns`.
  * Null text → null. See [[AhoCorasick]] for semantics (overlapping
  * occurrences count; duplicate patterns count independently).
  */
case class MultiPatternCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_pattern_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ac.countArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acRef = ctx.addReferenceObj("ac", ac, "graft.functions.AhoCorasick")
      s"${ev.value} = $acRef.countArray($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCounts =
    copy(child = newChild)
}

object MultiMatchFunctions {
  def multiPatternCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCounts(ColumnBridge.expression(text), patterns))
}
