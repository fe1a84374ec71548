package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Rank of a long value in a SORTED literal long array: the number of
  * entries `<= value` (or `< value` when `strict`) — the kernel behind
  * [[graft.ext.IntLadder.countBelow]]'s inlined-threshold samplers and
  * the [[graft.ext.Ring]] owner walk.
  *
  * Why a native expression: the HOF form
  * (`size(filter(typedlit(arr), ...))`) runs interpreted — one boxed
  * lambda call per element per row (measured 2 ms/row at 512
  * elements); a flat 512-branch `CASE WHEN` ladder overflows Janino's
  * 64 KB method limit inside larger projections and silently falls
  * back to interpreted eval. This expression generates ONE call into a
  * static binary-search kernel: O(log n) long comparisons, constant
  * generated-code size at any ladder length, duplicate-safe.
  */
case class SortedRankBelow(child: Expression, sorted: Array[Long],
                           strict: Boolean)
    extends UnaryExpression {
  require(sorted.nonEmpty, "empty ladder")
  require(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
    "ladder must be sorted ascending")

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires BIGINT input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SortedRank.count(sorted, input.asInstanceOf[Long], strict)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val arrRef = ctx.addReferenceObj("ladder", sorted, "long[]")
      s"${ev.value} = graft.functions.SortedRank.count($arrRef, $h, $strict);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SortedRankBelow = copy(child = newChild)
}

object SortedRank {
  /** Binary-search rank: entries `<= h` (`< h` when strict), duplicate
    * runs handled by searching for the BOUNDARY insertion point.
    * Static and Java-callable so generated code links directly.
    */
  def count(sorted: Array[Long], h: Long, strict: Boolean): Int = {
    // find the first index i with sorted(i) "stops" h:
    //   strict:  first i with sorted(i) >= h   (count of < h)
    //   else:    first i with sorted(i) >  h   (count of <= h)
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val stops = if (strict) sorted(mid) >= h else sorted(mid) > h
      if (stops) hi = mid else lo = mid + 1
    }
    lo
  }
}
