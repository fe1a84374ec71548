package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns (float or double
  * elements, mixed allowed), with full whole-stage-codegen support.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.3 preference order): the
  * built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` is
  * correct but the array higher-order functions are CodegenFallback — each
  * element evaluation goes through an interpreted lambda with variable
  * binding. On an all-pairs similarity join (n²/2 pairs × dim elements)
  * that interpretation dominates the whole query. This expression compiles
  * to a tight primitive loop over `ArrayData` inside the generated code —
  * no boxing, no per-element dispatch — and keeps the surrounding plan in
  * one WholeStageCodegen span.
  *
  * Semantics: sum over i < min(len(a), len(b)) of a[i]*b[i] in index order
  * (deterministic, partition-independent); null array → null; null
  * elements are skipped. Accumulation in double regardless of input width.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        s += x * y
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (elemType(left) == FloatType) s"$a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemType(right) == FloatType) s"$b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ((double)$getA) * ((double)$getB);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecNorm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity; 0.0 when either norm is zero. Arithmetic shape is
    * dot / (sqrt(dot aa) * sqrt(dot bb)) with index-order accumulation —
    * bit-identical to the reference formulation external engines use.
    */
  def vecCosine(a: Column, b: Column): Column = {
    val denom = vecNorm(a) * vecNorm(b)
    when(denom > 0, vecDot(a, b) / denom).otherwise(lit(0.0))
  }
}
