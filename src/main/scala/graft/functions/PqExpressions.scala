package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels. The composed-Column formulation
  * (an `array_max` over `numSubspaces × codebookSize` structs, each
  * holding a `slice` + literal-array dot) is semantically right but puts
  * ~2k literal nodes into the plan TWICE (encode + LUT) — measured ~5 s
  * of analyzer/optimizer time per q80 run at sf0.1, dwarfing the actual
  * arithmetic. These expressions carry the codebook as a REFERENCE
  * OBJECT (constructor parameter, not child literals), so the plan holds
  * exactly one node per use and the per-row work is a tight primitive
  * loop.
  *
  * Shared semantics (must stay aligned with SparkEntry's PqAnnOracle):
  * subspace m of a vector is elements [m·subDim, (m+1)·subDim); scores
  * accumulate in double in index order; elements beyond the vector's
  * length (or null) are skipped, exactly like [[VectorDot]]. NaN-free
  * input contract: a NaN element makes scores NaN and the argmax then
  * keeps code 0 (engines disagree on NaN ordering — same caveat as every
  * float kernel in this package).
  */
private[functions] trait PqCodebook { self: Expression =>
  def codebook: Seq[Seq[Double]]
  def numSubspaces: Int

  protected lazy val k: Int = codebook.length
  protected lazy val dim: Int = codebook.head.length
  protected lazy val subDim: Int = dim / numSubspaces
  /** flat [j * dim + d] */
  protected lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      var d = 0
      while (d < dim) { a(j * dim + d) = codebook(j)(d); d += 1 }
      j += 1
    }
    a
  }
  /** 0.5·|c_{j,m}|², flat [m * k + j], squares summed in index order. */
  protected lazy val halfNormSq: Array[Double] = {
    val a = new Array[Double](numSubspaces * k)
    var m = 0
    while (m < numSubspaces) {
      var j = 0
      while (j < k) {
        var h = 0.0
        var d = 0
        while (d < subDim) {
          val c = flat(j * dim + m * subDim + d)
          h += c * c
          d += 1
        }
        a(m * k + j) = 0.5 * h
        j += 1
      }
      m += 1
    }
    a
  }

  protected def vecCheck(child: Expression, name: String): TypeCheckResult = {
    val okVec = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$name requires an array<float|double> vector, got ${child.dataType.simpleString}")
    else if (codebook.isEmpty || codebook.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(s"$name codebook must be non-empty and rectangular")
    else if (dim % numSubspaces != 0)
      TypeCheckResult.TypeCheckFailure(
        s"$name codebook dim $dim must divide into $numSubspaces subspaces")
    else TypeCheckResult.TypeCheckSuccess

  }

  protected def isFloatVec(child: Expression): Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `pq_encode(vec)` → array<int> of length numSubspaces: per subspace,
  * the index of the codeword maximizing `dot(x_m, c) − |c|²/2` (the
  * L2-nearest codeword), ties to the lowest index. Codegen'd — this is
  * the corpus-scan hot path of PQ at 100 TB.
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Double]],
                    numSubspaces: Int)
    extends UnaryExpression with PqCodebook {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def checkInputDataTypes(): TypeCheckResult = vecCheck(child, prettyName)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = isFloatVec(child)
    val n = a.numElements()
    val out = new Array[Int](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      var bestJ = 0
      var best = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val idx = m * subDim + d
          if (idx < n && !a.isNullAt(idx)) {
            val x = if (isF) a.getFloat(idx).toDouble else a.getDouble(idx)
            s += x * flat(j * dim + idx)
          }
          d += 1
        }
        s -= halfNormSq(m * k + j)
        if (s > best) { best = s; bestJ = j }
        j += 1
      }
      out(m) = bestJ
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
      val halfRef = ctx.addReferenceObj("pqHalf", halfNormSq, "double[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val getX = if (isFloatVec(child)) s"$a.getFloat($idx)" else s"$a.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |int[] $out = new int[$numSubspaces];
         |for (int $m = 0; $m < $numSubspaces; $m++) {
         |  int $bestJ = 0;
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      int $idx = $m * $subDim + $d;
         |      if ($idx < $n && !$a.isNullAt($idx)) {
         |        $s += ((double)$getX) * $flatRef[$j * $dim + $idx];
         |      }
         |    }
         |    $s -= $halfRef[$m * $k + $j];
         |    if ($s > $best) { $best = $s; $bestJ = $j; }
         |  }
         |  $out[$m] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_lut(vec)` → array<array<double>>: lut[m][j] = dot(x_m, c_{j,m}) —
  * the per-query ADC lookup table. Query-side only (a handful of rows per
  * job), so CodegenFallback is fine; what matters is the ONE plan node.
  */
case class PqLut(child: Expression, codebook: Seq[Seq[Double]],
                 numSubspaces: Int)
    extends UnaryExpression with PqCodebook with CodegenFallback {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"
  override def checkInputDataTypes(): TypeCheckResult = vecCheck(child, prettyName)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = isFloatVec(child)
    val n = a.numElements()
    val rows = new Array[Any](numSubspaces)
    var m = 0
    while (m < numSubspaces) {
      val lut = new Array[Double](k)
      var j = 0
      while (j < k) {
        var s = 0.0
        var d = 0
        while (d < subDim) {
          val idx = m * subDim + d
          if (idx < n && !a.isNullAt(idx)) {
            val x = if (isF) a.getFloat(idx).toDouble else a.getDouble(idx)
            s += x * flat(j * dim + idx)
          }
          d += 1
        }
        lut(j) = s
        j += 1
      }
      rows(m) = new GenericArrayData(lut)
      m += 1
    }
    new GenericArrayData(rows)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Column-level entry points for the PQ kernels. */
object PqFunctions {

  def pqEncode(vec: Column, codebook: Seq[Seq[Double]], numSubspaces: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), codebook, numSubspaces))

  def pqLut(vec: Column, codebook: Seq[Seq[Double]], numSubspaces: Int): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(vec), codebook, numSubspaces))
}
