package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

/** `nearest_centroid(vec)` → int index of the centroid with the highest
  * cosine similarity to `vec`, ties to the LOWEST index — the IVF cell
  * assignment as ONE plan node. The composed form (array_max over
  * K structs each holding a literal centroid array) carries K×dim literal
  * nodes through the optimizer per use; this kernel holds the centroid
  * matrix as a reference object. Semantics mirror the composed form
  * exactly: cosine = dot/( |x|·|c| ) accumulated in index order, 0.0 when
  * either norm is zero, dot over min(len) with null elements skipped,
  * |x| over the full vector; a NaN cosine outranks every finite one
  * (Spark's NaN-greatest ordering), first NaN wins.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  private lazy val k = centroids.length
  private lazy val dim = centroids.head.length
  /** flat [j * dim + d] */
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      var d = 0
      while (d < dim) { a(j * dim + d) = centroids(j)(d); d += 1 }
      j += 1
    }
    a
  }
  /** sqrt of index-order sum of squares — same math as vecNorm. */
  private lazy val cNorm: Array[Double] = {
    val a = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var d = 0
      while (d < dim) { val c = flat(j * dim + d); s += c * c; d += 1 }
      a(j) = math.sqrt(s)
      j += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${child.dataType.simpleString}")
    else if (centroids.isEmpty || centroids.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(s"$prettyName centroid matrix must be rectangular")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = a.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        xx += x * x
      }
      i += 1
    }
    val normX = math.sqrt(xx)
    var bestJ = 0
    var best = Double.NegativeInfinity
    var bestNaN = false
    var j = 0
    while (j < k) {
      var dot = 0.0
      val lim = math.min(n, dim)
      var d = 0
      while (d < lim) {
        if (!a.isNullAt(d)) {
          val x = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
          dot += x * flat(j * dim + d)
        }
        d += 1
      }
      val denom = normX * cNorm(j)
      val s = if (denom > 0) dot / denom else 0.0
      if (java.lang.Double.isNaN(s)) {
        if (!bestNaN) { bestNaN = true; bestJ = j }
      } else if (!bestNaN && s > best) { best = s; bestJ = j }
      j += 1
    }
    bestJ
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val normRef = ctx.addReferenceObj("centNorm", cNorm, "double[]")
      val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val n = ctx.freshName("n")
      val xx = ctx.freshName("xx")
      val normX = ctx.freshName("normX")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      val bestNaN = ctx.freshName("bestNaN")
      def getAt(p: String) = if (isF) s"(double)$a.getFloat($p)" else s"$a.getDouble($p)"
      s"""
         |int $n = $a.numElements();
         |double $xx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { double x = ${getAt(i)}; $xx += x * x; }
         |}
         |double $normX = java.lang.Math.sqrt($xx);
         |int $bestJ = 0;
         |double $best = Double.NEGATIVE_INFINITY;
         |boolean $bestNaN = false;
         |for (int $j = 0; $j < $k; $j++) {
         |  double $dot = 0.0;
         |  int $lim = java.lang.Math.min($n, $dim);
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$a.isNullAt($d)) { $dot += ${getAt(d)} * $flatRef[$j * $dim + $d]; }
         |  }
         |  double $denom = $normX * $normRef[$j];
         |  double $s = ($denom > 0) ? ($dot / $denom) : 0.0;
         |  if (java.lang.Double.isNaN($s)) {
         |    if (!$bestNaN) { $bestNaN = true; $bestJ = $j; }
         |  } else if (!$bestNaN && $s > $best) { $best = $s; $bestJ = $j; }
         |}
         |${ev.value} = $bestJ;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** `hyperplane_bucket(vec)` → bigint whose bit i is the sign of
  * `dot(vec, plane_i)` — the random-hyperplane LSH bucket as ONE plan
  * node instead of bits × dim literal nodes OR-reduced. Mirrors the
  * composed form bit-exactly: bit set when dot >= 0, and ALSO when the
  * dot is NaN (Spark's NaN-greatest comparison made `NaN >= 0` true in
  * the composed form); dot over min(len), null elements skipped.
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  private lazy val bits = planes.length
  private lazy val dim = planes.head.length
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](bits * dim)
    var j = 0
    while (j < bits) {
      var d = 0
      while (d < dim) { a(j * dim + d) = planes(j)(d); d += 1 }
      j += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${child.dataType.simpleString}")
    else if (planes.isEmpty || planes.exists(_.length != dim) || bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName plane matrix must be rectangular with <= 63 rows")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val lim = math.min(a.numElements(), dim)
    var bucket = 0L
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var d = 0
      while (d < lim) {
        if (!a.isNullAt(d)) {
          val x = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
          dot += x * flat(j * dim + d)
        }
        d += 1
      }
      if (dot >= 0 || java.lang.Double.isNaN(dot)) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("planeFlat", flat, "double[]")
      val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val lim = ctx.freshName("lim")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket")
      val getX = if (isF) s"(double)$a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |int $lim = java.lang.Math.min($a.numElements(), $dim);
         |long $bucket = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$a.isNullAt($d)) { $dot += $getX * $flatRef[$j * $dim + $d]; }
         |  }
         |  if ($dot >= 0 || java.lang.Double.isNaN($dot)) $bucket |= (1L << $j);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** `mat_vec(vec)` → array<double>: the constant matrix × vector product,
  * row r = index-order dot of `vec` with matrix row r (null elements
  * skipped, length-mismatch truncates like [[VectorDot]]). The matrix is
  * a reference object — same one-plan-node rationale as
  * [[NearestCentroid]]. Backs deterministic random projection
  * (Johnson–Lindenstrauss) and any fixed linear map over embeddings.
  */
/** Top-`nprobe` centroid INDICES by cosine (descending; ties and the
  * NaN-first rule exactly as [[NearestCentroid]] — a NaN cosine outranks
  * every finite one, lowest index among equals). The multi-probe form of
  * the IVF assignment for a LARGE probe side: one codegen'd plan node per
  * row instead of a numCells-way cross join + window. Selection is
  * nprobe argmax passes over the k scores — k and nprobe are index-sized
  * constants, so the per-row cost is the dot products, same as
  * [[NearestCentroid]].
  */
case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]],
                            nprobe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private lazy val k = centroids.length
  private lazy val dim = centroids.head.length
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      var d = 0
      while (d < dim) { a(j * dim + d) = centroids(j)(d); d += 1 }
      j += 1
    }
    a
  }
  private lazy val cNorm: Array[Double] = {
    val a = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var d = 0
      while (d < dim) { val c = flat(j * dim + d); s += c * c; d += 1 }
      a(j) = math.sqrt(s)
      j += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${child.dataType.simpleString}")
    else if (centroids.isEmpty || centroids.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(s"$prettyName centroid matrix must be rectangular")
    else if (nprobe < 1 || nprobe > k)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName nprobe must be in [1, ${k}], got $nprobe")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = a.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        xx += x * x
      }
      i += 1
    }
    val normX = math.sqrt(xx)
    // NaN → +inf so the NaN-first rule falls out of plain comparison;
    // strict > keeps the lowest index among equals (NearestCentroid's rule)
    val eff = new Array[Double](k)
    var j = 0
    while (j < k) {
      var dot = 0.0
      val lim = math.min(n, dim)
      var d = 0
      while (d < lim) {
        if (!a.isNullAt(d)) {
          val x = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
          dot += x * flat(j * dim + d)
        }
        d += 1
      }
      val denom = normX * cNorm(j)
      val s = if (denom > 0) dot / denom else 0.0
      eff(j) = if (java.lang.Double.isNaN(s)) Double.PositiveInfinity else s
      j += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var bestJ = -1
      var best = Double.NegativeInfinity
      var jj = 0
      while (jj < k) {
        if (!taken(jj) && (bestJ < 0 || eff(jj) > best)) { best = eff(jj); bestJ = jj }
        jj += 1
      }
      taken(bestJ) = true
      out(p) = bestJ
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
      val normRef = ctx.addReferenceObj("centNorm", cNorm, "double[]")
      val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val n = ctx.freshName("n")
      val xx = ctx.freshName("xx")
      val normX = ctx.freshName("normX")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val jj = ctx.freshName("jj")
      val d = ctx.freshName("d")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val s = ctx.freshName("s")
      val eff = ctx.freshName("eff")
      val out = ctx.freshName("out")
      val taken = ctx.freshName("taken")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val bestJ = ctx.freshName("bestJ")
      def getAt(pos: String) = if (isF) s"(double)$a.getFloat($pos)" else s"$a.getDouble($pos)"
      s"""
         |int $n = $a.numElements();
         |double $xx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { double __x = ${getAt(i)}; $xx += __x * __x; }
         |}
         |double $normX = java.lang.Math.sqrt($xx);
         |int $lim = java.lang.Math.min($n, $dim);
         |double[] $eff = new double[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$a.isNullAt($d)) { $dot += ${getAt(d)} * $flatRef[$j * $dim + $d]; }
         |  }
         |  double $denom = $normX * $normRef[$j];
         |  double $s = ($denom > 0) ? ($dot / $denom) : 0.0;
         |  $eff[$j] = java.lang.Double.isNaN($s) ? java.lang.Double.POSITIVE_INFINITY : $s;
         |}
         |int[] $out = new int[$nprobe];
         |boolean[] $taken = new boolean[$k];
         |for (int $p = 0; $p < $nprobe; $p++) {
         |  int $bestJ = -1;
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $jj = 0; $jj < $k; $jj++) {
         |    if (!$taken[$jj] && ($bestJ < 0 || $eff[$jj] > $best)) { $best = $eff[$jj]; $bestJ = $jj; }
         |  }
         |  $taken[$bestJ] = true;
         |  $out[$p] = $bestJ;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

case class MatVec(child: Expression, matrix: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec"

  private lazy val rows = matrix.length
  private lazy val dim = matrix.head.length
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](rows * dim)
    var r = 0
    while (r < rows) {
      var d = 0
      while (d < dim) { a(r * dim + d) = matrix(r)(d); d += 1 }
      r += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${child.dataType.simpleString}")
    else if (matrix.isEmpty || matrix.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(s"$prettyName matrix must be rectangular")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val lim = math.min(a.numElements(), dim)
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var s = 0.0
      var d = 0
      while (d < lim) {
        if (!a.isNullAt(d)) {
          val x = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
          s += x * flat(r * dim + d)
        }
        d += 1
      }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("matFlat", flat, "double[]")
      val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val lim = ctx.freshName("lim")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val getX = if (isF) s"(double)$a.getFloat($d)" else s"$a.getDouble($d)"
      s"""
         |int $lim = java.lang.Math.min($a.numElements(), $dim);
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  double $s = 0.0;
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$a.isNullAt($d)) { $s += $getX * $flatRef[$r * $dim + $d]; }
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

/** `max_cosine(vec)` → double: the HIGHEST cosine similarity between
  * `vec` and any row of a fixed reference matrix — the scan-only kernel
  * behind embedding-space decontamination ("is this training document
  * semantically close to ANY benchmark item?"). Holding the benchmark
  * matrix as a reference object turns what would be a join against the
  * reference set into a per-row filter: the corpus never moves.
  * Semantics mirror [[NearestCentroid]] exactly — cosine accumulated in
  * index order, 0.0 when either norm is zero OR NaN (a NaN element
  * poisons the norm, so the `denom > 0` gate maps the row to 0.0 like a
  * zero vector), dot over min(len) with null elements skipped. A NaN
  * cosine proper (reachable only with infinite elements) propagates as
  * the maximum, matching Spark's NaN-greatest ordering.
  * An EMPTY reference matrix is rejected (use lit(-1.0) if "no refs"
  * should mean "keep everything").
  */
case class MaxCosine(child: Expression, refs: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_cosine"

  private lazy val k = refs.length
  private lazy val dim = refs.head.length
  /** flat [j * dim + d] */
  private lazy val flat: Array[Double] = {
    val a = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      var d = 0
      while (d < dim) { a(j * dim + d) = refs(j)(d); d += 1 }
      j += 1
    }
    a
  }
  private lazy val rNorm: Array[Double] = {
    val a = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var d = 0
      while (d < dim) { val c = flat(j * dim + d); s += c * c; d += 1 }
      a(j) = math.sqrt(s)
      j += 1
    }
    a
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = child.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (!okVec)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${child.dataType.simpleString}")
    else if (refs.isEmpty || refs.exists(_.length != dim))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName reference matrix must be non-empty and rectangular")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = a.numElements()
    var xx = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = if (isF) a.getFloat(i).toDouble else a.getDouble(i)
        xx += x * x
      }
      i += 1
    }
    val normX = math.sqrt(xx)
    var best = Double.NegativeInfinity
    var j = 0
    while (j < k && !java.lang.Double.isNaN(best)) {
      var dot = 0.0
      val lim = math.min(n, dim)
      var d = 0
      while (d < lim) {
        if (!a.isNullAt(d)) {
          val x = if (isF) a.getFloat(d).toDouble else a.getDouble(d)
          dot += x * flat(j * dim + d)
        }
        d += 1
      }
      val denom = normX * rNorm(j)
      val s = if (denom > 0) dot / denom else 0.0
      if (java.lang.Double.isNaN(s) || s > best) best = s
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("refFlat", flat, "double[]")
      val normRef = ctx.addReferenceObj("refNorm", rNorm, "double[]")
      val isF = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val n = ctx.freshName("n")
      val xx = ctx.freshName("xx")
      val normX = ctx.freshName("normX")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val denom = ctx.freshName("denom")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      def getAt(p: String) = if (isF) s"(double)$a.getFloat($p)" else s"$a.getDouble($p)"
      s"""
         |int $n = $a.numElements();
         |double $xx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { double x = ${getAt(i)}; $xx += x * x; }
         |}
         |double $normX = java.lang.Math.sqrt($xx);
         |double $best = Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $k && !java.lang.Double.isNaN($best); $j++) {
         |  double $dot = 0.0;
         |  int $lim = java.lang.Math.min($n, $dim);
         |  for (int $d = 0; $d < $lim; $d++) {
         |    if (!$a.isNullAt($d)) { $dot += ${getAt(d)} * $flatRef[$j * $dim + $d]; }
         |  }
         |  double $denom = $normX * $normRef[$j];
         |  double $s = ($denom > 0) ? ($dot / $denom) : 0.0;
         |  if (java.lang.Double.isNaN($s) || $s > $best) { $best = $s; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxCosine =
    copy(child = newChild)
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

  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))

  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]],
                       nprobe: Int): Column =
    ColumnBridge.column(
      NearestCentroids(ColumnBridge.expression(vec), centroids, nprobe))

  def matVec(vec: Column, matrix: Seq[Seq[Double]]): Column =
    ColumnBridge.column(MatVec(ColumnBridge.expression(vec), matrix))

  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneBucket(ColumnBridge.expression(vec), planes))

  def maxCosine(vec: Column, refs: Seq[Seq[Double]]): Column =
    ColumnBridge.column(MaxCosine(ColumnBridge.expression(vec), refs))
}
