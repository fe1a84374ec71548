package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-distribution entropy for text quality auditing: near-zero
  * entropy is repeated filler ("aaaa…", padding), abnormally high
  * entropy is key dumps / minified blobs / mojibake — both are
  * low-quality training text that length and stopword heuristics miss.
  *
  * Shannon entropy needs a per-document character histogram. With
  * built-ins that's `explode(chars) → groupBy(doc, char)` — a shuffle of
  * one row PER CHARACTER of the corpus, ~100× the input, absurd at any
  * scale. This expression builds the histogram in one pass inside the
  * row (ASCII counts in a flat array, a small map for the long tail), so
  * entropy is a scan-only projection fused into whole-stage codegen.
  *
  * The contract is engine-replayable determinism, not float prettiness
  * (the q87 lnScaled stance): the expression returns the integer
  *   S = Σ_c count(c) · floor(ln(count(c)) · 1e9)
  * over distinct codepoints c, and callers derive
  *   entropy_e9 = floor(ln(N)·1e9) − floor(S / N)      (N = char count)
  * ≈ entropy in nats × 1e9. Every term is floored before summation, so
  * an external engine reproduces S bit-for-bit from its own histogram
  * regardless of iteration order. S stays within int64 for documents up
  * to ~10^8 characters (S ≤ N·ln(N)·1e9) — far beyond any sane document.
  */
case class CharLnSumScaled(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "char_ln_sum_scaled"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CharLnSumScaled.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharLnSumScaled.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharLnSumScaled =
    copy(child = newChild)
}

object CharLnSumScaled {

  /** Static entry shared by interpreted eval and generated code. One
    * histogram pass over CODEPOINTS (surrogate pairs count once, matching
    * SQL engines' character semantics), then the floored-term sum.
    */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0L
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]
        val prev = other.get(cp)
        other.put(cp, if (prev == null) 1 else prev + 1)
      }
      i += Character.charCount(cp)
    }
    var sum = 0L
    var j = 0
    while (j < 128) {
      sum += term(ascii(j)); j += 1
    }
    if (other != null) {
      val it = other.values.iterator
      while (it.hasNext) sum += term(it.next())
    }
    sum
  }

  // count=1 → ln(1)=0: skipping it is exact, and it's the common case in
  // the long tail
  private def term(c: Int): Long =
    if (c < 2) 0L else c * math.floor(math.log(c) * 1e9).toLong
}

/** Column wrappers for the entropy expressions. */
object CharEntropyFunctions {
  import org.apache.spark.sql.functions._

  def charLnSumScaled(text: Column): Column =
    ColumnBridge.column(CharLnSumScaled(ColumnBridge.expression(text)))

  /** Scaled Shannon entropy in nats × 1e9 (see [[CharLnSumScaled]]):
    * a bigint both Spark and an external SQL engine compute identically.
    */
  def charEntropyE9(text: Column): Column = {
    val n = greatest(length(text).cast("long"), lit(1L))
    floor(log(n.cast("double")) * lit(1e9)).cast("long") -
      floor(charLnSumScaled(text).cast("double") / n).cast("long")
  }
}
