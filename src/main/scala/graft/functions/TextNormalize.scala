package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for web-scraped text — the cleanup pass that
  * runs before any hash-based dedup or n-gram operator, because
  * visually-identical strings with different codepoint sequences
  * ("é" precomposed vs "e"+U+0301) hash differently and silently defeat
  * exact dedup, span grams, and fingerprints. Spark has no built-in for
  * this; the JDK does (`java.text.Normalizer`, pure JVM, no codec
  * libs), so this is a native codegen'd expression rather than a UDF:
  * one static call per row from generated code, the surrounding
  * projection stays in whole-stage codegen.
  *
  * Supports the four standard forms (NFC/NFD/NFKC/NFKD). NFC is the
  * dedup-canonicalization choice (shortest, preserves compatibility
  * distinctions); NFKC additionally folds compatibility variants
  * (full-width forms, ligatures) — the usual choice before token
  * counting. The fast path: `Normalizer.isNormalized` is checked first,
  * so the overwhelmingly-ASCII common case costs one scan and zero
  * allocations.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  // resolve ONCE at construction (also validates the name); the per-row
  // path receives the enum ordinal — no string match or allocation
  private val resolvedForm = UnicodeNormalize.formOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String],
      resolvedForm.ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNormalize.normalize($c, " +
        s"${resolvedForm.ordinal});")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  private[functions] def formOf(name: String): java.text.Normalizer.Form =
    name.toUpperCase match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unknown Unicode normalization form '$other' (NFC/NFD/NFKC/NFKD)")
    }

  private val Forms = java.text.Normalizer.Form.values()

  /** Static entry shared by interpreted eval and generated code; `form`
    * is the Form enum ordinal resolved once at expression construction.
    */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}

/** Column wrappers for the text-normalization expressions. */
object TextNormalizeFunctions {
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))
}
