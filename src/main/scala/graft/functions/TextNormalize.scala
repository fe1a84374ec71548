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

/** Mojibake repair (the core ftfy move, as a codegen'd expression):
  * detect text whose characters are really UTF-8 BYTES misread as
  * Latin-1 ("cafÃ©", "donâ€™t" — the single most common encoding wreck
  * in web crawls) and decode them properly.
  *
  * The test is structural, not statistical, so it cannot damage clean
  * text:
  *  - a string containing any char > U+00FF cannot be a Latin-1
  *    misread (Latin-1 only produces U+00–FF) → unchanged;
  *  - re-encode the chars as their Latin-1 bytes; if those bytes are
  *    NOT well-formed UTF-8 with at least one multibyte sequence, the
  *    text was genuine Latin-1-range text ("café" with a real é) →
  *    unchanged;
  *  - otherwise the bytes decode as UTF-8 — that decode IS the
  *    repaired text. One generation of mojibake per call (doubly-
  *    mangled text needs a second application; recursing silently
  *    would hide how broken a source is).
  *
  * ASCII fast path: pure-ASCII strings (the overwhelming majority of a
  * crawl after charset routing) return the input reference untouched.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    FixMojibake.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FixMojibake.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {

  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    // one scan: bail on >FF chars, remember whether any char is >7F
    var hasHigh = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c > 0xFF) return s
      if (c > 0x7F) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // pure ASCII
    // chars ARE the Latin-1 bytes; check well-formed multibyte UTF-8
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) { bytes(i) = str.charAt(i).toByte; i += 1 }
    var j = 0
    var sawMulti = false
    while (j < n) {
      val b = bytes(j) & 0xFF
      val len =
        if (b < 0x80) 1
        else if (b >= 0xC2 && b <= 0xDF) 2
        else if (b >= 0xE0 && b <= 0xEF) 3
        else if (b >= 0xF0 && b <= 0xF4) 4
        else return s // lone continuation / overlong lead: real Latin-1
      if (j + len > n) return s
      var k = 1
      while (k < len) {
        val cont = bytes(j + k) & 0xFF
        val ok = (cont >= 0x80 && cont <= 0xBF) &&
          // range restrictions per RFC 3629 on the FIRST continuation
          (k != 1 || (b match {
            case 0xE0 => cont >= 0xA0
            case 0xED => cont <= 0x9F
            case 0xF0 => cont >= 0x90
            case 0xF4 => cont <= 0x8F
            case _ => true
          }))
        if (!ok) return s
        k += 1
      }
      if (len > 1) sawMulti = true
      j += len
    }
    if (!sawMulti) return s
    UTF8String.fromString(new String(bytes,
      java.nio.charset.StandardCharsets.UTF_8))
  }
}

/** Column wrappers for the text-normalization expressions. */
object TextNormalizeFunctions {
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))

  def fixMojibake(text: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(text)))
}
