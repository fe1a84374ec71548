package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Within-document repetition statistics — the char-weighted signals of
  * the Gopher repetition filter family (duplicate-line fractions,
  * most-frequent-n-gram char share for n=2..4, duplicated-n-gram char
  * share for n=5..10) that [[graft.ext.QualityFilters.withGopherRules]]'
  * length/symbol rules deliberately left out. Boilerplate loops, lyrics
  * pages, keyword stuffing and decode glitches all light these up while
  * passing every length heuristic.
  *
  * These are PER-DOCUMENT signals, so the correct 100 TB plan is a
  * per-row pass fused into the scan — never an explode: the built-in
  * formulation shuffles one posting per (doc, gram, n) — ~9× the corpus
  * token count through an exchange — to compute numbers that never leave
  * the row. This expression makes one pass over the line array and one
  * over the token array per n, with small per-document hash maps.
  *
  * Exactness contract (the CharLnSumScaled stance): every output is an
  * exact INTEGER numerator/denominator pair component — char counts are
  * CODEPOINT counts, gram identity is the space-joined token string,
  * top-gram ties break to the UTF-8-binary-smallest gram — so an
  * external SQL engine replays each field bit-for-bit and callers
  * threshold fractions via integer cross-multiplication, no floats.
  *
  * Inputs: the RAW text (lines split on `\n`, trimmed of `[ \t\f\r]` —
  * exactly that four-char class, spelled out so RE2 `\s` ambiguity can't
  * drift — case-sensitive, empties dropped) and the CANONICAL token
  * array (pass [[graft.ext.TextStats.canonicalTokens]]; taking tokens as
  * input keeps tokenization parity with every other operator instead of
  * re-implementing it here). Output struct, all BIGINT:
  *  - n_words, text_chars (Σ token cp-lens + separators)
  *  - n_lines, dup_line_count, dup_line_chars, line_chars_total
  *    (dup = all occurrences of any line whose count ≥ 2)
  *  - top_gram_chars_2/3/4 (top count × gram cp-len)
  *  - dup_gram_chars_5..10 (Σ over grams with count ≥ 2 of count × cp-len
  *    — the standard sum form; occurrences of distinct duplicated grams
  *    may overlap in text and are counted per occurrence, documented)
  */
case class RepetitionStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = RepetitionStats.Schema
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(text: Any, toks: Any): Any =
    RepetitionStats.compute(text.asInstanceOf[UTF8String],
      toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, a) =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($t, $a);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RepetitionStats =
    copy(left = newLeft, right = newRight)
}

object RepetitionStats {

  val Schema: StructType = StructType(
    (Seq("n_words", "text_chars", "n_lines", "dup_line_count",
      "dup_line_chars", "line_chars_total",
      "top_gram_chars_2", "top_gram_chars_3", "top_gram_chars_4") ++
      (5 to 10).map(n => s"dup_gram_chars_$n"))
      .map(f => StructField(f, LongType, nullable = false)))

  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** UTF-8 binary order (what an external engine's string comparison
    * uses) — Java String.compareTo is UTF-16 code-unit order, which
    * disagrees above the BMP.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val lim = math.min(x.length, y.length)
    var i = 0
    while (i < lim) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Static entry shared by interpreted eval and generated code. */
  def compute(text: UTF8String, toksArr: ArrayData): InternalRow = {
    val out = new Array[Any](15)

    // ----- lines: raw text, '\n' split, [ \t\f\r]-trim, empties dropped
    val raw = text.toString
    val lineCounts = new java.util.HashMap[String, Int]
    var start = 0
    var nLines = 0L
    var lineCharsTotal = 0L
    def addLine(endExcl: Int): Unit = {
      var a = start
      var b = endExcl
      def isTrim(ch: Char) = ch == ' ' || ch == '\t' || ch == '\f' || ch == '\r'
      while (a < b && isTrim(raw.charAt(a))) a += 1
      while (b > a && isTrim(raw.charAt(b - 1))) b -= 1
      if (b > a) {
        val line = raw.substring(a, b)
        lineCounts.put(line, lineCounts.getOrDefault(line, 0) + 1)
        nLines += 1
        lineCharsTotal += cpLen(line)
      }
    }
    var i = 0
    while (i < raw.length) {
      if (raw.charAt(i) == '\n') { addLine(i); start = i + 1 }
      i += 1
    }
    addLine(raw.length)
    var dupLineCount = 0L
    var dupLineChars = 0L
    val lineIt = lineCounts.entrySet().iterator()
    while (lineIt.hasNext) {
      val e = lineIt.next()
      if (e.getValue >= 2) {
        dupLineCount += e.getValue.toLong
        dupLineChars += e.getValue.toLong * cpLen(e.getKey)
      }
    }

    // ----- tokens (canonical, provided by the caller); empties dropped
    val m = toksArr.numElements()
    val toks = new java.util.ArrayList[String](m)
    var textChars = 0L
    var t = 0
    while (t < m) {
      if (!toksArr.isNullAt(t)) {
        val w = toksArr.getUTF8String(t).toString
        if (w.nonEmpty) {
          toks.add(w)
          textChars += cpLen(w)
        }
      }
      t += 1
    }
    val nWords = toks.size.toLong
    if (nWords > 1) textChars += nWords - 1 // single-space separators

    // ----- grams: one map per n; top for 2..4, dup-sum for 5..10
    def gramStats(n: Int): (Long, Long) = {
      if (toks.size < n) return (0L, 0L)
      val counts = new java.util.HashMap[String, Int]
      val sb = new java.lang.StringBuilder
      var p = 0
      while (p + n <= toks.size) {
        sb.setLength(0)
        var q = 0
        while (q < n) {
          if (q > 0) sb.append(' ')
          sb.append(toks.get(q + p))
          q += 1
        }
        val g = sb.toString
        counts.put(g, counts.getOrDefault(g, 0) + 1)
        p += 1
      }
      var topGram: String = null
      var topCount = 0
      var dupChars = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c > topCount ||
            (c == topCount && topGram != null && utf8Less(e.getKey, topGram))) {
          topCount = c; topGram = e.getKey
        }
        if (c >= 2) dupChars += c.toLong * cpLen(e.getKey)
      }
      val topChars = if (topGram == null) 0L else topCount.toLong * cpLen(topGram)
      (topChars, dupChars)
    }

    out(0) = nWords
    out(1) = textChars
    out(2) = nLines
    out(3) = dupLineCount
    out(4) = dupLineChars
    out(5) = lineCharsTotal
    var n = 2
    while (n <= 4) { out(4 + n) = gramStats(n)._1; n += 1 } // 6..8
    n = 5
    while (n <= 10) { out(4 + n) = gramStats(n)._2; n += 1 } // 9..14
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

/** Column wrapper. */
object RepetitionStatsFunctions {
  def repetitionStats(text: Column, toks: Column): Column =
    ColumnBridge.column(RepetitionStats(
      ColumnBridge.expression(text), ColumnBridge.expression(toks)))
}
