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
  * Built over UTF-8 BYTES, fully determinized: the goto and fail
  * functions are fused at build time into one dense 256-wide transition
  * table, so the per-row walk is one array load per input byte — no
  * hash lookups, no boxing, no fail-chain loop, and no per-row String
  * copy (it reads the UTF8String's bytes in place; UTF-8 is
  * self-synchronizing, so byte-level matches are exactly the
  * character-level matches). The trade is build-time memory: ~1 KiB per
  * trie node (one node per distinct pattern-prefix byte) — the
  * blocklist/marker scale this is for, capped at 2^18 nodes.
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

  // delta: DFA transition table, node*256 + byte -> node;
  // outOff/outPat: CSR layout of the precomputed output sets (patterns
  // ending at the node or anywhere on its fail chain)
  private val (delta, outOff, outPat) = AhoCorasick.build(patterns)
  private val patLens: Array[Int] =
    patterns.map(_.getBytes("UTF-8").length).toArray

  /** Per-pattern occurrence counts over `s` (overlapping included). */
  def countArray(s: UTF8String): ArrayData = {
    val counts = new Array[Long](numPatterns)
    val n = s.numBytes
    var cur = 0
    var i = 0
    while (i < n) {
      cur = delta((cur << 8) | (s.getByte(i) & 0xff))
      var o = outOff(cur)
      val end = outOff(cur + 1)
      while (o < end) { counts(outPat(o)) += 1L; o += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Replace every leftmost non-overlapping occurrence of any pattern
    * with `mask` — ties at one start position go to the EARLIEST pattern
    * in list order, and scanning resumes after the replaced span. These
    * are exactly RE2/PCRE `regexp_replace(text, 'p1|p2|…', mask, 'g')`
    * semantics for literal patterns (leftmost start wins; at equal start
    * the alternation order wins), so external engines replay redaction
    * verbatim. One DFA pass collects candidate matches (they surface at
    * their END byte, so a longer pattern can start before an
    * already-seen shorter one — selection must be global, not greedy),
    * then one sort + sweep builds the output.
    */
  def redact(s: UTF8String, mask: UTF8String): UTF8String = {
    val n = s.numBytes
    // collect (start, patternIdx) packed as start<<32 | idx: numeric
    // order = (start asc, idx asc), exactly the selection priority
    var packed = new Array[Long](8)
    var m = 0
    var cur = 0
    var i = 0
    while (i < n) {
      cur = delta((cur << 8) | (s.getByte(i) & 0xff))
      var o = outOff(cur)
      val end = outOff(cur + 1)
      while (o < end) {
        val idx = outPat(o)
        if (m == packed.length) packed = java.util.Arrays.copyOf(packed, m * 2)
        packed(m) = ((i - patLens(idx) + 1).toLong << 32) | idx.toLong
        m += 1
        o += 1
      }
      i += 1
    }
    if (m == 0) return s
    java.util.Arrays.sort(packed, 0, m)
    val src = s.getBytes
    val maskBytes = mask.getBytes
    val out = new java.io.ByteArrayOutputStream(n)
    var cursor = 0
    var j = 0
    while (j < m) {
      val start = (packed(j) >>> 32).toInt
      val idx = (packed(j) & 0xffffffffL).toInt
      if (start >= cursor) {
        out.write(src, cursor, start - cursor)
        out.write(maskBytes, 0, maskBytes.length)
        cursor = start + patLens(idx)
      }
      j += 1
    }
    out.write(src, cursor, n - cursor)
    UTF8String.fromBytes(out.toByteArray)
  }
}

object AhoCorasick {
  /** Driver-side build: byte trie → BFS fail links → determinized
    * transition table + CSR output sets. Only the three flat arrays
    * ship to executors.
    */
  private def build(patterns: Seq[String]): (Array[Int], Array[Int], Array[Int]) = {
    val trie = mutable.ArrayBuffer(Array.fill(256)(-1))
    val ends = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var cur = 0
      p.getBytes("UTF-8").foreach { b =>
        val idx = b & 0xff
        var nxt = trie(cur)(idx)
        if (nxt == -1) {
          trie += Array.fill(256)(-1)
          ends += Nil
          nxt = trie.length - 1
          trie(cur)(idx) = nxt
        }
        cur = nxt
      }
      ends(cur) = pi :: ends(cur)
    }
    val numNodes = trie.length
    require(numNodes <= (1 << 18),
      s"pattern set too large for the dense automaton ($numNodes trie " +
        "nodes > 2^18): split the patterns across several expressions")

    // BFS: fill fail links, determinize each row in place (missing byte
    // -> the fail state's transition, already determinized by BFS
    // order), and precompute output sets
    val fail = new Array[Int](numNodes)
    val outLists = new Array[List[Int]](numNodes)
    outLists(0) = Nil
    val queue = mutable.Queue.empty[Int]
    val root = trie(0)
    var b = 0
    while (b < 256) {
      val c = root(b)
      if (c == -1) root(b) = 0
      else { fail(c) = 0; queue += c }
      b += 1
    }
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      outLists(n) = ends(n) ::: outLists(fail(n))
      val row = trie(n)
      val frow = trie(fail(n))
      var b = 0
      while (b < 256) {
        val c = row(b)
        if (c == -1) row(b) = frow(b)
        else { fail(c) = frow(b); queue += c }
        b += 1
      }
    }

    val delta = new Array[Int](numNodes << 8)
    var n = 0
    while (n < numNodes) {
      System.arraycopy(trie(n), 0, delta, n << 8, 256)
      n += 1
    }
    val outOff = new Array[Int](numNodes + 1)
    n = 0
    while (n < numNodes) {
      outOff(n + 1) = outOff(n) + outLists(n).length
      n += 1
    }
    val outPat = new Array[Int](outOff(numNodes))
    n = 0
    while (n < numNodes) {
      var o = outOff(n)
      var l = outLists(n)
      while (l.nonEmpty) { outPat(o) = l.head; o += 1; l = l.tail }
      n += 1
    }
    (delta, outOff, outPat)
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

/** Redact every occurrence of every pattern in one pass — the masking
  * companion of [[MultiPatternCounts]] (blocklist scrubbing, PII-style
  * literal masking): leftmost non-overlapping match wins, ties at one
  * start position go to the earliest pattern in list order, scanning
  * resumes after the mask — exactly
  * `regexp_replace(text, 'p1|p2|…', mask, 'g')` semantics for literal
  * patterns, so external engines replay it. Null text → null.
  */
case class MultiPatternRedact(child: Expression, patterns: Seq[String],
                              mask: String)
    extends UnaryExpression {
  require(mask != null, "mask must not be null (use \"\" to delete matches)")

  @transient private lazy val ac = new AhoCorasick(patterns)
  @transient private lazy val maskU = UTF8String.fromString(mask)

  override def dataType: DataType = StringType
  override def prettyName: String = "multi_pattern_redact"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ac.redact(input.asInstanceOf[UTF8String], maskU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acRef = ctx.addReferenceObj("ac", ac, "graft.functions.AhoCorasick")
      val maskRef = ctx.addReferenceObj("mask", maskU,
        "org.apache.spark.unsafe.types.UTF8String")
      s"${ev.value} = $acRef.redact($c, $maskRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiPatternRedact =
    copy(child = newChild)
}

object MultiMatchFunctions {
  def multiPatternCounts(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiPatternCounts(ColumnBridge.expression(text), patterns))

  def multiPatternRedact(text: Column, patterns: Seq[String],
                         mask: String): Column =
    ColumnBridge.column(
      MultiPatternRedact(ColumnBridge.expression(text), patterns, mask))
}
