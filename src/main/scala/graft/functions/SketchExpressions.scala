package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native sketch kernels for the dedup operators.
  *
  * The declarative formulations (`array_min(transform(...))` × k slots for
  * MinHash; `aggregate` over per-token 64-slot arrays for SimHash) are
  * correct but run through CodegenFallback higher-order functions — one
  * interpreted lambda call per element per slot, plus a k-element array
  * allocation per token for SimHash. These expressions compute the same
  * sketches in one tight pass per row (hash each element once, then k
  * cheap long-mixes), called as a single static method from generated
  * code so the surrounding projection stays in whole-stage codegen.
  */

/** MinHash signature: array<bigint> of length `numHashes`; slot i = min
  * over elements of mix(xxh64(element), seed+i). Deterministic (fixed
  * seed), per-row, no shuffle. Empty/all-null input → all Long.MaxValue.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchHelper.minhash(input.asInstanceOf[ArrayData], numHashes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.minhash($c, $numHashes, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** PORTABLE MinHash signature: array<string> of length `numHashes`;
  * slot i = MIN over elements of the first 16 hex chars of
  * `md5(i || "|" || element)` — byte-for-byte the declarative
  * `transform(sequence(0, k−1), i => array_min(transform(sh, s =>
  * substring(md5(concat(i, "|", s)), 1, 16))))` that
  * [[graft.streaming.StreamingMinhashLsh]] replays in DuckDB, but in
  * ONE tight pass per row: each element's bytes are materialized once,
  * each (i, element) md5 runs on a reused thread-local digest into a
  * reused output buffer, and the running minima are kept as unsigned
  * longs (16 lowercase hex chars compare exactly like the unsigned
  * 64-bit value they spell, so the string min IS the numeric min) —
  * no per-slot array allocation, no interpreted lambda per element.
  * NULL elements are skipped (array_min semantics); a row with no
  * non-null element yields all-NULL slots, matching
  * `array_min(empty) = NULL`.
  */
case class PortableMinHash(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "portable_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchHelper.portableMinhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.portableMinhash($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array: per bit, sign of the ±1 sum over
  * token hashes. The token hash is the FIRST 8 BYTES OF md5 (big-endian
  * = the first 16 hex chars), not xxh64: md5 is the one 64-bit-capable
  * hash Spark and DuckDB share, so the whole sketch — and the gate
  * that band-joins it — replays bit-for-bit in an independent engine
  * (the library-wide md5 discipline of the CMS/HLL/KMV family). Bits
  * of md5 are uniform, so sketch quality is unchanged. Per-row, no
  * shuffle; integer accumulators throughout.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchHelper.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a token array: array<string> where
  * element i = tokens[i..i+n-1] joined by a single space, first-occurrence
  * order, duplicates removed. Short inputs (< n tokens) yield one shingle
  * of all tokens — the same windowing the declarative
  * `transform(sequence(...), slice+array_join)` form produced, but in one
  * native pass (the HOF form allocates a slice copy and joins strings
  * through interpreted lambdas per position).
  */
case class WordNgrams(child: Expression, n: Int, dedup: Boolean = true)
    extends UnaryExpression {

  require(n > 0, s"word_ngrams window must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    if (dedup) SketchHelper.wordNgrams(input.asInstanceOf[ArrayData], n)
    else SketchHelper.wordNgramsAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (dedup) "wordNgrams" else "wordNgramsAll"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.$fn($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** Character n-grams of a STRING (not a token array): array<string> of
  * every n-char window, duplicates kept (frequency matters for language
  * profiles). One pass over the UTF8String with slice views.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"char_ngrams window must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchHelper.charNgrams(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.charNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Highest occurrence count of any single token in the array (0 for an
  * empty array) — the dominance half of the repetition quality gate. The
  * composed form (`array_max(transform(array_distinct(toks), t ->
  * size(filter(toks, x -> x = t))))`) is O(distinct × tokens) through
  * interpreted lambda dispatch; this is one hash-count pass per row.
  * Null tokens count as the empty string, matching the canonical
  * tokenizer's behavior elsewhere in this package.
  */
case class TokenModeCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_mode_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SketchHelper.tokenModeCount(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.tokenModeCount($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenModeCount =
    copy(child = newChild)
}

/** Per-language marker-word counts: given K marker sets, returns
  * array<int> of length K where slot k = number of tokens (with
  * multiplicity) present in marker set k. One pass over the tokens with a
  * precomputed word → language-bitmask map — the declarative form
  * (`size(filter(tokens, array_contains(set_k, _)))` × K) interprets
  * K·|tokens|·|set| lambda calls per row.
  */
case class MarkerCounts(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression {

  require(markerSets.nonEmpty && markerSets.length <= 32,
    s"marker_counts supports 1..32 marker sets (Int bitmask), got ${markerSets.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "marker_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val lookup: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
    markerSets.zipWithIndex.foreach { case (words, k) =>
      words.foreach { w =>
        val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
        val prev = m.getOrDefault(u, Integer.valueOf(0)).intValue()
        m.put(u, Integer.valueOf(prev | (1 << k)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    SketchHelper.markerCounts(input.asInstanceOf[ArrayData], lookup, markerSets.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("markerLookup", lookup,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchHelper.markerCounts($c, $mapRef, ${markerSets.length});")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

/** Static-call target for interpreted eval AND generated code. */
object SketchHelper {

  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
                else arr.getUTF8String(i)
      i += 1
    }
    val count = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String](count * 2)
    i = 0
    while (i < count) {
      val end = math.min(i + n, len)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = toks(j); j += 1 }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** [[wordNgrams]] with DUPLICATES KEPT, in window order — the counting
    * form (DSIR features, LM transition counts) where occurrence
    * frequency is the signal set semantics would destroy.
    */
  def wordNgramsAll(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
                else arr.getUTF8String(i)
      i += 1
    }
    val count = math.max(len - n + 1, 1)
    val out = new Array[Any](count)
    i = 0
    while (i < count) {
      val end = math.min(i + n, len)
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = toks(j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def tokenModeCount(arr: ArrayData): Int = {
    val len = arr.numElements()
    if (len == 0) return 0
    val counts =
      new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](len * 2)
    var best = 0
    var i = 0
    while (i < len) {
      val t = if (arr.isNullAt(i)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
              else arr.getUTF8String(i)
      val c = counts.merge(t, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
      if (c > best) best = c
      i += 1
    }
    best
  }

  def minhash(arr: ArrayData, k: Int, seed: Long): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(base, seed + i)
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def charNgrams(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return new GenericArrayData(Array[Any](s))
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }

  def markerCounts(arr: ArrayData,
                   lookup: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
                   numSets: Int): ArrayData = {
    val counts = new Array[Int](numSets)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val mask = lookup.get(arr.getUTF8String(j))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val k = java.lang.Integer.numberOfTrailingZeros(m)
            counts(k) += 1
            m &= m - 1
          }
        }
      }
      j += 1
    }
    new GenericArrayData(counts.map(Int.box).asInstanceOf[Array[Any]])
  }

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5, folded big-endian — numerically equal to the
    * first 16 hex chars of the md5 string read as an unsigned 64-bit
    * value (two's-complement into the signed long), which is what the
    * DuckDB oracle decodes.
    */
  def md5Long64(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (h(i) & 0xffL); i += 1 }
    out
  }

  /** One-pass portable MinHash (see [[PortableMinHash]]): per element,
    * `numHashes` md5s of ("i|" ++ element bytes) on a reused digest;
    * minima tracked as unsigned longs of the first 8 digest bytes
    * (== the first 16 hex chars read as an unsigned number); hex
    * rendering only for the `numHashes` winners at the end.
    */
  def portableMinhash(arr: ArrayData, numHashes: Int): ArrayData = {
    // "i|" prefixes are a pure function of numHashes — tiny, compute
    // per call is fine (allocation-free reuse would need per-plan
    // state; 64 small arrays per ROW is noise next to the md5s)
    val prefixes = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < numHashes) {
      prefixes(i) = (i.toString + "|").getBytes(
        java.nio.charset.StandardCharsets.US_ASCII)
      i += 1
    }
    val mins = new Array[Long](numHashes)
    var found = false
    val d = md5Local.get()
    val out = new Array[Byte](16)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val sBytes = arr.getUTF8String(j).getBytes
        var k = 0
        while (k < numHashes) {
          d.reset()
          d.update(prefixes(k))
          d.update(sBytes)
          d.digest(out, 0, 16)
          var h = 0L
          var b = 0
          while (b < 8) { h = (h << 8) | (out(b) & 0xffL); b += 1 }
          if (!found || java.lang.Long.compareUnsigned(h, mins(k)) < 0)
            mins(k) = h
          k += 1
        }
        found = true
      }
      j += 1
    }
    if (!found)
      return new GenericArrayData(new Array[Any](numHashes)) // all NULL
    val hexDigits = "0123456789abcdef".getBytes
    val res = new Array[Any](numHashes)
    i = 0
    while (i < numHashes) {
      val v = mins(i)
      val hx = new Array[Byte](16)
      var b = 0
      while (b < 16) {
        hx(b) = hexDigits(((v >>> ((15 - b) * 4)) & 0xfL).toInt)
        b += 1
      }
      res(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(hx)
      i += 1
    }
    new GenericArrayData(res)
  }

  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = md5Long64(arr.getUTF8String(j).getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

object SketchFunctions {
  def minhashSignature(shingles: Column, numHashes: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes, seed))

  def portableMinhash(shingles: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(PortableMinHash(ColumnBridge.expression(shingles), numHashes))

  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(tokens)))

  def wordNgrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(tokens), n))

  def wordNgramsAll(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(tokens), n, dedup = false))

  def markerCounts(tokens: Column, markerSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(MarkerCounts(ColumnBridge.expression(tokens), markerSets))

  def charNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgrams(ColumnBridge.expression(text), n))

  def tokenModeCount(tokens: Column): Column =
    ColumnBridge.column(TokenModeCount(ColumnBridge.expression(tokens)))
}
