package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native URL kernels for the web-crawl operators.
  *
  * The declarative formulations in [[graft.ext.WebUrl]] (8–10 chained
  * regexp extracts/replaces per call, plus a filtered/sorted param
  * array) are correct but heavy twice over: per ROW each regex re-scans
  * the string through java.util.regex, and per PLAN the ~30-node column
  * tree is duplicated into every join fork (dedup-by-canonical forks it
  * twice, the domain roll-up twice more), so the curation capstones
  * spent more driver time PLANNING the forked trees than running them
  * (q144 measured ~1–2 s planning vs 0.7–0.9 s task time, r15 profile).
  * Each kernel is ONE expression node calling one static method — the
  * [[PortableMinHash]] pattern: single pass over the string, no regex,
  * whole-stage-codegen friendly — and is byte-for-byte equal to the
  * declarative composition it replaces (spec-pinned in
  * UrlKernelParitySpec; the DuckDB oracles replay the declarative form,
  * so parity IS the correctness contract).
  */

/** Canonical form of an absolute http(s) URL — the single-node kernel
  * for [[graft.ext.WebUrl.canonicalizeUrl]]; see there for the
  * documented semantics (scheme/host lowercased, userinfo dropped,
  * default port stripped, empty path → "/", fragment dropped, tracking
  * params dropped and the rest sorted bytewise). Null in, null out.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UrlKernel.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlKernel.canonicalize($c);")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

/** Lowercased host of an absolute URL (authority minus userinfo minus
  * port) — the kernel for [[graft.ext.WebUrl.hostOf]]. "" when the
  * input has no `scheme://` authority; null in, null out.
  */
case class UrlHost(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "url_host"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UrlKernel.host(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UrlKernel.host($c);")

  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

/** Registrable domain of a HOST string — the kernel for
  * [[graft.ext.WebUrl.registrableDomain]] (two-label heuristic with
  * co.uk-shaped second levels, IPv4 and single-label pass-through).
  * NEVER null: the declarative when/concat_ws chain it replaces maps a
  * null host to "" (concat_ws of a null array), so the kernel does too
  * — hence the hand-rolled non-nullSafe codegen.
  */
case class UrlRegistrableDomain(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "registrable_domain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any =
    UrlKernel.registrableDomain(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        graft.functions.UrlKernel.registrableDomain(
          ${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlRegistrableDomain =
    copy(child = newChild)
}

/** One-pass URL parsing helpers — static call targets for the generated
  * code. Every branch mirrors the exact regex semantics of the
  * declarative forms (documented inline), including their behavior on
  * garbage input; lowercasing goes through `UTF8String.toLowerCase` —
  * the very method Spark's `lower()` calls — so case folding can never
  * drift from the engine's.
  */
object UrlKernel {

  private def isAlpha(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')

  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  /** End index of `^[A-Za-z][A-Za-z0-9+.-]*`, or -1 when the first char
    * is not alpha. ':' is outside the class, so "://"
    * can only follow the MAXIMAL run — no backtracking subtlety.
    */
  private def schemeEnd(u: String): Int = {
    if (u.isEmpty || !isAlpha(u.charAt(0))) return -1
    var i = 1
    while (i < u.length && isSchemeChar(u.charAt(i))) i += 1
    i
  }

  private def lowerOf(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** Tracking-param test, ≡ rlike
    * `^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid)(=|$)`: any
    * `utm_` prefix matches ([^=]* runs to the first '=' or the end,
    * after which (=|$) always holds), the literals need '=' or
    * end-of-string right after.
    */
  private def isTracking(p: String): Boolean = {
    if (p.startsWith("utm_")) return true
    var i = 0
    while (i < TrackingLiterals.length) {
      val l = TrackingLiterals(i)
      if (p.startsWith(l) && (p.length == l.length || p.charAt(l.length) == '='))
        return true
      i += 1
    }
    false
  }
  private val TrackingLiterals =
    Array("gclid", "fbclid", "msclkid", "yclid", "mc_eid")

  /** (authority, path) of an absolute URL: authority = `[^/?#]*` after
    * `scheme://`, path = `[^?#]*` after it; both "" when the scheme
    * regex does not match (regexp_extract's no-match value).
    */
  private def authAndPath(u: String): (String, String) = {
    val se = schemeEnd(u)
    if (se <= 0 || !u.startsWith("://", se)) return ("", "")
    val as = se + 3
    var ae = as
    while (ae < u.length && { val c = u.charAt(ae)
      c != '/' && c != '?' && c != '#' }) ae += 1
    var pe = ae
    while (pe < u.length && { val c = u.charAt(pe)
      c != '?' && c != '#' }) pe += 1
    (u.substring(as, ae), u.substring(ae, pe))
  }

  /** Split authority into (host-with-port-stripped-not-lowered, port):
    *  - userinfo: drop through the FIRST '@' (`^[^@]*@` replace);
    *  - host: drop a trailing ':' + all-digits run (`:\d*$` — matches
    *    even with zero digits, i.e. a bare trailing ':');
    *  - port: the digits of `:(\d+)$` (needs ≥ 1 digit), else "".
    */
  private def hostPortOf(auth: String): (String, String) = {
    val at = auth.indexOf('@')
    val hp = if (at >= 0) auth.substring(at + 1) else auth
    var d = hp.length
    while (d > 0 && { val c = hp.charAt(d - 1); c >= '0' && c <= '9' }) d -= 1
    if (d > 0 && hp.charAt(d - 1) == ':')
      (hp.substring(0, d - 1), if (d < hp.length) hp.substring(d) else "")
    else (hp, "")
  }

  def host(u8: UTF8String): UTF8String = {
    if (u8 == null) return null
    val (auth, _) = authAndPath(u8.toString)
    val (h, _) = hostPortOf(auth)
    UTF8String.fromString(h).toLowerCase
  }

  def canonicalize(u8: UTF8String): UTF8String = {
    if (u8 == null) return null
    val u = u8.toString
    val se = schemeEnd(u)
    val hasScheme = se > 0 && u.startsWith("://", se)
    val scheme = if (hasScheme) lowerOf(u.substring(0, se)) else ""
    val (auth, path) = authAndPath(u)
    val (rawHost, port) = hostPortOf(auth)
    val hostLower = lowerOf(rawHost)
    // query = `^[^#?]*\?([^#]*)` over the WHOLE url — present only when
    // the first of '?'/'#' in the string is a '?', independent of any
    // scheme match (the declarative form extracts it from the raw url)
    var qi = 0
    while (qi < u.length && { val c = u.charAt(qi)
      c != '?' && c != '#' }) qi += 1
    val kept = new java.util.ArrayList[UTF8String](4)
    if (qi < u.length && u.charAt(qi) == '?') {
      var qe = qi + 1
      while (qe < u.length && u.charAt(qe) != '#') qe += 1
      // split('&'), drop empties and tracking params
      var start = qi + 1
      var i = qi + 1
      while (i <= qe) {
        if (i == qe || u.charAt(i) == '&') {
          if (i > start) {
            val p = u.substring(start, i)
            if (!isTracking(p)) kept.add(UTF8String.fromString(p))
          }
          start = i + 1
        }
        i += 1
      }
    }
    // array_sort over StringType = unsigned byte order = UTF8String's
    // natural ordering
    java.util.Collections.sort(kept)
    val sb = new java.lang.StringBuilder(u.length + 4)
    sb.append(scheme).append("://").append(hostLower)
    if (port.nonEmpty &&
        !(scheme == "http" && port == "80") &&
        !(scheme == "https" && port == "443"))
      sb.append(':').append(port)
    if (path.isEmpty) sb.append('/') else sb.append(path)
    if (!kept.isEmpty) {
      sb.append('?')
      var i = 0
      while (i < kept.size) {
        if (i > 0) sb.append('&')
        sb.append(kept.get(i).toString)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Split on literal '.', limit -1 (trailing empties kept) — Spark's
    * `split(h, "\\.")`.
    */
  private def splitDots(h: String): Array[String] = {
    var n = 1
    var i = 0
    while (i < h.length) { if (h.charAt(i) == '.') n += 1; i += 1 }
    val out = new Array[String](n)
    var k = 0
    var start = 0
    i = 0
    while (i <= h.length) {
      if (i == h.length || h.charAt(i) == '.') {
        out(k) = h.substring(start, i); k += 1; start = i + 1
      }
      i += 1
    }
    out
  }

  /** `^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$` (digit-shape only — 999.…
    * matches, exactly like the declarative rlike).
    */
  private def isIpv4Shape(h: String): Boolean = {
    var i = 0
    var group = 0
    while (group < 4) {
      var d = 0
      while (i < h.length && { val c = h.charAt(i); c >= '0' && c <= '9' } && d < 3) {
        d += 1; i += 1
      }
      if (d == 0) return false
      group += 1
      if (group < 4) {
        if (i >= h.length || h.charAt(i) != '.') return false
        i += 1
      }
    }
    i == h.length
  }

  private def isSecondLevel(s: String): Boolean =
    s == "co" || s == "com" || s == "net" || s == "org" ||
      s == "gov" || s == "ac" || s == "edu"

  def registrableDomain(h8: UTF8String): UTF8String = {
    // null host → "" (the declarative chain falls through every when()
    // to concat_ws over a null slice, which is "")
    if (h8 == null) return UTF8String.EMPTY_UTF8
    val lowered = h8.toLowerCase
    val h = lowered.toString
    if (isIpv4Shape(h)) return lowered
    val labels = splitDots(h)
    val n = labels.length
    if (n <= 2) return lowered
    val tld = labels(n - 1)
    // length() counts code points (UTF8String.numChars)
    val three = isSecondLevel(labels(n - 2)) &&
      tld.codePointCount(0, tld.length) == 2
    val from = if (three) n - 3 else n - 2
    val sb = new java.lang.StringBuilder(h.length)
    var i = from
    while (i < n) {
      if (i > from) sb.append('.')
      sb.append(labels(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Column-level entry points (the [[SketchFunctions]] pattern). */
object UrlFunctions {

  def canonicalizeUrl(url: Column): Column =
    ColumnBridge.column(CanonicalizeUrl(ColumnBridge.expression(url)))

  def hostOf(url: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(url)))

  def registrableDomain(host: Column): Column =
    ColumnBridge.column(UrlRegistrableDomain(ColumnBridge.expression(host)))
}
