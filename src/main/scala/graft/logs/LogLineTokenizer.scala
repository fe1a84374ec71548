package graft.logs

import java.util.regex.Pattern

/** Hand-rolled tokenizer for the S3 access-log grammar with a regex
  * fallback — the parse kernel under both [[graft.functions.ParseLogLine]]
  * (the Catalyst expression) and the `accesslog` DSv2 reader.
  *
  * The 18-group pattern ([[LogLineParser.Pattern]]) is structurally simple:
  * space-separated tokens of three shapes (`\S+` runs, one `\[[^\]]*\]`
  * bracket field, three `("[^"]*"|-)` quoted-or-dash fields, one final
  * single-char field). For a line in this common shape the generic regex
  * engine's work — alternation dispatch, per-group position bookkeeping,
  * backtracking machinery — is pure overhead; a direct left-to-right walk
  * produces the same capture groups several times faster.
  *
  * EXACTNESS ARGUMENT (why fast-path success implies regex equality):
  * a `find()` match must start with `\S`, so the earliest candidate start
  * is the first non-space character — where the walk starts. From there
  * the regex engine's first-attempted path IS the walk: `\S+` is maximal
  * (no in-token backtrack can succeed: every shorter prefix is followed
  * by a non-space, and the pattern requires a literal space), `[^\]]*` /
  * `[^"]*` cannot cross their closing delimiter, and the two branches of
  * the quoted-or-dash alternation are mutually exclusive on their first
  * character. A fully successful walk is therefore exactly the leftmost
  * greedy match the engine would return. On ANY deviation — double
  * separators, tabs, unterminated quotes, too few fields, matches that
  * could only start mid-line — the walk returns null and the caller runs
  * the real regex, preserving `Matcher.find` semantics bit-for-bit
  * (property-checked in LogLineTokenizerSpec).
  */
object LogLineTokenizer {

  private val CompiledPattern: Pattern = Pattern.compile(LogLineParser.Pattern)

  val NumGroups = 18

  /** Field shapes, pattern order: s = `\S+` token, b = bracket field,
    * q = quoted-or-dash, 1 = single non-space char.
    */
  private val Kinds: Array[Char] =
    "ssbsssssqssssssqq1".toCharArray

  /** Java regex `\s` (no UNICODE_CHARACTER_CLASS): exactly these six. */
  @inline private def isSpaceClass(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** The 18 capture groups of the leftmost match, or null if the line has
    * no match anywhere (the corrupt-record path).
    */
  def parseGroups(line: String): Array[String] = {
    val fast = tryFast(line)
    if (fast != null) fast else regexGroups(line)
  }

  private[logs] def regexGroups(line: String): Array[String] = {
    val m = CompiledPattern.matcher(line)
    if (!m.find()) return null
    val out = new Array[String](NumGroups)
    var i = 0
    while (i < NumGroups) { out(i) = m.group(i + 1); i += 1 }
    out
  }

  /** Single left-to-right walk; null on any shape deviation. */
  private[logs] def tryFast(line: String): Array[String] = {
    val n = line.length
    var i = 0
    while (i < n && isSpaceClass(line.charAt(i))) i += 1
    val out = new Array[String](NumGroups)
    var f = 0
    while (f < NumGroups) {
      if (i >= n) return null
      val start = i
      (Kinds(f): @annotation.switch) match {
        case 's' =>
          while (i < n && !isSpaceClass(line.charAt(i))) i += 1
          if (i == start) return null
          out(f) = line.substring(start, i)
        case 'b' =>
          if (line.charAt(i) != '[') return null
          i += 1
          while (i < n && line.charAt(i) != ']') i += 1
          if (i >= n) return null
          i += 1
          out(f) = line.substring(start, i)
        case 'q' =>
          val c = line.charAt(i)
          if (c == '"') {
            i += 1
            while (i < n && line.charAt(i) != '"') i += 1
            if (i >= n) return null
            i += 1
            out(f) = line.substring(start, i)
          } else if (c == '-') { i += 1; out(f) = "-" }
          else return null
        case '1' =>
          if (isSpaceClass(line.charAt(i))) return null
          out(f) = line.substring(i, i + 1)
          i += 1
      }
      // exactly one literal-space separator between fields (none required
      // after the last: the pattern is unanchored at both ends)
      if (f < NumGroups - 1) {
        if (i >= n || line.charAt(i) != ' ') return null
        i += 1
      }
      f += 1
    }
    out
  }
}
