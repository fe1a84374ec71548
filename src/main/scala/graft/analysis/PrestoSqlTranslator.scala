package graft.analysis

/** Text-level Presto/Athena → Spark SQL translation for the reference's
  * query surface (`example_queries/days_apart_analysis.sql`; function
  * inventory SURVEY.md §2.3) — so a user can hand this engine the SQL
  * files they run in Athena today, byte-for-byte, and get the same
  * results from `spark.sql`:
  *
  *  - `"double-quoted"` identifiers → `` `backticks` `` (the reference
  *    even warns about this: "Double quotes, not backticks here",
  *    `days_apart_analysis.sql:9`);
  *  - backslashes inside single-quoted literals are doubled — Presto
  *    string literals are raw, Spark's default parser processes escapes
  *    (`'/(\d+)'` would otherwise lose its `\d`);
  *  - 2-arg `regexp_replace(s, pat)` → 3-arg delete-matches form;
  *  - `regexp_extract(...)` → `nullif(regexp_extract(...), '')` (Presto
  *    returns NULL on miss, Spark returns '');
  *  - `date_parse(s, '%Y-%m-%d')` → `try_to_timestamp(s, 'yyyy-MM-dd')`
  *    (MySQL→Java format via [[PrestoDialect.translateFormat]]; null on
  *    malformed input rather than Presto's error — the engine's
  *    documented PERMISSIVE stance);
  *  - `date_diff('day', a, b)` → whole-unit difference `b − a` as BIGINT.
  *
  * Everything else the reference uses (`date_trunc`, `array_join`,
  * `regexp_extract_all`, CTEs, `GROUP BY` ordinals, `count(*)`/`sum`)
  * is shape-identical in Spark SQL and passes through untouched.
  *
  * The rewriter is a single quote-aware recursive descent over the text:
  * each interesting call site is located by balanced-paren scanning, its
  * arguments are rewritten recursively FIRST, then the call's rule is
  * applied once — no fixpoint iteration, no re-wrapping of already
  * translated calls.
  */
object PrestoSqlTranslator {

  def translate(prestoSql: String): String = rewrite(prestoSql)

  // rule: (lowercase name) → (rewritten args) => replacement text
  private type Rule = Seq[String] => String

  private val rules: Map[String, Rule] = Map(
    "regexp_replace" -> { args =>
      if (args.size == 2) s"regexp_replace(${args(0)}, ${args(1)}, '')"
      else s"regexp_replace(${args.mkString(", ")})"
    },
    // Presto: NULL on miss (Spark returns ''), and the 2-arg form returns
    // the WHOLE match (Spark's 2-arg form defaults to group 1). The rlike
    // guard — not nullif — distinguishes a genuine empty-group match
    // (Presto '') from a miss (Presto NULL).
    "regexp_extract" -> { args =>
      val withIdx = if (args.size == 2) args :+ "0" else args
      s"(CASE WHEN (${args(0)}) RLIKE (${args(1)}) " +
        s"THEN regexp_extract(${withIdx.mkString(", ")}) END)"
    },
    "date_parse" -> { args =>
      require(args.size == 2, s"date_parse expects 2 args, got $args")
      val fmt = args(1).trim
      require(fmt.length >= 2 && fmt.head == '\'' && fmt.last == '\'',
        s"date_parse format must be a string literal, got $fmt")
      val java = PrestoDialect.translateFormat(fmt.substring(1, fmt.length - 1))
      s"try_to_timestamp(${args(0)}, '$java')"
    },
    "date_diff" -> { args =>
      require(args.size == 3, s"date_diff expects 3 args, got $args")
      val unit = args(0).trim.stripPrefix("'").stripSuffix("'").toLowerCase
      val (a, b) = (args(1), args(2))
      unit match {
        // Presto counts COMPLETE elapsed units between timestamps
        // (23:00 → next day 01:00 is 0 days), truncating toward zero —
        // not calendar-day difference, so unix-time arithmetic for every
        // unit. The reference applies 'day' to midnight-truncated values,
        // where the two definitions coincide.
        case "day" | "hour" | "minute" | "second" =>
          val div = Map("day" -> 86400L, "hour" -> 3600L,
            "minute" -> 60L, "second" -> 1L)(unit)
          s"CAST((unix_timestamp($b) - unix_timestamp($a)) DIV $div AS BIGINT)"
        case other =>
          throw new IllegalArgumentException(s"unsupported date_diff unit '$other'")
      }
    }
  )

  private def rewrite(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '-' && i + 1 < n && s.charAt(i + 1) == '-') {
        // line comment: copy verbatim (apostrophes inside are not literals)
        var j = i
        while (j < n && s.charAt(j) != '\n') j += 1
        sb.append(s.substring(i, j)); i = j
      } else if (c == '/' && i + 1 < n && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        require(end >= 0, s"unterminated block comment at $i")
        sb.append(s.substring(i, end + 2)); i = end + 2
      } else if (c == '\'') {
        val end = literalEnd(s, i)
        // Presto literals are raw: double the backslashes for Spark's
        // escape-processing parser, and turn the '' quote-escape into \'
        // (Spark lexes adjacent 'a''b' as TWO literals and concatenates,
        // silently dropping the quote)
        val body = s.substring(i + 1, end - 1)
          .replace("\\", "\\\\").replace("''", "\\'")
        sb.append('\'').append(body).append('\'')
        i = end
      } else if (c == '"') {
        // double-quoted identifier → backticks ("" escape → literal ")
        val end = quotedIdentEnd(s, i)
        val ident = s.substring(i + 1, end - 1).replace("\"\"", "\"")
        sb.append('`').append(ident.replace("`", "``")).append('`')
        i = end
      } else if (c.isLetter || c == '_') {
        var j = i
        while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        val word = s.substring(i, j)
        var k = j
        while (k < n && s.charAt(k).isWhitespace) k += 1
        if (k < n && s.charAt(k) == '(' && rules.contains(word.toLowerCase)) {
          val (args, end) = parseArgs(s, k)
          sb.append(rules(word.toLowerCase)(args.map(a => rewrite(a.trim))))
          i = end
        } else { sb.append(word); i = j }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** End index (exclusive) of the single-quoted literal starting at `i`;
    * `''` is the Presto escape for a quote inside the literal.
    */
  private def literalEnd(s: String, i: Int): Int = {
    var j = i + 1
    while (j < s.length) {
      if (s.charAt(j) == '\'') {
        if (j + 1 < s.length && s.charAt(j + 1) == '\'') j += 2
        else return j + 1
      } else j += 1
    }
    throw new IllegalArgumentException(s"unterminated string literal at $i")
  }

  private def quotedIdentEnd(s: String, i: Int): Int = {
    var j = i + 1
    while (j < s.length) {
      if (s.charAt(j) == '"') {
        if (j + 1 < s.length && s.charAt(j + 1) == '"') j += 2
        else return j + 1
      } else j += 1
    }
    throw new IllegalArgumentException(s"unterminated quoted identifier at $i")
  }

  /** Top-level argument texts of the call whose '(' is at `open`, plus the
    * index just past the matching ')'. Quote- and nesting-aware.
    */
  private def parseArgs(s: String, open: Int): (Seq[String], Int) = {
    var depth = 0
    var j = open
    var argStart = open + 1
    val args = scala.collection.mutable.ArrayBuffer.empty[String]
    while (j < s.length) {
      s.charAt(j) match {
        case '\'' => j = literalEnd(s, j) - 1
        case '"' => j = quotedIdentEnd(s, j) - 1
        case '-' if j + 1 < s.length && s.charAt(j + 1) == '-' =>
          while (j < s.length && s.charAt(j) != '\n') j += 1
          j -= 1
        case '/' if j + 1 < s.length && s.charAt(j + 1) == '*' =>
          val end = s.indexOf("*/", j + 2)
          require(end >= 0, s"unterminated block comment at $j")
          j = end + 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) {
            val a = s.substring(argStart, j)
            if (a.trim.nonEmpty || args.nonEmpty) args += a
            return (args.toSeq, j + 1)
          }
        case ',' if depth == 1 =>
          args += s.substring(argStart, j)
          argStart = j + 1
        case _ =>
      }
      j += 1
    }
    throw new IllegalArgumentException(s"unbalanced parentheses at $open")
  }
}
