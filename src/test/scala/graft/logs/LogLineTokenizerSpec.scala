package graft.logs

import org.scalatest.funsuite.AnyFunSuite

/** The fast walk must agree with the regex on EVERY input: identical
  * groups when it claims a match, and a bail (null) whenever the line is
  * anything but the common shape — in which case the regex fallback
  * defines the answer. Checked on adversarial fixtures and seeded fuzz.
  */
class LogLineTokenizerSpec extends AnyFunSuite {

  private def viaRegex(s: String) = Option(LogLineTokenizer.regexGroups(s)).map(_.toSeq)
  private def viaApi(s: String) = Option(LogLineTokenizer.parseGroups(s)).map(_.toSeq)

  private val canonical =
    """own bkt [06/Feb/2019:00:00:38 +0000] 1.2.3.4 arn:req RID7 REST.GET.OBJECT k/p "GET /k HTTP/1.1" 200 - 512 1024 12 3 "-" "agent x/1.0" V"""

  private val adversarial = Seq(
    canonical,
    "   " + canonical,                         // leading spaces
    canonical + "   trailing junk",            // trailing content after version
    canonical.replace(" 200 ", "  200 "),      // double separator
    canonical.replace(" 200 ", " 200\t"),      // tab separator
    canonical.replace("\"GET /k HTTP/1.1\"", "\"unterminated"),
    canonical.replace("\"GET /k HTTP/1.1\"", "-"),   // dash request
    canonical.replace("\"GET /k HTTP/1.1\"", "-x"),  // dash-prefixed token
    canonical.replace("[06/Feb/2019:00:00:38 +0000]", "[no close"),
    canonical.replace("[06/Feb/2019:00:00:38 +0000]", "[]"),
    canonical.replace(" V", " VERSIONLONG"),   // multi-char tail token
    canonical.dropRight(2),                    // version char missing
    "garbage\twith\ttabs " + canonical,        // valid match starts mid-line
    "a b c d",                                 // too few fields
    "", " ", "-", "\"\"",
    canonical.replace("\"agent x/1.0\"", "\"\""),   // empty quotes
    canonical.replace("RID7", "R\"I[D]7"),     // quotes/brackets inside \S+ token
    canonical + " " + canonical                // two lines' worth of tokens
  )

  test("fast walk + fallback equals pure regex on adversarial shapes") {
    adversarial.foreach { line =>
      assert(viaApi(line) == viaRegex(line), s"line: <$line>")
    }
  }

  test("fast walk succeeds on the canonical shape (no fallback day-to-day)") {
    assert(LogLineTokenizer.tryFast(canonical) != null)
    assert(LogLineTokenizer.tryFast(canonical).toSeq ==
      LogLineTokenizer.regexGroups(canonical).toSeq)
  }

  test("fuzz: 20k seeded random mutations never diverge from the regex") {
    val rnd = new scala.util.Random(7)
    val chars = Array(' ', '\t', '"', '[', ']', '-', 'x', '\u000B')
    def mutate(s: String): String = {
      if (s.isEmpty) return canonical
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.substring(0, i) + s.substring(i + 1)              // delete
        case 1 => s.updated(i, chars(rnd.nextInt(chars.length)))      // replace
        case 2 => s.substring(0, i) + chars(rnd.nextInt(chars.length)) + s.substring(i)
      }
    }
    (1 to 20000).foreach { _ =>
      var line = canonical
      (0 until 1 + rnd.nextInt(4)).foreach(_ => line = mutate(line))
      assert(viaApi(line) == viaRegex(line), s"line: <$line>")
    }
  }
}
