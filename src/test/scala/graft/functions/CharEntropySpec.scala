package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.CharEntropyFunctions._

class CharEntropySpec extends SparkTestBase {
  import spark.implicits._

  private def lnSum(texts: String*): Seq[Long] =
    texts.toDF("t").select(charLnSumScaled(col("t"))).as[Long].collect().toSeq

  private def entropy(texts: String*): Seq[Long] =
    texts.toDF("t").select(charEntropyE9(col("t"))).as[Long].collect().toSeq

  test("floored-term histogram sum matches the hand computation") {
    // aabbbc: 2*floor(ln2*1e9) + 3*floor(ln3*1e9), the single 'c' term 0
    assert(lnSum("aabbbc") == Seq(2L * 693147180L + 3L * 1098612288L))
    assert(lnSum("", "z") == Seq(0L, 0L))
  }

  test("entropy: zero for constant text, ln(n)*1e9 for all-distinct") {
    assert(entropy("aaaa") == Seq(0L))
    // abcd: S = 0, entropy = floor(ln(4)*1e9)
    assert(entropy("abcd") == Seq(1386294361L))
  }

  test("codepoint semantics: a surrogate pair counts once") {
    // U+1D11E twice = one distinct codepoint with count 2 → entropy 0
    val clef = "\ud834\udd1e"
    assert(lnSum(clef + clef) == Seq(2L * 693147180L))
    assert(entropy(clef + clef) == Seq(0L))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.unsafe.types.UTF8String
    val texts = Seq("aabbbc", "", "abcdabcd", "h\u00e9llo w\u00f6rld",
      "aAbB  \n\t zz")
    val viaDf = lnSum(texts: _*)
    val direct = texts.map(t =>
      CharLnSumScaled.compute(UTF8String.fromString(t)))
    assert(viaDf == direct)
    // and the interpreted Expression path (no codegen)
    val interp = texts.map { t =>
      CharLnSumScaled(org.apache.spark.sql.catalyst.expressions.Literal(t))
        .eval(null).asInstanceOf[Long]
    }
    assert(interp == direct)
  }

  test("null propagates") {
    val out = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "t")
      .select(charLnSumScaled(col("t"))).collect()
    assert(out.head.isNullAt(0))
  }
}
