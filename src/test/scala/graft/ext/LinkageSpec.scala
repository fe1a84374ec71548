package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.JaroWinkler
import org.apache.spark.unsafe.types.UTF8String

class LinkageSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaroWinkler: classic reference values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(jw("same", "same") == 1.0)
    assert(jw("", "") == 0.0)      // DuckDB parity: empty never matches
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
  }

  test("jaroWinkler: byte semantics (UTF-8), DuckDB parity values") {
    // 'éé' vs 'ée': 4 vs 3 BYTES — byte-walk gives 0.7777…, a
    // codepoint-walk would give 0.666…; pinned to the byte answer
    assert(math.abs(jw("éé", "ée") - 0.7777777777777778) < 1e-15)
  }

  test("jaroWinkler: bonus only above 0.7, prefix capped at 4") {
    // window=1 strands the tail 'a's: m=2, jaro=0.6 < 0.7 → NO bonus
    // (DuckDB agrees: 0.6 exactly)
    assert(jw("aaaaa", "aabbb") == 0.6)
    // bonus path, prefix 4: jaro=(5/6+5/6+1)/3, jw = 0.9333… (DuckDB value)
    assert(math.abs(jw("abcdef", "abcdxf") - 0.9333333333333333) < 1e-15)
    // prefixes 5 and 6 both cap at 4 → identical value (DuckDB: 0.95 both)
    val ja = jw("abcdefgh", "abcdexgh")
    val jb = jw("abcdefgh", "abcdefxh")
    assert(ja == jb && math.abs(ja - 0.95) < 1e-15)
  }

  test("jaroWinkler column: codegen path agrees with the static compute") {
    val pairs = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("hello world", "helo wrld"), ("x", "x"), ("", "abc"))
    val got = pairs.toDF("a", "b")
      .select(Linkage.jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == pairs.map { case (a, b) => jw(a, b) })
  }

  test("jaroUpperBound dominates the threshold-translated jaro (lossless)") {
    // the pre-filter chain is: jw >= t  ⟹  jaro >= (t−0.4)/0.6  and
    // bound >= jaro — so for EVERY pair, bound >= (jw − 0.4)/0.6 must
    // hold, else a qualifying pair could be dropped before the full
    // similarity pass. Fuzz it across lengths, alphabets and unicode.
    val rnd = new scala.util.Random(29)
    def word(alpha: String, max: Int): String =
      (0 until (1 + rnd.nextInt(max))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val pairs = (0 until 4000).map { i =>
      val alpha = Seq("ab", "abcdef", "abcdefghijklmnop", "aéü日")(i % 4)
      (word(alpha, 3 + i % 18), word(alpha, 3 + (i / 4) % 18))
    } ++ Seq(("", "abc"), ("abc", ""), ("martha", "marhta"), ("x", "x"))
    def ub(a: String, b: String): Double = JaroWinkler.jaroUpperBoundCompute(
      UTF8String.fromString(a), UTF8String.fromString(b))
    pairs.foreach { case (a, b) =>
      val v = jw(a, b)
      assert(ub(a, b) >= (v - 0.4) / 0.6 - 1e-12,
        s"bound ${ub(a, b)} < implied jaro ${(v - 0.4) / 0.6} for ('$a','$b') jw=$v")
    }
    // codegen column path agrees with the static compute; null propagates
    val df = pairs.take(50).toDF("a", "b")
      .select(col("a"), col("b"),
        JaroWinkler.jaroUpperBound(col("a"), col("b")).as("ub"))
      .collect()
    df.foreach(r => assert(r.getDouble(2) == ub(r.getString(0), r.getString(1))))
    val nul = Seq(("x", null: String)).toDF("a", "b")
      .select(JaroWinkler.jaroUpperBound(col("a"), col("b"))).collect()
    assert(nul(0).isNullAt(0))
  }

  test("fuzzyJoin equals the brute-force blocking contract") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcdef"
    val names = (0 until 80).map { i =>
      (i.toLong, (0 until (3 + rnd.nextInt(10)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    // planted typos of the first 30 names (swap two middle chars)
    val probes = (0 until 30).map { i =>
      val n = names(i)._2.toCharArray
      if (n.length >= 4) { val t = n(1); n(1) = n(2); n(2) = t }
      (1000L + i, new String(n))
    }
    def contract(prefix: Int): Set[(Long, Long)] = (for {
      (ip, p) <- probes; (in, n) <- names
      if p.nonEmpty && n.nonEmpty && p.take(prefix) == n.take(prefix) &&
        math.abs(p.length - n.length) <= 2 && jw(p, n) >= 0.8
    } yield (ip, in)).toSet
    for (prefix <- Seq(1, 2, 3)) {
      val got = Linkage.fuzzyJoin(
          probes.toDF("id", "name"), "id", "name",
          names.toDF("id", "name"), "id", "name",
          threshold = 0.8, lengthBand = 2, blockPrefix = prefix)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      val expect = contract(prefix)
      assert(got == expect,
        s"prefix=$prefix missing=${expect -- got} extra=${got -- expect}")
    }
    assert(contract(1).nonEmpty, "degenerate spec: no pairs planted")
  }

  test("fuzzyJoin: hot-block occupancy guard fails loudly, not quadratically") {
    // every name shares the same 2-char prefix and length → one block
    val hot = (0 until 50).map(i => (i.toLong, s"th${i % 10}")).toDF("id", "name")
    val ex = intercept[IllegalArgumentException](
      Linkage.fuzzyJoin(hot, "id", "name", hot, "id", "name",
        threshold = 0.5, lengthBand = 2, maxBlockRows = 10L))
    assert(ex.getMessage.contains("quadratic"), ex.getMessage)
    // guard disabled → runs; same call with a generous cap → runs
    assert(Linkage.fuzzyJoin(hot, "id", "name", hot, "id", "name",
      threshold = 0.99, lengthBand = 0, maxBlockRows = 0L).count() >= 50L)
  }

  test("editDistanceOneJoin equals all-pairs levenshtein <= 1 (lossless)") {
    val rnd = new scala.util.Random(37)
    val alphabet = "abcd"
    val base = (0 until 50).map { i =>
      (i.toLong, (0 until (2 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(4))).mkString)
    }
    // planted: substitutions, insertions, deletions, duplicates
    val planted = base.take(12).zipWithIndex.map { case ((_, s), i) =>
      val mut = i % 4 match {
        case 0 => s.updated(rnd.nextInt(s.length), 'x')        // substitute
        case 1 => s.substring(0, 1) + "q" + s.substring(1)     // insert
        case 2 => if (s.length > 1) s.substring(1) else s      // delete
        case _ => s                                            // duplicate
      }
      (100L + i, mut)
    }
    val all = base ++ planted
    val got = Linkage.editDistanceOneJoin(all.toDF("id", "name"), "id", "name")
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(expect.exists(_._3 == 1) && expect.exists(_._3 == 0),
      "spec must exercise both distance classes")
  }

  test("fuzzyJoin: null and empty names never match") {
    val l = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "abc"))
      .toDF("id", "name")
    val r = Seq((10L, "abc")).toDF("id", "name")
    val got = Linkage.fuzzyJoin(l, "id", "name", r, "id", "name", 0.5, 2)
      .select("id_l").as[Long].collect().toSet
    assert(got == Set(3L))
  }
}
