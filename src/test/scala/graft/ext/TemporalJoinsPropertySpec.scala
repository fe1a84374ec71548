package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property tests: the shuffle-friendly temporal joins must be
  * OBSERVATIONALLY IDENTICAL to their naive definitions on arbitrary data
  * — the as-of join to a per-row "max build time <= probe time" lookup,
  * the bucketed range join to the raw non-equi join. Random cases are
  * generated once per seed and run through real Spark plans in one batch
  * (a job per forAll case would take minutes).
  */
class TemporalJoinsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val baseMs = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  // timestamps quantized to 1s, deliberately narrow so key+time collisions
  // and bucket-boundary hits actually occur
  private val tsGen: Gen[Timestamp] =
    Gen.choose(0L, 5L * 86400).map(s => new Timestamp(baseMs + s * 1000))
  private val keyGen: Gen[Long] = Gen.choose(0L, 6L)

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("asofJoin == naive greatest-build-at-or-before lookup (random)") {
    for (seed <- 1L to 3L) {
      val probes = sample(Gen.zip(keyGen, tsGen), 120, seed * 1000)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val builds = sample(Gen.zip(keyGen, tsGen), 80, seed * 2000)
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) }
      val probeDf = probes.toDF("pid", "k", "t")
      val buildDf = builds.toDF("k", "bt", "v")

      val got = TemporalJoins.asofJoin(probeDf, buildDf, "k", "t", "bt", Seq("bt", "v"))
        .select("pid", "asof_bt", "asof_v")
        .as[(Long, Option[Timestamp], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      val byKey = builds.groupBy(_._1)
      val expected = probes.map { case (pid, k, t) =>
        val cands = byKey.getOrElse(k, Seq.empty).filter(!_._2.after(t))
        // operator contract: latest build time; among equal times the
        // greatest payload struct (bt, v) — i.e. max v
        val best = cands.sortBy(b => (b._2.getTime, b._3)).lastOption
        pid -> ((best.map(_._2), best.map(_._3)))
      }.toMap
      assert(got == expected, s"seed $seed")
    }
  }

  test("byTimeBuckets == naive non-equi join (random, mixed spans)") {
    for (seed <- 1L to 3L) {
      val probes = sample(tsGen, 150, seed * 3000)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // spans from sub-second to multi-day, including zero/negative (must
      // be dropped by the operator and match the naive join's emptiness)
      val spanGen = Gen.choose(-3600L, 3L * 86400)
      val ivs = sample(Gen.zip(tsGen, spanGen), 40, seed * 4000)
        .zipWithIndex.map { case ((t0, span), i) =>
          (i.toLong, t0, new Timestamp(t0.getTime + span * 1000))
        }
      val probeDf = probes.toDF("pid", "pt")
      val ivDf = ivs.toDF("iid", "start", "end")

      val got = TemporalJoins.byTimeBuckets(probeDf, ivDf, "pt", "start", "end")
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val naive = probeDf.join(ivDf,
          col("pt") >= col("start") && col("pt") < col("end"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"seed $seed")
    }
  }
}
