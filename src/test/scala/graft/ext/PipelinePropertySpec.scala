package graft.ext

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized algebraic properties of the pipeline operators — the laws a
  * user composes against, checked over generated inputs (fixed seeds:
  * deterministic suite). Batched: cases are generated driver-side and run
  * through Spark in ONE job per property, not one per case.
  */
class PipelinePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .collect { case Some(a) => a }.take(n).toSeq

  private val rowGen: Gen[(Long, String, Double)] = for {
    k <- Gen.choose(0L, 30L)
    name <- Gen.identifier.map(_.take(8))
    v <- Gen.choose(-1000.0, 1000.0)
  } yield (k, name, v)

  test("upsert law: updated keys win, others pass through, key set is the union") {
    for (seed <- 1L to 5L) {
      val baseRows = sample(rowGen, 40, seed).distinctBy(_._1)
      val updRows = sample(rowGen, 15, seed + 1000).distinctBy(_._1)
      val base = baseRows.toDF("k", "name", "v")
      val upd = updRows.toDF("k", "name", "v")
      val out = Merge.upsert(base, upd, Seq("k"))
        .as[(Long, String, Double)].collect().toSeq
      val updMap = updRows.map(r => r._1 -> r).toMap
      val expected = updRows ++ baseRows.filterNot(r => updMap.contains(r._1))
      assert(out.sortBy(_._1) == expected.sortBy(_._1),
        s"seed $seed: upsert disagreed with the reference semantics")
      // idempotence: applying the same batch again changes nothing
      val twice = Merge.upsert(out.toDF("k", "name", "v"), upd, Seq("k"))
        .as[(Long, String, Double)].collect().toSeq
      assert(twice.sortBy(_._1) == out.sortBy(_._1), s"seed $seed: not idempotent")
    }
  }

  test("upsertVersioned law: equals upsert with the per-key max-version row") {
    for (seed <- 1L to 5L) {
      val baseRows = sample(rowGen, 30, seed).distinctBy(_._1)
      val updRows = sample(
        for {
          (k, n, v) <- rowGen
          ver <- Gen.choose(0L, 5L)
        } yield (k, n, v, ver), 25, seed + 2000)
      val base = baseRows.map { case (k, n, v) => (k, n, v, -1L) }
        .toDF("k", "name", "v", "ver")
      val upd = updRows.toDF("k", "name", "v", "ver")
      val out = Merge.upsertVersioned(base, upd, Seq("k"), "ver")
        .as[(Long, String, Double, Long)].collect().toSeq
      // reference: per key, max by (ver, name, v) — the struct-argmax order
      val latest = updRows.groupBy(_._1).map { case (_, rows) =>
        rows.maxBy(r => (r._4, r._2, r._3))
      }.toSeq
      val latestMap = latest.map(r => r._1 -> r).toMap
      val expected = latest ++ baseRows.map { case (k, n, v) => (k, n, v, -1L) }
        .filterNot(r => latestMap.contains(r._1))
      assert(out.sortBy(_._1) == expected.sortBy(_._1).toSeq, s"seed $seed")
    }
  }

  private val eventGen: Gen[(Long, Timestamp, String)] = for {
    u <- Gen.choose(1L, 8L)
    t <- Gen.choose(0L, 100000L)
    e <- Gen.oneOf("a", "b", "c", "x")
  } yield (u, new Timestamp(1700000000000L + t * 1000L), e)

  test("funnel laws: prefix monotonicity, strict time ordering, depth consistency") {
    for (seed <- 1L to 5L) {
      val events = sample(eventGen, 120, seed).toDF("user_id", "ts", "event_type")
      val steps = Seq("a", "b", "c")
      val full = Funnel.funnel(events, "user_id", "ts", "event_type", steps)
        .collect().map(r => r.getLong(0) ->
          ((0 until steps.length).map(i =>
            Option(r.getTimestamp(1 + i))), r.getLong(1 + steps.length))).toMap
      // depth == count of non-null stage times, and stages fill prefix-first
      full.foreach { case (u, (times, depth)) =>
        assert(times.count(_.isDefined) == depth, s"seed $seed user $u")
        assert(times.takeWhile(_.isDefined).length == depth,
          s"seed $seed user $u: a later stage filled after a gap")
        // strict ordering along the chain
        times.flatten.sliding(2).foreach {
          case Seq(x, y) => assert(x.before(y), s"seed $seed user $u: not strict")
          case _ =>
        }
      }
      // prefix monotonicity: entities completing k+1 steps ⊆ completing k
      val two = Funnel.funnel(events, "user_id", "ts", "event_type", steps.take(2))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      full.foreach { case (u, (_, depth)) =>
        assert(two.contains(u), s"seed $seed: user $u lost when steps shrank")
        assert(math.min(depth, 2L) == two(u),
          s"seed $seed user $u: depth over prefix disagrees")
      }
    }
  }
}
