package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def probe = (0L until 1000L).map(i => (i, s"p$i")).toDF("pk", "payload")
  private def build = Seq(3L, 7L, 400L, 999L, 999L).map(k => (k, s"b$k")).toDF("bk", "tag")

  test("prunedJoin ≡ plain inner join (no false negatives)") {
    val pruned = BloomJoin.prunedJoin(probe, build, "pk", "bk")
      .select("pk", "payload", "bk", "tag")
      .as[(Long, String, Long, String)].collect().sorted
    val plain = probe.join(build, $"pk" === $"bk")
      .select("pk", "payload", "bk", "tag")
      .as[(Long, String, Long, String)].collect().sorted
    assert(pruned.sameElements(plain))
    assert(plain.length == 5) // 999 matched twice
  }

  test("mightContain admits every build key") {
    val bits = BloomJoin.buildBits(build, "bk")
    val admitted = build.crossJoin(broadcast(bits))
      .filter(BloomJoin.mightContain(col("__bloom"), col("__k"), col("bk")))
      .count()
    assert(admitted == 5)
  }

  test("sizing travels with the bitset: non-default build params cannot mismatch") {
    // Before the fix, buildBits(numBits = 1<<17, numHashes = 3) probed with
    // mightContain's defaults (1<<20, 5) indexed past the array → nulls →
    // silent false negatives. Now numBits/k come from the row itself.
    val bits = BloomJoin.buildBits(build, "bk", numBits = 1 << 17, numHashes = 3)
    val admitted = build.crossJoin(broadcast(bits))
      .filter(BloomJoin.mightContain(col("__bloom"), col("__k"), col("bk")))
      .count()
    assert(admitted == 5)
  }

  test("pruning is effective: non-members overwhelmingly rejected") {
    val bits = BloomJoin.buildBits(build, "bk")
    val passed = probe.crossJoin(broadcast(bits))
      .filter(BloomJoin.mightContain(col("__bloom"), col("__k"), col("pk")))
      .count()
    // 4 true members; 2^20 bits over 4 keys → FP rate ≈ 0, but assert a
    // loose probabilistic bound so the test never flakes
    assert(passed >= 4 && passed <= 50,
      s"expected ~4 of 1000 probe keys to pass, got $passed")
  }

  test("prunedJoinAuto: self-sized filter still exactly equals the plain join") {
    val pruned = BloomJoin.prunedJoinAuto(probe, build, "pk", "bk", fpp = 0.01)
      .select("pk").as[Long].collect().sorted
    assert(pruned.sameElements(Array(3L, 7L, 400L, 999L, 999L)))
    // a larger build sizes itself without loss: result is still the join
    val bigBuild = (0L until 2000L).map(k => Tuple1(k * 2)).toDF("bk") // evens
    val bigProbe = (0L until 4000L).toDF("pk")
    assert(BloomJoin.prunedJoinAuto(bigProbe, bigBuild, "pk", "bk").count() == 2000)
  }

  test("mixed-width integral keys: no false negatives (int probe, long build)") {
    // xxhash64 is type-dependent (int 7 and long 7 hash differently);
    // both sides normalize to long before hashing, so the coercing plain
    // join and the pruned join still agree
    val p = (0 until 100).toDF("pk") // IntegerType
    val b = Seq(7L, 42L, 99L).toDF("bk") // LongType
    val pruned = BloomJoin.prunedJoin(p, b, "pk", "bk")
      .select("pk").as[Int].collect().sorted
    assert(pruned.sameElements(Array(7, 42, 99)))
  }

  test("incompatible key types are rejected up front, not silently unmatched") {
    val p = Seq(7.0).toDF("pk") // DoubleType vs LongType build
    val b = Seq(7L).toDF("bk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.prunedJoin(p, b, "pk", "bk")
    }
    assert(e.getMessage.contains("integral or share one exact type"))
  }

  test("string keys: equivalence to the plain join holds for any key type") {
    val rnd = new scala.util.Random(3)
    val p = (1 to 500).map(i => s"key${rnd.nextInt(80)}").toDF("pk")
    val b = (1 to 30).map(i => s"key${rnd.nextInt(80)}").distinct.toDF("bk")
    val pruned = BloomJoin.prunedJoin(p, b, "pk", "bk")
      .select("pk").as[String].collect().sorted.toSeq
    val plain = p.join(b, $"pk" === $"bk")
      .select("pk").as[String].collect().sorted.toSeq
    assert(pruned == plain && plain.nonEmpty)
  }

  test("empty build side: filter rejects everything, join is empty") {
    val out = BloomJoin.prunedJoin(probe, build.filter(lit(false)), "pk", "bk")
    assert(out.count() == 0)
  }

  test("null keys: never matched, never poison the filter") {
    val p = Seq(Some(1L), None, Some(2L)).toDF("pk")
    val b = Seq(Some(1L), None).toDF("bk")
    val out = BloomJoin.prunedJoin(p, b, "pk", "bk").select("pk")
      .as[Long].collect()
    assert(out.sameElements(Array(1L)))
  }

  test("plan shape: membership filter sits BELOW the probe-side join exchange") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, ShuffledJoin}
    // disable auto-broadcast so the equi-join is a shuffled join — the
    // regime bloom pruning exists for (build side above the broadcast
    // threshold) — and AQE so executedPlan shows concrete exchanges; the
    // assertion is that probe rows meet the bloom membership test (the
    // xxhash64 probes, whether a standalone Filter or fused into the
    // one-row broadcast join's condition) BELOW the join's shuffle.
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = BloomJoin.prunedJoin(probe, build, "pk", "bk")
        .queryExecution.executedPlan
      val shuffledJoins = plan.collect { case j: ShuffledJoin => j }
      assert(shuffledJoins.nonEmpty, s"expected a shuffled equi-join:\n$plan")
      val prunedExchange = plan.collect { case e: ShuffleExchangeExec => e }
        .exists(_.find {
          case f: FilterExec => f.condition.toString.contains("xxhash64")
          case j: BroadcastNestedLoopJoinExec =>
            j.condition.exists(_.toString.contains("xxhash64"))
          case _ => false
        }.isDefined)
      assert(prunedExchange,
        s"bloom membership filter is not below a join exchange:\n$plan")
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("tiny filter still correct, just less selective") {
    val pruned = BloomJoin.prunedJoin(probe, build, "pk", "bk",
        numBits = 64, numHashes = 2)
      .select("pk").as[Long].collect().sorted
    assert(pruned.sameElements(Array(3L, 7L, 400L, 999L, 999L)))
  }
}
