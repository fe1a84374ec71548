package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain-Scala reference of Sampling.esKey — ONE copy for the three
    * weighted-sampler equivalence tests.
    */
  private def refKey(id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"graft-ws|$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(13)
    val h = java.lang.Long.parseLong(hex, 16).toDouble
    math.log((h + 1.0) / 4503599627370496.0) / w
  }

  test("hashSplit: disjoint, exhaustive, proportional, deterministic") {
    val df = spark.range(20000).toDF("id")
    val out = Sampling.hashSplit(df, "id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val counts = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 20000L, "exhaustive")
    assert(math.abs(counts("train") - 18000L) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 200, counts.toString)
    // membership is a pure function of the key
    val again = Sampling.hashSplit(df.repartition(13), "id",
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .as[(Long, String)].collect().toMap
    val first = out.as[(Long, String)].collect().toMap
    assert(first == again)
    // null key -> null split, explicitly
    val withNull = Seq(Option(1L), Option.empty[Long]).toDF("id")
    val ns = Sampling.hashSplit(withNull, "id", Seq("all" -> 1.0))
      .collect().map(r => Option(r.getString(1))).toSet
    assert(ns == Set(Some("all"), None))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "b" -> 0.4)))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(df, "id", Seq("a" -> 0.5, "a" -> 0.5)))
  }

  test("hashSplit nests with sample: the first split IS the same-rate sample") {
    // both derive from the identical md5-bucket expression, so
    // split == "train" at fraction r must equal sample(rate = r)
    val df = spark.range(5000).toDF("id")
    val split = Sampling.hashSplit(df, "id",
        Seq("train" -> 0.5, "rest" -> 0.5))
      .filter($"split" === "train").select("id").as[Long].collect().toSet
    val sampled = Sampling.sample(df, "id", 0.5)
      .select("id").as[Long].collect().toSet
    assert(split == sampled)
  }

  test("weightedSample: matches a plain-Scala reference selection exactly") {
    val rows = (0L until 200L).map(i => (i, (i % 13 + 1).toDouble))
    val expected = rows.map { case (id, w) => (refKey(id, w), id) }
      .sortBy { case (k, id) => (-k, id) }.take(25).map(_._2).toSet
    val got = Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", n = 25)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
  }

  test("weightedSample: deterministic under repartitioning; caps at eligible") {
    val df = (0L until 60L).map(i => (i, 1.0 + i)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 20).select("id").as[Long].collect().sorted
    val b = Sampling.weightedSample(df.repartition(7), "id", "w", 20)
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b))
    assert(Sampling.weightedSample(df, "id", "w", 1000).count() == 60)
  }

  test("weightedSample: heavy weights dominate; null/non-positive excluded") {
    val heavy = (0L until 50L).map(i => (i, 1000.0))
    val light = (100L until 150L).map(i => (i, 0.001))
    val df = (heavy ++ light).toDF("id", "w")
    val picked = Sampling.weightedSample(df, "id", "w", 40)
      .select("id").as[Long].collect()
    assert(picked.forall(_ < 50L)) // light side ~never beats 6 orders of magnitude
    val withBad = Seq((1L, Some(2.0)), (2L, None), (3L, Some(0.0)), (4L, Some(-1.0)))
      .toDF("id", "w")
    assert(Sampling.weightedSample(withBad, "id", "w", 10)
      .select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("weightedSamplePerGroup: n per group, weighted, matches global logic per group") {
    val rows = (0L until 120L).map(i => (i, (i % 7 + 1).toDouble, s"g${i % 3}"))
    val expected = rows.groupBy(_._3).values.flatMap { grp =>
      grp.map { case (id, w, _) => (refKey(id, w), id) }
        .sortBy { case (k, id) => (-k, id) }.take(10).map(_._2)
    }.toSet
    val got = Sampling.weightedSamplePerGroup(
        rows.toDF("id", "w", "g"), "id", "w", "g", n = 10)
      .select("id").as[Long].collect().toSet
    assert(got == expected && got.size == 30)
  }

  test("weightedSampleTargets: exact per-stratum counts, weighted, unlisted strata dropped") {
    val rows = (0L until 150L).map(i => (i, (i % 5 + 1).toDouble, s"s${i % 3}"))
    val targets = Map("s0" -> 12, "s1" -> 70) // s1 underfull (50 rows), s2 unlisted
    val expected = rows.groupBy(_._3).collect {
      case (g, grp) if targets.contains(g) =>
        grp.map { case (id, w, _) => (refKey(id, w), id) }
          .sortBy { case (k, id) => (-k, id) }.take(targets(g)).map(_._2)
    }.flatten.toSet
    val got = Sampling.weightedSampleTargets(
        rows.toDF("id", "w", "g"), "id", "w", "g", targets)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.count(_ % 3 == 0) == 12)  // s0 capped at target
    assert(got.count(_ % 3 == 1) == 50)  // s1 underfull: whole stratum
    assert(!got.exists(_ % 3 == 2))      // s2 unlisted: dropped
  }

  test("weightedSample: non-integral ids fail loudly, not empty or truncated") {
    val strDf = Seq(("a", 1.0), ("b", 2.0)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      Sampling.weightedSample(strDf, "id", "w", 1)
    }
    assert(e.getMessage.contains("integral id"))
    // fractional ids would truncate in the heap (2.1 and 2.9 collide to 2)
    // and silently fail the join-back — rejected, not mangled
    val dblDf = Seq((2.5, 1.0), (3.5, 2.0)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(dblDf, "id", "w", 1)
    }
  }

  test("perGroupSample: duplicate keys still select deterministically") {
    // rows share the key value but differ in payload: the full-row hash
    // tiebreaker must pick the same payload under any partitioning
    val df = Seq((1L, "g", "x"), (1L, "g", "y"), (1L, "g", "z"),
      (2L, "g", "w")).toDF("id", "grp", "payload")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.perGroupSample(d, "id", "grp", k = 2)
        .select("payload").as[String].collect().sorted.toSeq
    val a = run(df)
    assert(a == run(df.repartition(5)) && a == run(df.repartition(1)))
  }

  test("perGroupSample: map columns don't break the full-row tiebreaker") {
    // Spark's hash functions reject MapType at analysis; the tiebreaker
    // must hash only hashable columns instead of failing the whole query
    val df = Seq((1L, "g", Map("a" -> 1)), (2L, "g", Map("b" -> 2)),
      (3L, "g", Map("c" -> 3))).toDF("id", "grp", "props")
    val out = Sampling.perGroupSample(df, "id", "grp", k = 2)
    assert(out.count() == 2)
    // determinism on the hashable prefix still holds under repartitioning
    val ids = out.select("id").as[Long].collect().sorted.toSeq
    val again = Sampling.perGroupSample(df.repartition(5), "id", "grp", k = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == again)
  }

  test("perGroupSample: exactly k per big group, whole small group, stable") {
    val df = ((0L until 100L).map(i => (i, "big")) ++
      Seq((1000L, "small"), (1001L, "small"))).toDF("id", "grp")
    val out = Sampling.perGroupSample(df, "id", "grp", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.count(_._2 == "big") == 10)
    assert(out.count(_._2 == "small") == 2) // underfull group kept whole
    // membership is a pure function of the rows: repartitioned input
    // selects the same ids
    val again = Sampling.perGroupSample(df.repartition(7), "id", "grp", k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  private lazy val ids = spark.range(0, 20000).toDF("id")

  test("rate is honored within hash-uniformity tolerance, and is pure") {
    val n = Sampling.sample(ids, "id", 0.25).count()
    assert(math.abs(n - 5000) < 300, s"got $n of expected ~5000")
    // determinism: identical membership on re-run and under repartitioning
    val a = Sampling.sample(ids, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Sampling.sample(ids.repartition(13), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("nested sample property: a 10% sample is a subset of the 30% sample") {
    val small = Sampling.sample(ids, "id", 0.10).collect().map(_.getLong(0)).toSet
    val large = Sampling.sample(ids, "id", 0.30).collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(large))
  }

  test("stratified: per-stratum rates, default for unknown strata") {
    val df = ids.withColumn("stratum",
      when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.stratified(df, "id", "stratum",
      Map("a" -> 0.5, "b" -> 0.05), defaultRate = 0.2)
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // strata have ~6667 members each
    assert(math.abs(counts("a") - 3333) < 300, s"a=${counts("a")}")
    assert(math.abs(counts("b") - 333) < 120, s"b=${counts("b")}")
    assert(math.abs(counts("c") - 1333) < 250, s"c=${counts("c")}")
  }

  test("rate 0 keeps nothing; rate 1 keeps everything") {
    assert(Sampling.sample(ids, "id", 0.0).count() == 0L)
    assert(Sampling.sample(ids, "id", 1.0).count() == 20000L)
  }

  test("null keys: kept at rate 1.0, excluded at partial rates — explicitly") {
    val withNulls = ids.select(
      when(col("id") < 100, col("id")).otherwise(lit(null)).as("id"))
    assert(Sampling.sample(withNulls, "id", 1.0).count() == 20000L)
    val partial = Sampling.sample(withNulls, "id", 0.5)
    assert(partial.filter(col("id").isNull).count() == 0L)
  }

  test("rebalance hits target proportions within hash tolerance, no upsampling") {
    // skewed corpus: a=12000, b=6000, c=2000; ask for 25/25/50 — c is the
    // scarce stratum (2000/0.5 = 4000 output bound)
    val df = ids.withColumn("stratum",
      when(col("id") < 12000, "a").when(col("id") < 18000, "b").otherwise("c"))
    val out = Sampling.rebalance(df, "id", "stratum",
      Map("a" -> 0.25, "b" -> 0.25, "c" -> 0.5))
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected ~1000/1000/2000 (c kept whole: rate 1.0 exactly)
    assert(counts("c") == 2000L, s"scarce stratum must be kept whole: $counts")
    assert(math.abs(counts("a") - 1000) < 150, s"a=${counts("a")}")
    assert(math.abs(counts("b") - 1000) < 150, s"b=${counts("b")}")
  }

  test("rebalance rejects impossible targets") {
    val df = ids.withColumn("stratum", lit("a"))
    intercept[IllegalArgumentException] {
      Sampling.rebalance(df, "id", "stratum", Map("a" -> 0.5, "b" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.rebalance(df, "id", "stratum", Map("a" -> 0.7)) // shares != 1
    }
  }

  test("sampling is a pure scan filter: no shuffle in the plan") {
    val plan = Sampling.stratified(ids.withColumn("s", lit("x")), "id", "s",
      Map("x" -> 0.5), 0.1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sample should not shuffle:\n$plan")
  }

  /** Plain-Scala single-pass reference of the token-budget greedy prefix:
    * sort each group by (priority desc nulls last, md5(id), id), keep
    * while the running token sum stays within budget.
    */
  private def refBudget(rows: Seq[(Long, String, Long, Option[Double])],
                        budget: String => Long): Set[Long] = {
    def hex(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    rows.groupBy(_._2).flatMap { case (g, rs) =>
      val ordered = rs.sortBy { case (id, _, _, p) =>
        (p.isEmpty, p.map(-_).getOrElse(0.0), hex(id), id)
      }
      var cum = 0L
      ordered.flatMap { case (id, _, t, _) =>
        cum += t
        if (cum <= budget(g)) Some(id) else None
      }
    }.toSet
  }

  test("tokenBudgetPerGroup: hash-order fill matches the single-window reference") {
    // token sizes engineered so budgets cut mid-group; zero-token rows
    // ride along free; group sizes differ
    val rows = (0L until 300L).map(i =>
      (i, s"g${i % 4}", if (i % 11 == 0) 0L else (i % 17 + 1) * 3L,
        None: Option[Double]))
    val df = rows.map { case (id, g, t, _) => (id, g, t) }.toDF("id", "g", "t")
    val got = Sampling.tokenBudgetPerGroup(df, "id", "g", "t", budget = 200L)
      .select("id").as[Long].collect().toSet
    assert(got == refBudget(rows, _ => 200L))
    // deterministic under repartitioning
    val again = Sampling.tokenBudgetPerGroup(df.repartition(7), "id", "g", "t", 200L)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("tokenBudgetPerGroup: priority fill (ties + null priority) matches reference") {
    // priority i % 5 forces heavy ties (md5 tiebreak decides); every
    // 13th row has null priority (ranks last); tokens vary
    val rows = (0L until 260L).map(i =>
      (i, s"g${i % 3}", (i % 7 + 1) * 5L,
        if (i % 13 == 0) None else Some((i % 5).toDouble)))
    val df = rows.map { case (id, g, t, p) =>
      (id, g, t, p.map(Double.box).orNull) }.toDF("id", "g", "t", "q")
    val got = Sampling.tokenBudgetPerGroup(df, "id", "g", "t", 400L,
      priorityCol = Some("q"))
      .select("id").as[Long].collect().toSet
    assert(got == refBudget(rows, _ => 400L))
    // degenerate constant priority: one bucket, still exact
    val const = rows.map { case (id, g, t, _) => (id, g, t, 1.0) }
      .toDF("id", "g", "t", "q")
    val gotConst = Sampling.tokenBudgetPerGroup(const, "id", "g", "t", 400L,
      priorityCol = Some("q")).select("id").as[Long].collect().toSet
    assert(gotConst == refBudget(
      rows.map { case (id, g, t, _) => (id, g, t, Some(1.0)) }, _ => 400L))
  }

  test("tokenBudgetTargets: per-group budgets, unlisted groups dropped") {
    val rows = (0L until 200L).map(i =>
      (i, s"g${i % 4}", (i % 9 + 1) * 4L, None: Option[Double]))
    val df = rows.map { case (id, g, t, _) => (id, g, t) }.toDF("id", "g", "t")
    val budgets = Map("g0" -> 150L, "g2" -> 60L)
    val got = Sampling.tokenBudgetTargets(df, "id", "g", "t", budgets)
      .select("id", "g").as[(Long, String)].collect()
    assert(got.forall { case (_, g) => budgets.contains(g) })
    assert(got.map(_._1).toSet ==
      refBudget(rows.filter(r => budgets.contains(r._2)), budgets(_)))
    // realized token sums honor each group's own budget
    val sums = got.groupBy(_._2).map { case (g, rs) =>
      g -> rs.map(r => rows(r._1.toInt)._3).sum }
    sums.foreach { case (g, s) => assert(s <= budgets(g), s"$g over budget: $s") }
  }

  test("tokenBudgetPerGroup: null/negative rows excluded, oversized budget keeps all") {
    val df = Seq(
      (Some(1L), Some("a"), Some(5L)),
      (None, Some("a"), Some(5L)),      // null id
      (Some(3L), None, Some(5L)),       // null group
      (Some(4L), Some("a"), None),      // null tokens
      (Some(5L), Some("a"), Some(-2L)), // negative tokens
      (Some(6L), Some("a"), Some(0L))   // zero tokens: free rider
    ).toDF("id", "g", "t")
    val got = Sampling.tokenBudgetPerGroup(df, "id", "g", "t", 1000L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 6L))
  }

  test("temperatureSample: sqrt caps, floor-to-1, deterministic membership") {
    // group sizes 100 / 9 / 1 → caps 10 / 3 / 1
    val df = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 109L).map(i => (i, "mid")) ++ Seq((200L, "tiny")))
      .toDF("id", "g")
    val out = Sampling.temperatureSample(df, "id", "g")
      .select("id", "g").as[(Long, String)].collect()
    val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byGroup("big").size == 10 && byGroup("mid").size == 3 &&
      byGroup("tiny") == Set(200L))
    // membership is the md5-rank prefix — replicate it directly
    def expect(ids: Seq[Long], k: Int): Set[Long] = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
      ids.sortBy { i =>
        val h = md5.digest(i.toString.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        (h, i)
      }.take(k).toSet
    }
    assert(byGroup("big") == expect(0L until 100L, 10))
    assert(byGroup("mid") == expect(100L until 109L, 3))
    // scale factor: num/den = 3/2 → caps floor(10·1.5) = 15
    val scaled = Sampling.temperatureSample(df, "id", "g", 3L, 2L)
      .filter(col("g") === "big").count()
    assert(scaled == 15L)
    // re-partitioning must not change membership (pure function of rows)
    val shuffled = Sampling.temperatureSample(df.repartition(7), "id", "g")
      .select("id").as[Long].collect().toSet
    assert(shuffled == out.map(_._1).toSet)
  }
}
