package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingSpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-gramstore").toString + "/grams"

  test("spans flag only against STRICTLY-PRIOR batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val received = ListBuffer.empty[(Long, Long, Long, Long, Long)]
    val query = StreamingSpanDedup.start(
      mem.toDF().toDF("doc_id", "text"), tmpStore(), "doc_id", "text", k = 5,
      sink = df => received.synchronized {
        received ++= df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      })
    try {
      // batch 0: establishes the corpus; nothing prior → no spans,
      // including the intra-batch duplicate pair 2/3
      val dup = "alpha beta gamma delta epsilon zeta"
      mem.addData((1L, "one two three four five six seven"),
        (2L, dup), (3L, dup))
      query.processAllAvailable()
      assert(received.isEmpty)
      // batch 1: doc 10 re-quotes batch-0 doc 1's run → flagged;
      // doc 11 is fresh → clean
      mem.addData((10L, "XX one two three four five six YY"),
        (11L, "entirely new material in this later batch"))
      query.processAllAvailable()
      // doc 10 tokens: xx one two three four five six yy → windows 1,2
      // match (five-grams inside the quoted run) → merged span [1, 6]
      assert(received.toList == List((1L, 10L, 1L, 6L, 2L)))
    } finally query.stop()
  }

  test("byBatch survives compaction: more batches than compactEvery") {
    // regression twin of the paragraph-dedup test: lazy per-batch plans
    // once outlived the compaction that deletes their delta files
    val batches = (0 until 10).map { i =>
      Seq((i.toLong, "t0 t1 t2 t3 t4 t5")).toDF("doc_id", "text")
    }
    val out = StreamingSpanDedup.byBatch(spark, batches, tmpStore(),
        "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // batch 0 has no prior corpus; every later batch's whole text is one
    // already-seen span (2 windows of k=5 over 6 tokens)
    assert(out == (1 until 10).map(i =>
      (i.toLong, i.toLong, 0L, 5L, 2L)).toSet)
  }

  test("byBatch replay: same semantics, string grams, batch-tagged union") {
    val b0 = Seq((1L, "p q r s t u v")).toDF("doc_id", "text")
    val b1 = Seq((2L, "a p q r s t b"), (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val out = StreamingSpanDedup.byBatch(spark, Seq(b0, b1), tmpStore(),
        "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // batch 0 empty store → nothing; batch 1 doc 2: only the window at
    // pos 1 ("p q r s t") exists in batch 0 → span [1, 5], one gram
    assert(out == Set((1L, 2L, 1L, 5L, 1L)))
  }

  test("retry idempotency: re-running a batch neither double-writes nor self-matches") {
    val store = tmpStore()
    val deduper = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5)
    val b0 = Seq((1L, "p q r s t u")).toDF("doc_id", "text")
    val b1 = Seq((2L, "x p q r s t y")).toDF("doc_id", "text")
    assert(deduper.update(b0, 0L).count() == 0)
    val first = deduper.update(b1, 1L).collect().toSeq
    val retry = deduper.update(b1, 1L).collect().toSeq // foreachBatch retry
    assert(first == retry && first.nonEmpty)
    // batch 1's own grams never entered its probe: doc 2's unique
    // window "x p q r s" would self-match if the first attempt leaked
    assert(first.map(_.getLong(2)).min == 1L) // span starts at "p", not "x"
  }

  test("store accumulates: a third batch sees grams from both earlier batches") {
    val store = tmpStore()
    val b0 = Seq((1L, "m n o p q r")).toDF("doc_id", "text")
    val b1 = Seq((2L, "c d e f g h")).toDF("doc_id", "text")
    val b2 = Seq((3L, "z m n o p q y c d e f g x")).toDF("doc_id", "text")
    val out = StreamingSpanDedup.byBatch(spark, Seq(b0, b1, b2), store,
        "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // doc 3: "m n o p q" (pos 1) from b0 and "c d e f g" (pos 7) from b1
    assert(out == Set((2L, 3L, 1L, 5L, 1L), (2L, 3L, 7L, 11L, 1L)))
  }

  private def batches: Seq[org.apache.spark.sql.DataFrame] = Seq(
    Seq((1L, "m n o p q r"), (2L, "h i j k l m n")).toDF("doc_id", "text"),
    Seq((3L, "c d e f g h")).toDF("doc_id", "text"),
    Seq((4L, "z m n o p q y c d e f g x")).toDF("doc_id", "text"),
    Seq((5L, "a h i j k l m b"), (6L, "c d e f g h extra one")).toDF("doc_id", "text"),
    Seq((7L, "m n o p q r reprise"), (8L, "novel content only here now")).toDF("doc_id", "text"))

  private def runSpans(store: String, compactEvery: Int): Set[Seq[Long]] = {
    val deduper = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5, hashGrams = true, compactEvery = compactEvery,
      numBuckets = 4)
    batches.zipWithIndex
      .flatMap { case (b, i) => deduper.update(b, i.toLong).collect() }
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  test("compaction changes nothing observable: spans equal at every cadence") {
    val never = runSpans(tmpStore(), compactEvery = 100)
    val every2 = runSpans(tmpStore(), compactEvery = 2)
    val every1 = runSpans(tmpStore(), compactEvery = 1)
    assert(never.nonEmpty)
    assert(every2 == never)
    assert(every1 == never)
  }

  test("compacted store is sub-linear in repeated content") {
    // the same boilerplate text recrawled every batch: a flat store
    // would hold its grams once PER BATCH; the compacted store holds
    // them once, plus at most the uncompacted delta tail
    val store = tmpStore()
    val boiler = "the same boilerplate footer text repeated in every crawl"
    val deduper = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5, hashGrams = true, compactEvery = 2,
      numBuckets = 4)
    val nBatches = 8
    (0 until nBatches).foreach { i =>
      deduper.update(Seq((i.toLong, boiler)).toDF("doc_id", "text"), i.toLong)
    }
    val gramsPerBatch = graft.ext.Dedup.corpusGrams(
      Seq((0L, boiler)).toDF("doc_id", "text"), "text", 5, hashGrams = true)
      .distinct().count()
    val storedRows = deduper.storeParts(nBatches.toLong)
      .map(_.count()).sum
    // flat store: nBatches * gramsPerBatch rows; compacted: base holds
    // them once + <= compactEvery delta copies awaiting the next fold
    assert(storedRows <= gramsPerBatch * 3,
      s"store holds $storedRows gram rows for $gramsPerBatch distinct " +
        s"grams after $nBatches identical batches — compaction not collapsing")
    assert(storedRows >= gramsPerBatch)
  }

  test("restart: a fresh session catalog re-registers the compacted base from disk") {
    val store = tmpStore()
    val deduper = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5, hashGrams = true, compactEvery = 1,
      numBuckets = 4)
    deduper.update(Seq((1L, "p q r s t u")).toDF("doc_id", "text"), 0L)
    deduper.update(Seq((2L, "irrelevant filler text for compaction")).toDF("doc_id", "text"), 1L)
    // simulate restart: drop every catalog entry for this store (files stay)
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_key_store_"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_key_store_")),
      "catalog wipe must actually remove the store tables")
    val fresh = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5, hashGrams = true, compactEvery = 1,
      numBuckets = 4)
    val spans = fresh.update(
      Seq((3L, "x p q r s t y")).toDF("doc_id", "text"), 2L).collect()
    // batch-0 grams survived the catalog wipe: the quoted run still flags
    assert(spans.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      == Seq((3L, 1L, 5L)))
  }

  test("plan: the compacted base is a bucketed scan the probe never shuffles") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val store = tmpStore()
    val deduper = new StreamingSpanDedup.SpanDeduper(spark, store,
      "doc_id", "text", k = 5, hashGrams = true, compactEvery = 1,
      numBuckets = 4)
    deduper.update(Seq((1L, "p q r s t u")).toDF("doc_id", "text"), 0L)
    deduper.update(Seq((2L, "filler so compaction has a delta")).toDF("doc_id", "text"), 1L)
    // force the shuffled-join regime (the 100 TB shape: the base is far
    // beyond any broadcast threshold) and a concrete executed plan
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val spans = deduper.update(
        Seq((3L, "x p q r s t y")).toDF("doc_id", "text"), 2L)
      val plan = spans.queryExecution.executedPlan
      val baseScans = plan.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains("compacted_upto_")) => f
      }
      assert(baseScans.nonEmpty, s"no compacted-base scan in plan:\n$plan")
      assert(baseScans.forall(_.bucketedScan),
        s"compacted base is not read as a bucketed scan:\n$plan")
      // the store SIDE of the semi-join (its right subtree) must hold
      // the base scan with no Exchange in between — an exchange ABOVE
      // the join (the island-merge window's) is fine and expected
      val storeSides = plan.collect {
        case j: org.apache.spark.sql.execution.joins.ShuffledJoin
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi =>
          j.children.last
      }.filter(_.exists {
        case f: FileSourceScanExec => f.relation.location.rootPaths
          .exists(_.toString.contains("compacted_upto_"))
        case _ => false
      })
      assert(storeSides.nonEmpty,
        s"no shuffled semi-join probes the compacted base:\n$plan")
      assert(storeSides.forall(
        _.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        s"probe shuffles the compacted store side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
