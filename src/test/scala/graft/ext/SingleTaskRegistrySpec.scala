package graft.ext

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Enforcement for the [[SingleTask.key]] contract (VERDICT r8 watch
  * item 1): the key silences both the `WindowExec` single-partition WARN
  * and PlanGuard's empty-partition-spec rule, so a call over an
  * UNBOUNDED frame would silently restore the single-task sort those
  * rules exist to ban. This spec makes the contract checkable two ways:
  *
  *  1. REGISTRY — every `SingleTask.key(` call site in main source must
  *     appear in the registry below with its stated bound. A new call
  *     site fails this suite until it is registered here WITH a framed-
  *     cardinality assertion (or an explicit declared-path rationale).
  *  2. BOUNDS — for each registered site, the bound-driving cardinality
  *     is measured on the actual gate inputs (sf0.01 test data, the
  *     driver's correctness scale) and asserted against the stated
  *     constant. If testdata or an operator changes shape such that a
  *     "bounded" frame grows past its bound, the suite fails loudly.
  */
class SingleTaskRegistrySpec extends SparkTestBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"
  private def sfTable(name: String) =
    graft.Tables.load(spark, sfDir, name)

  /** file (relative to src/main/scala/graft) -> expected call-site count.
    * Bounds, per site:
    *  - gates/RelationalGates.scala (q58 moving average): frame = one row per
    *    DISTINCT DAY of orders — calendar-bounded (TPC-H dates span
    *    1992–1998, ~2.4k days; a century is ~37k rows). Asserted below.
    *  - ext/WebUrl.scala (allocateBudget rank): frame = one row per
    *    budget KEY (domains / mixture components) — caller-bounded; the
    *    q203 gate frame is 7 domains. Asserted below.
    *  - ext/Profile.scala (equalFrequencyBins): DECLARED deterministic
    *    small-frame path — scaladoc directs scale users to
    *    equalFrequencyBinsApprox (no single-task sort). The q77 gate
    *    deliberately runs it on orders to pin ntile semantics against
    *    DuckDB; input-size canary asserted below.
    *  - ext/Layout.scala ×2 (zvalueByNtile; string z-bounds): ntile
    *    variant is the DECLARED deterministic path (zvalueByRange is the
    *    scale path); the string-bounds window runs over DISTINCT values
    *    hard-capped by the MaxStringZDistinct require (LayoutSpec pins
    *    the refusal at cap+1).
    *  - ext/TextStats.scala ×2 (vocabCoverage; score bucket/carry):
    *    vocabulary-sized and ≤ ScoreBuckets+2 frames — both asserted
    *    below.
    *  - ext/FreqSketch.scala (hdrQuantiles running sum): frame = the
    *    HDR histogram relation, STRUCTURALLY bounded at
    *    (63 − subBits + 1)·2^subBits rows (~1.9k at subBits 5) for the
    *    whole nonnegative BIGINT domain. Asserted below. (amsF2 /
    *    amsInnerProduct take their depth-row median via a global
    *    collect+sort aggregate instead — no window, no key needed.)
    *  - ext/FreqSketch.scala (mgMerge re-compress): frame = the union
    *    of input summaries, ≤ k rows per input shard by the
    *    per-shard compress — summary-sized, never corpus-sized.
    *    Asserted below.
    */
  private val registry = Map(
    // q58's declared-bounded frame — lived in SparkEntry.scala until
    // the round-11 per-family gate-registry split
    "gates/RelationalGates.scala" -> 1,
    "ext/WebUrl.scala" -> 1,
    "ext/Profile.scala" -> 1,
    "ext/Layout.scala" -> 2,
    "ext/TextStats.scala" -> 2,
    // + cmsJoinSize's min-over-slices window (r11): frame = one row
    // per slice, ≤ Depth rows by the groupBy — asserted below
    "ext/FreqSketch.scala" -> 3,
    "ext/Bootstrap.scala" -> 1,
    // tdigestMerge re-cluster (key materialized ONCE as a column so
    // all merge windows/aggregates share one partitioning — anchoring
    // a fresh key per stage priced an exchange into every stage of the
    // global chain, the r12 regression) + tdigestQuantiles pick ×2:
    // frames = the union of input digests / one digest — ≤ shards·(δ+1)
    // and ≤ δ+1 rows by the summarize compress. Asserted below.
    "ext/TDigest.scala" -> 3)

  test("every SingleTask.key call site in main source is registered") {
    val root = Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root), s"expected to run from repo root, no $root")
    val found = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map { p =>
        val text = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        val n = "SingleTask\\.key\\(".r.findAllIn(text).size
        root.relativize(p).toString -> n
      }
      .filter(_._2 > 0).toMap
    assert(found == registry,
      s"SingleTask.key call sites changed: found $found, registered " +
        s"$registry. The key silences the single-task plan guards, so " +
        "EVERY site needs a stated bound + a framed-cardinality " +
        "assertion in SingleTaskRegistrySpec before it ships.")
  }

  test("q58 day frame is calendar-bounded on gate data") {
    val days = sfTable("orders")
      .select(date_trunc("day", col("o_orderdate")).as("day"))
      .distinct().count()
    assert(days > 0 && days <= 2500,
      s"q58's single-task frame is $days rows — the moving-average " +
        "window is only safe because one-row-per-day is calendar-bounded")
  }

  test("allocateBudget q203 frame is the 7-domain key set") {
    val domains = sfTable("documents")
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
      .select(concat(lit("d"), (col("doc_id") % 7).cast("string")))
      .distinct().count()
    assert(domains == 7, s"q203's largest-remainder frame is $domains keys")
  }

  test("vocabCoverage frame is vocabulary-sized, not corpus-sized") {
    val docs = sfTable("documents")
    val toks = docs.select(
      explode(TextStats.canonicalTokens(col("text"))).as("term"))
    val corpusTokens = toks.count()
    val vocab = toks.distinct().count()
    // the window input is the DISTINCT-term count frame; Heaps-law
    // sublinearity is the whole point — if vocab tracks the corpus the
    // frame is unbounded and the operator needs a bucket/carry rewrite
    assert(vocab > 0 && vocab <= 300000L, s"vocab frame = $vocab rows")
    assert(vocab * 5 <= corpusTokens,
      s"vocab ($vocab) is not << corpus tokens ($corpusTokens): the " +
        "single-task ranking frame is no longer vocabulary-compressed")
  }

  test("score bucket/carry frame stays <= ScoreBuckets+2 on high-distinct scores") {
    // 50k continuous near-unique scores — the shape that used to force a
    // corpus-sized single-task sort; the two-phase form must compress
    // the carry frame to the coarse bucket count regardless of input
    val df = spark.range(50000).select(col("id"),
      (sin(col("id").cast("double")) * 1e6).as("s"))
    val (lo, hi) = {
      val r = df.agg(min("s"), max("s")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val buckets = df.select(
        coalesce(least(width_bucket(col("s"), lit(lo), lit(hi), lit(1024)),
          lit(1024)), lit(1025L)).cast("int").as("b"))
      .distinct().count()
    assert(buckets <= 1026,
      s"carry frame would be $buckets rows (> ScoreBuckets+2)")
    // and the public operator built on it still answers on this input
    val pct = TextStats.scorePercentiles(df, "id", "s")
    assert(pct.count() == 50000)
  }

  test("declared-small-frame gate inputs stay canary-sized (q77, q63)") {
    // these two gates deliberately run the DETERMINISTIC ntile paths on
    // real tables to pin tie/bucket semantics against DuckDB; their
    // scale siblings (equalFrequencyBinsApprox / zvalueByRange) carry
    // production traffic. Canary: if the correctness-gate tables ever
    // grow past ~1M rows the deterministic gates should move to the
    // sibling + fixture pattern instead of a growing single-task sort.
    assert(sfTable("orders").count() <= 1000000L)
    assert(sfTable("events").count() <= 1000000L)
  }

  test("hdrQuantiles frame is structurally bounded by the bucket domain") {
    // the running-sum window input is the HDR histogram relation —
    // bounded by construction at (63 − subBits + 1)·2^subBits rows for
    // ANY input distribution, not by luck of the data
    val vals = spark.range(200000)
      .select((col("id") * col("id") % 900719925474L).as("v"))
    val rows = FreqSketch.hdrHistogram(vals, "v", subBits = 5).count()
    assert(rows <= (63 - 5 + 1).toLong * 32,
      s"histogram frame = $rows rows — exceeds the structural bound")
  }

  test("mgMerge frame is summary-sized (<= k x shards) by construction") {
    // the merge-compress window ranks the UNION OF SUMMARIES, each
    // input contributing <= k rows per shard — never the corpus; the
    // frame entering the SingleTask window is what summed produces
    val items = spark.range(100000)
      .select((col("id") % 4).cast("string").as("shard"),
        (col("id") % 997).cast("string").as("item"))
    val k = 16
    val perShard = (0 until 4).map(i =>
      FreqSketch.mgSummarize(items.filter(col("shard") === i.toString),
        "item", "shard", k))
    val frameRows = perShard.reduce(_ unionByName _)
      .select("item").distinct().count()
    assert(frameRows <= k.toLong * 4,
      s"mgMerge frame = $frameRows rows — exceeds k x shards")
    val merged = FreqSketch.mgMerge(perShard, k).count()
    assert(merged <= k.toLong, s"merged summary = $merged rows > k")
  }

  test("cmsJoinSize frame is Depth rows by construction") {
    val ev = spark.range(50000)
      .select((col("id") % 997).cast("string").as("k"),
        (col("id") % 2).as("side"))
    val a = FreqSketch.cmsSketch(ev.filter(col("side") === 0), "k", 256)
    val b = FreqSketch.cmsSketch(ev.filter(col("side") === 1), "k", 256)
    assert(a.count() <= FreqSketch.Depth * 256L)
    val out = FreqSketch.cmsJoinSize(a, b)
    assert(out.count() == FreqSketch.Depth,
      "join-size frame must be one row per slice")
  }

  test("tdigest merge/quantile frames are digest-sized by construction") {
    // the merge re-cluster window ranks the UNION OF DIGESTS — each
    // input ≤ δ+1 centroid rows by the summarize compress — and the
    // quantile pick works one merged digest (≤ δ+1 rows); never the
    // corpus
    val vals = spark.range(120000)
      .select((col("id") % 3).cast("string").as("shard"),
        (col("id") * col("id") % 99991).cast("double").as("v"))
    val delta = 16
    val perShard = (0 until 3).map(i =>
      TDigest.tdigestSummarize(vals.filter(col("shard") === i.toString),
        "v", "shard", delta))
    perShard.foreach(d => assert(d.count() <= delta + 1,
      "per-shard digest exceeds delta+1 rows"))
    val frameRows = perShard.map(_.count()).sum
    assert(frameRows <= (delta + 1).toLong * 3,
      s"merge frame = $frameRows rows — exceeds shards x (delta+1)")
    val merged = TDigest.tdigestMerge(perShard, delta)
    assert(merged.count() <= delta + 1, "merged digest exceeds delta+1")
  }

  test("bootstrap CI frame is exactly the replicate count by construction") {
    // confidenceInterval ranks the replicate-totals relation — one row
    // per replicate by the groupBy(b) aggregate, b < replicates a
    // LITERAL bound (require-capped at 512); never data-sized
    val rows = spark.range(5000)
      .select(col("id"), (col("id") % 97).as("v"))
    val reps = Bootstrap.replicateTotals(rows, "id", "v", replicates = 16)
    assert(reps.count() == 16L,
      "replicate frame must be exactly the replicate count")
  }

  test("AMS estimator frame is exactly AmsDepth rows by construction") {
    // the frame the median aggregate collects is the AMS sketch
    // itself — at most AmsDepth rows for ANY input, by the groupBy(j)
    // over a j < AmsDepth posexplode (its collect_list buffer is
    // constant-size for the same reason)
    val items = spark.range(100000).select(col("id").cast("string").as("it"))
    val rows = FreqSketch.amsSketch(items, "it").count()
    assert(rows <= FreqSketch.AmsDepth.toLong,
      s"AMS estimator frame = $rows rows — exceeds the depth bound")
  }
}
