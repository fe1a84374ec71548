package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — Structured-Streaming gates: cross-batch state (dedup, sketches, components, CDC), interval joins, stream profiles.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object StreamingGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext streaming — the streaming daily-counts aggregation executed on a
    // batch frame (EliminateEventTimeWatermark makes the SAME code path
    // valid in both modes; true streaming covered in ScalaTest).
    "q26_stream_daily_counts" -> ((s, dir) => {
      val parsed = LogLineParser.parse(syntheticLogLines(tbl(s, dir, "events")))
      graft.streaming.LogStream.dailyOperationCounts(parsed)
        .select(col("window.start").as("day_start"), col("operation"),
          col("n_requests"), col("total_bytes"))
        .orderBy("day_start", "operation")
    }),

    // ext streaming — the stateful streaming funnel's BATCH REPLAY: the
    // flatMapGroupsWithState fold over ts-sorted events equals the batch
    // funnel recurrence exactly when all events form one batch, so this
    // gates the streaming code path against q71's own oracle; cross-batch
    // incremental state covered in ScalaTest (MemoryStream).
    "q84_stream_funnel" -> ((s, dir) => {
      graft.streaming.StreamingFunnel.batchFunnel(tbl(s, dir, "events"),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")
    }),

    // ext streaming — paragraph-level continuous dedup, batch replay
    // form: the corpus thirds arrive as batch 0 (within-batch dedup
    // only), the batch third as batch 1 (probed against batch 0's
    // accumulated paragraph store); oracle replays both folds in SQL.
    "q118_stream_paragraph_dedup" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            array_join(slice(words, 1, 8), " "),
            lit("Subscribe to our newsletter!"),
            array_join(slice(words, 9, 8), " ")).as("text"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q118").toString + "/paras"
      streaming.StreamingParagraphDedup.byBatch(s,
          Seq(shaped.filter(col("doc_id") % 3 =!= 0),
            shaped.filter(col("doc_id") % 3 === 0)),
          store, "doc_id", "text")
        .orderBy("batch_id", "doc_id")
    }),

    // ext streaming — span-level continuous dedup, batch replay form: the
    // second "day" of documents is probed against the first day's gram
    // store; the oracle replays the same two-batch fold in SQL.
    "q104_stream_span_dedup" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val day1 = docs.filter(col("doc_id") % 3 =!= 0)
      // day-2 docs re-quote a 10-token prefix of a DAY-1 source doc
      // (doc_id ≡ 1 mod 9 ⊂ day1) under fresh ids, plus a unique tail
      val day2 = docs.filter(col("doc_id") % 9 === 1)
        .select((col("doc_id") + 90000).as("doc_id"),
          concat(array_join(slice(words, 1, 10), " "),
            lit(" tail"), col("doc_id").cast("string")).as("text"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q104").toString + "/grams"
      streaming.StreamingSpanDedup.byBatch(s, Seq(day1, day2), store,
          "doc_id", "text", k = 5)
        .orderBy("batch_id", "doc_id", "span_start")
    }),

    // ext streaming — cumulative foreachBatch column profile (continuous
    // data-QA), executed as a batch replay of three simulated micro-
    // batches (doc_id % 3): the SAME fold/merge code path the streaming
    // foreachBatch sink runs; true streaming covered in ScalaTest
    // (cross-batch state over MemoryStream).
    "q81_stream_profile" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val batches = (0 to 2).map(b => docs.filter(col("doc_id") % 3 === b))
      graft.streaming.StreamingProfile.cumulativeByBatch(
          batches, Seq("doc_id", "lang", "n_chars"))
        .withColumnRenamed("column", "col_name")
        .orderBy("batch_id", "col_name")
    }),

    // streaming — CONTINUOUS duplicate-cluster maintenance: three edge
    // batches fold through the versioned label store (incremental CC per
    // batch, touched components only) and the FINAL label state must
    // equal the one-shot fixpoint over every edge seen, which the oracle
    // replays as one recursive closure.
    "q148_stream_components" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val b1 = d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") % 89).as("id_a"),
          ((col("doc_id") * 3 + 1) % 89).as("id_b"))
      val b2 = d.filter(col("doc_id") % 3 === 1)
        .select(((col("doc_id") * 5) % 141).as("id_a"),
          ((col("doc_id") * 7 + 4) % 141).as("id_b"))
      val b3 = d.filter(col("doc_id") % 3 === 2)
        .select(((col("doc_id") * 11 + 7) % 200).as("id_a"),
          ((col("doc_id") * 13 + 2) % 200).as("id_b"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q148").toString + "/labels"
      streaming.StreamingComponents.byBatch(s, Seq(b1, b2, b3), store)
        .withColumnRenamed("comp", "component")
        .orderBy("id")
    }),

    // streaming — CONTINUOUS corpus-frequency boilerplate strip (q128's
    // policy at ingest time, on the countCol sum-merge mode of the
    // KeyedBatchStore): two batches split doc_id mod 3; 'Rare promo
    // banner' lives in exactly docs 0-3, so batch 0 sees 2 < minDocs
    // carriers and keeps it while batch 1's two more carriers cross the
    // cumulative threshold and strip it — the mid-stream crossing, at
    // any scale factor. The mass template lines strip in both batches.
    "q135_stream_boilerplate" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), concat_ws("\n",
          array_join(slice(words, 1, 8), " "),
          when(col("doc_id") % 2 === 0,
            lit("Subscribe to our newsletter!"))
            .otherwise(concat(lit("unique middle "),
              col("doc_id").cast("string"))),
          when(col("doc_id") < 4, lit("Rare promo banner"))
            .otherwise(lit("All rights reserved to no one."))).as("text"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q135").toString + "/lines"
      streaming.StreamingBoilerplate.byBatch(s,
          Seq(shaped.filter(col("doc_id") % 3 =!= 0),
            shaped.filter(col("doc_id") % 3 === 0)),
          store, "doc_id", "text", minDocs = 3)
        .orderBy("batch_id", "doc_id")
    }),

    // streaming — CONTINUOUS exact heavy-hitters: three event batches
    // fold per-key partial counts through the counting store, and the
    // final top-20 (count DESC, key ASC — the deterministic tiebreak)
    // must equal the one-shot group-count top-k over everything seen,
    // which the oracle computes directly.
    "q157_stream_topk" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .select(concat(col("event_type"), lit("#"),
          (col("user_id") % 50).cast("string")).as("key"), col("event_id"))
      val batches = (0 to 2).map(i =>
        e.filter(col("event_id") % 3 === i).select("key"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q157").toString + "/counts"
      streaming.StreamingTopK.byBatch(s, batches, store, "key", k = 20)
        .orderBy(col("n_total").desc, col("key"))
    }),

    // streaming — stream–stream interval join (view → purchase
    // attribution within 30 min, same user): watermarks + the event-time
    // bound are what make the state store finite on an unbounded stream;
    // the identical plan replays in batch here (withWatermark is a
    // documented batch no-op), so the oracle is a plain SQL interval
    // join. Cross-batch matching and late-row eviction are spec-driven.
    "q184_stream_interval_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id"), col("ts"), col("user_id"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      graft.streaming.StreamJoin.intervalJoin(views, buys, "user_id",
          "ts", "ts", maxDelay = "30 minutes")
        .select(col("l_event_id").as("view_id"),
          col("r_event_id").as("purchase_id"),
          col("l_user_id").as("user_id"),
          (unix_micros(col("r_ts")) - unix_micros(col("l_ts")))
            .as("micros_to_purchase"))
        .orderBy("view_id", "purchase_id")
    }),

    // streaming — continuous CDC upsert (latest-wins current state):
    // the events stream replayed in three arrival batches; the final
    // state per user is the max-(ts, event_id) row REGARDLESS of batch
    // order (latest-wins by version, not arrival — the batch split is
    // deliberately not time-ordered). Buckets rewrite only when
    // touched; the oracle is a plain argmax window over all events.
    "q194_stream_cdc" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val batches = (0 to 2).map(i => e.filter(col("event_id") % 3 === i))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q194").toString + "/cdc"
      graft.streaming.StreamingMerge.byBatch(s, batches, store,
          "user_id", orderCols = Seq("ts", "event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"),
          unix_micros(col("ts")).as("last_ts_us"))
        .orderBy("user_id")
    }),

    // ext storage dedup — content-defined chunking over binary payloads
    // (gear rolling hash, FastCDC shape): ~50 B/chunk rows leave the
    // scan, payloads don't. CLOSED-FORM fixture (the q107/q179/q185
    // pattern): blocks CdcBlockEven/CdcBlockOdd were searched offline so
    // the gear hash's FIRST qualifying cut (len ≥ 64, h&255 == 0) lands
    // exactly at the block end — so `repeat(B, n) || tail` (tail 17 B <
    // minSize) must chunk into n block-chunks at multiples of |B| plus
    // one tail chunk, each with a CONSTANT sha-256 the oracle states
    // literally. Repeated identical digests are the dedup shape the
    // operator exists for; general (unknown-cut) inputs stay pinned by
    // ArchivesSpec's edit-locality/shift-resistance properties.
    "q198_cdc_chunks" -> ((s, dir) => {
      val id = col("doc_id")
      val block = when(id % 2 === 0, lit(CdcBlockEven))
        .otherwise(lit(CdcBlockOdd))
      val n = (id % 5 + 1).cast("int")
      val payload = encode(
        concat(repeat(block, n), lit(CdcTail)), "UTF-8")
      val assets = tbl(s, dir, "documents")
        .filter(id.isNotNull)
        .select(id, payload.as("data"))
      ext.Archives.cdcChunks(assets, "doc_id", "data",
          minSize = 64, avgSize = 256, maxSize = 1024).toDF()
        .select(col("record_id").as("doc_id"), col("chunk_index"),
          col("offset"), col("length"), col("digest"))
        .orderBy("doc_id", "chunk_index")
    }),

    // streaming ext — cross-batch CMS accumulation with fixed-size
    // state (the unbounded-domain complement of q157's exact counter):
    // 3 doc_id-striped batches fold into one cell store; by cell-wise
    // mergeability the final estimates equal the one-shot corpus
    // sketch, which is exactly what the oracle replays.
    "q225_stream_cms" -> ((s, dir) => {
      def words(df: DataFrame): DataFrame = df
        .select(explode(split(trim(regexp_replace(lower(col("text")),
          "\\s+", " ")), " ")).as("word"))
        .filter(length(col("word")) > 0)
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val batches = (0 to 2).map(i => words(docs.filter(col("doc_id") % 3 === i)))
      val probes = words(docs.filter(col("doc_id") % 89 === 0))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q225").toString + "/cms"
      streaming.StreamingFreqSketch.byBatch(s, batches, store, "word",
          probes, "word", width = 512, minCount = 80L)
        .orderBy("item")
    }),

    // streaming ext — PER-GROUP cross-batch CMS: frequencies per event
    // type with one bounded counter grid per group (the grouped twin of
    // q225, completing the grouped streaming-sketch symmetry with
    // q267/q270/q271). Cells key j:bucket:grp with the group LAST
    // (separator-safe); per-group cell-wise mergeability makes the
    // folded store equal the one-shot per-group sketch of the
    // concatenation — exactly what the oracle replays via the md5
    // hex-slice decode, per group.
    "q273_stream_cms_group" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i)
          .select("event_type", "user_id"))
      val probes = ev.filter(col("user_id") % 97 === 0)
        .select("event_type", "user_id")
      val store = java.nio.file.Files
        .createTempDirectory("graft-q273").toString + "/cms"
      streaming.StreamingFreqSketch.byBatchBy(s, batches, store,
          "event_type", "user_id", probes, "event_type", "user_id",
          width = 256, minCount = 2L)
        .orderBy("grp", "item")
    }),

    // streaming ext — SLIDING-WINDOW + DECAYED HDR quantiles: "p99
    // latency NOW", not since the stream began — the last window
    // symmetry gap (HLL q252 / t-digest q274 / CMS q275 already have
    // windowed reads). A windowed store tags bucket cells with the
    // batch id; window reads fold only the range, the decayed read
    // scales each batch's counts by the exact integer
    // 2^(freshness/halfLife) before the rank pick. Exact [lo, hi]
    // value bounds per quantile as ever; the oracle replays every
    // state's comparison-ladder bucketing + rank pick.
    "q276_stream_hdr_window" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          floor(col("o_totalprice")).cast("long").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q276").toString + "/hdr"
      streaming.StreamingHdr.byBatchWindow(s, batches, store, "v",
          Seq(0.5, 0.99), window = 2, subBits = 5,
          decayHalfLife = Some(1))
        .orderBy("batch_id", "kind", "q")
    }),

    // streaming ext — SLIDING-WINDOW + DECAYED CMS: "hot items RIGHT
    // NOW", not since the stream began. A windowed store tags cells
    // with the batch id (counters sum per (batch, cell); expiry folds
    // only the batches in range — subtraction-based expiry would need
    // the same per-batch bookkeeping with none of the decay reads),
    // and the decayed read scales each batch's counts by the integer
    // 2^(freshness/halfLife) before the per-cell sum — the
    // heavy-hitters twin of q274's generation-weighted quantiles.
    // Exact-integer scaling: the oracle replays every read via the
    // same md5 hex-slice decode with per-batch cell grids.
    "q275_stream_cms_window" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i).select("user_id"))
      val probes = ev.filter(col("user_id") % 97 === 0).select("user_id")
      val store = java.nio.file.Files
        .createTempDirectory("graft-q275").toString + "/cms"
      streaming.StreamingFreqSketch.byBatchWindow(s, batches, store,
          "user_id", probes, "user_id", width = 256, window = 2,
          minCount = 1L, decayHalfLife = Some(1))
        .orderBy("batch_id", "kind", "item")
    }),

    // streaming ext — PER-GROUP sliding-window + decayed CMS: the
    // grouped twin of q275 (and the windowed twin of q273), closing
    // the grouped × windowed CMS cell: cells key batch:j:bucket:grp
    // (group LAST, separator-safe), window reads range-fold only the
    // group's in-range cells, decay scales counts by the integer
    // 2^(freshness/halfLife) — per-(group, item) estimates bounded by
    // the group's own windowed weight. Oracle replays every state via
    // the md5 hex-slice decode with the group key threaded through.
    "q278_stream_cms_group_window" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i)
          .select("event_type", "user_id"))
      val probes = ev.filter(col("user_id") % 97 === 0)
        .select("event_type", "user_id")
      val store = java.nio.file.Files
        .createTempDirectory("graft-q278").toString + "/cms"
      streaming.StreamingFreqSketch.byBatchWindowBy(s, batches, store,
          "event_type", "user_id", probes, "event_type", "user_id",
          width = 256, window = 2, minCount = 1L,
          decayHalfLife = Some(1))
        .orderBy("batch_id", "kind", "grp", "item")
    }),

    // streaming ext — PER-GROUP sliding-window + decayed HDR
    // quantiles: the grouped twin of q276 (and the windowed twin of
    // q271) — "p99 per endpoint NOW". Batch-tagged cells key
    // batch:bucket:grp; each state is a per-group range fold + rank
    // pick with exact [lo, hi] bounds; decay scales each batch's
    // counts by the exact integer factor first. The grouped × windowed
    // matrix is now gate-complete for every sketch family.
    "q279_stream_hdr_group_window" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull
          && col("o_orderpriority").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          col("o_orderpriority").as("g"),
          floor(col("o_totalprice")).cast("long").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("g", "v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q279").toString + "/hdr"
      streaming.StreamingHdr.byBatchWindowBy(s, batches, store, "g",
          "v", Seq(0.5, 0.99), window = 2, subBits = 5,
          decayHalfLife = Some(1))
        .orderBy("batch_id", "kind", "grp", "q")
    }),

    // streaming ext — bottom-k reservoir: a uniform k-sample of an
    // unbounded stream with ≤ k rows of state per batch. Priorities are
    // md5(key), so the sample is deterministic, batch-split INVARIANT
    // (global bottom-k ⊆ union of per-batch bottom-k's), and the
    // oracle replays it as one ORDER BY over the whole corpus — which
    // is exactly the invariance claim.
    "q236_stream_reservoir" -> ((s, dir) => {
      val ev = tbl(s, dir, "events").filter(col("event_id").isNotNull)
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i).select("event_id"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q236").toString + "/res"
      streaming.StreamingReservoir.byBatch(s, batches, store,
          "event_id", "BIGINT", k = 100)
        .orderBy("priority", "event_id")
    }),

    // streaming ext — cross-batch Bloom accumulation: the continuous
    // novelty screen (state ≤ mBits rows over the shared KeyedBatchStore
    // LSM in distinct mode). Each batch's distinct items are screened
    // against the filter of the batches BEFORE it, then folded in; the
    // oracle replays novelty from each bit's first-appearance batch,
    // checking both the screen and the accumulation order.
    "q242_stream_bloom" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select(col("event_id"),
          concat(lit("u"), col("user_id").cast("string")).as("item"))
      val batches = (0 to 2).map(i =>
        ev.filter(col("event_id") % 3 === i).select("item"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q242").toString + "/bloom"
      streaming.StreamingBloom.byBatch(s, batches, store, "item",
          mBits = 8192)
        .orderBy("batch_id")
    }),

    // streaming ext — cross-batch HDR quantiles: the continuous p50/
    // p99 tracker (state = the ≤ ~1.9k-row bucket histogram in the
    // KeyedBatchStore LSM, sum-merge). RUNNING quantiles after every
    // batch, so the oracle replays the accumulation at each step from
    // batch-prefix histograms — not just the final state.
    "q247_stream_hdr" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          floor(col("o_totalprice")).cast("long").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q247").toString + "/hdr"
      streaming.StreamingHdr.byBatch(s, batches, store, "v",
          Seq(0.5, 0.9, 0.99), subBits = 5)
        .orderBy("batch_id", "q")
    }),

    // streaming ext — cross-batch HLL: continuous distinct-user
    // counting with per-batch register keys, so ONE store answers both
    // the cumulative count and a sliding last-2-batch window (expiry a
    // max-merged register table cannot do — max is not invertible).
    // Exact distinct counts ride along for both reads per batch.
    "q252_stream_hll" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull)
        .select((col("event_id") % 3L).as("b"),
          // (user, session-slot) items: thousands of distinct values
          // with partial cross-batch overlap, so cumulative grows
          // while the window genuinely expires
          concat(lit("u"), col("user_id").cast("string"), lit(":"),
            (col("event_id") % 50L).cast("string")).as("item"))
      val batches = (0L to 2L).map(i =>
        ev.filter(col("b") === i).select("item"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q252").toString + "/hll"
      val est = streaming.StreamingHll.byBatch(s, batches, store,
        "item", p = 8, window = 2)
      val di = ev.select(col("b"), col("item")).distinct()
      val exact = di
        .select(col("b"), col("item"),
          explode(array((0L to 2L).map(lit): _*)).as("bid"))
        .filter(col("b") <= col("bid"))
        .groupBy(col("bid").as("batch_id"))
        .agg(count_distinct(col("item")).as("exact_cum"),
          count_distinct(when(col("b") >= col("bid") - 1L, col("item")))
            .as("exact_win"))
      est.join(exact, Seq("batch_id"))
        .select(col("batch_id"), col("est_cum"), col("est_win"),
          col("exact_cum"), col("exact_win"))
        .orderBy("batch_id")
    }),

    // streaming ext — cross-batch t-digest: continuous quantiles over
    // an UNBOUNDED real domain (the StreamingHdr complement) with ONE
    // ≤ δ+1-row digest as total state. The fold is a strict per-batch
    // left fold (digest_i = recluster(digest_{i-1} ∪ summarize(batch)))
    // — a pure function of the batch sequence — so the oracle unrolls
    // all three batches bit-for-bit: per-shard summarize, three
    // re-cluster stages, running quantile picks with exact [vmin,
    // vmax] brackets after every batch.
    "q260_stream_tdigest" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull
          && col("o_custkey").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          (col("o_custkey") % 4L).as("shard"),
          col("o_totalprice").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("shard", "v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q260").toString + "/tdigest"
      graft.streaming.StreamingTDigest.byBatch(s, batches, store, "v",
          Seq(0.5, 0.9), shardCol = Some("shard"), delta = 32)
        .select(col("batch_id"), col("qi"), col("q"), col("n"),
          col("target_rank"), col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"),
          (col("vmin").cast("double") <= col("estimate") &&
            col("estimate") <= col("vmax").cast("double"))
            .as("est_in_bracket"))
        .orderBy("batch_id", "qi")
    }),

    // streaming ext — SLIDING-WINDOW + DECAYED t-digest quantiles: the
    // cumulative fold (q260) cannot expire old batches (rank
    // re-clustering is not invertible), so windowed reads merge the
    // RETAINED per-batch digests — last-2-batches quantiles after every
    // batch — and the decayed read scales each batch's weights by
    // 2^(freshness/halfLife) before ONE widened re-cluster (the
    // generation-weighted merge; integer-exact scaling, so the whole
    // thing replays bit-for-bit). Exact [vmin, vmax] brackets as ever.
    "q274_stream_tdigest_window" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull
          && col("o_custkey").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          (col("o_custkey") % 2L).as("shard"),
          col("o_totalprice").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("shard", "v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q274").toString + "/tdigest"
      graft.streaming.StreamingTDigest.byBatchWindow(s, batches, store,
          "v", Seq(0.5, 0.9), window = 2, shardCol = Some("shard"),
          delta = 16, decayHalfLife = Some(1))
        .select(col("batch_id"), col("kind"), col("qi"), col("q"),
          col("n"), col("target_rank"), col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"),
          (col("vmin").cast("double") <= col("estimate") &&
            col("estimate") <= col("vmax").cast("double"))
            .as("est_in_bracket"))
        .orderBy("batch_id", "kind", "qi")
    }),

    // streaming ext — PER-GROUP windowed/decayed t-digest: the last
    // untested grouped × windowed combination (grouped CMS/HDR/HLL
    // window since r13; q274 windows the GLOBAL digest, q267 groups
    // the CUMULATIVE one). Per-batch digests retain the group key;
    // each window state is one group-partitioned widened re-cluster
    // over the in-range digests, the decayed read scales each batch's
    // weight/sumv by the integer 2^(freshness/halfLife) first. The
    // oracle replays every (state, group) re-cluster + rank pick.
    "q277_stream_tdigest_group_window" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull
          && col("o_orderpriority").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          col("o_orderpriority").as("grp"),
          col("o_totalprice").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("grp", "v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q277").toString + "/tdigest"
      graft.streaming.StreamingTDigest.byBatchWindow(s, batches, store,
          "v", Seq(0.5, 0.9), window = 2, delta = 16,
          decayHalfLife = Some(1), groupCol = Some("grp"))
        .select(col("batch_id"), col("kind"), col("shard").as("grp"),
          col("qi"), col("q"), col("n"), col("target_rank"),
          col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"),
          (col("vmin").cast("double") <= col("estimate") &&
            col("estimate") <= col("vmax").cast("double"))
            .as("est_in_bracket"))
        .orderBy("batch_id", "kind", "grp", "qi")
    }),

    // streaming ext — PER-GROUP cross-batch t-digest: the q264/q266
    // batch family's streaming member (and the grouped twin of q260),
    // completing the per-group sketch symmetry. State is ≤ δ+1 rows
    // PER GROUP; each batch folds through the group-preserving widened
    // re-cluster (tdigestMergeByGroup), and the running per-(group, q)
    // brackets are read after EVERY batch so the gate checks the whole
    // fold. The oracle unrolls both batches bit-for-bit: per-(batch,
    // group) summarize, two group-partitioned widened re-clusters,
    // per-group quantile picks from each fold state.
    "q267_stream_tdigest_group" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull
          && col("o_orderpriority").isNotNull)
        .select((col("o_orderkey") % 2L).as("b"),
          col("o_orderpriority").as("grp"),
          col("o_totalprice").as("v"))
      val batches = (0L to 1L).map(i =>
        vals.filter(col("b") === i).select("grp", "v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q267").toString + "/tdigest"
      graft.streaming.StreamingTDigest.byBatch(s, batches, store, "v",
          Seq(0.5, 0.9), delta = 16, groupCol = Some("grp"))
        .select(col("batch_id"), col("shard").as("grp"), col("qi"),
          col("q"), col("n"), col("target_rank"), col("weight"),
          col("vmin").cast("double").as("vmin_d"),
          col("vmax").cast("double").as("vmax_d"),
          col("estimate"),
          (col("vmin").cast("double") <= col("estimate") &&
            col("estimate") <= col("vmax").cast("double"))
            .as("est_in_bracket"))
        .orderBy("batch_id", "grp", "qi")
    }),

    // streaming ext — continuously-maintained IVF index: the frozen
    // quantizer comes from the FIRST batch (the initial corpus), each
    // later batch appends by one kernel-assignment scan (no rebuild,
    // postings never move), and the same queries are re-run after EVERY
    // batch — later batches must surface in search as they land. The
    // oracle replays each per-batch search state: assignment is a pure
    // per-row function of the frozen centroids, so the accumulated
    // index equals the bulk index of the batches seen so far.
    // compactEvery = 2 makes the run FOLD deltas into a generation
    // segment mid-stream, so the oracle also proves compaction is a
    // pure rewrite (search results identical from folded segments).
    "q269_stream_ivf" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      val batches = (0L to 2L).map(i =>
        em.filter(col("vec_id") % 3 === i).select("vec_id", "embedding"))
      val cents = ext.Similarity.ivfCentroids(batches(0), "vec_id",
        "embedding", numCells = 16)
      val qs = em.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q269").toString + "/ivf"
      graft.streaming.StreamingIvf.byBatch(s, batches, store, "vec_id",
          "embedding", cents, qs, "query_id", k = 10, nprobe = 4,
          compactEvery = 2)
        .orderBy("batch_id", "query_id", "rank")
    }),

    // streaming ext — PER-GROUP cross-batch HLL: distinct users per
    // event type with both the cumulative and sliding last-2-batch
    // reads, per group (the grouped twin of q252, completing the
    // q249 batch / q252 streaming / per-group streaming symmetry).
    // Register keys carry the group LAST (a group value may contain
    // the separator; only the tail field may be ambiguous). Exact
    // per-group counts ride along for both reads per batch.
    "q270_stream_hll_group" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("event_id").isNotNull && col("user_id").isNotNull &&
          col("event_type").isNotNull)
        .select((col("event_id") % 3L).as("b"),
          col("event_type").as("t"),
          concat(lit("u"), col("user_id").cast("string"), lit(":"),
            (col("event_id") % 50L).cast("string")).as("item"))
      val batches = (0L to 2L).map(i =>
        ev.filter(col("b") === i).select("t", "item"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q270").toString + "/hll"
      val est = graft.streaming.StreamingHll.byBatchBy(s, batches, store,
        "t", "item", p = 8, window = 2)
      val di = ev.select(col("b"), col("t"), col("item")).distinct()
      val exact = di
        .select(col("b"), col("t"), col("item"),
          explode(array((0L to 2L).map(lit): _*)).as("bid"))
        .filter(col("b") <= col("bid"))
        .groupBy(col("bid").as("batch_id"), col("t").as("grp"))
        .agg(count_distinct(col("item")).as("exact_cum"),
          count_distinct(when(col("b") >= col("bid") - 1L, col("item")))
            .as("exact_win"))
      est.join(exact, Seq("batch_id", "grp"))
        .select(col("batch_id"), col("grp"), col("est_cum"),
          col("est_win"), col("exact_cum"), col("exact_win"))
        .orderBy("batch_id", "grp")
    }),

    // streaming ext — PER-GROUP cross-batch HDR quantiles: running
    // p50/p99 per order priority after every batch (the grouped twin
    // of q247, closing the per-group streaming-sketch symmetry: HLL
    // q270, t-digest q267, HDR here). Histogram rows key as bucket:grp
    // (group LAST — separator-safe) and sum-merge per key; state is
    // ≤ groups × ~1.9k rows regardless of stream length.
    "q271_stream_hdr_group" -> ((s, dir) => {
      val vals = tbl(s, dir, "orders")
        .filter(col("o_totalprice").isNotNull && col("o_orderkey").isNotNull
          && col("o_orderpriority").isNotNull)
        .select((col("o_orderkey") % 3L).as("b"),
          col("o_orderpriority").as("g"),
          floor(col("o_totalprice")).cast("long").as("v"))
      val batches = (0L to 2L).map(i =>
        vals.filter(col("b") === i).select("g", "v"))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q271").toString + "/hdr"
      graft.streaming.StreamingHdr.byBatchBy(s, batches, store, "g", "v",
          Seq(0.5, 0.99), subBits = 5)
        .orderBy("batch_id", "grp", "q")
    }),

    // streaming ext — continuous MinHash+LSH near-dedup: each batch's
    // documents are probed against the banded-signature index of the
    // strictly-prior batches (the document-level twin of q104's span
    // store; q13's LSH made continuous). Portable md5 hashing, so the
    // oracle rebuilds every signature, band key, and estimate
    // bit-for-bit — the verify here is the MinHash ESTIMATE (matching
    // components / 64, a power-of-two division so the double is exact),
    // not the exact-Jaccard equivalence trick q13 uses.
    "q280_stream_minhash_lsh" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      val all = docs.union(near)
      // near-copies of batch-2 originals land in batch 0 (10000 ≡ 1
      // mod 3), so the replay exercises BOTH directions: copy probing
      // its earlier original AND original probing its earlier copy
      val batches = (0 to 2).map(b => all.filter(col("doc_id") % 3 === b))
      val store = java.nio.file.Files
        .createTempDirectory("graft-q280").toString + "/lsh"
      streaming.StreamingMinhashLsh.byBatch(s, batches, store,
          "doc_id", "text", shingleSize = 3, numHashes = 64, bands = 16,
          estThreshold = 0.8)
        .orderBy("batch_id", "doc_id", "match_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // batch 0 = the q110 oracle over the corpus thirds (tagged 0);
    // batch 1 = the q117 oracle (tagged 1); union replays the fold
    "q118_stream_paragraph_dedup" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    concat(
        |      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |      chr(10), 'Subscribe to our newsletter!', chr(10),
        |      array_to_string(list_slice(string_split(text, ' '), 9, 16), ' ')) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp0 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM raw WHERE doc_id % 3 <> 0),
        |p0 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp0)),
        |k0 AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p0),
        |out0 AS (
        |  SELECT CAST(0 AS BIGINT) AS batch_id, k0.doc_id,
        |    string_agg(k0.para, chr(10) ORDER BY k0.idx) AS clean_text,
        |    CAST(len(any_value(sp0.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM k0 JOIN sp0 ON k0.doc_id = sp0.doc_id
        |  WHERE k0.rk = 1
        |  GROUP BY k0.doc_id),
        |cn AS (
        |  SELECT DISTINCT norm FROM p0 WHERE norm <> ''),
        |sp1 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM raw WHERE doc_id % 3 = 0),
        |p1 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp1)),
        |k1 AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p1),
        |out1 AS (
        |  SELECT CAST(1 AS BIGINT) AS batch_id, k1.doc_id,
        |    string_agg(k1.para, chr(10) ORDER BY k1.idx) AS clean_text,
        |    CAST(len(any_value(sp1.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM k1 JOIN sp1 ON k1.doc_id = sp1.doc_id
        |  WHERE k1.rk = 1
        |    AND (k1.norm = '' OR k1.norm NOT IN (SELECT norm FROM cn))
        |  GROUP BY k1.doc_id)
        |SELECT * FROM out0 UNION ALL SELECT * FROM out1
        |ORDER BY batch_id, doc_id""".stripMargin,

    // two-batch replay: day 1 against an empty store emits nothing; day 2
    // probes day 1's grams (q98's postings/island machinery, batch-tagged)
    "q104_stream_span_dedup" ->
      """WITH day1 AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        |day2 AS (
        |  SELECT doc_id + 90000 AS doc_id,
        |    concat(array_to_string(list_slice(string_split(text, ' '), 1, 10), ' '),
        |           ' tail', CAST(doc_id AS VARCHAR)) AS text
        |  FROM documents WHERE doc_id % 9 = 1),
        |bt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM day2),
        |bg AS (
        |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> {'pos': i - 1,
        |            'gram': array_to_string(list_slice(t, i, i + 4), ' ')})) AS u
        |    FROM bt WHERE len(t) >= 5)),
        |cg AS (
        |  SELECT unnest(list_transform(
        |      generate_series(1, greatest(len(t) - 4, 1)),
        |      i -> array_to_string(list_slice(t, i, i + 4), ' '))) AS gram
        |  FROM (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |        FROM day1)),
        |hits AS (
        |  SELECT doc_id, pos FROM bg WHERE gram IN (SELECT gram FROM cg)),
        |m AS (
        |  SELECT doc_id, pos,
        |    max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM hits),
        |isl AS (
        |  SELECT doc_id, pos,
        |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM m)
        |SELECT CAST(1 AS BIGINT) AS batch_id, doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl
        |GROUP BY doc_id, island
        |ORDER BY batch_id, doc_id, span_start""".stripMargin,

    "q26_stream_daily_counts" ->
      s"""WITH e AS ($EventsCte),
         |p AS (
         |  SELECT CAST(date_trunc('second', ts) AS TIMESTAMP) AS request_time,
         |    CASE WHEN value > 50 THEN 'REST.GET.OBJECT' ELSE 'REST.PUT.OBJECT' END AS operation,
         |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE CAST(round(value * 100) AS BIGINT) END AS bytes_sent
         |  FROM e WHERE event_id % 101 <> 0)
         |SELECT CAST(date_trunc('day', request_time) AS TIMESTAMP) AS day_start,
         |  operation,
         |  CAST(count(*) AS BIGINT) AS n_requests,
         |  CAST(sum(bytes_sent) AS BIGINT) AS total_bytes
         |FROM p
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    // cumulative-after-batch-b = profile over doc_id % 3 <= b: the batch
    // replay's fold is associative/commutative, so the cumulative state at
    // batch b equals a fresh profile of the union of batches 0..b
    "q81_stream_profile" -> {
      def one(c: String) =
        s"""SELECT b.batch_id, '$c' AS col_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(min($c) AS VARCHAR) AS min_value,
           |  CAST(max($c) AS VARCHAR) AS max_value
           |FROM b JOIN documents d ON d.doc_id % 3 <= b.batch_id
           |GROUP BY b.batch_id""".stripMargin
      s"""WITH b AS (
         |  SELECT CAST(unnest(generate_series(0, 2)) AS BIGINT) AS batch_id)
         |${one("doc_id")}
         |UNION ALL
         |${one("lang")}
         |UNION ALL
         |${one("n_chars")}
         |ORDER BY batch_id, col_name""".stripMargin
    },

    // identical recurrence to q71 — the streaming fold must reproduce the
    // batch funnel bit-for-bit on a single batch
    "q84_stream_funnel" ->
      s"""WITH ev AS ($EventsCte),
         |s1 AS (SELECT user_id, min(ts) AS t_1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts) AS t_2 FROM ev e JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.ts > s1.t_1 GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts) AS t_3 FROM ev e JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.ts > s2.t_2 GROUP BY 1)
         |SELECT s1.user_id, t_1, t_2, t_3,
         |  CAST(1 + (CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END)
         |         + (CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth
         |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         |ORDER BY 1""".stripMargin,

    // replays the two-batch cumulative strip: batch 0 strips on its own
    // distinct-doc counts (>= 3), batch 1 on batch-1 counts PLUS batch
    // 0's (the frequency store), all occurrences dropped per batch
    "q135_stream_boilerplate" ->
      """WITH base AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |    CASE WHEN doc_id % 2 = 0 THEN 'Subscribe to our newsletter!'
        |         ELSE 'unique middle ' || CAST(doc_id AS VARCHAR) END,
        |    CASE WHEN doc_id < 4 THEN 'Rare promo banner'
        |         ELSE 'All rights reserved to no one.' END) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp0 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM base WHERE doc_id % 3 <> 0),
        |p0 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp0)),
        |c0 AS (SELECT norm, count(DISTINCT doc_id) AS n
        |       FROM p0 WHERE norm <> '' GROUP BY 1),
        |out0 AS (
        |  SELECT CAST(0 AS BIGINT) AS batch_id, p0.doc_id,
        |    string_agg(p0.para, chr(10) ORDER BY p0.idx) AS clean_text,
        |    CAST(len(any_value(sp0.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM p0 JOIN sp0 ON p0.doc_id = sp0.doc_id
        |  WHERE p0.norm NOT IN (SELECT norm FROM c0 WHERE n >= 3)
        |  GROUP BY p0.doc_id),
        |sp1 AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |        FROM base WHERE doc_id % 3 = 0),
        |p1 AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u FROM sp1)),
        |c1 AS (SELECT norm, count(DISTINCT doc_id) AS n
        |       FROM p1 WHERE norm <> '' GROUP BY 1),
        |f1 AS (SELECT c1.norm FROM c1 LEFT JOIN c0 ON c0.norm = c1.norm
        |       WHERE c1.n + coalesce(c0.n, 0) >= 3),
        |out1 AS (
        |  SELECT CAST(1 AS BIGINT) AS batch_id, p1.doc_id,
        |    string_agg(p1.para, chr(10) ORDER BY p1.idx) AS clean_text,
        |    CAST(len(any_value(sp1.t)) AS BIGINT) AS n_paras,
        |    CAST(count(*) AS BIGINT) AS n_kept
        |  FROM p1 JOIN sp1 ON p1.doc_id = sp1.doc_id
        |  WHERE p1.norm NOT IN (SELECT norm FROM f1)
        |  GROUP BY p1.doc_id)
        |SELECT * FROM out0 UNION ALL SELECT * FROM out1
        |ORDER BY batch_id, doc_id""".stripMargin,

    // one recursive closure over all three batch edge families — the
    // continuous fold must land on the same fixpoint
    "q148_stream_components" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id % 89 AS a, (doc_id * 3 + 1) % 89 AS b
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT (doc_id * 5) % 141, (doc_id * 7 + 4) % 141
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 = 1
        |  UNION ALL
        |  SELECT (doc_id * 11 + 7) % 200, (doc_id * 13 + 2) % 200
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 3 = 2),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM sym),
        |r(x, y) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
        |SELECT x AS id, min(y) AS component
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // the one-shot heavy-hitters the incremental fold must reproduce
    "q157_stream_topk" ->
      """WITH k AS (
        |  SELECT event_type || '#' || (user_id % 50) AS key
        |  FROM events
        |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL)
        |SELECT key, CAST(count(*) AS BIGINT) AS n_total
        |FROM k GROUP BY key
        |ORDER BY n_total DESC, key LIMIT 20""".stripMargin,

    // the batch meaning of the interval join, verbatim
    "q184_stream_interval_join" ->
      s"""WITH e AS ($EventsCte)
         |SELECT v.event_id AS view_id, p.event_id AS purchase_id,
         |  v.user_id,
         |  CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT)
         |    AS micros_to_purchase
         |FROM e v JOIN e p
         |  ON p.user_id = v.user_id
         |  AND v.event_type = 'view' AND p.event_type = 'purchase'
         |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
         |WHERE v.user_id IS NOT NULL AND v.ts IS NOT NULL
         |  AND p.ts IS NOT NULL
         |ORDER BY view_id, purchase_id""".stripMargin,

    // batch-split-independent final state = one argmax over all events
    "q194_stream_cdc" ->
      s"""WITH e AS ($EventsCte)
         |SELECT user_id, event_id AS last_event_id,
         |  event_type AS last_type,
         |  CAST(epoch_us(ts) AS BIGINT) AS last_ts_us
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM e WHERE user_id IS NOT NULL AND ts IS NOT NULL)
         |WHERE rn = 1
         |ORDER BY user_id""".stripMargin,

    // closed-form CDC replay: n = 1 + doc_id%5 block chunks at offsets
    // i*|B| plus one 17-byte tail chunk, digests stated literally (the
    // fixture blocks cut exactly at their ends — see CdcBlockEven)
    "q198_cdc_chunks" ->
      s"""WITH d AS (
         |  SELECT doc_id, (doc_id % 2 = 0) AS ev,
         |    CAST(1 + doc_id % 5 AS BIGINT) AS n,
         |    CAST(CASE WHEN doc_id % 2 = 0 THEN 179 ELSE 177 END AS BIGINT) AS bl
         |  FROM documents WHERE doc_id IS NOT NULL),
         |c AS (
         |  SELECT doc_id, ev, n, bl, u.i AS ci
         |  FROM d, unnest(generate_series(0, n)) u(i))
         |SELECT doc_id, CAST(ci AS INT) AS chunk_index,
         |  CAST(ci * bl AS BIGINT) AS "offset",
         |  CAST(CASE WHEN ci < n THEN bl ELSE 17 END AS INT) AS length,
         |  CASE WHEN ci < n THEN
         |    (CASE WHEN ev THEN '$CdcDigestEven' ELSE '$CdcDigestOdd' END)
         |  ELSE '$CdcDigestTail' END AS digest
         |FROM c
         |ORDER BY doc_id, chunk_index""".stripMargin,

    // the streaming accumulator's cell-wise mergeability makes the
    // fold-3-batches result equal the ONE-SHOT corpus sketch — the
    // oracle replays the one-shot form (batch membership by doc_id % 3
    // is irrelevant to the merged counters, which is the point)
    "q225_stream_cms" -> cmsOracle(width = 512, probeMod = 89,
      minCount = 80),

    // grouped twin: per-(event_type, j, bucket) counters; the group key
    // rides every stage of the same md5 hex-slice replay
    "q273_stream_cms_group" -> cmsGroupOracle(width = 256, probeMod = 97,
      minCount = 2),

    // windowed/decayed twin: per-(batch, j, bucket) grids, range-summed
    // window states + the 2^(freshness)-scaled decay state
    "q278_stream_cms_group_window" -> cmsGroupWindowOracle(width = 256,
      probeMod = 97, minCount = 1L),

    "q279_stream_hdr_group_window" -> StreamGroupHdrWindowOracle,

    "q275_stream_cms_window" -> cmsWindowOracle(width = 256,
      probeMod = 97, minCount = 1),

    // the batch-split-invariance claim IS the oracle: the streamed
    // reservoir must equal the one-shot bottom-k of the whole corpus
    "q236_stream_reservoir" ->
      """SELECT event_id, md5(CAST(event_id AS VARCHAR)) AS priority
        |FROM (SELECT DISTINCT event_id FROM events WHERE event_id IS NOT NULL)
        |ORDER BY priority, event_id
        |LIMIT 100""".stripMargin,

    "q242_stream_bloom" -> StreamBloomOracle,

    "q247_stream_hdr" -> StreamHdrOracle,

    "q276_stream_hdr_window" -> StreamHdrWindowOracle,

    "q252_stream_hll" -> StreamHllOracle,

    "q260_stream_tdigest" -> StreamTDigestOracle,

    "q274_stream_tdigest_window" -> StreamTDigestWindowOracle,

    "q267_stream_tdigest_group" -> StreamGroupTDigestOracle,

    "q277_stream_tdigest_group_window" -> StreamGroupTDigestWindowOracle,

    "q269_stream_ivf" -> StreamIvfOracle,

    "q270_stream_hll_group" -> StreamGroupHllOracle,

    "q271_stream_hdr_group" -> StreamGroupHdrOracle,

    // full hash-exact replay: DuckDB rebuilds the minhash signatures
    // (h_i(s) = first 16 hex chars of md5('i|' || s); fixed-width
    // lowercase hex compares like the unsigned number it spells, so
    // min() over hex IS min-hashing), the band keys, the band-collision
    // candidates, and the matching-component estimate — then applies
    // the same strictly-prior-batch rule the store enforces
    "q280_stream_minhash_lsh" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |sigc AS (
         |  SELECT sh.doc_id, g.i AS i,
         |    min(substr(md5(g.i::VARCHAR || '|' || u.s), 1, 16)) AS m
         |  FROM sh, unnest(sh.s) u(s), generate_series(0, 63) g(i)
         |  GROUP BY 1, 2),
         |sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM sigc GROUP BY 1),
         |bands AS (
         |  SELECT doc_id,
         |    md5(b.b::VARCHAR || '|' ||
         |        array_to_string(sig[(b.b * 4 + 1):(b.b * 4 + 4)], '|')) AS bkey
         |  FROM sig, generate_series(0, 15) b(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS match_id
         |  FROM bands a JOIN bands b ON a.bkey = b.bkey
         |  WHERE a.doc_id % 3 > b.doc_id % 3),
         |est AS (
         |  SELECT c.doc_id, c.match_id,
         |    CAST(len(list_filter(generate_series(1, 64),
         |      i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 64.0 AS est_jaccard
         |  FROM cand c
         |  JOIN sig sa ON sa.doc_id = c.doc_id
         |  JOIN sig sb ON sb.doc_id = c.match_id)
         |SELECT CAST(doc_id % 3 AS BIGINT) AS batch_id,
         |  CAST(doc_id AS BIGINT) AS doc_id,
         |  CAST(match_id AS BIGINT) AS match_id, est_jaccard
         |FROM est WHERE est_jaccard >= 0.8
         |ORDER BY batch_id, doc_id, match_id""".stripMargin,
  )
}
