package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — deduplication family: exact, MinHash, SimHash, n-gram Jaccard, embedding near-dup, span/paragraph dedup, connected components, decontamination.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object DedupGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext dedup — exact duplicate groups by content digest.
    "q12_dedup_exact" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val dups = docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      Dedup.exactGroups(docs.union(dups), "doc_id", "text")
    }),

    // ext dedup — MinHash + LSH banding candidates, exact-Jaccard verified.
    "q13_dedup_minhash" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      Dedup.minhashDuplicates(docs.union(near), "doc_id", "text",
          numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
    }),

    // ext dedup — embedding-cosine near-dup pairs (exact predicate).
    "q14_dedup_embedding" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings").select("vec_id", "embedding")
      val copies = em.filter(col("vec_id") % 9 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      Dedup.embeddingDuplicates(em.union(copies), "vec_id", "embedding", threshold = 0.9)
        .select("id_a", "id_b")
    }),

    // ext dedup — SimHash near-dup pairs. Oracle-gated since round 12:
    // the token hash is md5's first 16 hex chars (the library-wide
    // replayable-hash discipline), so DuckDB rebuilds every 64-bit
    // sketch bit-for-bit and brute-forces the hamming<=3 pairs — the
    // engine's pigeonhole banding is LOSSLESS (banded ∪ verify ≡
    // all-pairs filter, asserted brute-force in DedupSpec), so the two
    // formulations must agree exactly.
    "q23_dedup_simhash" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val dups = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      Dedup.simhashDuplicates(docs.union(dups), "doc_id", "text", maxDistance = 3)
        .orderBy("id_a", "id_b")
    }),

    // ext dedup — near-duplicate CLUSTERS: the q13 pair graph labeled by
    // connected components (min reachable id), the cluster view that lets
    // survivor policies be content-aware rather than id-ordered.
    // Recall bound (diagnosability note): the engine side is MinHash/LSH
    // while the oracle brute-forces exact Jaccard — with 64 hashes /
    // 32 bands the per-pair miss probability is ~1e-14 on this corpus, so
    // the gate is stable, but a future corpus with a pair barely above
    // 0.8 could in principle flake HERE (not a wrong answer: sketch
    // recall). q70 gates the same clustering on the exact pair path.
    "q49_dedup_components" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      val pairs = Dedup.minhashDuplicates(docs.union(near), "doc_id", "text",
          numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.8)
      Dedup.connectedComponents(pairs.select("id_a", "id_b"))
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id")
    }),

    // ext dedup — incremental ingest dedup: a new batch deduped against an
    // existing corpus WITHOUT re-pairing corpus x corpus (the square that
    // never changes); plus the usual within-batch greedy pass.
    "q56_dedup_incremental" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") < 400)
      val fresh = docs.filter(col("doc_id") >= 400)
      val nearCorpus = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 10000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      val withinDup = fresh.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"))
      Dedup.minhashDedupIncremental(
          fresh.union(nearCorpus).union(withinDup), corpus, "doc_id", "text",
          numHashes = 64, bands = 32, shingleSize = 3, threshold = 0.8)
        .select("doc_id")
        .orderBy("doc_id")
    }),

    // ext dedup — exact all-pairs n-gram Jaccard (no sketching): the
    // verify-stage / small-n member of the dedup family. Size-band
    // blocking bounds the candidate space (a pair at jaccard ≥ t has
    // shingle-count ratio ≤ 1/t, so only same/adjacent log-scale size
    // buckets ever join).
    "q59_dedup_ngram_jaccard" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val near = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          concat(col("text"), lit(" zzz end")).as("text"))
      Dedup.ngramJaccardPairs(docs.union(near), "doc_id", "text",
          n = 3, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
    }),

    // ext text — canonical-form document fingerprinting: identical content
    // modulo case/whitespace → identical md5 fingerprint; n_same counts
    // each fingerprint's group in the SAME hash-partitioned pass (window
    // over fp — one shuffle, no second scan or self-join). The
    // edit-tolerant rolling-hash variant (TextStats.winnowingFingerprints)
    // is covered in TextStatsSpec: its xxhash64 values are not
    // reproducible in an external SQL engine, so it has no oracle entry.
    "q60_fingerprint" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val spaced = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 30000).as("doc_id"),
          concat(lit("  "), regexp_replace(col("text"), " ", "  ")).as("text"))
      val w = Window.partitionBy("fp")
      docs.union(spaced)
        .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
        .withColumn("n_same", count(lit(1)).over(w))
        .orderBy("doc_id")
    }),

    // ext dedup — survivor per near-dup cluster (longest text, ties to
    // min id): the content-aware policy layer over q49's component labels.
    // Pairs come from the EXACT prefix-filtered path (zero false
    // negatives), so the oracle's brute-force Jaccard pair set is equal by
    // construction and the gate cannot flake on sketch recall (ADVICE r3);
    // the MinHash pair path keeps its own direct gate in q13. The pair
    // graph + labels are the SHARED stage with q88 (nearDupGraph) — one
    // AllPairs + CC fixpoint, two policy consumers, like a real pipeline.
    "q70_dedup_survivors" -> ((s, dir) => {
      val (_, labels) = nearDupGraph(s, dir)
      Dedup.clusterSurvivorsFromLabels(nearDupCorpus(s, dir), "doc_id",
          "text", labels)
        .orderBy("component")
    }),

    // ext dedup — exact duplicated-substring spans (trim repeated passages,
    // keep the document): maximal token ranges whose every 5-token window
    // appears in >= 2 distinct documents, merged gaps-and-islands per doc.
    "q97_duplicate_spans" -> ((s, dir) => {
      ext.Dedup.duplicateSpans(tbl(s, dir, "documents"), "doc_id", "text",
          k = 5, minDocs = 2)
        .orderBy("doc_id", "span_start")
    }),

    // ext similarity — embedding-space decontamination (the semantic
    // companion of q82's n-gram form): the benchmark slice (vec_id%23=0)
    // is fused into the MaxCosine scan kernel; corpus rows within
    // cosine 0.92 of ANY benchmark vector drop — including the benchmark
    // rows themselves (cos 1.0). No join in the plan: the corpus never
    // moves. Exact doubles, so the oracle's max-over-refs replays them.
    // (The embeddings table has no zero/NaN vectors, so the kernel's
    // denom>0-else-0 convention and the oracle's raw division agree.)
    "q123_semantic_decontam" -> ((s, dir) => {
      val em = tbl(s, dir, "embeddings")
      ext.Similarity.semanticDecontaminate(
          em, em.filter(col("vec_id") % 23 === 0),
          "embedding", "embedding", tau = 0.92)
        .select(col("vec_id"), col("max_ref_cosine"))
        .orderBy("vec_id")
    }),

    // ext dedup — INCREMENTAL paragraph dedup (batch vs corpus, the
    // daily-ingest shape): batch = doc_id % 3 == 0 with the q110
    // construction, corpus = the rest; corpus paragraphs collapse to
    // distinct norms in-scan and anti-join the batch's survivors.
    "q117_paragraph_dedup_incr" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val shaped = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            array_join(slice(words, 1, 8), " "),
            lit("Subscribe to our newsletter!"),
            array_join(slice(words, 9, 8), " ")).as("text"))
      ext.Dedup.paragraphDedupIncremental(
          shaped.filter(col("doc_id") % 3 === 0),
          shaped.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext dedup — corpus-wide exact PARAGRAPH dedup with document
    // reconstruction (the boilerplate killer): every doc gets a shared
    // boilerplate paragraph injected between two 8-word slices of its
    // text; the op keeps only the first occurrence of each normalized
    // paragraph corpus-wide and reassembles docs in order. The oracle
    // replays split/normalize/first-occurrence/reassemble in SQL.
    "q110_paragraph_dedup" -> ((s, dir) => {
      val words = split(col("text"), " ")
      val docs = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"),
          concat_ws("\n",
            array_join(slice(words, 1, 8), " "),
            lit("Subscribe to our newsletter!"),
            array_join(slice(words, 9, 8), " ")).as("text"))
      ext.Dedup.paragraphDedup(docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext dedup — cross-corpus (incremental) substring spans: a synthetic
    // "daily batch" copies a 12-token prefix from corpus documents and
    // appends a unique tail; the operator localizes exactly the copied
    // prefix as a span, probing batch windows against corpus grams.
    "q98_span_decontaminate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val batch = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 70000).as("doc_id"),
          concat(array_join(slice(words, 1, 12), " "),
            lit(" uniq"), col("doc_id").cast("string")).as("text"))
      ext.Dedup.duplicateSpansAgainst(batch, docs, "doc_id", "text", k = 5)
        .orderBy("doc_id", "span_start")
    }),

    // ext dedup — benchmark DECONTAMINATION: corpus documents sharing
    // >= 2 distinct 3-grams with a (derived) benchmark set — the n-gram
    // overlap gate run before training. The benchmark is every 11th
    // document's first 8 words, so contamination is planted by
    // construction; the engine must count shared grams and test docs hit.
    "q82_decontaminate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents").select("doc_id", "text")
      val words = split(col("text"), " ")
      val bench = docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 50000).as("doc_id"),
          array_join(slice(words, 1, 8), " ").as("text"))
      Dedup.ngramOverlapAcross(docs, bench, "doc_id", "text",
          n = 3, minShared = 2L)
        .orderBy("doc_id")
    }),

    // ext dedup — INCREMENTAL connected components (cluster-label
    // maintenance, the daily-ingest shape): labels from the even-doc
    // edge batch fold in the odd-doc batch — fresh nodes, merges, and
    // fresh-side relabels all exercised — and must equal the full
    // recompute over the accumulated edges, which the oracle replays as
    // a recursive transitive closure (the q49 pattern).
    "q147_dedup_components_incr" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val b1 = d.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") % 89).as("id_a"),
          ((col("doc_id") * 3 + 1) % 89).as("id_b"))
      val b2 = d.filter(col("doc_id") % 2 === 1)
        .select(((col("doc_id") * 5) % 141).as("id_a"),
          ((col("doc_id") * 7 + 4) % 141).as("id_b"))
      ext.Dedup.connectedComponentsIncremental(
          ext.Dedup.connectedComponents(b1), b2)
        .withColumnRenamed("comp", "component")
        .orderBy("id")
    }),

    // ext web — canonical-URL dedup (the recrawl collapse): scheme case,
    // host case, default port, tracking params, and fragments all vary
    // across members of a group, every member canonicalizes to the same
    // url, and only the min-id member survives.
    "q143_url_dedup" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val scheme = when(col("doc_id") % 2 === 0, "HTTPS://")
        .otherwise("https://")
      val host = when(col("doc_id") % 2 === 0, "WWW.Example.COM")
        .otherwise("www.EXAMPLE.com")
      val port = when(col("doc_id") % 2 === 0, ":443").otherwise("")
      val query = when(col("doc_id") % 3 === 0, "?utm_source=x")
        .when(col("doc_id") % 3 === 1, "?gclid=1&utm_medium=y")
        .otherwise("")
      val frag = when(col("doc_id") % 2 === 0, "#top").otherwise(lit(""))
      val url = concat(scheme, host, port, lit("/page/"),
        (col("doc_id") % 50).cast("string"), query, frag)
      ext.WebUrl.dedupByCanonicalUrl(
          d.select(col("doc_id"), url.as("url")), "url", "doc_id")
        .select("doc_id", "url_canon")
        .orderBy("doc_id")
    }),

    // ext multimodal dedup — image near-duplicate pairs: groups of 8
    // consecutive doc_ids share one textured base image, each member
    // perturbed at a different single pixel (≤2 dHash bits per member,
    // so intra-group hamming ≤4); pairing is the pigeonhole band join
    // over the 8-byte hashes — pixels never shuffle — which is LOSSLESS
    // at distance ≤ 6, so the oracle is the plain all-pairs filter.
    "q175_image_neardup" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val assets = tbl(s, dir, "documents").select(col("doc_id")).as[Long]
        .map { id =>
          val p = (id % 8).toInt
          ext.Multimodal.Asset(id, "image",
            ext.Multimodal.makeBmpTextured(id / 8, 18, 16,
              flip = Some((p * 2, p))))
        }
      val hashes = ext.Multimodal.imageHashes(assets).toDF()
        .select(col("asset_id").as("doc_id"), col("dhash"))
      ext.Dedup.hammingPairs(hashes, "doc_id", "dhash", maxDistance = 6)
        .orderBy("id_a", "id_b")
    }),

    // ext capstone — CROSS-MODAL dedup: text-duplicate edges (exact
    // digest groups over docs + planted %9 text copies at id+20000) and
    // image near-dup edges (the q175 perceptual-hash bands) union into
    // ONE graph, and connected components labels the multimodal
    // clusters — a text copy and an image variant of the same page land
    // in the same cluster even though no single modality links them.
    // The oracle chains digest equality, the closed-form dHash pairs,
    // and a recursive-CTE reachability (the q49 pattern).
    "q204_multimodal_dedup" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val all = d.select(col("doc_id"), col("text"))
        .union(d.filter(col("doc_id") % 9 === 0)
          .select((col("doc_id") + 20000).as("doc_id"), col("text")))
      // text edges: member → keep of each exact digest group
      val groups = ext.Dedup.exactGroups(all, "doc_id", "text")
      val textEdges = all.select(col("doc_id"), md5(col("text")).as("digest"))
        .join(groups.filter(col("n_copies") > 1), Seq("digest"))
        .filter(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id").as("id_a"), col("keep_id").as("id_b"))
      // image edges: q175's grouped textured images, banded hamming ≤ 6
      val assets = d.select(col("doc_id")).as[Long].map { id =>
        val p = (id % 8).toInt
        ext.Multimodal.Asset(id, "image",
          ext.Multimodal.makeBmpTextured(id / 8, 18, 16,
            flip = Some((p * 2, p))))
      }
      val imgEdges = ext.Dedup.hammingPairs(
          ext.Multimodal.imageHashes(assets).toDF()
            .select(col("asset_id").as("doc_id"), col("dhash")),
          "doc_id", "dhash", maxDistance = 6)
        .select("id_a", "id_b")
      ext.Dedup.connectedComponents(textEdges.union(imgEdges))
        .select(col("id").as("doc_id"), col("comp").as("cluster"))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // SimHash replay (q23): per token the first 16 md5 hex chars are
    // the 64-bit hash (ascii-fold digit decode — bit i lives in hex
    // char 16 − i//4 at in-digit position i%4); per (doc, bit) the ±1
    // sum's sign builds the sketch; the four 16-bit band values pivot
    // out as integers and the hamming<=3 pair set is brute-forced
    // all-pairs (the engine's banding is lossless, so identical).
    "q23_dedup_simhash" ->
      s"""WITH base AS (SELECT doc_id, text FROM documents),
         |uni AS (
         |  SELECT doc_id, text FROM base
         |  UNION ALL
         |  SELECT doc_id + 10000 AS doc_id, text FROM base
         |  WHERE doc_id % 11 = 0),
         |tok AS (
         |  SELECT d.doc_id, md5(u.tk) AS hx
         |  FROM (SELECT doc_id,
         |          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
         |        FROM uni WHERE text IS NOT NULL) d,
         |    unnest(string_split(d.t, ' ')) AS u(tk)),
         |bits AS (
         |  SELECT doc_id, v.i,
         |    CASE WHEN sum(
         |      ((CASE WHEN ascii(substr(hx, CAST(16 - v.i // 4 AS INT), 1)) >= 97
         |             THEN ascii(substr(hx, CAST(16 - v.i // 4 AS INT), 1)) - 87
         |             ELSE ascii(substr(hx, CAST(16 - v.i // 4 AS INT), 1)) - 48 END
         |        >> CAST(v.i % 4 AS INT)) & 1) * 2 - 1) > 0
         |      THEN 1 ELSE 0 END AS bit
         |  FROM tok
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) v
         |  GROUP BY 1, 2),
         |sk AS (
         |  SELECT doc_id,
         |    CAST(sum(CASE WHEN i // 16 = 0
         |      THEN bit * (1 << CAST(i % 16 AS INT)) ELSE 0 END) AS BIGINT) AS b0,
         |    CAST(sum(CASE WHEN i // 16 = 1
         |      THEN bit * (1 << CAST(i % 16 AS INT)) ELSE 0 END) AS BIGINT) AS b1,
         |    CAST(sum(CASE WHEN i // 16 = 2
         |      THEN bit * (1 << CAST(i % 16 AS INT)) ELSE 0 END) AS BIGINT) AS b2,
         |    CAST(sum(CASE WHEN i // 16 = 3
         |      THEN bit * (1 << CAST(i % 16 AS INT)) ELSE 0 END) AS BIGINT) AS b3
         |  FROM bits GROUP BY 1),
         |pr AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
         |         bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
         |      AS INT) AS hamming
         |  FROM sk a JOIN sk b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, hamming FROM pr
         |WHERE hamming <= 3 ORDER BY 1, 2""".stripMargin,

    // max cosine over the benchmark slice per corpus row, then the
    // strict < tau survivor filter — same index-order double arithmetic
    // as the kernel (the q14/q15 list_sum equivalence)
    "q123_semantic_decontam" ->
      """WITH refs AS (SELECT embedding FROM embeddings WHERE vec_id % 23 = 0),
        |sc AS (
        |  SELECT e.vec_id,
        |    max(list_sum(list_transform(list_zip(e.embedding, r.embedding),
        |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(r.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) AS max_ref_cosine
        |  FROM embeddings e CROSS JOIN refs r
        |  GROUP BY e.vec_id)
        |SELECT vec_id, max_ref_cosine FROM sc
        |WHERE max_ref_cosine < 0.92 ORDER BY vec_id""".stripMargin,

    // q110's machinery on the batch third, plus an anti-join against the
    // corpus thirds' distinct normalized paragraphs
    "q117_paragraph_dedup_incr" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    concat(
        |      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |      chr(10), 'Subscribe to our newsletter!', chr(10),
        |      array_to_string(list_slice(string_split(text, ' '), 9, 16), ' ')) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |cn AS (
        |  SELECT DISTINCT
        |    trim(regexp_replace(lower(para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT unnest(string_split(text, chr(10))) AS para
        |        FROM raw WHERE doc_id % 3 <> 0)
        |  WHERE trim(regexp_replace(lower(para), '\s+', ' ', 'g')) <> ''),
        |sp AS (SELECT doc_id, string_split(text, chr(10)) AS t
        |       FROM raw WHERE doc_id % 3 = 0),
        |p AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u
        |        FROM sp)),
        |k AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p)
        |SELECT k.doc_id,
        |  string_agg(k.para, chr(10) ORDER BY k.idx) AS clean_text,
        |  CAST(len(any_value(sp.t)) AS BIGINT) AS n_paras,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM k JOIN sp ON k.doc_id = sp.doc_id
        |WHERE k.rk = 1
        |  AND (k.norm = '' OR k.norm NOT IN (SELECT norm FROM cn))
        |GROUP BY k.doc_id
        |ORDER BY k.doc_id""".stripMargin,

    // split on newline (trailing empties kept by both engines),
    // normalize lower/collapse-ws/trim, first occurrence = min (doc_id,
    // idx) via row_number, empty-norm paragraphs always kept, reassemble
    // with string_agg ORDER BY idx
    "q110_paragraph_dedup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    concat(
        |      array_to_string(list_slice(string_split(text, ' '), 1, 8), ' '),
        |      chr(10), 'Subscribe to our newsletter!', chr(10),
        |      array_to_string(list_slice(string_split(text, ' '), 9, 16), ' ')) AS text
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |sp AS (SELECT doc_id, string_split(text, chr(10)) AS t FROM base),
        |p AS (
        |  SELECT doc_id, u.idx AS idx, u.para AS para,
        |    trim(regexp_replace(lower(u.para), '\s+', ' ', 'g')) AS norm
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)),
        |          i -> {'idx': i - 1, 'para': t[i]})) AS u
        |        FROM sp)),
        |k AS (
        |  SELECT doc_id, idx, para, norm,
        |    CASE WHEN norm = '' THEN 1
        |      ELSE row_number() OVER (PARTITION BY norm ORDER BY doc_id, idx)
        |    END AS rk
        |  FROM p)
        |SELECT k.doc_id,
        |  string_agg(k.para, chr(10) ORDER BY k.idx) AS clean_text,
        |  CAST(len(any_value(sp.t)) AS BIGINT) AS n_paras,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM k JOIN sp ON k.doc_id = sp.doc_id
        |WHERE k.rk = 1
        |GROUP BY k.doc_id
        |ORDER BY k.doc_id""".stripMargin,

    // duplicated 5-token windows across documents -> per-doc postings ->
    // gaps-and-islands interval merge, mirroring Dedup.duplicateSpans
    "q97_duplicate_spans" ->
      """WITH t0 AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, u.pos AS pos, u.gram AS gram FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, len(t) - 4),
        |      i -> {'pos': i - 1,
        |            'gram': array_to_string(list_slice(t, i, i + 4), ' ')})) AS u
        |    FROM t0 WHERE len(t) >= 5)),
        |dup AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |hits AS (
        |  SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
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
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl
        |GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // batch windows probed against corpus grams; corpus grams mirror the
    // WordNgrams kernel (short docs emit the whole text — harmless here,
    // a <k-token gram can never equal a k-token batch window)
    "q98_span_decontaminate" ->
      """WITH batch AS (
        |  SELECT doc_id + 70000 AS doc_id,
        |    concat(array_to_string(list_slice(string_split(text, ' '), 1, 12), ' '),
        |           ' uniq', CAST(doc_id AS VARCHAR)) AS text
        |  FROM documents WHERE doc_id % 9 = 0),
        |bt AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        |  FROM batch),
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
        |        FROM documents)),
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
        |SELECT doc_id,
        |  CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(pos) + 4 AS BIGINT) AS span_end,
        |  CAST(count(*) AS BIGINT) AS n_grams
        |FROM isl
        |GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,

    // Incremental-dedup semantics in exact-Jaccard form: corpus ids < 400,
    // new ids >= 400; a new row is dropped on a match to any corpus row or
    // to a smaller-id new row.
    "q56_dedup_incremental" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents
         |  WHERE doc_id < 400 AND doc_id % 7 = 0
         |  UNION ALL
         |  SELECT doc_id + 20000, text FROM documents
         |  WHERE doc_id >= 400 AND doc_id % 5 = 0),
         |$ShingleCte,
         |drops AS (
         |  SELECT DISTINCT n.doc_id
         |  FROM sh n JOIN sh o
         |    ON ((o.doc_id < 400 AND n.doc_id >= 400)
         |        OR (o.doc_id >= 400 AND n.doc_id >= 400 AND o.doc_id < n.doc_id))
         |  WHERE CAST(len(list_intersect(n.s, o.s)) AS DOUBLE)
         |      / CAST(len(n.s) + len(o.s) - len(list_intersect(n.s, o.s)) AS DOUBLE) >= 0.8)
         |SELECT doc_id FROM sh
         |WHERE doc_id >= 400 AND doc_id NOT IN (SELECT doc_id FROM drops)
         |ORDER BY doc_id""".stripMargin,

    "q12_dedup_exact" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 5 = 0)
        |SELECT md5(text) AS digest,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keep_id
        |FROM all_docs
        |GROUP BY 1""".stripMargin,

    "q13_dedup_minhash" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8""".stripMargin,

    "q14_dedup_embedding" ->
      """WITH all_v AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, list_transform(embedding, x -> CAST(x * 2.0 AS FLOAT))
        |  FROM embeddings WHERE vec_id % 9 = 0),
        |scored AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM all_v a JOIN all_v b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b FROM scored WHERE cosine >= 0.9""".stripMargin,

    "q49_dedup_components" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |e AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
         |SELECT x AS doc_id, min(y) AS component
         |FROM r
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    // exact algorithm on both sides: same pair set by construction (the
    // size-band blocking has zero false negatives, so no LSH-recall caveat)
    "q59_dedup_ngram_jaccard" ->
      s"""WITH all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 20000, text || ' zzz end' FROM documents WHERE doc_id % 11 = 0),
         |$ShingleCte
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8""".stripMargin,

    // mirrors TextStats.fingerprint = md5 ∘ Dedup.canonicalize
    "q60_fingerprint" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 30000, '  ' || regexp_replace(text, ' ', '  ', 'g')
        |  FROM documents WHERE doc_id % 13 = 0),
        |fps AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM all_docs)
        |SELECT doc_id, fp,
        |  CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS n_same
        |FROM fps
        |ORDER BY doc_id""".stripMargin,

    "q70_dedup_survivors" ->
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 10000, text || ' zzz end' FROM documents WHERE doc_id % 7 = 0),
         |$ShingleCte,
         |e AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         |      / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.8),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a),
         |comp AS (SELECT x AS doc_id, min(y) AS component FROM r GROUP BY 1),
         |j AS (
         |  SELECT c.component, c.doc_id, CAST(length(d.text) AS BIGINT) AS len
         |  FROM comp c JOIN all_docs d USING (doc_id))
         |SELECT component, doc_id AS survivor_id, n_members, max_len FROM (
         |  SELECT component, doc_id, len,
         |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members,
         |    max(len) OVER (PARTITION BY component) AS max_len,
         |    row_number() OVER (PARTITION BY component ORDER BY len DESC, doc_id) AS rn
         |  FROM j) WHERE rn = 1
         |ORDER BY component""".stripMargin,

    "q82_decontaminate" -> {
      // distinct word-3-gram postings of a (doc_id, text) source — the
      // ShingleCte formula, parameterized by source and output id name
      def grams(src: String, outId: String) =
        s"""SELECT doc_id AS $outId, unnest(s) AS gram FROM (
           |    SELECT doc_id, list_distinct(list_transform(
           |      generate_series(1, greatest(len(t) - 2, 1)),
           |      i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
           |    FROM (SELECT doc_id,
           |            string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
           |          FROM $src))""".stripMargin
      s"""WITH bench AS (
         |  SELECT doc_id + 50000 AS doc_id,
         |    array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS text
         |  FROM documents WHERE doc_id % 11 = 0),
         |cg AS (${grams("documents", "corpus_id")}),
         |tg AS (${grams("bench", "test_id")})
         |SELECT cg.corpus_id AS doc_id,
         |  CAST(count(DISTINCT cg.gram) AS BIGINT) AS n_shared_grams,
         |  CAST(count(DISTINCT tg.test_id) AS BIGINT) AS n_test_docs
         |FROM cg JOIN tg ON tg.gram = cg.gram
         |GROUP BY 1 HAVING count(DISTINCT cg.gram) >= 2
         |ORDER BY 1""".stripMargin
    },

    // recursive transitive closure over BOTH edge batches (q49's form):
    // the incremental fold must match the accumulated fixpoint
    "q147_dedup_components_incr" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id % 89 AS a, (doc_id * 3 + 1) % 89 AS b
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 2 = 0
        |  UNION ALL
        |  SELECT (doc_id * 5) % 141, (doc_id * 7 + 4) % 141
        |  FROM documents WHERE doc_id IS NOT NULL AND doc_id % 2 = 1),
        |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        |nodes AS (SELECT DISTINCT a AS id FROM sym),
        |r(x, y) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
        |SELECT x AS id, min(y) AS component
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // replays canonicalization with q122's regex pipeline, then keeps
    // the min-id member of each canonical group
    "q143_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN 'WWW.Example.COM' ELSE 'www.EXAMPLE.com' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END) ||
        |    '/page/' || CAST(doc_id % 50 AS VARCHAR) ||
        |    (CASE doc_id % 3 WHEN 0 THEN '?utm_source=x'
        |      WHEN 1 THEN '?gclid=1&utm_medium=y' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '#top' ELSE '' END) AS url
        |  FROM documents WHERE doc_id IS NOT NULL),
        |p AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '') AS hostport,
        |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        |    regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS query
        |  FROM u),
        |q AS (
        |  SELECT doc_id, scheme,
        |    lower(regexp_replace(hostport, ':[0-9]*$', '')) AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port, path,
        |    list_sort(list_filter(string_split(query, '&'),
        |      x -> NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid)(=|$)') AND x <> '')) AS params
        |  FROM p),
        |c AS (
        |  SELECT doc_id,
        |    scheme || '://' || host ||
        |    (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |       OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
        |    (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) AS url_canon
        |  FROM q),
        |m AS (SELECT url_canon, min(doc_id) AS doc_id FROM c GROUP BY 1)
        |SELECT c.doc_id, c.url_canon FROM c JOIN m USING (url_canon, doc_id)
        |ORDER BY c.doc_id""".stripMargin,

    // banded-pairing is lossless at hamming ≤ 6 (7 bands, pigeonhole),
    // so the oracle is the straight all-pairs hamming filter over the
    // closed-form dHashes of the grouped+perturbed images
    "q175_image_neardup" ->
      s"""WITH ${imageHashCtes(
            "((d.doc_id // 8) * 31 + u.x * u.x" +
            " + (3 + (d.doc_id // 8) % 5) * u.x * v.y" +
            " + (7 + (d.doc_id // 8) % 11) * v.y" +
            " + CASE WHEN u.x = 2 * (d.doc_id % 8) AND v.y = d.doc_id % 8" +
            " THEN 96 ELSE 0 END) % 256")},
         |hh AS (
         |  SELECT doc_id, ${hugeToLong("h")} AS dhash FROM dh)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
         |FROM hh a JOIN hh b ON b.doc_id > a.doc_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         |ORDER BY id_a, id_b""".stripMargin,

    // chained: digest-group text edges + the q175 closed-form image
    // pairs, then min-label reachability (the q49 recursive pattern)
    "q204_multimodal_dedup" -> {
      s"""WITH RECURSIVE all_docs AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id + 20000, text FROM documents
         |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id % 9 = 0),
         |g AS (
         |  SELECT md5(text) AS dg, min(doc_id) AS k, count(*) AS n
         |  FROM all_docs GROUP BY 1),
         |te AS (
         |  SELECT a.doc_id AS a, g.k AS b
         |  FROM all_docs a JOIN g ON md5(a.text) = g.dg
         |  WHERE g.n > 1 AND a.doc_id <> g.k),
         |${imageHashCtes(
            "((d.doc_id // 8) * 31 + u.x * u.x" +
            " + (3 + (d.doc_id // 8) % 5) * u.x * v.y" +
            " + (7 + (d.doc_id // 8) % 11) * v.y" +
            " + CASE WHEN u.x = 2 * (d.doc_id % 8) AND v.y = d.doc_id % 8" +
            " THEN 96 ELSE 0 END) % 256")},
         |hh AS (
         |  SELECT doc_id, ${hugeToLong("h")} AS dhash FROM dh),
         |ie AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b
         |  FROM hh a JOIN hh b ON b.doc_id > a.doc_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6),
         |e AS (SELECT a, b FROM te UNION SELECT a, b FROM ie),
         |sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |nodes AS (SELECT DISTINCT a AS id FROM sym),
         |r(x, y) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT r.x, s.b FROM r JOIN sym s ON r.y = s.a)
         |SELECT x AS doc_id, min(y) AS cluster
         |FROM r
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    },
  )
}
