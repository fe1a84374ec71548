package graft
package gates

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._

/** Gate registry — web/link-graph family: URL handling, robots, crawl planning, PageRank/HITS and friends, HTML link extraction.
  * Entries are verbatim from the pre-split SparkEntry.scala
  * (round-11 refactor; zero behavior change).
  */
private[graft] object WebGraphGates extends GateFamily {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ext web — URL canonicalization + registrable domain (the keying
    // stage of every per-domain cap / URL-dedup / domain-mixing pass):
    // urls synthesized deterministically from doc_id (uppercase schemes
    // and hosts, default and non-default ports, tracking params,
    // fragments, a co.uk host, an IPv4 literal), then normalized; the
    // per-domain doc count is a partitioned window. Oracle replays the
    // synthesis AND the normalization.
    "q122_url_canonical" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val host = when(col("doc_id") % 5 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 5 === 1, "news.Example.co.uk")
        .when(col("doc_id") % 5 === 2, "Sub.Blog.example.ORG")
        .when(col("doc_id") % 5 === 3, "192.168.10.42")
        .otherwise("example.net")
      val scheme = when(col("doc_id") % 2 === 0, "HTTPS://")
        .otherwise("http://")
      val port = when(col("doc_id") % 4 === 0, ":443")
        .when(col("doc_id") % 4 === 1, ":8080").otherwise("")
      val query = when(col("doc_id") % 3 === 0, "?utm_source=tw&z=9&a=1")
        .when(col("doc_id") % 3 === 1, "?b=2&utm_medium=email")
        .otherwise("")
      val frag = when(col("doc_id") % 2 === 0, "#Sec2").otherwise(lit(""))
      val url = concat(scheme, host, port,
        lit("/Articles/"), col("doc_id").cast("string"), query, frag)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("reg_domain"))
      d.select(col("doc_id"),
          ext.WebUrl.canonicalizeUrl(url).as("url_canon"),
          ext.WebUrl.registrableDomain(ext.WebUrl.hostOf(url))
            .as("reg_domain"))
        .withColumn("domain_docs", count(lit(1)).over(w))
        .orderBy("doc_id")
    }),

    // ext text — HTML → visible text extraction (the pre-gate pass of a
    // crawl pipeline): documents wrapped in synthetic boilerplate (style
    // block, comment, script holding fake tags, double-encoded entities)
    // must strip back to deterministic text; md5 keeps the gate compact.
    "q85_html_strip" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>T</title><style type=\"text/css\">p { color: red; }</style></head><body><h1>Doc "),
        col("doc_id"),
        lit("</h1> <p>"), col("text"),
        lit("</p><!-- trailing comment --><script>var x = \"<p>not text</p>\";</script>" +
          "<div>tail &amp;amp; &lt;b&gt;bold&lt;/b&gt;&nbsp;end</div></body></html>"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), TextStats.stripHtml(html).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // ext graph — fixed-iteration PageRank (the crawl-quality prior) in
    // the integer-scaled engine-replayable form: two modular edge
    // families over a 101-node graph (varied in/out degrees, self-loop
    // collisions possible), 5 damped rounds, every float step a single
    // shared-literal multiply/divide + floor so the oracle replays the
    // fixed point as 5 chained CTEs. Edges partition once; only
    // (id, rank) frames move per round.
    "q131_pagerank" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 101).as("src"),
        ((col("doc_id") * 5 + 2) % 101).as("dst"))
      ext.LinkGraph.pageRank(e1.union(e2), iterations = 5)
        .withColumnRenamed("rank", "rank_e12")
        .orderBy("id")
    }),

    // ext graph — PageRank with the textbook dangling-mass term: sources
    // draw from mod 89 but destinations from mod 101, so nodes 89..100
    // appear only as sinks — their rank mass must be re-spread each round
    // (one scalar aggregate), not silently lost. Same integer-exact
    // replay contract as q131; the oracle adds one share CTE per round.
    "q132_pagerank_dangling" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 89).as("src"),
        ((col("doc_id") * 7 + 5) % 101).as("dst"))
      ext.LinkGraph.pageRank(e1.union(e2), iterations = 5,
          redistributeDangling = true)
        .withColumnRenamed("rank", "rank_e12")
        .orderBy("id")
    }),

    // ext graph — personalized PageRank: teleport mass lands per an
    // integer prior ((id²+3) mod 11 · 1e5 — several nodes get EXACTLY 0
    // and must end with rank 0 unless linked-to), dangling mass re-spread
    // per the same prior. e6-scaled normalization and 4 damped rounds
    // replay as chained CTEs with one dangling-scalar CTE per round.
    "q133_personalized_pagerank" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 89).as("src"),
        ((col("doc_id") * 7 + 5) % 101).as("dst"))
      val edges = e1.union(e2)
      val nodes = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id"))).distinct()
      val prior = nodes.select(col("id"),
        (((col("id") * col("id") + 3) % 11) * lit(100000L)).as("weight"))
      ext.LinkGraph.personalizedPageRank(edges, prior, iterations = 4)
        .withColumnRenamed("rank", "rank_e12")
        .orderBy("id")
    }),

    // ext web — crawl blocklist audit: registrable-domain exact matches
    // (subdomains caught via the reg-domain key) + path/query literal
    // substrings through ONE Aho–Corasick DFA pass; flags not filters.
    "q139_url_blocklist" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val host = when(col("doc_id") % 5 === 0, "WWW.Example.COM")
        .when(col("doc_id") % 5 === 1, "ads.tracker-hub.net")
        .when(col("doc_id") % 5 === 2, "Sub.Blog.example.ORG")
        .when(col("doc_id") % 5 === 3, "192.168.10.42")
        .otherwise("example.net")
      val path = when(col("doc_id") % 7 === 0,
        concat(lit("/ads/banner"), col("doc_id").cast("string")))
        .otherwise(concat(lit("/Articles/"), col("doc_id").cast("string")))
      val query = when(col("doc_id") % 11 === 3, lit("?ref=CASINO"))
        .otherwise(lit(""))
      val url = concat(lit("https://"), host, path, query)
      ext.WebUrl.withBlocklist(d.select(col("doc_id"), url.as("url")),
          "url", Seq("tracker-hub.net", "192.168.10.42"),
          Seq("/ads/", "casino"))
        .select("doc_id", "url", "reg_domain", "domain_blocked",
          "n_blocked_hits", "keep_url")
        .orderBy("doc_id")
    }),

    // ext web+graph — the crawl-frontier prior END-TO-END (the q95
    // composition pattern): per-domain quality roll-up (q130's operator)
    // feeds personalized PageRank (q133's) over the domain link graph, so
    // a domain's authority is teleport-biased by its content quality —
    // the score a frontier scheduler would sort on. 37 synthetic
    // registrable domains keyed by doc_id mod 37; link u→v when a doc of
    // domain u references domain (7u+3 style). Oracle chains the q130
    // aggregate into the q133 round CTEs.
    "q134_crawl_prior" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val url = concat(lit("https://www.site"),
        (col("doc_id") % 37).cast("string"),
        lit(".com/a/"), col("doc_id").cast("string"))
      val scored = d.select(col("doc_id"),
        (col("doc_id") % 37).as("domain_id"), url.as("url"),
        floor(ext.TextStats.qualityScore(col("text")) * lit(1e6))
          .cast("long").as("q_e6"))
      val dq = ext.WebUrl.withDomainQuality(scored, "url", "q_e6")
      // one row per domain: reg_domain ↔ domain_id is 1:1 by construction
      val domains = dq.select(col("domain_id"), col("reg_domain"),
        col("domain_mean_scaled")).distinct()
      val prior = domains.select(col("domain_id").as("id"),
        col("domain_mean_scaled").as("weight"))
      val edges = d.select((col("doc_id") % 37).as("src"),
        ((col("doc_id") * 7 + 3) % 37).as("dst"))
      ext.LinkGraph.personalizedPageRank(edges, prior, iterations = 4)
        .join(domains, col("id") === domains("domain_id"))
        .select(col("domain_id"), col("reg_domain"),
          col("domain_mean_scaled").as("quality_e6"),
          col("rank").as("rank_e12"))
        .orderBy("domain_id")
    }),

    // ext graph — fixed-iteration HITS over the q131 edge families:
    // hubs (pages worth crawling FROM) and authorities (pages worth
    // keeping), e6-scaled L1-normalized integer iterates, one driver
    // scalar per half-round. The oracle replays the 3 rounds as chained
    // CTEs with a scalar divisor CTE per normalization.
    "q149_hits" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 101).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 101).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 101).as("src"),
        ((col("doc_id") * 5 + 2) % 101).as("dst"))
      ext.LinkGraph.hits(e1.union(e2), iterations = 3)
        .orderBy("id")
    }),

    // ext graph — co-citation pair counts (text-free related-page
    // signal): 23 citers with out-degree ≤ 3 BY CONSTRUCTION (each dst
    // is a function of the citer value, so degrees don't grow with the
    // corpus), plus one link-farm hub citing doc_id % 47 — always past
    // the out-degree cap at every sf, so the farm cut is exercised and
    // its pairs must NOT appear. Pairs emit inside the citer's task
    // from the capped out-list — no edge-table self-join.
    "q150_cocitation" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val src = col("doc_id") % 23
      val e1 = d.select(src.as("src"), ((src % 5) * 3).as("dst"))
      val e2 = d.select(src.as("src"), ((src % 7) * 2 + 1).as("dst"))
      val e3 = d.select(src.as("src"), ((src % 4) * 5 + 2).as("dst"))
      val hub = d.select(lit(999L).as("src"), (col("doc_id") % 47).as("dst"))
      ext.LinkGraph.cocitation(e1.union(e2).union(e3).union(hub),
          maxOutDeg = 12, minCocitations = 2L)
        .orderBy("id_a", "id_b")
    }),

    // ext web — robots.txt longest-match evaluation (RFC 9309 / Google
    // semantics: longest matching prefix wins, Allow wins length ties,
    // no match = allowed): 7 synthetic domains × 11 rule shapes incl. a
    // deliberate same-length Allow/Disallow tie on /p0 and deeper
    // overrides both ways. The engine extracts host+path from the URL
    // string; the verdict is ONE integer max (2·len + allow), no window.
    "q151_robots" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val urls = d.select(col("doc_id"),
        concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 3).cast("string")).as("url"))
      val rules = d.select(
        concat(lit("d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("domain"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
          | WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
          | WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
          | WHEN 9 THEN '/p4/x1' ELSE '/p0' END""".stripMargin)
          .as("rule_path"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
          | WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN false
          | WHEN 6 THEN true WHEN 7 THEN true WHEN 8 THEN false
          | WHEN 9 THEN true ELSE true END""".stripMargin).as("allow"))
        .distinct()
      ext.WebUrl.robotsEvaluate(urls, "doc_id", "url", rules)
        .orderBy("doc_id")
    }),

    // ext graph+text — anchor-text aggregation: each document "links"
    // to target (doc_id·7+3) mod 37 with its first two words as anchor;
    // the top-3 terms per target (count DESC, term ASC) are the
    // off-page topic labels. Counts collapse before the rank window
    // ever sorts anything.
    "q158_anchor_text" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val anchors = d.select(((col("doc_id") * 7 + 3) % 37).as("dst"),
        array_join(slice(split(col("text"), " "), 1, 2), " ")
          .as("anchor_text"))
      ext.LinkGraph.anchorTopTerms(anchors, "dst", "anchor_text", k = 3)
        .orderBy("dst", "rank")
    }),

    // ext graph — semi-supervised LABEL PROPAGATION: sparse seed labels
    // (every 7th node of the 89-node symmetric graph) spread by
    // clamped-seed majority vote with the min-label tiebreak; 3 fixed
    // rounds replay as chained CTEs (votes → majority → fold). Nodes no
    // labeled neighbor has reached stay null.
    "q159_label_prop" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e0 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * 3 + 1) % 89).as("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = d.select((col("doc_id") % 89).as("id"))
        .filter(col("id") % 7 === 0).distinct()
        .select(col("id"), (expr("id div 7") % 3).as("label"))
      ext.LinkGraph.labelPropagation(edges, seeds, iterations = 3)
        .orderBy("id")
    }),

    // CAPSTONE — crawl-frontier gate: the 37-domain link graph's
    // PageRank (q131 machinery) joined onto per-URL robots verdicts
    // (q151 machinery) — the two signals a frontier scheduler combines:
    // is this URL crawlABLE, and how authoritative is its domain. Only
    // allowed URLs survive, carrying their domain rank.
    "q163_frontier_score" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val edges = d.select((col("doc_id") % 37).as("src"),
        ((col("doc_id") * 7 + 3) % 37).as("dst"))
      val ranks = ext.LinkGraph.pageRank(edges, iterations = 5)
      val urls = d.select(col("doc_id"), (col("doc_id") % 37).as("domain_id"),
        concat(lit("https://www.site"), (col("doc_id") % 37).cast("string"),
          lit(".com/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 3).cast("string")).as("url"))
      val rules = d.select(
        concat(lit("www.site"), (col("doc_id") % 37).cast("string"),
          lit(".com")).as("domain"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
          | WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
          | WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
          | WHEN 9 THEN '/p4/x1' ELSE '/p0' END""".stripMargin)
          .as("rule_path"),
        expr("""CASE doc_id % 11
          | WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
          | WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN false
          | WHEN 6 THEN true WHEN 7 THEN true WHEN 8 THEN false
          | WHEN 9 THEN true ELSE true END""".stripMargin).as("allow"))
        .distinct()
      ext.WebUrl.robotsEvaluate(urls.select("doc_id", "url"),
          "doc_id", "url", rules)
        .filter(col("allowed"))
        .join(urls.select("doc_id", "domain_id"), Seq("doc_id"))
        .join(ranks.withColumnRenamed("id", "domain_id"), Seq("domain_id"))
        .select(col("doc_id"), col("url"),
          col("rank").as("domain_rank_e12"))
        .orderBy("doc_id")
    }),

    // ext graph — multi-source BFS crawl depth: seeds are the ids ≡ 0
    // mod 10 of the 89-node graph, 4 hop-budget rounds (Bellman-Ford
    // shape, min-aggregate per round); nodes no seed reaches within the
    // budget stay null. Exact small integers replay as chained CTEs.
    "q164_hop_distance" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 89).as("src"),
        ((col("doc_id") * 3 + 1) % 89).as("dst"))
      val e2 = d.select(((col("doc_id") * 5) % 89).as("src"),
        ((col("doc_id") * 7 + 4) % 89).as("dst"))
      val edges = e1.union(e2)
      val seeds = edges.select(col("src").as("id"))
        .union(edges.select(col("dst").as("id")))
        .distinct().filter(col("id") % 10 === 0)
      ext.LinkGraph.hopDistance(edges, seeds, maxHops = 4)
        .orderBy("id")
    }),

    // ext graph — triangle enumeration on a ring-with-chords graph (40
    // guaranteed triangles {i, i+1, i+2}) plus a constant-apex fan that
    // pushes node 0's oriented degree past the cap: its 3 triangles
    // must vanish, the other 37 must survive — the link-farm cut,
    // replayed by the oracle's identical cap logic.
    "q165_triangles" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val i = col("doc_id") % 40
      val ring = d.select(i.as("src"), ((i + 1) % 40).as("dst"))
      val chords = d.select(i.as("src"), ((i + 2) % 40).as("dst"))
      val fan = d.select(lit(0L).as("src"),
        (col("doc_id") % 27 + 14).as("dst"))
      ext.LinkGraph.triangles(ring.union(chords).union(fan), maxDeg = 12)
        .orderBy("id_a", "id_b", "id_c")
    }),

    // ext graph — reciprocal-link detection (the mutual-citation /
    // link-scheme signal): ordered pairs where BOTH directions exist,
    // found by one self-equi-join on the oriented key — no cross join.
    "q168_reciprocal_links" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e = d.select((col("doc_id") % 61).as("src"),
          ((col("doc_id") * 3 + 2) % 61).as("dst"))
        .union(d.select(((col("doc_id") * 5 + 1) % 61).as("src"),
          ((col("doc_id") * 2) % 61).as("dst")))
        .union(d.filter(col("doc_id") % 4 === 0)
          .select(((col("doc_id") * 7) % 61).as("src"),
            ((col("doc_id") * 11 + 3) % 61).as("dst")))
        .union(d.filter(col("doc_id") % 4 === 0)
          .select(((col("doc_id") * 11 + 3) % 61).as("src"),
            ((col("doc_id") * 7) % 61).as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
      e.join(e.select(col("dst").as("src"), col("src").as("dst")),
          Seq("src", "dst"), "left_semi")
        .filter(col("src") < col("dst"))
        .select(col("src").as("id_a"), col("dst").as("id_b"))
        .orderBy("id_a", "id_b")
    }),

    // ext crawl — sitemap XML entry extraction: per-doc synthetic flat
    // sitemaps (entries with/without optionals, one loc-less block that
    // must be dropped, an even-id extra entry), exploded to one row per
    // <url> via regexp_extract_all inside codegen. The oracle re-parses
    // the identically-synthesized XML with DuckDB's RE2.
    "q180_sitemap" -> ((s, dir) => {
      val id = col("doc_id")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset>"),
        lit("<url><loc>https://d"), (id % 7).cast("string"),
        lit(".example.com/p"), (id % 5).cast("string"),
        lit("</loc><lastmod>2024-01-0"), ((id % 9) + 1).cast("string"),
        lit("</lastmod><priority>0."), (id % 10).cast("string"),
        lit("</priority></url>"),
        lit("<url><loc> https://m"), (id % 3).cast("string"),
        lit(".example.com/ </loc></url>"),
        lit("<url><lastmod>2024-02-01</lastmod></url>"),
        when(id % 2 === 0, lit("<url><loc>https://x.example.com/q</loc>" +
          "<priority>1.0</priority></url>")).otherwise(lit("")),
        lit("</urlset>"))
      val maps = tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, xml.as("xml"))
      ext.WebUrl.parseSitemap(maps, "doc_id", "xml")
        .orderBy("doc_id", "entry_index")
    }),

    // ext graph — k-core peeling (k=5, 4 fixed rounds): a mod-61
    // quasi-random periphery (avg degree ~4, melts under k=5 over a
    // genuine multi-round cascade) plus a planted 13-clique (the
    // independent-residue pair (id%13, (id//13)%13) covers all 78
    // edges) that survives as the core. Per round one degree aggregate
    // + two semi-joins over edges that only shrink, lineage cut per
    // round; fixed-count rounds keep the gate SQL-unrollable, the
    // fixpoint property is spec-asserted.
    "q183_kcore" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val e1 = d.select((col("doc_id") % 61).as("src"),
        ((col("doc_id") * col("doc_id") + 1) % 61).as("dst"))
      val e2 = d.select(((col("doc_id") * 3) % 61).as("src"),
        ((col("doc_id") * 5 + 2) % 61).as("dst"))
      val e3 = d.select((col("doc_id") % 13).as("src"),
        (expr("doc_id div 13") % 13).as("dst"))
      ext.LinkGraph.kCore(e1.union(e2).union(e3), k = 5, rounds = 4)
        .orderBy("id")
    }),

    // ext crawl — per-host politeness schedule: rank within host in id
    // order × the host's crawl delay (policy-bounded window; see the
    // operator doc). Delays derive per-domain from the id so the oracle
    // replays the config join and the ranking.
    "q190_politeness" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val urls = d.select(col("doc_id"),
        concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 5).cast("string")).as("url"))
      val delays = d.select(
        concat(lit("d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("domain"),
        ((col("doc_id") % 7 + 1) * 250).as("delay_ms")).distinct()
      ext.WebUrl.politenessSchedule(urls, "doc_id", "url", delays)
        .orderBy("doc_id")
    }),

    // ext capstone — crawl-frontier INGEST: discovered sitemaps parse to
    // entries (q180 machinery), URLs canonical-dedup across discoverers
    // (q143 machinery: case/tracking-param variants collapse, min id
    // survives), and the surviving frontier schedules per host under
    // politeness delays (q190 machinery). Synthesized locs keep the
    // canonical forms closed-form, so the oracle chains id arithmetic
    // instead of re-parsing.
    "q192_frontier_ingest" -> ((s, dir) => {
      val id = col("doc_id")
      val locA = concat(
        when(id % 2 === 0, lit("HTTPS://D")).otherwise(lit("https://d")),
        (id % 7).cast("string"),
        when(id % 2 === 0, lit(".Example.COM/p")).otherwise(lit(".example.com/p")),
        (id % 5).cast("string"),
        when(id % 3 === 0, lit("?utm_source=x")).otherwise(lit("")))
      val locB = concat(lit("https://m"), (id % 3).cast("string"),
        lit(".example.com/q"), (id % 11).cast("string"))
      val xml = concat(lit("<urlset><url><loc>"), locA,
        lit("</loc></url><url><loc>"), locB, lit("</loc></url></urlset>"))
      val maps = tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, xml.as("xml"))
      val entries = ext.WebUrl.parseSitemap(maps, "doc_id", "xml")
        .select((col("doc_id") * 4 + col("entry_index")).as("url_id"),
          col("loc").as("url"))
      val deduped = ext.WebUrl.dedupByCanonicalUrl(entries, "url", "url_id")
      val d = tbl(s, dir, "documents").filter(id.isNotNull)
      val delays = d.select(
        concat(lit("d"), (id % 7).cast("string"),
          lit(".example.com")).as("domain"),
        ((id % 7 + 1) * 250).as("delay_ms")).distinct()
      ext.WebUrl.politenessSchedule(
          deduped.select(col("url_id"), col("url_canon")),
          "url_id", "url_canon", delays)
        .select(col("url_id"), col("host"), col("fetch_seq"),
          col("fetch_offset_ms"))
        .orderBy("url_id")
    }),

    // ext scheduling — exact largest-remainder budget apportionment:
    // 10007 fetches split across the 7 synthetic domains proportional
    // to their n_chars mass, summing to the budget EXACTLY (floors +
    // remainder to the largest fractional parts, ties to the smallest
    // domain). Decimal products, HUGEINT on the oracle side.
    "q203_crawl_budget" -> ((s, dir) => {
      val mass = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
        .groupBy(concat(lit("d"), (col("doc_id") % 7).cast("string"))
          .as("domain"))
        .agg(sum(col("n_chars")).as("mass"))
      ext.WebUrl.allocateBudget(mass, "domain", "mass", total = 10007L)
        .orderBy("domain")
    }),

    // ext crawl — robots.txt with the FULL RFC 9309 pattern grammar
    // ('*' wildcards, '$' end anchors): rules translate losslessly to
    // SQL LIKE (escape '#'), the verdict stays the single integer max
    // (longest pattern, allow wins ties). URLs carry .html suffixes so
    // anchors actually discriminate; the oracle replays the translation
    // and the LIKE matching.
    "q205_robots_wildcard" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val urls = d.select(col("doc_id"),
        concat(lit("https://d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com/p"), (col("doc_id") % 5).cast("string"),
          lit("/x"), (col("doc_id") % 3).cast("string"),
          when(col("doc_id") % 4 === 0, lit(".html")).otherwise(lit("")))
          .as("url"))
      val rules = d.select(
        concat(lit("d"), (col("doc_id") % 7).cast("string"),
          lit(".example.com")).as("domain"),
        expr("""CASE doc_id % 9
          | WHEN 0 THEN '/p0*' WHEN 1 THEN '/p1/*1' WHEN 2 THEN '/*.html$'
          | WHEN 3 THEN '/p2' WHEN 4 THEN '/p3/x*' WHEN 5 THEN '/p4*2$'
          | WHEN 6 THEN '/p0/x0$' WHEN 7 THEN '/*2.html$'
          | ELSE '/p1' END""".stripMargin).as("rule_path"),
        expr("""CASE doc_id % 9
          | WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
          | WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN true
          | WHEN 6 THEN true WHEN 7 THEN true ELSE false END""".stripMargin)
          .as("allow"))
        .distinct()
      ext.WebUrl.robotsEvaluateWildcard(urls, "doc_id", "url", rules)
        .orderBy("doc_id")
    }),

    // ext versioning — change magnitude over the q196 diff machinery:
    // the O(len²) edit distance runs ONLY on the changed ids (digest
    // pre-filter), distinguishing prefix stamps (%11: 8-char insert)
    // from character rewrites (%13: e→3 substitutions). The oracle
    // rebuilds both versions and applies DuckDB's identical levenshtein.
    "q206_change_magnitude" -> ((s, dir) => {
      val d = tbl(s, dir, "documents")
        .filter(col("doc_id").isNotNull && col("text").isNotNull)
      val prev = d.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), col("text"))
      val next = d.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0,
            concat(lit("edited: "), col("text")))
            .when(col("doc_id") % 13 === 0, translate(col("text"), "e", "3"))
            .otherwise(col("text")).as("text"))
      ext.Merge.changeMagnitude(prev, next, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ext profiling — burst/abuse signals per user: peak sliding-minute
    // event count (event-time RANGE window over epoch seconds), exact
    // e6 error ratio, and the combined suspect flag — the bot screen a
    // log pipeline runs before traffic numbers mean anything.
    "q208_burst_signals" -> ((s, dir) => {
      ext.Profile.burstSignals(tbl(s, dir, "events"),
          "user_id", "ts", "event_type", errorType = "error",
          windowSecs = 60, rateThreshold = 2L,
          errorRatioE6Threshold = 250000L)
        .orderBy("user_id")
    }),

    // ext crawl — anchor-link extraction from synthesized HTML (the
    // WARC-payload → LinkGraph-edge ingest step): quoting variants,
    // case-insensitive tags, a rel=nofollow link, an href-less anchor
    // that must NOT emit, and an entity in the anchor text. The oracle
    // re-parses the identically-synthesized HTML with DuckDB's RE2 and
    // replays the stripHtml chain on the anchor slice.
    "q211_html_links" -> ((s, dir) => {
      val id = col("doc_id")
      val html = concat(
        lit("<html><body><p>intro</p><a href=\"https://d"),
        (id % 7).cast("string"),
        lit(".example.com/p"), (id % 5).cast("string"),
        lit("\">Link <b>"), (id % 3).cast("string"), lit("</b> text</a>"),
        lit("<a class='x' rel='nofollow' href='/rel/"), (id % 4).cast("string"),
        lit("'>Rel &amp; anchor</a>"),
        when(id % 2 === 0, lit("<A HREF=\"../up/q.html\">Up</A>"))
          .otherwise(lit("")),
        lit("<a name=\"skip\">no href</a></body></html>"))
      ext.WebUrl.extractHtmlLinks(
          tbl(s, dir, "documents").filter(id.isNotNull)
            .select(id, html.as("html")),
          "doc_id", "html")
        .orderBy("doc_id", "link_index")
    }),

    // ext crawl — RFC 3986 reference resolution (crawl subset) over an
    // 11-case href matrix per doc: absolute, scheme-relative, rooted,
    // query-only, fragment-only, sibling, ./, ../, past-root clamp,
    // nested + fragment, and the EMPTY reference ("" → the base minus
    // fragment, §5.4 — extractHtmlLinks emits href="" for <a href="">).
    // The oracle replays the identical regex chain.
    "q212_href_resolve" -> ((s, dir) => {
      val id = col("doc_id")
      val base = concat(lit("https://h"), (id % 5).cast("string"),
        lit(".example.com/a"), (id % 3).cast("string"),
        lit("/b/c.html?q="), (id % 2).cast("string"))
      val href = element_at(array(
        lit("https://abs.example.com/z"), lit("//cdn.example.com/j.js"),
        lit("/rooted.html"), lit("?p=2"), lit("#frag"), lit("d.html"),
        lit("./e.html"), lit("../up.html"), lit("../../../../past.html"),
        lit("sub/deep.html#x"), lit("")), (id % 11 + 1).cast("int"))
      tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, base.as("base"), href.as("href"))
        .withColumn("resolved",
          ext.WebUrl.resolveHref(col("base"), col("href")))
        .orderBy("doc_id")
    }),

    // ext crawl — robots.txt BODY parsing (RFC 9309 groups): synthetic
    // bodies where even ids carry a graftbot group (exact match wins,
    // its rules apply) and odd ids only a '*' group (fallback applies);
    // an empty Disallow and a comment line must vanish. The oracle
    // replays the line typing, the lag-based group ids, and the
    // exact-beats-star selection.
    "q216_robots_parse" -> ((s, dir) => {
      val id = col("doc_id")
      val body = concat(
        lit("# fetched\n"),
        when(id % 2 === 0, concat(
          lit("User-agent: graftbot\nDisallow: /g"), (id % 5).cast("string"),
          lit("/\nAllow: /g"), (id % 5).cast("string"),
          lit("/pub\nCrawl-delay: "), (id % 4).cast("string"),
          lit("\n\n"))).otherwise(lit("")),
        lit("User-agent: *\nDisallow: /x"), (id % 3).cast("string"),
        lit("/\nDisallow:\nSitemap: https://d"), (id % 7).cast("string"),
        lit(".example.com/sitemap.xml"))
      ext.WebUrl.parseRobotsTxt(
          tbl(s, dir, "documents").filter(id.isNotNull)
            .select(concat(lit("d"), id.cast("string")).as("domain"),
              body.as("body")),
          "domain", "body", userAgent = "graftbot")
        .orderBy("domain", "rule_path")
    }),

    // ext capstone — page → frontier: extractHtmlLinks pulls three
    // differently-shaped hrefs (relative, rooted with a tracking param,
    // absolute with uppercase scheme/host + default port) out of
    // synthesized HTML, resolveHref absolutizes them against the page,
    // canonicalizeUrl normalizes, and the frontier aggregates in-link
    // counts. The oracle states each link's CANONICAL CLOSED FORM
    // directly — so the whole extract→resolve→canonicalize chain must
    // reproduce it end-to-end, not just each stage in isolation.
    "q217_link_frontier" -> ((s, dir) => {
      val id = col("doc_id")
      val base = concat(lit("https://s"), (id % 6).cast("string"),
        lit(".example.com/dir"), (id % 3).cast("string"), lit("/page.html"))
      val html = concat(
        lit("<html><body><a href=\"art"), (id % 8).cast("string"),
        lit(".html\">rel</a><a href=\"/shared/hub.html?utm_source=x&ref="),
        (id % 4).cast("string"),
        lit("\">hub</a><a href='HTTPS://S"), (id % 6).cast("string"),
        lit(".Example.COM:443/dir"), ((id + 1) % 3).cast("string"),
        lit("/other.html'>abs</a></body></html>"))
      val pages = tbl(s, dir, "documents").filter(id.isNotNull)
        .select(id, base.as("base"), html.as("html"))
      ext.WebUrl.extractHtmlLinks(pages, "doc_id", "html")
        .join(pages.select(col("doc_id"), col("base")), Seq("doc_id"))
        .select(col("doc_id"), ext.WebUrl.canonicalizeUrl(
          ext.WebUrl.resolveHref(col("base"), col("href"))).as("target"))
        .groupBy("target")
        .agg(count(lit(1)).cast("long").as("n_refs"),
          min(col("doc_id")).as("first_referrer"))
        .orderBy("target")
    }),

    // ext capstone — robots → fetch plan: parseRobotsTxt rules (exact
    // graftbot group; the '*' Disallow-all group must NOT apply) feed
    // robotsEvaluateWildcard (the /pN* block loses to the longer /pN9$
    // allow — longest-match + allow-tie through the WHOLE chain), and
    // robotsCrawlDelays feeds politenessSchedule offsets. The oracle
    // states allowed-set and offsets in closed form, so parsing, group
    // selection, wildcard scoring, and scheduling must all compose.
    "q222_robots_politeness" -> ((s, dir) => {
      val d = tbl(s, dir, "documents").filter(col("doc_id").isNotNull)
      val id = col("doc_id")
      val h = id % 7
      val hostStr = concat(lit("d"), h.cast("string"), lit(".example.com"))
      val blocked = (h % 3).cast("string")
      val body = concat(
        lit("User-agent: graftbot\nDisallow: /p"), blocked,
        lit("*\nAllow: /p"), blocked, lit("9$\nCrawl-delay: "),
        (h + 1).cast("string"),
        lit("\n\nUser-agent: *\nDisallow: /"))
      val bodies = d.select(hostStr.as("domain"), body.as("body")).distinct()
      val urls = d.select(id,
        concat(lit("https://"), hostStr, lit("/p"),
          when(id % 11 === 0, concat(blocked, lit("9")))
            .otherwise((id % 5).cast("string"))).as("url"))
      val rules = ext.WebUrl.parseRobotsTxt(bodies, "domain", "body",
        userAgent = "graftbot")
      val delays = ext.WebUrl.robotsCrawlDelays(bodies, "domain", "body",
        userAgent = "graftbot")
      val allowed = ext.WebUrl
        .robotsEvaluateWildcard(urls, "doc_id", "url", rules)
        .filter(col("allowed")).select("doc_id", "url")
      ext.WebUrl.politenessSchedule(allowed, "doc_id", "url", delays)
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // replays url synthesis + canonicalization + registrable-domain
    // heuristic; RE2-safe patterns keep both engines identical
    "q122_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |    (CASE doc_id % 5 WHEN 0 THEN 'WWW.Example.COM'
        |      WHEN 1 THEN 'news.Example.co.uk' WHEN 2 THEN 'Sub.Blog.example.ORG'
        |      WHEN 3 THEN '192.168.10.42' ELSE 'example.net' END) ||
        |    (CASE doc_id % 4 WHEN 0 THEN ':443' WHEN 1 THEN ':8080' ELSE '' END) ||
        |    '/Articles/' || CAST(doc_id AS VARCHAR) ||
        |    (CASE doc_id % 3 WHEN 0 THEN '?utm_source=tw&z=9&a=1'
        |      WHEN 1 THEN '?b=2&utm_medium=email' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '#Sec2' ELSE '' END) AS url
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
        |    (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) AS url_canon,
        |    host, string_split(host, '.') AS labels
        |  FROM q),
        |r AS (
        |  SELECT doc_id, url_canon,
        |    CASE WHEN regexp_matches(host, '^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$') THEN host
        |         WHEN len(labels) <= 2 THEN host
        |         WHEN labels[-2] IN ('co','com','net','org','gov','ac','edu')
        |           AND length(labels[-1]) = 2 THEN array_to_string(labels[-3:], '.')
        |         ELSE array_to_string(labels[-2:], '.') END AS reg_domain
        |  FROM c)
        |SELECT doc_id, url_canon, reg_domain,
        |  CAST(count(*) OVER (PARTITION BY reg_domain) AS BIGINT) AS domain_docs
        |FROM r ORDER BY doc_id""".stripMargin,

    // the exact stripHtml pass chain, RE2 flavor (global 'g' flag; inline
    // (?is); no backreferences anywhere — by design of stripHtml)
    "q85_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>T</title><style type="text/css">p { color: red; }</style></head><body><h1>Doc '
        |    || CAST(doc_id AS VARCHAR) || '</h1> <p>' || text
        |    || '</p><!-- trailing comment --><script>var x = "<p>not text</p>";</script><div>tail &amp;amp; &lt;b&gt;bold&lt;/b&gt;&nbsp;end</div></body></html>'
        |    AS html
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |            '(?s)<!--.*?-->', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
        |      '\s+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, md5(clean) AS clean_md5,
        |  CAST(length(clean) AS BIGINT) AS n_chars
        |FROM stripped
        |ORDER BY doc_id""".stripMargin,

    // replays the 5 damped rounds as chained CTEs; contributions are
    // (rank * 85) // (100 * outdeg) — EXACT integer ops on both sides,
    // no float anywhere — summed as BIGINT (order-free). Every rank is
    // re-CAST to BIGINT per round: DuckDB's sum(BIGINT) yields HUGEINT,
    // which the comparator would otherwise materialize as float64 (the
    // r5 lesson — hashes diverge on type, not value)
    "q131_pagerank" -> {
      val rounds = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        s"""r$k AS (
           |  SELECT n.id, CAST(p.base + coalesce(sum(
           |      (r.rank * 85) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN p
           |  LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prev r ON r.id = e.src
           |  LEFT JOIN od d ON d.src = e.src
           |  GROUP BY n.id, p.base)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 101 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 101, (doc_id * 5 + 2) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |p AS (SELECT CAST(150000000000 // count(*) AS BIGINT) AS base,
         |             CAST(1000000000000 // count(*) AS BIGINT) AS init
         |      FROM nodes),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id, (SELECT init FROM p) AS rank FROM nodes),
         |$rounds
         |SELECT id, CAST(rank AS BIGINT) AS rank_e12 FROM r5 ORDER BY id""".stripMargin
    },

    // q131's replay plus one dangling-share CTE per round: the sink mass
    // D (ranks of nodes with no out-edges, an anti-join sum) is floored
    // into a uniform share (D*85)//(100*N) and added to every node —
    // exactly LinkGraph.pageRank(redistributeDangling = true)'s driver
    // scalar. All sums re-CAST to BIGINT (DuckDB HUGEINT promotion).
    "q132_pagerank_dangling" -> {
      val rounds = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        s"""s$k AS (
           |  SELECT CAST((CAST(coalesce(sum(r.rank), 0) AS BIGINT) * 85)
           |      // (100 * (SELECT n FROM p)) AS BIGINT) AS share
           |  FROM $prev r LEFT JOIN od d ON d.src = r.id
           |  WHERE d.src IS NULL),
           |r$k AS (
           |  SELECT n.id, CAST(p.base + s.share + coalesce(sum(
           |      (r.rank * 85) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN p CROSS JOIN s$k s
           |  LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prev r ON r.id = e.src
           |  LEFT JOIN od d ON d.src = e.src
           |  GROUP BY n.id, p.base, s.share)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 89 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 89, (doc_id * 7 + 5) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |p AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |             CAST(150000000000 // count(*) AS BIGINT) AS base,
         |             CAST(1000000000000 // count(*) AS BIGINT) AS init
         |      FROM nodes),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id, (SELECT init FROM p) AS rank FROM nodes),
         |$rounds
         |SELECT id, CAST(rank AS BIGINT) AS rank_e12 FROM r5 ORDER BY id""".stripMargin
    },

    "q133_personalized_pagerank" -> {
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 89 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 89, (doc_id * 7 + 5) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |ids AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |w AS (SELECT id, ((id * id + 3) % 11) * 100000 AS w FROM ids),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
         |nodes AS (SELECT id,
         |  CAST((w * 1000000) // (SELECT tw FROM tot) AS BIGINT) AS wn FROM w),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id,
         |  CAST((1000000000000 * wn) // 1000000 AS BIGINT) AS rank FROM nodes),
         |${personalizedRoundsSql(4)}
         |SELECT id, CAST(rank AS BIGINT) AS rank_e12 FROM r4 ORDER BY id""".stripMargin
    },

    // chains the q130 domain-quality aggregate (identical SQL shape, so
    // the stage oracles compose — the q95 pattern) into the q133 round
    // CTEs: the prior is each domain's mean quality, the graph links
    // domain k → (7k+3) mod 37.
    "q134_crawl_prior" -> {
      s"""WITH scored AS (
         |  SELECT doc_id, doc_id % 37 AS domain_id,
         |    'site' || CAST(doc_id % 37 AS VARCHAR) || '.com' AS reg_domain,
         |    CAST(floor(${qualityScoreSql("text")} * 1e6) AS BIGINT) AS q_e6
         |  FROM documents WHERE doc_id IS NOT NULL),
         |st AS (
         |  SELECT domain_id, reg_domain,
         |    CAST(floor(CAST(sum(q_e6) AS DOUBLE) / count(*)) AS BIGINT) AS dms
         |  FROM scored GROUP BY 1, 2),
         |e AS (
         |  SELECT DISTINCT doc_id % 37 AS src, (doc_id * 7 + 3) % 37 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL),
         |ids AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |w AS (SELECT i.id, greatest(coalesce(st.dms, 0), 0) AS w
         |      FROM ids i LEFT JOIN st ON st.domain_id = i.id),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
         |nodes AS (SELECT id,
         |  CAST((w * 1000000) // (SELECT tw FROM tot) AS BIGINT) AS wn FROM w),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT id,
         |  CAST((1000000000000 * wn) // 1000000 AS BIGINT) AS rank FROM nodes),
         |${personalizedRoundsSql(4)}
         |SELECT r.id AS domain_id, st.reg_domain, st.dms AS quality_e6,
         |  CAST(r.rank AS BIGINT) AS rank_e12
         |FROM r4 r JOIN st ON st.domain_id = r.id
         |ORDER BY domain_id""".stripMargin
    },

    // reg-domain mapping replayed per host CASE; substring hits as
    // non-overlapping regexp_extract_all counts over the lowercased url
    "q139_url_blocklist" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN 'WWW.Example.COM'
        |          WHEN doc_id % 5 = 1 THEN 'ads.tracker-hub.net'
        |          WHEN doc_id % 5 = 2 THEN 'Sub.Blog.example.ORG'
        |          WHEN doc_id % 5 = 3 THEN '192.168.10.42'
        |          ELSE 'example.net' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN '/ads/banner' || CAST(doc_id AS VARCHAR)
        |          ELSE '/Articles/' || CAST(doc_id AS VARCHAR) END) ||
        |    (CASE WHEN doc_id % 11 = 3 THEN '?ref=CASINO' ELSE '' END) AS url,
        |    CASE WHEN doc_id % 5 = 0 THEN 'example.com'
        |         WHEN doc_id % 5 = 1 THEN 'tracker-hub.net'
        |         WHEN doc_id % 5 = 2 THEN 'example.org'
        |         WHEN doc_id % 5 = 3 THEN '192.168.10.42'
        |         ELSE 'example.net' END AS reg_domain
        |  FROM documents WHERE doc_id IS NOT NULL),
        |f AS (
        |  SELECT doc_id, url, reg_domain,
        |    reg_domain IN ('tracker-hub.net', '192.168.10.42') AS domain_blocked,
        |    CAST(len(regexp_extract_all(lower(url), '/ads/'))
        |       + len(regexp_extract_all(lower(url), 'casino')) AS BIGINT)
        |      AS n_blocked_hits
        |  FROM u)
        |SELECT doc_id, url, reg_domain, domain_blocked, n_blocked_hits,
        |  (NOT domain_blocked AND n_blocked_hits = 0) AS keep_url
        |FROM f ORDER BY doc_id""".stripMargin,

    // 3 HITS rounds as chained CTEs; every sum re-CAST to BIGINT (DuckDB
    // HUGEINT promotion) and each normalization is the dual-branch CASE
    // on its own round-total CTE, mirroring LinkGraph.hits' driver scalar
    "q149_hits" -> {
      // every multiply-referenced CTE is MATERIALIZED and the round
      // total rides in on ONE cross join per round: DuckDB otherwise
      // INLINES each CTE reference, and the chained rounds' references
      // compound into exponentially many re-opened parquet scans
      // ("Too many open files" at round 3 even with a 20k fd limit)
      def norm(x: String) =
        s"""CAST(CASE WHEN t.t > 0 AND t.t <= 9200000000000
           |    THEN ($x * 1000000) // t.t
           |    ELSE $x // greatest(t.t // 1000000, 1)
           |    END AS BIGINT)""".stripMargin
      val rounds = (1 to 3).map { k =>
        val prevH = if (k == 1) "h0" else s"h${k - 1}"
        s"""a${k}r AS MATERIALIZED (
           |  SELECT n.id, CAST(coalesce(sum(h.h), 0) AS BIGINT) AS a
           |  FROM nodes n LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prevH h ON h.id = e.src
           |  GROUP BY n.id),
           |a${k}t AS MATERIALIZED (
           |  SELECT CAST(sum(a) AS BIGINT) AS t FROM a${k}r),
           |a$k AS MATERIALIZED (
           |  SELECT id, ${norm("a")} AS a FROM a${k}r, a${k}t t),
           |h${k}r AS MATERIALIZED (
           |  SELECT n.id, CAST(coalesce(sum(a.a), 0) AS BIGINT) AS h
           |  FROM nodes n LEFT JOIN e ON e.src = n.id
           |  LEFT JOIN a$k a ON a.id = e.dst
           |  GROUP BY n.id),
           |h${k}t AS MATERIALIZED (
           |  SELECT CAST(sum(h) AS BIGINT) AS t FROM h${k}r),
           |h$k AS MATERIALIZED (
           |  SELECT id, ${norm("h")} AS h FROM h${k}r, h${k}t t)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT doc_id % 101 AS src, (doc_id * doc_id + 1) % 101 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION
         |  SELECT (doc_id * 3) % 101, (doc_id * 5 + 2) % 101
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes),
         |$rounds
         |SELECT h3.id, CAST(h3.h AS BIGINT) AS hub_e6,
         |       CAST(a3.a AS BIGINT) AS auth_e6
         |FROM h3 JOIN a3 ON a3.id = h3.id ORDER BY h3.id""".stripMargin
    },

    // the capped-pairing replay: out-degree computed over the distinct
    // de-self-looped edges, citers past the cap (or below 2) dropped,
    // then the unordered pair count with the same >= 2 floor
    "q150_cocitation" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id % 23 AS src, ((doc_id % 23) % 5) * 3 AS dst
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT doc_id % 23, ((doc_id % 23) % 7) * 2 + 1
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT doc_id % 23, ((doc_id % 23) % 4) * 5 + 2
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT 999, doc_id % 47
        |    FROM documents WHERE doc_id IS NOT NULL)
        |  WHERE src <> dst),
        |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
        |keep AS (SELECT e.src, e.dst FROM e JOIN deg USING (src)
        |         WHERE deg.d BETWEEN 2 AND 12),
        |p AS (SELECT least(a.dst, b.dst) AS id_a, greatest(a.dst, b.dst) AS id_b
        |      FROM keep a JOIN keep b ON a.src = b.src AND a.dst < b.dst)
        |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_common
        |FROM p GROUP BY id_a, id_b HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // longest-match replay: the oracle knows the URL path in closed form,
    // scores matching rules 2·len+allow, and reads the verdict off the
    // parity of the max — the same single-aggregate form as the engine
    "q151_robots" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id IS NOT NULL),
        |urls AS (SELECT doc_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      || '/x' || (doc_id % 3) AS url,
        |    '/p' || (doc_id % 5) || '/x' || (doc_id % 3) AS path,
        |    'd' || (doc_id % 7) || '.example.com' AS host
        |  FROM d),
        |rules AS (SELECT DISTINCT
        |    'd' || (doc_id % 7) || '.example.com' AS domain,
        |    CASE doc_id % 11
        |      WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
        |      WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
        |      WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
        |      WHEN 9 THEN '/p4/x1' ELSE '/p0' END AS rule_path,
        |    CASE doc_id % 11
        |      WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN FALSE
        |      WHEN 3 THEN TRUE WHEN 4 THEN FALSE WHEN 5 THEN FALSE
        |      WHEN 6 THEN TRUE WHEN 7 THEN TRUE WHEN 8 THEN FALSE
        |      WHEN 9 THEN TRUE ELSE TRUE END AS allow
        |  FROM d),
        |m AS (SELECT u.doc_id,
        |    max(2 * length(r.rule_path)
        |      + CASE WHEN r.allow THEN 1 ELSE 0 END) AS score
        |  FROM urls u JOIN rules r
        |    ON r.domain = u.host AND starts_with(u.path, r.rule_path)
        |  GROUP BY u.doc_id)
        |SELECT u.doc_id, u.url,
        |  coalesce(m.score % 2 = 1, TRUE) AS allowed,
        |  CAST(coalesce(m.score // 2, 0) AS BIGINT) AS matched_len
        |FROM urls u LEFT JOIN m ON m.doc_id = u.doc_id
        |ORDER BY u.doc_id""".stripMargin,

    // the same count-then-rank with the deterministic tiebreak
    "q158_anchor_text" ->
      """WITH a AS (
        |  SELECT (doc_id * 7 + 3) % 37 AS dst,
        |    unnest(regexp_split_to_array(trim(lower(
        |      array_to_string(list_slice(regexp_split_to_array(text, ' '), 1, 2), ' ')
        |    )), '\s+')) AS term
        |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |c AS (
        |  SELECT dst, term, CAST(count(*) AS BIGINT) AS n_anchors
        |  FROM a WHERE term <> '' GROUP BY dst, term),
        |r AS (
        |  SELECT dst, term, n_anchors,
        |    CAST(row_number() OVER (PARTITION BY dst
        |      ORDER BY n_anchors DESC, term ASC) AS INT) AS rank
        |  FROM c)
        |SELECT dst, term, n_anchors, rank FROM r WHERE rank <= 3
        |ORDER BY dst, rank""".stripMargin,

    // 3 clamped-seed majority rounds as chained CTEs (votes → window-max
    // majority with min-label tiebreak → fold with seed/vote/prev
    // precedence); CTEs MATERIALIZED per the q149 lesson
    "q159_label_prop" -> {
      val rounds = (1 to 3).map { k =>
        val prev = s"l${k - 1}"
        s"""v$k AS MATERIALIZED (
           |  SELECT e.dst AS id, l.label, CAST(count(*) AS BIGINT) AS c
           |  FROM e JOIN $prev l ON l.id = e.src
           |  WHERE l.label IS NOT NULL
           |  GROUP BY e.dst, l.label),
           |b$k AS MATERIALIZED (
           |  SELECT id, min(label) AS vote FROM (
           |    SELECT id, label, c, max(c) OVER (PARTITION BY id) AS mx
           |    FROM v$k) WHERE c = mx GROUP BY id),
           |l$k AS MATERIALIZED (
           |  SELECT n.id,
           |    coalesce(s.label, b.vote, p.label) AS label
           |  FROM nodes n
           |  LEFT JOIN seeds s ON s.id = n.id
           |  LEFT JOIN b$k b ON b.id = n.id
           |  LEFT JOIN $prev p ON p.id = n.id)"""
      }.mkString(",\n")
      s"""WITH e0 AS MATERIALIZED (
         |  SELECT doc_id % 89 AS src, (doc_id * 3 + 1) % 89 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL),
         |e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM
         |    (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |seeds AS MATERIALIZED (
         |  SELECT id, (id // 7) % 3 AS label FROM (
         |    SELECT DISTINCT doc_id % 89 AS id FROM documents
         |    WHERE doc_id IS NOT NULL) WHERE id % 7 = 0),
         |l0 AS MATERIALIZED (
         |  SELECT n.id, s.label FROM nodes n LEFT JOIN seeds s ON s.id = n.id),
         |$rounds
         |SELECT id, label FROM l3 ORDER BY id""".stripMargin
    },

    // q131's 5 PageRank rounds on the 37-domain graph + the q151
    // longest-match robots replay, joined: allowed URLs with their
    // domain's rank
    "q163_frontier_score" -> {
      val rounds = (1 to 5).map { k =>
        val prev = s"r${k - 1}"
        s"""r$k AS MATERIALIZED (
           |  SELECT n.id, CAST(p.base + coalesce(sum(
           |      (r.rank * 85) // (100 * d.outdeg)), 0) AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN p
           |  LEFT JOIN e ON e.dst = n.id
           |  LEFT JOIN $prev r ON r.id = e.src
           |  LEFT JOIN od d ON d.src = e.src
           |  GROUP BY n.id, p.base)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT doc_id % 37 AS src, (doc_id * 7 + 3) % 37 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |p AS (SELECT CAST(150000000000 // count(*) AS BIGINT) AS base,
         |             CAST(1000000000000 // count(*) AS BIGINT) AS init
         |      FROM nodes),
         |od AS MATERIALIZED (
         |  SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT id, (SELECT init FROM p) AS rank FROM nodes),
         |$rounds,
         |urls AS MATERIALIZED (
         |  SELECT doc_id, doc_id % 37 AS domain_id,
         |    'https://www.site' || (doc_id % 37) || '.com/p' || (doc_id % 5)
         |      || '/x' || (doc_id % 3) AS url,
         |    '/p' || (doc_id % 5) || '/x' || (doc_id % 3) AS path,
         |    'www.site' || (doc_id % 37) || '.com' AS host
         |  FROM documents WHERE doc_id IS NOT NULL),
         |rules AS MATERIALIZED (SELECT DISTINCT
         |    'www.site' || (doc_id % 37) || '.com' AS domain,
         |    CASE doc_id % 11
         |      WHEN 0 THEN '/p0' WHEN 1 THEN '/p1' WHEN 2 THEN '/p2'
         |      WHEN 3 THEN '/p3' WHEN 4 THEN '/p4' WHEN 5 THEN '/p1/x1'
         |      WHEN 6 THEN '/p2/x2' WHEN 7 THEN '/p0/x0' WHEN 8 THEN '/p3/x'
         |      WHEN 9 THEN '/p4/x1' ELSE '/p0' END AS rule_path,
         |    CASE doc_id % 11
         |      WHEN 0 THEN FALSE WHEN 1 THEN TRUE WHEN 2 THEN FALSE
         |      WHEN 3 THEN TRUE WHEN 4 THEN FALSE WHEN 5 THEN FALSE
         |      WHEN 6 THEN TRUE WHEN 7 THEN TRUE WHEN 8 THEN FALSE
         |      WHEN 9 THEN TRUE ELSE TRUE END AS allow
         |  FROM documents WHERE doc_id IS NOT NULL),
         |m AS MATERIALIZED (SELECT u.doc_id,
         |    max(2 * length(r.rule_path)
         |      + CASE WHEN r.allow THEN 1 ELSE 0 END) AS score
         |  FROM urls u JOIN rules r
         |    ON r.domain = u.host AND starts_with(u.path, r.rule_path)
         |  GROUP BY u.doc_id)
         |SELECT u.doc_id, u.url, CAST(r5.rank AS BIGINT) AS domain_rank_e12
         |FROM urls u
         |LEFT JOIN m ON m.doc_id = u.doc_id
         |JOIN r5 ON r5.id = u.domain_id
         |WHERE coalesce(m.score % 2 = 1, TRUE)
         |ORDER BY u.doc_id""".stripMargin
    },

    // 4 Bellman-Ford rounds as chained MATERIALIZED CTEs, min-merge of
    // previous distance and best in-neighbor + 1
    "q164_hop_distance" -> {
      val rounds = (1 to 4).map { k =>
        val prev = s"d${k - 1}"
        s"""c$k AS MATERIALIZED (
           |  SELECT e.dst AS id, min(p.dist + 1) AS c
           |  FROM e JOIN $prev p ON p.id = e.src
           |  WHERE p.dist IS NOT NULL GROUP BY e.dst),
           |d$k AS MATERIALIZED (
           |  SELECT n.id,
           |    CASE WHEN p.dist IS NULL THEN c.c
           |         WHEN c.c IS NULL THEN p.dist
           |         ELSE least(p.dist, c.c) END AS dist
           |  FROM nodes n
           |  LEFT JOIN c$k c ON c.id = n.id
           |  LEFT JOIN $prev p ON p.id = n.id)"""
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT doc_id % 89 AS src, (doc_id * 3 + 1) % 89 AS dst
         |    FROM documents WHERE doc_id IS NOT NULL
         |    UNION ALL
         |    SELECT (doc_id * 5) % 89, (doc_id * 7 + 4) % 89
         |    FROM documents WHERE doc_id IS NOT NULL)),
         |nodes AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |seeds AS MATERIALIZED (SELECT id FROM nodes WHERE id % 10 = 0),
         |d0 AS MATERIALIZED (
         |  SELECT n.id, CASE WHEN s.id IS NOT NULL THEN CAST(0 AS BIGINT)
         |    ELSE NULL END AS dist
         |  FROM nodes n LEFT JOIN seeds s ON s.id = n.id),
         |$rounds
         |SELECT id, CAST(dist AS BIGINT) AS dist FROM d4 ORDER BY id""".stripMargin
    },

    // symmetrize + orient by id, cap the apex's oriented degree, then
    // wedge + closing-edge joins — the same shape the engine plans
    "q165_triangles" ->
      """WITH e0 AS MATERIALIZED (
        |  SELECT src, dst FROM (
        |    SELECT doc_id % 40 AS src, (doc_id % 40 + 1) % 40 AS dst
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT doc_id % 40, (doc_id % 40 + 2) % 40
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT 0, doc_id % 27 + 14
        |    FROM documents WHERE doc_id IS NOT NULL)
        |  WHERE src <> dst),
        |adj AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0),
        |kept AS MATERIALIZED (
        |  SELECT adj.a, adj.b FROM adj JOIN (
        |    SELECT a FROM adj GROUP BY a HAVING count(*) <= 12) d
        |  USING (a)),
        |w AS (SELECT x.a AS id_a, x.b AS id_b, y.b AS id_c
        |      FROM kept x JOIN kept y ON x.a = y.a AND x.b < y.b)
        |SELECT w.id_a, w.id_b, w.id_c
        |FROM w JOIN adj ON adj.a = w.id_b AND adj.b = w.id_c
        |ORDER BY id_a, id_b, id_c""".stripMargin,

    // both directions present, reported once as (lo, hi)
    "q168_reciprocal_links" ->
      """WITH e AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id % 61 AS src, (doc_id * 3 + 2) % 61 AS dst
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT (doc_id * 5 + 1) % 61, (doc_id * 2) % 61
        |    FROM documents WHERE doc_id IS NOT NULL
        |    UNION ALL
        |    SELECT (doc_id * 7) % 61, (doc_id * 11 + 3) % 61
        |    FROM documents WHERE doc_id IS NOT NULL AND doc_id % 4 = 0
        |    UNION ALL
        |    SELECT (doc_id * 11 + 3) % 61, (doc_id * 7) % 61
        |    FROM documents WHERE doc_id IS NOT NULL AND doc_id % 4 = 0)
        |  WHERE src <> dst)
        |SELECT a.src AS id_a, a.dst AS id_b
        |FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
        |WHERE a.src < a.dst
        |ORDER BY id_a, id_b""".stripMargin,

    // identical XML synthesis, DuckDB RE2 re-parse: <url> blocks with
    // ordinality, loc-less block dropped, ''→NULL optionals
    "q180_sitemap" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    '<?xml version="1.0"?><urlset>'
        |    || '<url><loc>https://d' || (doc_id % 7)
        |    || '.example.com/p' || (doc_id % 5)
        |    || '</loc><lastmod>2024-01-0' || ((doc_id % 9) + 1)
        |    || '</lastmod><priority>0.' || (doc_id % 10)
        |    || '</priority></url>'
        |    || '<url><loc> https://m' || (doc_id % 3)
        |    || '.example.com/ </loc></url>'
        |    || '<url><lastmod>2024-02-01</lastmod></url>'
        |    || CASE WHEN doc_id % 2 = 0
        |         THEN '<url><loc>https://x.example.com/q</loc><priority>1.0</priority></url>'
        |         ELSE '' END
        |    || '</urlset>' AS xml
        |  FROM documents WHERE doc_id IS NOT NULL),
        |b AS (
        |  SELECT doc_id, regexp_extract_all(xml, '(?s)<url>(.*?)</url>', 1) AS l
        |  FROM x),
        |e AS (
        |  SELECT doc_id, CAST(u.i - 1 AS INT) AS entry_index, l[u.i] AS blk
        |  FROM b, unnest(generate_series(1, len(l))) AS u(i))
        |SELECT doc_id, entry_index,
        |  regexp_extract(blk, '<loc>\s*([^<\s][^<]*?)\s*</loc>', 1) AS loc,
        |  nullif(regexp_extract(blk, '<lastmod>\s*([^<]+?)\s*</lastmod>', 1), '')
        |    AS lastmod,
        |  nullif(regexp_extract(blk, '<priority>\s*([^<]+?)\s*</priority>', 1), '')
        |    AS priority
        |FROM e
        |WHERE length(regexp_extract(blk, '<loc>\s*([^<\s][^<]*?)\s*</loc>', 1)) > 0
        |ORDER BY doc_id, entry_index""".stripMargin,

    // identical 4-round unroll: per round degrees over surviving
    // undirected simple edges, keep ≥ k, re-restrict edges; final
    // degrees re-counted and filtered like the engine's output stage
    "q183_kcore" -> {
      val k = 5
      val rounds = (1 to 4).map { r =>
        val prev = s"e${r - 1}"
        s"""d$r AS (
           |  SELECT id, count(*) AS d FROM (
           |    SELECT a AS id FROM $prev UNION ALL SELECT b AS id FROM $prev)
           |  GROUP BY id),
           |k$r AS (SELECT id FROM d$r WHERE d >= $k),
           |e$r AS (
           |  SELECT e.a, e.b FROM $prev e
           |  JOIN k$r x ON x.id = e.a
           |  JOIN k$r y ON y.id = e.b)"""
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT doc_id % 61 AS src, (doc_id * doc_id + 1) % 61 AS dst
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION ALL
         |  SELECT (doc_id * 3) % 61, (doc_id * 5 + 2) % 61
         |  FROM documents WHERE doc_id IS NOT NULL
         |  UNION ALL
         |  SELECT doc_id % 13, (doc_id // 13) % 13
         |  FROM documents WHERE doc_id IS NOT NULL),
         |e0 AS (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw WHERE src <> dst),
         |$rounds
         |SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
         |  SELECT a AS id FROM e4 UNION ALL SELECT b AS id FROM e4)
         |GROUP BY id HAVING count(*) >= $k
         |ORDER BY id""".stripMargin
    },

    // the same conservative-merge config join + per-host id-order rank
    "q190_politeness" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      AS url,
        |    'd' || (doc_id % 7) || '.example.com' AS host
        |  FROM documents WHERE doc_id IS NOT NULL),
        |del AS (
        |  SELECT 'd' || (doc_id % 7) || '.example.com' AS host,
        |    CAST(max((doc_id % 7 + 1) * 250) AS BIGINT) AS delay_ms
        |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT u.doc_id, u.url, u.host,
        |    CAST(row_number() OVER (PARTITION BY u.host ORDER BY u.doc_id) - 1
        |      AS BIGINT) AS fetch_seq,
        |    del.delay_ms
        |  FROM u LEFT JOIN del ON del.host = u.host)
        |SELECT doc_id, url, host, fetch_seq,
        |  CAST(fetch_seq * coalesce(delay_ms, 1000) AS BIGINT)
        |    AS fetch_offset_ms
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    // id-arithmetic replay of the chained stages: canonical forms are
    // closed-form by construction; dedup keeps min url_id per canonical;
    // the politeness rank runs over the survivors in url_id order
    "q192_frontier_ingest" ->
      """WITH e AS (
        |  SELECT doc_id * 4 + 0 AS url_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      AS canon,
        |    'd' || (doc_id % 7) || '.example.com' AS host
        |  FROM documents WHERE doc_id IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id * 4 + 1,
        |    'https://m' || (doc_id % 3) || '.example.com/q' || (doc_id % 11),
        |    'm' || (doc_id % 3) || '.example.com'
        |  FROM documents WHERE doc_id IS NOT NULL),
        |surv AS (
        |  SELECT min(url_id) AS url_id, canon, host
        |  FROM e GROUP BY canon, host),
        |del AS (
        |  SELECT 'd' || (doc_id % 7) || '.example.com' AS host,
        |    CAST(max((doc_id % 7 + 1) * 250) AS BIGINT) AS delay_ms
        |  FROM documents WHERE doc_id IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT s.url_id, s.host,
        |    CAST(row_number() OVER (PARTITION BY s.host ORDER BY s.url_id) - 1
        |      AS BIGINT) AS fetch_seq,
        |    del.delay_ms
        |  FROM surv s LEFT JOIN del ON del.host = s.host)
        |SELECT url_id, host, fetch_seq,
        |  CAST(fetch_seq * coalesce(delay_ms, 1000) AS BIGINT)
        |    AS fetch_offset_ms
        |FROM r
        |ORDER BY url_id""".stripMargin,

    // the same exact integer apportionment in HUGEINT
    "q203_crawl_budget" ->
      """WITH m AS (
        |  SELECT 'd' || (doc_id % 7) AS domain,
        |    CAST(sum(n_chars) AS HUGEINT) AS w
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
        |  GROUP BY 1
        |  HAVING sum(n_chars) > 0),
        |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM m),
        |b AS (
        |  SELECT m.domain, (m.w * 10007) AS p,
        |    ((m.w * 10007) - ((m.w * 10007) % t.tw)) / t.tw AS base,
        |    (m.w * 10007) % t.tw AS rem
        |  FROM m, t),
        |d AS (SELECT CAST(10007 - sum(base) AS BIGINT) AS deficit FROM b),
        |r AS (
        |  SELECT domain, base,
        |    row_number() OVER (ORDER BY rem DESC, domain ASC) AS rk
        |  FROM b)
        |SELECT r.domain,
        |  CAST(r.base + CASE WHEN r.rk <= d.deficit THEN 1 ELSE 0 END
        |    AS BIGINT) AS allocated
        |FROM r, d
        |ORDER BY r.domain""".stripMargin,

    // the same glob→LIKE translation and longest-pattern/allow-ties max
    "q205_robots_wildcard" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://d' || (doc_id % 7) || '.example.com/p' || (doc_id % 5)
        |      || '/x' || (doc_id % 3)
        |      || (CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END) AS url,
        |    'd' || (doc_id % 7) || '.example.com' AS host,
        |    '/p' || (doc_id % 5) || '/x' || (doc_id % 3)
        |      || (CASE WHEN doc_id % 4 = 0 THEN '.html' ELSE '' END) AS path
        |  FROM documents WHERE doc_id IS NOT NULL),
        |r AS (
        |  SELECT DISTINCT 'd' || (doc_id % 7) || '.example.com' AS host,
        |    CASE doc_id % 9
        |      WHEN 0 THEN '/p0*' WHEN 1 THEN '/p1/*1' WHEN 2 THEN '/*.html$'
        |      WHEN 3 THEN '/p2' WHEN 4 THEN '/p3/x*' WHEN 5 THEN '/p4*2$'
        |      WHEN 6 THEN '/p0/x0$' WHEN 7 THEN '/*2.html$'
        |      ELSE '/p1' END AS rp,
        |    CASE doc_id % 9
        |      WHEN 0 THEN false WHEN 1 THEN true WHEN 2 THEN false
        |      WHEN 3 THEN true WHEN 4 THEN false WHEN 5 THEN true
        |      WHEN 6 THEN true WHEN 7 THEN true ELSE false END AS allow
        |  FROM documents WHERE doc_id IS NOT NULL),
        |rl AS (
        |  SELECT host, rp, allow,
        |    (CASE WHEN rp LIKE '%$' THEN
        |       replace(regexp_replace(substr(rp, 1, length(rp) - 1),
        |         '([%_#])', '#\1', 'g'), '*', '%')
        |     ELSE
        |       replace(regexp_replace(rp, '([%_#])', '#\1', 'g'), '*', '%')
        |       || '%' END) AS lk
        |  FROM r),
        |scored AS (
        |  SELECT u.doc_id,
        |    max(2 * length(rl.rp) + CASE WHEN rl.allow THEN 1 ELSE 0 END)
        |      AS score
        |  FROM u JOIN rl ON rl.host = u.host
        |  WHERE u.path LIKE rl.lk ESCAPE '#'
        |  GROUP BY u.doc_id)
        |SELECT u.doc_id, u.url,
        |  coalesce(s.score % 2 = 1, true) AS allowed,
        |  CAST(coalesce(s.score // 2, 0) AS BIGINT) AS matched_len
        |FROM u LEFT JOIN scored s ON s.doc_id = u.doc_id
        |ORDER BY u.doc_id""".stripMargin,

    // both versions rebuilt, changed = text differs, same levenshtein
    "q206_change_magnitude" ->
      """WITH pn AS (
        |  SELECT doc_id, text AS ptext,
        |    CASE WHEN doc_id % 11 = 0 THEN 'edited: ' || text
        |         WHEN doc_id % 13 = 0 THEN replace(text, 'e', '3')
        |         ELSE text END AS ntext
        |  FROM documents
        |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
        |    AND doc_id % 17 <> 0 AND doc_id % 19 <> 0)
        |SELECT doc_id,
        |  CAST(levenshtein(ptext, ntext) AS BIGINT) AS dist,
        |  CAST(levenshtein(ptext, ntext) * 1000000
        |    // greatest(length(ntext), length(ptext), 1) AS BIGINT) AS rel_e6
        |FROM pn WHERE ptext <> ntext
        |ORDER BY doc_id""".stripMargin,

    // the same event-time range window and exact ratios
    "q208_burst_signals" ->
      s"""WITH e AS ($EventsCte),
         |b AS (
         |  SELECT user_id, epoch(ts) AS sec,
         |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
         |  FROM e WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |w AS (
         |  SELECT user_id, err,
         |    count(*) OVER (PARTITION BY user_id ORDER BY sec
         |      RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS burst
         |  FROM b)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(err) AS BIGINT) AS n_errors,
         |  CAST(max(burst) AS BIGINT) AS max_burst,
         |  CAST(CAST(sum(err) AS BIGINT) * 1000000 // count(*) AS BIGINT)
         |    AS error_ratio_e6,
         |  (max(burst) >= 2 OR
         |   CAST(sum(err) AS BIGINT) * 1000000 // count(*) >= 250000)
         |    AS is_suspect
         |FROM w GROUP BY user_id
         |ORDER BY user_id""".stripMargin,

    // identical HTML synthesis; RE2 block scan with ordinality; the
    // q85 stripHtml chain replayed on the anchor slice
    "q211_html_links" -> {
      // nested q85 strip chain over an expression (entity order matters:
      // &amp; last)
      def strip(e: String): String =
        s"""trim(regexp_replace(
           |      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           |      regexp_replace(
           |        regexp_replace(
           |          regexp_replace(
           |            regexp_replace(
           |              regexp_replace($e, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
           |              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
           |            '(?s)<!--.*?-->', ' ', 'g'),
           |          '<[^>]+>', ' ', 'g'),
           |        '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
           |        '&#39;', CHR(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g'),
           |      '\\s+', ' ', 'g'))""".stripMargin
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><body><p>intro</p><a href="https://d' || (doc_id % 7)
         |    || '.example.com/p' || (doc_id % 5)
         |    || '">Link <b>' || (doc_id % 3) || '</b> text</a>'
         |    || '<a class=''x'' rel=''nofollow'' href=''/rel/' || (doc_id % 4)
         |    || '''>Rel &amp; anchor</a>'
         |    || CASE WHEN doc_id % 2 = 0
         |         THEN '<A HREF="../up/q.html">Up</A>' ELSE '' END
         |    || '<a name="skip">no href</a></body></html>' AS html
         |  FROM documents WHERE doc_id IS NOT NULL),
         |b AS (
         |  SELECT doc_id,
         |    regexp_extract_all(html,
         |      '(?is)<a\\s[^>]*href\\s*=\\s*(?:"[^"]*"|''[^'']*'')[^>]*>.*?</a>', 0) AS l
         |  FROM h),
         |e AS (
         |  SELECT doc_id, CAST(u.i - 1 AS INT) AS link_index, l[u.i] AS blk
         |  FROM b, unnest(generate_series(1, len(l))) AS u(i))
         |SELECT doc_id, link_index,
         |  CASE WHEN regexp_extract(blk, '(?is)href\\s*=\\s*"([^"]*)"', 1) <> ''
         |    THEN regexp_extract(blk, '(?is)href\\s*=\\s*"([^"]*)"', 1)
         |    ELSE regexp_extract(blk, '(?is)href\\s*=\\s*''([^'']*)''', 1) END
         |    AS href,
         |  ${strip("regexp_extract(blk, '(?is)^<a\\s[^>]*>(.*)</a>$$', 1)")} AS anchor,
         |  regexp_matches(regexp_extract(blk, '(?is)^(<a\\s[^>]*>)', 1),
         |    '(?is)rel\\s*=\\s*("[^"]*nofollow[^"]*"|''[^'']*nofollow[^'']*'')')
         |    AS nofollow
         |FROM e
         |ORDER BY doc_id, link_index""".stripMargin
    },

    // the same join + dot-fold regex chain, nested textually
    "q212_href_resolve" -> {
      val origin = "regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
      val scheme = "regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)"
      val basePath =
        "regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
      val baseDir =
        s"CASE WHEN $basePath = '' THEN '/' ELSE regexp_replace($basePath, '[^/]*$$', '') END"
      val pathOrSlash = s"CASE WHEN $basePath = '' THEN '/' ELSE $basePath END"
      val baseQuery = "regexp_extract(base, '^[^?#]*(\\?[^#]*)', 1)"
      val joined =
        s"""CASE
           |    WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN href
           |    WHEN href LIKE '//%' THEN $scheme || ':' || href
           |    WHEN href LIKE '/%' THEN $origin || href
           |    WHEN href LIKE '?%' THEN $origin || $pathOrSlash || href
           |    WHEN href LIKE '#%' OR href = ''
           |      THEN $origin || $pathOrSlash || $baseQuery
           |    ELSE $origin || $baseDir || href END""".stripMargin
      val noFrag = s"regexp_replace($joined, '#.*$$', '')"
      val jOrigin =
        s"regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)"
      val jRest =
        s"regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$$', 1)"
      val dotFolded = (1 to 8).foldLeft(
        (1 to 8).foldLeft(jRest)((c, _) =>
          s"regexp_replace($c, '/\\.(/|$$)', '/', 'g')")) { (c, _) =>
        s"regexp_replace($c, '/(\\.[^/.][^/]*|\\.\\.[^/]+|[^/.][^/]*)/\\.\\.(/|$$)', '/', 'g')"
      }
      val clamped = s"regexp_replace($dotFolded, '^/(\\.\\./)*(\\.\\.$$)?', '/', 'g')"
      s"""WITH d AS (
         |  SELECT doc_id,
         |    'https://h' || (doc_id % 5) || '.example.com/a' || (doc_id % 3)
         |      || '/b/c.html?q=' || (doc_id % 2) AS base,
         |    (['https://abs.example.com/z', '//cdn.example.com/j.js',
         |      '/rooted.html', '?p=2', '#frag', 'd.html', './e.html',
         |      '../up.html', '../../../../past.html',
         |      'sub/deep.html#x', ''])[(doc_id % 11) + 1] AS href
         |  FROM documents WHERE doc_id IS NOT NULL)
         |SELECT doc_id, base, href, $jOrigin || $clamped AS resolved
         |FROM d
         |ORDER BY doc_id""".stripMargin
    },

    // identical body synthesis; line typing + lag group ids +
    // exact-beats-star replayed
    "q216_robots_parse" ->
      """WITH r AS (
        |  SELECT 'd' || doc_id AS domain,
        |    '# fetched' || chr(10) ||
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      'User-agent: graftbot' || chr(10) ||
        |      'Disallow: /g' || (doc_id % 5) || '/' || chr(10) ||
        |      'Allow: /g' || (doc_id % 5) || '/pub' || chr(10) ||
        |      'Crawl-delay: ' || (doc_id % 4) || chr(10) || chr(10)
        |    ELSE '' END ||
        |    'User-agent: *' || chr(10) ||
        |    'Disallow: /x' || (doc_id % 3) || '/' || chr(10) ||
        |    'Disallow:' || chr(10) ||
        |    'Sitemap: https://d' || (doc_id % 7) || '.example.com/sitemap.xml'
        |    AS body
        |  FROM documents WHERE doc_id IS NOT NULL),
        |lines AS (
        |  SELECT domain, CAST(u.i AS INT) AS i,
        |    trim(regexp_replace(ls[u.i], '#.*$', '')) AS l
        |  FROM (SELECT domain, string_split(body, chr(10)) AS ls FROM r),
        |    unnest(generate_series(1, len(ls))) AS u(i)),
        |typed AS (
        |  SELECT domain, i, l,
        |    lower(regexp_extract(l, '(?i)^user-agent\s*:\s*(\S+)', 1)) AS ua
        |  FROM lines),
        |t2 AS (
        |  SELECT *, (ua <> '') AS isua,
        |    CASE WHEN ua <> '' AND NOT coalesce(
        |      lag(ua <> '') OVER (PARTITION BY domain ORDER BY i), false)
        |      THEN 1 ELSE 0 END AS newg
        |  FROM typed),
        |t3 AS (
        |  SELECT *, sum(newg) OVER (PARTITION BY domain ORDER BY i
        |    ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM t2),
        |grps AS (
        |  SELECT domain, grp,
        |    max(CASE WHEN ua = 'graftbot' THEN 1 ELSE 0 END) AS ex,
        |    max(CASE WHEN ua = '*' THEN 1 ELSE 0 END) AS st
        |  FROM t3 WHERE isua GROUP BY 1, 2),
        |de AS (SELECT domain, max(ex) AS hasex FROM grps GROUP BY 1),
        |app AS (
        |  SELECT t3.domain, t3.l,
        |    coalesce(CASE WHEN de.hasex = 1 THEN g.ex = 1 ELSE g.st = 1 END,
        |      false) AS applies
        |  FROM t3 LEFT JOIN grps g USING (domain, grp)
        |    LEFT JOIN de USING (domain))
        |SELECT domain,
        |  CASE WHEN al <> '' THEN al ELSE dis END AS rule_path,
        |  (al <> '') AS allow
        |FROM (
        |  SELECT domain, applies,
        |    regexp_extract(l, '(?i)^allow\s*:\s*(\S+)', 1) AS al,
        |    regexp_extract(l, '(?i)^disallow\s*:\s*(\S+)', 1) AS dis
        |  FROM app)
        |WHERE applies AND (al <> '' OR dis <> '')
        |ORDER BY domain, rule_path""".stripMargin,

    // each link's canonical target in closed form — the engine must
    // reproduce it through the real extract→resolve→canonicalize chain
    "q217_link_frontier" ->
      """WITH t AS (
        |  SELECT doc_id, unnest([
        |    'https://s' || (doc_id % 6) || '.example.com/dir' || (doc_id % 3)
        |      || '/art' || (doc_id % 8) || '.html',
        |    'https://s' || (doc_id % 6) || '.example.com/shared/hub.html?ref='
        |      || (doc_id % 4),
        |    'https://s' || (doc_id % 6) || '.example.com/dir'
        |      || ((doc_id + 1) % 3) || '/other.html'
        |  ]) AS target
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT target, CAST(count(*) AS BIGINT) AS n_refs,
        |  min(doc_id) AS first_referrer
        |FROM t GROUP BY target
        |ORDER BY target""".stripMargin,

    // closed-form allowed set + offsets: /pX allowed iff X != h%3 or
    // the /p(h%3)9 allow-exception; delay = (h+1) s
    "q222_robots_politeness" ->
      """WITH d0 AS (
        |  SELECT doc_id, doc_id % 7 AS h, doc_id % 5 AS p
        |  FROM documents WHERE doc_id IS NOT NULL),
        |u AS (
        |  SELECT doc_id, h, 'd' || h || '.example.com' AS host,
        |    'https://d' || h || '.example.com' ||
        |    CASE WHEN doc_id % 11 = 0 THEN '/p' || (h % 3) || '9'
        |         ELSE '/p' || p END AS url,
        |    (doc_id % 11 = 0 OR p <> (h % 3)) AS ok
        |  FROM d0),
        |r AS (
        |  SELECT doc_id, url, host, h,
        |    CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) - 1
        |      AS BIGINT) AS fetch_seq
        |  FROM u WHERE ok)
        |SELECT doc_id, url, host, fetch_seq,
        |  CAST(fetch_seq * ((h + 1) * 1000) AS BIGINT) AS fetch_offset_ms
        |FROM r
        |ORDER BY doc_id""".stripMargin,
  )
}
