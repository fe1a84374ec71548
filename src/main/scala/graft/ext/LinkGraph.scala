package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.PlanCapture

/** Link-graph authority scoring for crawl curation. Domain- and
  * page-level PageRank is the standard crawl-frontier / quality prior
  * (a page linked by many high-rank pages is worth crawling and worth
  * training on); at corpus scale the link graph is billions of edges, so
  * the iteration must move only rank-sized frames, never re-shuffle the
  * edge list, and never collect anything graph-sized.
  *
  * Same machinery family as [[Dedup.connectedComponents]]: edges are
  * hash-partitioned once up front (lineage cuts preserve the
  * partitioning), each round is one join + one skinny aggregate, and the
  * frame that moves carries (id, rank) only.
  *
  * All arithmetic is EXACT INTEGER: ranks are bigints scaled by 1e12 and
  * the damping factor is a rational `dampingNum / dampingDen` (default
  * 85/100), so every step is integral multiply + integral divide (SQL
  * `div`, floor for the non-negative operands used here). No doubles
  * anywhere — an external SQL engine replays the fixed point bit-for-bit
  * as k chained CTEs, which the gate oracles do, with zero sensitivity
  * to float rounding or engine version.
  */
object LinkGraph {

  /** Fixed-iteration damped PageRank over a directed edge list, in the
    * engine-replayable integer-scaled form (the q87/q129 stance):
    *
    *   r0(v)   = floor(1e12 / N)
    *   r_k(v)  = floor(teleportE12 / N)
    *             + Σ_{u→v} (r_{k-1}(u) · dampingNum) div (outdeg(u) · dampingDen)
    *             [+ dangling share, when `redistributeDangling`]
    *
    * Integer contributions sum as BIGINT: partition-order independent.
    *
    * `teleportE12` must be (1 − damping) · 1e12 in intent; it is a
    * separate exact-integer parameter (not derived) so the caller states
    * the integer and both engines divide it by N identically.
    *
    * `redistributeDangling = true` restores the textbook invariant that
    * sink (no-out-edge) rank mass is not lost: each round the dangling
    * mass D = Σ_{outdeg(u)=0} r_{k-1}(u) folds into a one-row aggregate
    * and every node receives floor(D · dampingNum / (dampingDen · N)).
    * Default false (rank totals drift below 1e12 — fine for the
    * ranking / prior use, and one fewer aggregate per round).
    *
    * Multi-edges collapse (`distinct`); a fixed iteration count (default
    * 5) rather than convergence detection keeps the oracle replayable —
    * PageRank's use here is a quality PRIOR, not an eigenvector to
    * machine precision.
    *
    * Per-round shuffle profile: ranks exchange on src to meet the
    * pre-partitioned edges, then (dst, contrib) pairs — 16 bytes/edge —
    * exchange into the sum aggregate (map-side partial sums first). The
    * edge list itself never moves after the initial partition. The ONLY
    * driver scalar is `nodes.count()`, once: the dangling-mass sum (when
    * redistribution is on) rides as a one-row aggregate frame
    * cross-joined into the update, so rounds chain without driver
    * barriers.
    */
  def pageRank(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst", iterations: Int = 5,
               dampingNum: Long = 85L, dampingDen: Long = 100L,
               teleportE12: Long = 150000000000L,
               redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingNum > 0 && dampingNum < dampingDen,
      "damping must be a rational in (0, 1)")
    val e = PlanCapture.cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    val nodes = PlanCapture.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct())
    val n = nodes.count() // the one always-on driver scalar
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val outdeg = PlanCapture.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val base = teleportE12 / n
    var ranks = PlanCapture.cut(
      nodes.withColumn("rank", lit(1000000000000L / n)))
    var k = 0
    while (k < iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"), col("rank"), col("outdeg"))
        .selectExpr("id",
          s"(rank * ${dampingNum}L) div (outdeg * ${dampingDen}L) AS __c")
        .groupBy(col("id")).agg(sum(col("__c")).cast("long").as("__cin"))
      // textbook dangling-mass term: a ONE-ROW aggregate frame
      // cross-joined into the update (exact-integer div, all operands
      // non-negative) — not a driver collect, so a k-round run has no
      // per-round driver barrier (the q149/hits stance)
      ranks =
        if (!redistributeDangling)
          PlanCapture.cut(nodes
            .join(contribs, Seq("id"), "left")
            .select(col("id"),
              (lit(base) + coalesce(col("__cin"), lit(0L))).as("rank")))
        else {
          val shareF = ranks.join(outdeg,
              ranks("id") === outdeg("src"), "left_anti")
            .agg(coalesce(sum(col("rank")), lit(0L)).as("__d"))
            .selectExpr(
              s"(__d * ${dampingNum}L) div (${dampingDen}L * ${n}L) AS __share")
          PlanCapture.cut(nodes
            .join(contribs, Seq("id"), "left")
            .crossJoin(shareF)
            .selectExpr("id",
              s"${base}L + __share + coalesce(__cin, 0L) AS rank"))
        }
      k += 1
    }
    ranks
  }

  /** Personalized PageRank: teleport mass lands proportionally to a
    * caller-supplied non-negative integer prior instead of uniformly —
    * the crawl-frontier form where the prior is a per-domain quality
    * score (see [[WebUrl.withDomainQuality]]) and the output is the
    * quality-biased authority of each node.
    *
    * Exact-integer normalization keeps every product inside a BIGINT:
    * the prior is first normalized to wN(v) = (w(v) · 1e6) div W (six
    * scaled digits, W = Σ w over graph nodes; one driver scalar), then
    *
    *   teleport(v) = (teleportE12 · wN(v)) div 1e6       ≤ 1.5e17
    *   r0(v)       = (1e12 · wN(v)) div 1e6              ≤ 1e18
    *   r_k(v)      = teleport(v)
    *               + Σ_{u→v} (r_{k-1}(u) · dampingNum) div (outdeg(u) · dampingDen)
    *               + (M · wN(v)) div 1e6                 ≤ 1e18
    *     where M = (D · dampingNum) div dampingDen, D = Σ dangling rank
    *
    * Dangling mass is ALWAYS redistributed here (per the personalization
    * vector, the textbook personalized form) — without it, sink loss
    * would bias against exactly the high-prior nodes the caller boosted.
    * Requires Σ w ≤ ~9e12 so `w · 1e6` stays in range — a per-domain
    * e6-scaled quality prior over millions of domains is well inside.
    *
    * Nodes absent from `prior` (and graph nodes whose prior is null)
    * weigh 0: they receive no teleport mass and act as pure conduits.
    * Same shuffle profile as [[pageRank]]; the prior joins to nodes once
    * up front, never per round.
    */
  def personalizedPageRank(edges: DataFrame, prior: DataFrame,
                           priorIdCol: String = "id",
                           priorWeightCol: String = "weight",
                           srcCol: String = "src", dstCol: String = "dst",
                           iterations: Int = 5,
                           dampingNum: Long = 85L, dampingDen: Long = 100L,
                           teleportE12: Long = 150000000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(dampingNum > 0 && dampingNum < dampingDen,
      "damping must be a rational in (0, 1)")
    val e = PlanCapture.cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    // Aggregate the prior by id BEFORE joining: a prior with duplicate ids
    // would otherwise fan out the left join, duplicating node rows through
    // every round (totalW, teleport mass, dangling sum and edge
    // contributions all silently double-counted). Sum is the natural merge
    // for weight mass; negatives clamp to 0 per row first.
    val w0 = prior
      .select(col(priorIdCol).cast("long").as("id"),
        greatest(coalesce(col(priorWeightCol).cast("long"), lit(0L)),
          lit(0L)).as("w"))
      .groupBy(col("id")).agg(sum(col("w")).as("w"))
    val nodesW = PlanCapture.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct()
        .join(w0, Seq("id"), "left")
        .select(col("id"), coalesce(col("w"), lit(0L)).as("w")))
    val totalW = nodesW.agg(coalesce(sum(col("w")), lit(0L)))
      .head().getLong(0) // one driver scalar
    if (nodesW.isEmpty) return nodesW.select(col("id")).withColumn("rank", lit(0L))
    require(totalW > 0, "prior must give positive weight to >=1 graph node")
    // The scaladoc bound made enforceable: wn = (w * 1e6) div W needs
    // w * 1_000_000L inside a BIGINT, and 0 <= w <= totalW bounds every
    // product — without this, an oversized prior silently wraps negative
    // under non-ANSI arithmetic and produces garbage ranks.
    require(totalW <= 9200000000000L,
      s"sum of prior weights ($totalW) exceeds the exact-integer bound " +
        "9.2e12; pre-scale the prior down (ranks only depend on ratios)")
    // wN: e6-scaled normalized prior, joined once; rides every round as
    // a node attribute (no per-round re-join against `prior`)
    val nodes = PlanCapture.cut(nodesW
      .selectExpr("id", s"(w * 1000000L) div ${totalW}L AS wn"))
    val outdeg = PlanCapture.cut(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    var ranks = PlanCapture.cut(nodes
      .selectExpr("id", "wn", s"(1000000000000L * wn) div 1000000L AS rank"))
    var k = 0
    while (k < iterations) {
      // dangling mass as a one-row cross-joined aggregate (the q149
      // stance): no per-round driver barrier
      val mF = ranks.join(outdeg,
          ranks("id") === outdeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__d"))
        .selectExpr(s"(__d * ${dampingNum}L) div ${dampingDen}L AS __m")
      val contribs = e
        .join(ranks.select(col("id").as("src"), col("rank")), Seq("src"))
        .join(outdeg, Seq("src"))
        .select(col("dst").as("id"), col("rank"), col("outdeg"))
        .selectExpr("id",
          s"(rank * ${dampingNum}L) div (outdeg * ${dampingDen}L) AS __c")
        .groupBy(col("id")).agg(sum(col("__c")).cast("long").as("__cin"))
      ranks = PlanCapture.cut(nodes
        .join(contribs, Seq("id"), "left")
        .crossJoin(mF)
        .selectExpr("id", "wn",
          s"(${teleportE12}L * wn) div 1000000L" +
            s" + coalesce(__cin, 0L) + (__m * wn) div 1000000L AS rank"))
      k += 1
    }
    ranks.select(col("id"), col("rank"))
  }

  /** Fixed-iteration HITS (Kleinberg hubs & authorities) — the
    * complement to [[pageRank]] for crawl curation: PageRank finds pages
    * worth TRAINING on (endorsed content), HITS hubs find pages worth
    * CRAWLING from (link directories / sitemaps whose out-links
    * concentrate on strong authorities).
    *
    * Exact-integer, oracle-replayable (the q131 stance). Scores are
    * e6-scaled distributions; each half-round is one join + one sum,
    * then an integer renormalization by a single driver scalar:
    *
    *   h_0(v)    = 1e6
    *   a_k(v)    = Σ_{u→v} h'_{k-1}(u)           (raw BIGINT sum)
    *   a'_k(v)   = normalize(a_k(v); A_k),  A_k = Σ_v a_k(v)
    *   hraw_k(v) = Σ_{v→w} a'_k(w)
    *   h'_k(v)   = normalize(hraw_k(v); H_k), H_k = Σ_v hraw_k(v)
    *
    * where normalize(x; T) is the DUAL-BRANCH exact-integer L1 form,
    * one CASE an external engine replays verbatim:
    *   T ≤ 9.2e12 → (x · 1e6) div T        (exact: x ≤ T keeps the
    *                                        product inside a BIGINT)
    *   T > 9.2e12 → x div max(T div 1e6, 1) (pre-scaled divisor: no
    *                                        overflow at ANY scale, ≤1
    *                                        part-per-million coarser)
    * Raw sums are bounded by 1e6 · |E|, so the exact branch covers
    * graphs to ~9.2e6 edges and the big branch the rest — both produce
    * scores summing to ≈1e6 (floor loss only), so iterates can't grow;
    * the usual HITS L2 normalization is replaced by an L1 form that
    * needs no sqrt and replays bit-for-bit in SQL.
    *
    * Shuffle profile matches [[pageRank]]: edges hash-partition once,
    * each half-round moves only (id, score) pairs with map-side partial
    * sums. Unlike [[pageRank]]'s dangling scalar, the round totals are
    * NOT driver collects: each rides as a one-row aggregate frame
    * cross-joined into the normalize CASE, so a k-round run is ONE job
    * with zero per-round driver barriers (2k fewer blocking collects —
    * on a 1000-executor cluster each barrier is a full-cluster drain).
    * Fixed `iterations` keeps the oracle a chain of CTEs.
    */
  /** The dual-branch normalize over column `c` against a one-row total
    * frame's column `__t` (cross-joined in — no driver scalar).
    */
  private def normCase(c: String): String =
    s"""CAST(CASE WHEN __t > 0L AND __t <= 9200000000000L
       |  THEN ($c * 1000000L) div __t
       |  ELSE $c div greatest(__t div 1000000L, 1L)
       |  END AS BIGINT)""".stripMargin

  def hits(edges: DataFrame, srcCol: String = "src", dstCol: String = "dst",
           iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = PlanCapture.cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    val nodes = PlanCapture.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct())
    if (nodes.isEmpty)
      return nodes.withColumn("hub_e6", lit(0L))
        .withColumn("auth_e6", lit(0L))
    var hubs = PlanCapture.cut(nodes.withColumn("h", lit(1000000L)))
    var auths: DataFrame = null
    var k = 0
    while (k < iterations) {
      val aRaw = nodes
        .join(e.join(hubs.select(col("id").as("src"), col("h")), Seq("src"))
            .groupBy(col("dst").as("id"))
            .agg(sum(col("h")).cast("long").as("__a")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__a"), lit(0L)).as("a"))
      val aTot = aRaw.agg(coalesce(sum(col("a")), lit(0L))
        .cast("long").as("__t"))
      auths = PlanCapture.cut(aRaw.crossJoin(aTot)
        .selectExpr("id", s"${normCase("a")} AS a"))
      val hRaw = nodes
        .join(e.join(auths.select(col("id").as("dst"), col("a")), Seq("dst"))
            .groupBy(col("src").as("id"))
            .agg(sum(col("a")).cast("long").as("__h")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__h"), lit(0L)).as("h"))
      val hTot = hRaw.agg(coalesce(sum(col("h")), lit(0L))
        .cast("long").as("__t"))
      hubs = PlanCapture.cut(hRaw.crossJoin(hTot)
        .selectExpr("id", s"${normCase("h")} AS h"))
      k += 1
    }
    hubs.join(auths, Seq("id"))
      .select(col("id"), col("h").as("hub_e6"), col("a").as("auth_e6"))
  }

  /** Co-citation pairs — link-graph document similarity: two pages
    * co-cited when the same page links to both, scored by the number of
    * distinct common citing pages. The graph-side near-dup /
    * related-page signal that needs no text at all.
    *
    * The classic self-join blowup is bounded the LSH-bucket way: a
    * citing page with out-degree d yields d·(d−1)/2 pairs, so pages
    * whose out-degree exceeds `maxOutDeg` are dropped BEFORE pairing
    * (link farms / mega-directories contribute noise, not signal —
    * the standard frequent-bucket cut, same stance as the span/gram
    * postings caps). Work is then Σ min(d, cap)² per citing page:
    * linear-ish in edges, never quadratic in the corpus. Pairs emit
    * (lo, hi) ordered so each unordered pair counts once; `distinct`
    * on (citer, a, b) first so multi-edges can't double-count.
    *
    * One shuffle to group edges by citer, one to aggregate pair counts;
    * `minCocitations` prunes the long tail before the aggregate's
    * output ever materializes.
    */
  def cocitation(edges: DataFrame, srcCol: String = "src",
                 dstCol: String = "dst", maxOutDeg: Int = 64,
                 minCocitations: Long = 2L): DataFrame = {
    require(maxOutDeg >= 2, "maxOutDeg must be >= 2")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .filter(col("src") =!= col("dst"))
      .distinct()
    val kept = e.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("dsts"))
      .filter(size(col("dsts")) <= maxOutDeg && size(col("dsts")) >= 2)
    // per-citer pair fan-out stays inside one task via the collected
    // (capped) out-list: no self-join of the edge table
    val pairs = kept.select(explode(expr(
      """flatten(transform(dsts, (x, i) ->
        |  transform(slice(dsts, i + 2, size(dsts) - i - 1), y ->
        |    struct(least(x, y) AS id_a, greatest(x, y) AS id_b))))"""
        .stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    pairs.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("n_common"))
      .filter(col("n_common") >= minCocitations)
  }

  /** Semi-supervised label propagation — spread a sparse set of trusted
    * labels (spam/ham domain verdicts, topic tags, language families)
    * over the link graph: each round, every node adopts the majority
    * label among its in-neighbors' current labels, seeds stay clamped,
    * and unlabeled nodes stay null until a labeled neighbor reaches
    * them. The standard cheap alternative to training a classifier when
    * the graph itself carries the signal.
    *
    * Deterministic and oracle-replayable: the majority vote breaks ties
    * by MIN label (one struct-max aggregate — no window over row-level
    * data), rounds are fixed-count, and every step is a join + aggregate
    * over (id, label) frames. Same shuffle profile as [[pageRank]]:
    * edges partition once, label frames move.
    *
    * Seeds clamp (the semi-supervised form): a seeded node's label never
    * changes, which also removes the oscillation classic LPA needs
    * random orderings to escape.
    */
  def labelPropagation(edges: DataFrame, seeds: DataFrame,
                       srcCol: String = "src", dstCol: String = "dst",
                       seedIdCol: String = "id", seedLabelCol: String = "label",
                       iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = PlanCapture.cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    val nodes = PlanCapture.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct())
    // duplicate seed ids collapse to their min label up front: without
    // this a conflicting seed frame would fan out every round's join
    val s = seeds
      .select(col(seedIdCol).cast("long").as("id"),
        col(seedLabelCol).cast("long").as("__seed"))
      .filter(col("id").isNotNull && col("__seed").isNotNull)
      .groupBy(col("id")).agg(min(col("__seed")).as("__seed"))
    var labels = PlanCapture.cut(nodes.join(s, Seq("id"), "left")
      .select(col("id"), col("__seed").as("label")))
    var k = 0
    while (k < iterations) {
      val votes = e
        .join(labels.filter(col("label").isNotNull)
          .select(col("id").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("id"), col("label"))
        .agg(count(lit(1)).as("__c"))
        // majority with min-label tiebreak in ONE aggregate:
        // max(struct(count, -label)) picks max count, then min label
        .groupBy(col("id"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__b"))
        .select(col("id"), (-col("__b.__nl")).as("__vote"))
      labels = PlanCapture.cut(nodes
        .join(s, Seq("id"), "left")
        .join(votes, Seq("id"), "left")
        .join(labels.withColumnRenamed("label", "__prev"), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__seed"), col("__vote"), col("__prev")).as("label")))
      k += 1
    }
    labels
  }

  /** Multi-source BFS hop distance — the crawl-depth computation: how
    * many link hops separate each page from the nearest SEED (the
    * curated frontier / sitemap set), the standard crawl-budget and
    * quality prior ("depth ≥ 6 from any seed" is a classic drop rule).
    *
    * Bellman-Ford-shaped fixed rounds (maxHops of them — exactly the
    * frontier's hop budget, so "unreached within budget" and "node
    * beyond budget" coincide by construction): each round one join +
    * one min-aggregate, dist frames only; edges partition once. All
    * distances are exact small integers — the oracle replays the rounds
    * as chained CTEs. Unreached nodes report null.
    */
  def hopDistance(edges: DataFrame, seeds: DataFrame,
                  srcCol: String = "src", dstCol: String = "dst",
                  seedIdCol: String = "id", maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = PlanCapture.cut(edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src")))
    val nodes = PlanCapture.cut(
      e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
        .distinct())
    val s = seeds.select(col(seedIdCol).cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
    var dist = PlanCapture.cut(nodes.join(s.withColumn("__z", lit(0L)),
        Seq("id"), "left")
      .select(col("id"), col("__z").as("dist")))
    var k = 0
    while (k < maxHops) {
      val cand = e
        .join(dist.filter(col("dist").isNotNull)
          .select(col("id").as("src"), col("dist")), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("dist") + 1L).as("__c"))
      dist = PlanCapture.cut(dist.join(cand, Seq("id"), "left")
        .select(col("id"),
          when(col("dist").isNull, col("__c"))
            .when(col("__c").isNull, col("dist"))
            .otherwise(least(col("dist"), col("__c"))).as("dist")))
      k += 1
    }
    dist
  }

  /** Triangle enumeration over the undirected graph — the density /
    * community-structure QA signal (triangle-free neighborhoods are
    * spam-graph shaped; dense ones are organic). Emits each triangle
    * once as (id_a < id_b < id_c).
    *
    * Scale shape: edges symmetrize + orient by id (a < b), nodes past
    * `maxDeg` oriented-degree are cut FIRST (the [[cocitation]]
    * link-farm stance — a hub of degree d contributes O(d²) wedges),
    * then two hash equi-joins: wedges (a<b<c sharing a) probe the
    * oriented edge set for the closing (b, c) edge. No collect, no
    * cross join; work is Σ min(deg, cap)² per node.
    */
  def triangles(edges: DataFrame, srcCol: String = "src",
                dstCol: String = "dst", maxDeg: Int = 64): DataFrame = {
    require(maxDeg >= 2, "maxDeg must be >= 2")
    val e0 = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .filter(col("a") =!= col("b"))
    val adj = e0.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val kept = adj.join(
      adj.groupBy(col("a")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") <= maxDeg).select("a"),
      Seq("a"), "left_semi")
    val wedges = kept.as("x").join(kept.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.a").as("id_a"), col("x.b").as("id_b"),
        col("y.b").as("id_c"))
    wedges.join(adj.select(col("a").as("id_b"), col("b").as("id_c")),
        Seq("id_b", "id_c"), "left_semi")
      .select("id_a", "id_b", "id_c") // using-join put the keys first
  }

  /** k-core peeling — the density filter a crawl/link analysis runs to
    * find the graph's cohesive interior (spam farms and boilerplate
    * link-rings melt away with the low-degree fringe): repeatedly drop
    * every node whose UNDIRECTED simple-graph degree is below k, then
    * recount, since removals reduce neighbors' degrees.
    *
    * Round semantics are FIXED-COUNT, not run-to-fixpoint, for the same
    * reason as [[pageRank]]'s fixed 5 iterations: a deterministic,
    * externally-replayable unrolling (the oracle unrolls the identical
    * rounds in SQL). Peeling is monotone — once converged, further
    * rounds are identity — so `rounds` is an upper bound the caller
    * sizes to the graph's peel depth; the companion fixpoint check
    * lives in the spec. Per round: one degree aggregate over the
    * surviving edges + two semi-joins; edges only ever SHRINK, and
    * lineage is cut each round so the plan stays flat at any `rounds`.
    *
    * Output: surviving (id, degree) pairs — degree as counted within
    * the final core.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 8,
            srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    var e = PlanCapture.cut(und)
    var r = 0
    while (r < rounds) {
      val deg = e.select(col("a").as("id"))
        .union(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("__d"))
      val keep = deg.filter(col("__d") >= k).select("id")
      e = PlanCapture.cut(
        e.join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
          .select("a", "b"))
      r += 1
    }
    e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).cast("long").as("degree"))
      .filter(col("degree") >= k)
  }

  /** Anchor-text aggregation — how the web labels its own pages: the
    * top-k terms other pages use when LINKING to a target, the classic
    * off-page relevance signal (and, for curation, a second opinion on
    * what a document is about that its own text can't game).
    *
    * Input is one row per link: (dstCol, textCol) with the anchor's
    * text. Terms are lowercased whitespace tokens. Two stages:
    *   1. row-level terms collapse into (dst, term, n_anchors) counts —
    *      partial aggregation applies, so the shuffle carries per-task
    *      (dst, term) partials, never anchor rows;
    *   2. rank ≤ k per dst over the REDUCED count frame — the window
    *      sorts distinct (dst, term) pairs, bounded by vocabulary ×
    *      targets, not by link count. (The window-vs-TopKAgg rule from
    *      q08/q54 applies to ROW-level ranking; after a count aggregate
    *      the window input is already small.)
    * Ordering (n_anchors DESC, term ASC) is total per dst, so the k
    * survivors are deterministic and externally replayable.
    */
  def anchorTopTerms(anchors: DataFrame, dstCol: String, textCol: String,
                     k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = anchors
      .filter(col(dstCol).isNotNull && col(textCol).isNotNull)
      .select(col(dstCol).as("dst"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("dst"), col("term"))
      .agg(count(lit(1)).cast("long").as("n_anchors"))
    counts
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("dst"))
          .orderBy(col("n_anchors").desc, col("term").asc)))
      .filter(col("rank") <= k)
  }
}
