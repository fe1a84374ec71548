package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl corpora — the normalization every URL-keyed
  * stage (per-domain caps, URL dedup, domain mixing weights) depends on.
  * A crawl sees the same page as `HTTP://Example.COM:80/a?utm_source=x&b=1#top`
  * and `http://example.com/a?b=1`; keying on raw strings splits its stats
  * across spellings and lets tracking params defeat URL-level dedup.
  *
  * Everything here is pure per-row column expressions over built-in
  * functions — codegen'd, no shuffle, streaming-safe — and every regex is
  * RE2-compatible (no lookaround/backreferences), so an external engine
  * can replay the normalization bit-for-bit (the oracle does).
  *
  * Scope: absolute `http(s)://` URLs, the crawl-pipeline case. Inputs
  * that aren't that are normalized deterministically but not usefully
  * (no scheme inference, no IDN/punycode, no %-decoding — those need a
  * spec-complete parser, not an analytics engine). Null in, null out.
  */
object WebUrl {

  /** Lowercased host of an absolute URL: authority minus userinfo minus
    * port. `""` when the input has no `scheme://` authority at all.
    *
    * Kernelized (r16): one native expression node
    * ([[graft.functions.UrlHost]]) replaces the 3-regex chain — same
    * bytes out (parity spec-pinned against [[hostOfSpec]], which IS the
    * old declarative form and what the oracles replay), one string pass
    * per row, and a 1-node footprint in every plan fork instead of ~6.
    */
  def hostOf(url: Column): Column =
    graft.functions.UrlFunctions.hostOf(url)

  /** The declarative reference form of [[hostOf]] — kept for the kernel
    * parity spec (UrlKernelParitySpec asserts bytewise equality).
    */
  private[ext] def hostOfSpec(url: Column): Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    lower(regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":\\d*$", ""))
  }

  /** Canonical form of an absolute http(s) URL:
    *  - scheme and host lowercased; userinfo dropped
    *  - default port stripped (`:80` for http, `:443` for https);
    *    non-default ports kept
    *  - empty path becomes `/` (path case is preserved — paths are
    *    case-sensitive, hosts are not)
    *  - fragment dropped
    *  - tracking query params dropped (`utm_*`, `gclid`, `fbclid`,
    *    `msclkid`, `yclid`, `mc_eid`), the rest SORTED bytewise; an
    *    emptied query loses its `?`
    *
    * Kernelized (r16): one native expression node
    * ([[graft.functions.CanonicalizeUrl]]) replaces the ~30-node
    * regex/array tree. The declarative form below ([[canonicalizeUrlSpec]])
    * stays as the parity reference — it is what the DuckDB oracles
    * replay, and UrlKernelParitySpec pins the kernel to it bytewise.
    * Beyond per-row cost, the win is PLAN size: dedup-by-canonical and
    * the domain roll-up each fork the expression tree into both join
    * sides, so the curation capstones paid ~1–2 s of driver planning
    * per run on duplicated trees (r15 profile).
    */
  def canonicalizeUrl(url: Column): Column =
    graft.functions.UrlFunctions.canonicalizeUrl(url)

  /** The declarative reference form of [[canonicalizeUrl]] — kept for
    * the kernel parity spec.
    */
  private[ext] def canonicalizeUrlSpec(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val hostPort = regexp_replace(auth, "^[^@]*@", "")
    val host = lower(regexp_replace(hostPort, ":\\d*$", ""))
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // the query starts at the FIRST '?' before any '#' (RFC 3986) — the
    // leading class must exclude '?' itself or the regex greedily
    // anchors to the LAST one, dropping params between them; later '?'s
    // are legal query content and stay inside the capture
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val keptParams = array_sort(filter(split(query, "&"), p =>
      !p.rlike("^(utm_[^=]*|gclid|fbclid|msclkid|yclid|mc_eid)(=|$)")
        && p =!= ""))
    val canonPort = when(port === ""
      || (scheme === "http" && port === "80")
      || (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val canonPath = when(path === "", lit("/")).otherwise(path)
    val canonQuery = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, canonPort, canonPath, canonQuery)
  }

  /** Registrable domain of a host, by the standard two-label heuristic
    * with the ubiquitous multi-part second levels special-cased (a full
    * public-suffix list is data, not logic — swap one in by joining it;
    * this covers the `co.uk`-shaped bulk): last two labels, or last
    * THREE when the second-to-last label is a known second-level
    * (`co|com|net|org|gov|ac|edu`) under a two-letter ccTLD. IPv4
    * literals and single-label hosts pass through unchanged. The
    * grouping key for per-domain caps, domain mixing weights, and
    * domain-level dedup.
    *
    * Kernelized (r16): one native expression node
    * ([[graft.functions.UrlRegistrableDomain]]) replaces the
    * split/slice/when tree — bytewise-equal to [[registrableDomainSpec]]
    * (parity spec-pinned), including the null-host → "" edge the
    * declarative concat_ws fall-through produces.
    */
  def registrableDomain(host: Column): Column =
    graft.functions.UrlFunctions.registrableDomain(host)

  /** The declarative reference form of [[registrableDomain]] — kept for
    * the kernel parity spec.
    */
  private[ext] def registrableDomainSpec(host: Column): Column = {
    val h = lower(host)
    val labels = split(h, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val tld = element_at(labels, -1)
    when(h.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$"), h)
      .when(n <= 2, h)
      .when(sld.isin("co", "com", "net", "org", "gov", "ac", "edu")
        && length(tld) === 2, concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** Per-registrable-domain quality roll-up joined back onto each row:
    * appends `reg_domain`, `domain_docs`, and `domain_mean_scaled` —
    * the inputs of domain-level curation decisions (drop documents from
    * domains whose MEAN quality is low, cap pages per domain) that
    * per-document filters can't make.
    *
    * `scoreScaledCol` must be an integer-scaled per-document score
    * (e.g. `floor(quality · 1e6)` as bigint): integer sums are
    * order-independent, so `domain_mean_scaled = floor(sum / count)` is
    * one deterministic double division an external engine replays
    * exactly — a double `avg` would depend on reduction order.
    *
    * Shape, deliberately: aggregate-then-join, NOT a window and NOT a
    * broadcast. A window over `partitionBy(reg_domain)` shuffles AND
    * sorts every row; the aggregate is two-phase (map-side partial sums,
    * the exchange carries one row per domain per task) and the join back
    * re-shuffles rows without sorting. The stats side can't be broadcast
    * at corpus scale — a web crawl has ~10^8 registrable domains — so
    * this is a plain hash equi-join AQE can size (and skew-split: a
    * mega-domain like blogspot is exactly AQE's skew-join case).
    */
  def withDomainQuality(df: DataFrame, urlCol: String,
                        scoreScaledCol: String): DataFrame = {
    val dom = df.withColumn("reg_domain",
      registrableDomain(hostOf(col(urlCol))))
    val stats = dom.groupBy(col("reg_domain"))
      .agg(count(lit(1)).as("domain_docs"),
        sum(col(scoreScaledCol)).as("__ssum"))
      .select(col("reg_domain"), col("domain_docs"),
        floor(col("__ssum").cast("double") / col("domain_docs"))
          .cast("long").as("domain_mean_scaled"))
    dom.join(stats, Seq("reg_domain"))
  }

  /** Crawl blocklist audit — the UT1/adult-list shape every crawl
    * pipeline runs before spending tokens on a page. Appends, per row:
    *  - `reg_domain`: [[registrableDomain]] of the URL's host, so a
    *    blocklist entry `example.net` catches `ads.example.net` too;
    *  - `domain_blocked`: reg_domain ∈ `blockedDomains` (exact,
    *    case-insensitive);
    *  - `n_blocked_hits`: total occurrences of any `blockedSubstrings`
    *    entry in the lowercased URL (path/query patterns like `/ads/`),
    *    ALL matched in one Aho–Corasick byte-DFA pass
    *    ([[graft.functions.MultiMatch]]) instead of N contains scans;
    *  - `keep_url`: neither list fired.
    * Flags, not filters (the QualityFilters stance): curation wants to
    * AUDIT what a list would drop before committing; callers filter on
    * `keep_url`.
    *
    * Scale: both lists are config-sized (the public blocklists are
    * thousands of entries). Domains match through a literal `isin`
    * (codegen'd hash set — no join, no broadcast variable); substrings
    * through one DFA whose transition table ships once per executor
    * inside the codegen'd expression. A corpus-sized blocklist is a
    * different operator: anti-join it on reg_domain.
    */
  def withBlocklist(df: DataFrame, urlCol: String,
                    blockedDomains: Seq[String],
                    blockedSubstrings: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty || blockedSubstrings.nonEmpty,
      "at least one blocklist must be non-empty")
    val rd = registrableDomain(hostOf(col(urlCol)))
    val domBlocked =
      if (blockedDomains.isEmpty) lit(false)
      else rd.isin(blockedDomains.map(_.toLowerCase): _*)
    val subHits: Column =
      if (blockedSubstrings.isEmpty) lit(0L)
      else aggregate(
        graft.functions.MultiMatchFunctions.multiPatternCounts(
          lower(col(urlCol)), blockedSubstrings.map(_.toLowerCase)),
        lit(0L), (acc, x) => acc + x)
    // null url ⇒ null host/counts: unknown is not evidence of a block, so
    // both signals coalesce to their clean value and the row is kept
    df.withColumn("reg_domain", rd)
      .withColumn("domain_blocked", coalesce(domBlocked, lit(false)))
      .withColumn("n_blocked_hits", coalesce(subHits, lit(0L)))
      .withColumn("keep_url",
        !col("domain_blocked") && col("n_blocked_hits") === 0L)
  }

  /** URL-level dedup: one surviving row per CANONICAL url (the min-id
    * row — the [[Dedup]] keep-first policy), with the canonical form
    * appended as `url_canon`. The recrawl-collapse step: a page fetched
    * as `HTTP://Example.COM:80/a?utm_source=x#frag` and
    * `http://example.com/a` is one document, and URL dedup removes it
    * before any content-level pass pays to tokenize it twice.
    *
    * Rows with a null id or a null url are dropped (no identity / no
    * key — the module's null stance). `idCol` must be unique per row.
    *
    * Scale shape: the canonical form is per-row column arithmetic in the
    * scan; the keep-set is ONE aggregate keyed by the canonical string
    * (bounded by URL length — ~100 B, the skinny-representation rule;
    * deliberately NOT a hash digest: a digest collision would silently
    * merge two distinct pages and DROP one, the one failure mode a
    * dedup must not have) and a semi-join back on (url_canon, id).
    */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String,
                          idCol: String): DataFrame = {
    val withCanon = df
      .filter(col(idCol).isNotNull && col(urlCol).isNotNull)
      .withColumn("url_canon", canonicalizeUrl(col(urlCol)))
    val keep = withCanon
      .groupBy(col("url_canon")).agg(min(col(idCol)).as(idCol))
    withCanon.join(keep, Seq("url_canon", idCol), "left_semi")
  }

  /** robots.txt rule evaluation — the crawl-politeness gate every fetch
    * frontier runs: given per-domain prefix rules, decide per URL
    * whether it may be crawled. Implements the longest-match semantics
    * of RFC 9309 (Google's published interpretation): among all rules
    * whose path is a prefix of the URL's path, the LONGEST wins; on an
    * exact length tie Allow beats Disallow; a URL matching no rule is
    * allowed.
    *
    * `rules` rows are (domainCol, pathCol, allowCol): lowercased host
    * the group applies to, literal path prefix (no `*`/`$` wildcards —
    * those need the DFA matcher, a different operator), and
    * allow=true / disallow=false. The decision is ONE integer aggregate:
    * each matching rule scores `2·len(path) + allow`, and max(score)
    * simultaneously encodes longest-match and the allow-wins tiebreak —
    * parity of the max IS the verdict. No window, no per-rule ordering.
    *
    * Output: input id/url plus `allowed` and `matched_len` (length of
    * the winning prefix; 0 when no rule matched).
    *
    * Scale: URLs join rules hash-partitioned on host — a domain's rule
    * group is config-sized (robots.txt caps at 500 KiB), so per-key
    * fan-out is bounded; AQE broadcasts the rules side outright when the
    * whole ruleset is small. One join + one partial-aggregated groupBy;
    * the URL table never moves twice.
    */
  /** Translate one robots.txt path pattern (literal + `*` any-run +
    * optional trailing `$` end anchor — the full RFC 9309 grammar) into
    * a SQL LIKE pattern with `#` as the escape char: LIKE's `%`/`_`
    * metacharacters (and `#` itself) in literal text are escaped, `*`
    * becomes `%`, and a pattern NOT ending in `$` gets a trailing `%`
    * (robots rules are prefix matches; LIKE is a full match). Lossless:
    * LIKE-with-escape is exactly the glob-with-anchor language. The
    * reference form of the column-level translation inside
    * [[robotsEvaluateWildcard]]; the spec asserts the two agree.
    */
  private[ext] def robotsPatternToLike(pattern: String): String = {
    val (body, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val sb = new StringBuilder
    body.foreach {
      case '*' => sb.append('%')
      case c @ ('%' | '_' | '#') => sb.append('#').append(c)
      case c => sb.append(c)
    }
    if (!anchored) sb.append('%')
    sb.toString
  }

  /** [[robotsEvaluate]] with the FULL RFC 9309 pattern grammar (`*`
    * wildcards and the `$` end anchor), not just literal prefixes:
    * matching is one SQL LIKE per (url, rule) pair after a lossless
    * glob→LIKE translation, and the verdict stays the single integer
    * max — 2·len(pattern)+allow, longest PATTERN wins, allow wins
    * length ties (Google's published tiebreak; `$`/`*` count toward
    * length exactly as the spec's "most specific" rule counts octets).
    * Same join/aggregate shape and scale posture as the literal form.
    */
  def robotsEvaluateWildcard(urls: DataFrame, idCol: String, urlCol: String,
                             rules: DataFrame, domainCol: String = "domain",
                             pathCol: String = "rule_path",
                             allowCol: String = "allow"): DataFrame = {
    val u = urls
      .filter(col(idCol).isNotNull && col(urlCol).isNotNull)
      .select(col(idCol), col(urlCol),
        hostOf(col(urlCol)).as("__host"),
        when(length(regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)) === 0, "/")
          .otherwise(regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
          .as("__path"))
    val r = rules.select(lower(col(domainCol)).as("__host"),
        col(pathCol).as("__rp"),
        col(allowCol).cast("boolean").as("__allow"))
      .filter(col("__rp").isNotNull && length(col("__rp")) > 0)
    // glob → LIKE as pure column ops ('#' as the escape char keeps the
    // expression readable in both engines): escape %/_/# in literals,
    // '*' → '%', strip a trailing '$' anchor else append the prefix '%'
    val likePat = {
      val deAnchored = when(col("__rp").endsWith("$"),
        expr("substring(__rp, 1, length(__rp) - 1)")).otherwise(col("__rp"))
      val escaped = regexp_replace(deAnchored, "([%_#])", "#$1")
      val starred = regexp_replace(escaped, "\\*", "%")
      when(col("__rp").endsWith("$"), starred)
        .otherwise(concat(starred, lit("%")))
    }
    val scored = u.join(r.withColumn("__like", likePat), Seq("__host"))
      .filter(expr("__path LIKE __like ESCAPE '#'"))
      .groupBy(col(idCol))
      .agg(max(length(col("__rp")).cast("long") * 2L
        + col("__allow").cast("long")).as("__score"))
    u.join(scored, Seq(idCol), "left")
      .select(col(idCol), col(urlCol),
        coalesce(col("__score") % 2L === 1L, lit(true)).as("allowed"),
        coalesce(expr("__score div 2"), lit(0L)).as("matched_len"))
  }

  def robotsEvaluate(urls: DataFrame, idCol: String, urlCol: String,
                     rules: DataFrame, domainCol: String = "domain",
                     pathCol: String = "rule_path",
                     allowCol: String = "allow"): DataFrame = {
    val u = urls
      .filter(col(idCol).isNotNull && col(urlCol).isNotNull)
      .select(col(idCol), col(urlCol),
        hostOf(col(urlCol)).as("__host"),
        // empty path (bare authority) crawls as "/"
        when(length(regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)) === 0, "/")
          .otherwise(regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))
          .as("__path"))
    val r = rules.select(lower(col(domainCol)).as("__host"),
      col(pathCol).as("__rp"),
      col(allowCol).cast("boolean").as("__allow"))
      .filter(col("__rp").isNotNull && length(col("__rp")) > 0)
    val scored = u.join(r, Seq("__host"))
      .filter(col("__path").startsWith(col("__rp")))
      .groupBy(col(idCol))
      .agg(max(length(col("__rp")).cast("long") * 2L
        + col("__allow").cast("long")).as("__score"))
    u.join(scored, Seq(idCol), "left")
      .select(col(idCol), col(urlCol),
        coalesce(col("__score") % 2L === 1L, lit(true)).as("allowed"),
        coalesce(expr("__score div 2"), lit(0L)).as("matched_len"))
  }

  /** Exact proportional budget apportionment (largest-remainder /
    * Hamilton method) — the "we can fetch N pages this cycle, split
    * them across domains by quality mass" step a crawl scheduler runs
    * above [[politenessSchedule]], and the same machinery a training
    * mix uses to turn fractional sampling weights into integer document
    * counts that sum EXACTLY to the budget (floor-and-forget leaks up
    * to #keys fetches per cycle; naive rounding overshoots).
    *
    * All arithmetic exact: base_i = ⌊total·w_i / W⌋ and the remainder
    * total − Σ base (which is < #keys) goes to the largest fractional
    * parts total·w_i mod W, ties to the smallest key — a total order,
    * so the allocation is a pure function of the weights. Products run
    * in decimal(38) (HUGEINT on the oracle side), so a 100 TB-scale
    * total × weight cannot wrap. Weights are honored to 1e-9
    * resolution (they integerize exactly at scale 9 first — the common
    * factor cancels, so integer weights allocate identically).
    *
    * The ranking window is GLOBAL but runs over the already-aggregated
    * per-key frame (domains, mixture components — the vocabulary-window
    * stance); keys with non-positive weight are dropped (they can earn
    * no budget).
    */
  def allocateBudget(weights: DataFrame, keyCol: String, weightCol: String,
                     total: Long): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    // weights integerize at 1e-9 resolution: decimal(27,9) truncation ×
    // 1e9 is an EXACT decimal(38,9) (27+10+1 = 38 — no Spark precision
    // loss) whose value is integral, so fractional weights (0.3/0.2/0.5)
    // keep their proportionality instead of collapsing under a
    // straight decimal(38,0) cast. Proportions — and therefore every
    // base/remainder below — are invariant under the common 1e9 factor,
    // so integer-weight callers (and the q203 oracle) see identical
    // allocations. Weights past the decimal(27,9) range fail loudly.
    val w = weights
      .filter(col(keyCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) > 0)
      .select(col(keyCol),
        (col(weightCol).cast("decimal(27,9)") *
          lit(1000000000L).cast("decimal(10,0)"))
          .cast("decimal(38,0)").as("__w"))
      .select(col(keyCol),
        when(col("__w").isNotNull, col("__w"))
          .otherwise(raise_error(concat(
            lit("allocateBudget weight out of decimal(27,9) range for key "),
            col(keyCol).cast("string")))).as("__w"))
      .filter(col("__w") > 0)
    val tot = w.agg(sum(col("__w")).as("__tw"))
    val based = w.crossJoin(broadcast(tot))
      .select(col(keyCol), col("__w"), col("__tw"),
        (col("__w") * lit(total)).as("__p"))
      // the 1e9 weight pre-scale consumed 9 digits of decimal(38)
      // headroom, so __w·total can exceed decimal(38) for in-range
      // weights near 1e18 × large totals — the non-ANSI multiply would
      // return NULL and those keys would silently allocate null instead
      // of failing. Same loud contract as the __w range guard above.
      .select(col(keyCol), col("__w"), col("__tw"),
        when(col("__p").isNotNull, col("__p"))
          .otherwise(raise_error(concat(
            lit("allocateBudget weight*total overflows decimal(38) "),
            lit("for key "), col(keyCol).cast("string"),
            lit(" — rescale weights or split the budget"))))
          .as("__p"))
      // base via subtract-remainder-then-divide: the % is exact on
      // decimals and the division of an exact multiple is exact at any
      // result scale — a direct floor(p/tw) would floor a ROUNDED
      // quotient and can be off by one just below an integer
      .select(col(keyCol), col("__w"),
        expr("CAST((__p - (__p % __tw)) / __tw AS DECIMAL(38,0))").as("__base"),
        expr("__p % __tw").as("__rem"))
    val deficit = based.agg((lit(total) - coalesce(sum(col("__base")),
      lit(0))).cast("long").as("__d"))
    // per-key frame (domains / mixture components) — bounded by
    // construction; the constant partition key states the single-task
    // intent
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(SingleTask.key(col(keyCol)))
      .orderBy(col("__rem").desc, col(keyCol).asc)
    based.crossJoin(broadcast(deficit))
      .withColumn("__rk", row_number().over(rankW))
      .select(col(keyCol),
        (col("__base").cast("long") +
          when(col("__rk") <= col("__d"), 1L).otherwise(0L))
          .as("allocated"))
  }

  /** Parse raw robots.txt BODIES into the rule frame
    * [[robotsEvaluate]]/[[robotsEvaluateWildcard]] consume — the missing
    * ingest step between "fetched /robots.txt" and "may we crawl this":
    * RFC 9309 group semantics, per row (domain, body):
    *
    *  - lines split on `\n`, `#` comments stripped, whitespace-trimmed;
    *  - a GROUP is a run of consecutive `User-agent:` lines plus the
    *    rules that follow until the next such run (the lag-based group
    *    id below — the per-domain window is robots.txt-bounded by the
    *    500 KiB fetch cap, the politeness-window stance);
    *  - the applicable groups are those naming `userAgent` exactly
    *    (case-insensitive product token); if none does, the `*` groups;
    *  - `Allow:`/`Disallow:` lines of applicable groups become
    *    (domain, rule_path, allow) rows; an EMPTY Disallow/Allow value
    *    is the RFC's "no restriction" and emits nothing.
    *
    * Deterministic and engine-replayable throughout (regex line typing,
    * one lag window, group aggregates). Companions: [[robotsCrawlDelays]]
    * (per-domain `Crawl-delay` of the applicable groups, milliseconds —
    * feeds [[politenessSchedule]]) and [[robotsSitemaps]] (`Sitemap:`
    * lines are group-independent per the spec).
    */
  def parseRobotsTxt(df: DataFrame, domainCol: String, bodyCol: String,
                     userAgent: String = "*"): DataFrame = {
    val g = robotsGroups(df, domainCol, bodyCol, userAgent)
    val al = regexp_extract(col("__l"), "(?i)^allow\\s*:\\s*(\\S+)", 1)
    val dis = regexp_extract(col("__l"), "(?i)^disallow\\s*:\\s*(\\S+)", 1)
    g.filter(col("__applies") && (al =!= "" || dis =!= ""))
      .select(col("domain"),
        when(al =!= "", al).otherwise(dis).as("rule_path"),
        (al =!= "").as("allow"))
  }

  /** Applicable-group `Crawl-delay` per domain, in milliseconds (floor
    * of seconds × 1000, decimal-exact; the MIN across applicable groups
    * when several state one). Domains without a delay emit nothing —
    * join with a default downstream ([[politenessSchedule]] does).
    */
  def robotsCrawlDelays(df: DataFrame, domainCol: String, bodyCol: String,
                        userAgent: String = "*"): DataFrame = {
    val g = robotsGroups(df, domainCol, bodyCol, userAgent)
    val d = regexp_extract(col("__l"),
      "(?i)^crawl-delay\\s*:\\s*([0-9]+(?:\\.[0-9]+)?)$", 1)
    g.filter(col("__applies") && d =!= "")
      .select(col("domain"),
        floor(d.cast("decimal(18,3)") * 1000).cast("long").as("delay_ms"))
      .groupBy("domain")
      .agg(min(col("delay_ms")).as("delay_ms"))
  }

  /** `Sitemap:` directives (group-independent per RFC 9309 §2.3.3):
    * distinct (domain, sitemap_url).
    */
  def robotsSitemaps(df: DataFrame, domainCol: String,
                     bodyCol: String): DataFrame =
    robotsLines(df, domainCol, bodyCol)
      .select(col("domain"),
        regexp_extract(col("__l"), "(?i)^sitemap\\s*:\\s*(\\S+)", 1)
          .as("sitemap_url"))
      .filter(col("sitemap_url") =!= "")
      .distinct()

  /** Shared line frame: (domain, __i, __l) — comment-stripped trimmed
    * lines in order.
    */
  private def robotsLines(df: DataFrame, domainCol: String,
                          bodyCol: String): DataFrame =
    df.filter(col(domainCol).isNotNull && col(bodyCol).isNotNull)
      .select(lower(col(domainCol)).as("domain"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("__i", "__raw")))
      .select(col("domain"), col("__i"),
        trim(regexp_replace(col("__raw"), "#.*$", "")).as("__l"))

  /** Shared group machinery: every line annotated with its RFC 9309
    * group id and whether that group applies to `userAgent`.
    */
  private def robotsGroups(df: DataFrame, domainCol: String,
                           bodyCol: String, userAgent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robotsLines(df, domainCol, bodyCol)
    val ua = regexp_extract(col("__l"), "(?i)^user-agent\\s*:\\s*(\\S+)", 1)
    val w = Window.partitionBy("domain").orderBy("__i")
    val typed = lines
      .withColumn("__ua", lower(ua))
      .withColumn("__isUa", col("__ua") =!= "")
      .withColumn("__newGrp",
        (col("__isUa") && !coalesce(lag(col("__isUa"), 1).over(w), lit(false)))
          .cast("long"))
      .withColumn("__grp", sum(col("__newGrp")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val wanted = lower(lit(userAgent))
    val groups = typed.filter(col("__isUa"))
      .groupBy(col("domain"), col("__grp"))
      .agg(max((col("__ua") === wanted).cast("int")).as("__exact"),
        max((col("__ua") === "*").cast("int")).as("__star"))
    val domainExact = groups.groupBy("domain")
      .agg(max(col("__exact")).as("__hasExact"))
    typed.join(groups, Seq("domain", "__grp"), "left")
      .join(domainExact, Seq("domain"), "left")
      .withColumn("__applies",
        coalesce(when(col("__hasExact") === 1, col("__exact") === 1)
          .otherwise(col("__star") === 1), lit(false)))
  }

  /** Anchor-link extraction from raw HTML — the step between a fetched
    * page ([[graft.ext.Warc]] payloads) and everything link-shaped
    * downstream ([[graft.ext.LinkGraph]] edges, `anchorTopTerms`,
    * frontier ingest): one row per `<a … href=…>…</a>` block, with the
    * resolved-attribute href (double- or single-quoted — the structural
    * subset, the [[graft.ext.TextStats.stripHtml]] stance: deterministic
    * and RE2-replayable beats a lenient parser that no external engine
    * can replicate), the tag-stripped entity-decoded anchor text, and a
    * `nofollow` flag from the `rel` attribute.
    *
    * Pure per-row column expressions — `regexp_extract_all` block scan +
    * `posexplode`, then per-block extracts — fused into the scan, no
    * shuffle, streaming-safe. Output: (id, link_index, href, anchor,
    * nofollow); pages with no links emit nothing.
    */
  def extractHtmlLinks(df: DataFrame, idCol: String,
                       htmlCol: String): DataFrame = {
    val blockPat = "(?is)<a\\s[^>]*href\\s*=\\s*(?:\"[^\"]*\"|'[^']*')[^>]*>.*?</a>"
    val blocks = df
      .filter(col(idCol).isNotNull && col(htmlCol).isNotNull)
      .select(col(idCol),
        posexplode(call_function("regexp_extract_all",
          col(htmlCol), lit(blockPat), lit(0)))
          .as(Seq("link_index", "__blk")))
    val hrefD = regexp_extract(col("__blk"), "(?is)href\\s*=\\s*\"([^\"]*)\"", 1)
    val hrefS = regexp_extract(col("__blk"), "(?is)href\\s*=\\s*'([^']*)'", 1)
    val openTag = regexp_extract(col("__blk"), "(?is)^(<a\\s[^>]*>)", 1)
    val inner = regexp_extract(col("__blk"), "(?is)^<a\\s[^>]*>(.*)</a>$", 1)
    blocks.select(col(idCol), col("link_index"),
      when(hrefD =!= "", hrefD).otherwise(hrefS).as("href"),
      TextStats.stripHtml(inner).as("anchor"),
      openTag.rlike("(?is)rel\\s*=\\s*(\"[^\"]*nofollow[^\"]*\"|'[^']*nofollow[^']*')")
        .as("nofollow"))
  }

  /** RFC 3986-style reference resolution for the crawl subset: turn an
    * extracted href into an absolute URL against the page it came from.
    * Handles absolute refs (pass through), scheme-relative (`//host/…`),
    * root-relative (`/…`), query-only (`?…`), fragment-only (`#…` —
    * fragments are dropped entirely: a crawler's URL identity never
    * includes them), and plain relative paths with `./`/`../` dot
    * segments (collapsed via a bounded regex fold — up to 8 levels,
    * far beyond real markup; excess `../` past the root clamps to the
    * root as the RFC requires). Contract bounds, stated: the BASE is
    * expected canonical (no dot segments of its own — run
    * [[canonicalizeUrl]] first), and a base without `scheme://host`
    * yields null. Pure codegen'd column expressions; the oracle replays
    * the identical regex chain.
    */
  def resolveHref(base: Column, href: Column): Column = {
    val origin = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    // base path up to and including the last '/' (query/fragment cut);
    // an origin-only base gets path "/"
    val basePath = regexp_extract(base,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val baseDir = when(basePath === "", lit("/"))
      .otherwise(regexp_replace(basePath, "[^/]*$", ""))
    // the base's own query, kept by the RFC for empty and fragment-only
    // references (T.query = B.query when the ref defines no path/query)
    val baseQuery = regexp_extract(base, "^[^?#]*(\\?[^#]*)", 1)
    val pathOrSlash = when(basePath === "", lit("/")).otherwise(basePath)
    val joined =
      when(href.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), href)
        .when(href.startsWith("//"), concat(scheme, lit(":"), href))
        .when(href.startsWith("/"), concat(origin, href))
        .when(href.startsWith("?"), concat(origin, pathOrSlash, href))
        // RFC 3986 §5.4: "" and "#frag" both resolve to the base minus
        // its fragment — path AND query survive (extractHtmlLinks does
        // emit href="" for <a href=""> links, so this case is live)
        .when(href.startsWith("#") || href === "",
          concat(origin, pathOrSlash, baseQuery))
        .otherwise(concat(origin, baseDir, href))
    // drop the fragment, split off the JOINED url's origin (the folds
    // must never see the host — "//ex.com/../x" contains a
    // "/segment/../" shape), then collapse dot segments: "/./" folds,
    // "segment/../" folds innermost-first (8 passes bound the depth),
    // and excess leading "../" past the root clamps away
    val noFrag = regexp_replace(joined, "#.*$", "")
    val joinedOrigin = regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val joinedRest = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val dotsFolded = (1 to 8).foldLeft(
      (1 to 8).foldLeft(joinedRest)((c, _) =>
        regexp_replace(c, "/\\.(/|$)", "/"))) { (c, _) =>
      regexp_replace(c, "/(\\.[^/.][^/]*|\\.\\.[^/]+|[^/.][^/]*)/\\.\\.(/|$)", "/")
    }
    val clamped = regexp_replace(dotsFolded, "^/(\\.\\./)*(\\.\\.$)?", "/")
    when(base.isNull || href.isNull || origin === "", lit(null).cast("string"))
      .otherwise(concat(joinedOrigin, clamped))
  }

  /** Per-host politeness schedule — the frontier-to-fetch-plan step
    * between [[robotsEvaluate]] (may we?) and the fetcher (when?): URLs
    * rank within their host in deterministic id order and each gets a
    * fetch offset of rank × the host's crawl delay (Crawl-delay
    * directive or `defaultDelayMs`), so no host is hit faster than its
    * declared rate no matter how many executors fetch in parallel.
    *
    * The per-host `row_number` window is safe HERE by construction:
    * politeness itself bounds how many URLs a scheduling batch may hold
    * per host (a host allowing one fetch per second gets ≤ 86 400 rows
    * into a daily plan — queueing more is wasted state), so the window
    * partition is policy-bounded, unlike the corpus-sized windows the
    * two-phase bucket machinery exists for.
    */
  def politenessSchedule(urls: DataFrame, idCol: String, urlCol: String,
                         delays: DataFrame, domainCol: String = "domain",
                         delayCol: String = "delay_ms",
                         defaultDelayMs: Long = 1000L): DataFrame = {
    require(defaultDelayMs >= 0, s"defaultDelayMs must be >= 0, got $defaultDelayMs")
    val u = urls
      .filter(col(idCol).isNotNull && col(urlCol).isNotNull)
      .select(col(idCol), col(urlCol), hostOf(col(urlCol)).as("host"))
    val d = delays
      .select(lower(col(domainCol)).as("host"),
        col(delayCol).cast("long").as("__delay"))
      .filter(col("host").isNotNull && col("__delay").isNotNull &&
        col("__delay") >= 0)
      // one delay per host: a duplicated config row must not fan out
      // the join — max is the conservative (slowest) merge
      .groupBy("host").agg(max(col("__delay")).as("__delay"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("host").orderBy(col(idCol))
    u.join(d, Seq("host"), "left")
      .withColumn("fetch_seq", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col(urlCol), col("host"), col("fetch_seq"),
        (col("fetch_seq") * coalesce(col("__delay"), lit(defaultDelayMs)))
          .as("fetch_offset_ms"))
  }

  /** Sitemap (sitemaps.org XML) entry extraction — the crawl-frontier
    * seed source next to [[robotsEvaluate]]: one output row per `<url>`
    * block with its `<loc>` (required; blocks without one are dropped,
    * per protocol), and optional `<lastmod>`/`<priority>`.
    *
    * Deliberately a REGEX-over-column pipeline, not an XML parser: a
    * 100 TB crawl's sitemaps are overwhelmingly machine-generated flat
    * XML, and `regexp_extract_all` + `explode` keeps extraction inside
    * whole-stage codegen with zero per-row parser allocation. The
    * documented contract is the flat subset: nested `<urlset>` inside
    * CDATA or namespaced exotica are out of scope (they would need the
    * full parser this operator intentionally is not).
    */
  def parseSitemap(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val blocks = df
      .filter(col(idCol).isNotNull && col(xmlCol).isNotNull)
      .select(col(idCol),
        posexplode(regexp_extract_all(col(xmlCol),
          lit("(?s)<url>(.*?)</url>"), lit(1)))
          .as(Seq("entry_index", "__block")))
    blocks
      .select(col(idCol), col("entry_index").cast("int").as("entry_index"),
        regexp_extract(col("__block"), "<loc>\\s*([^<\\s][^<]*?)\\s*</loc>", 1)
          .as("loc"),
        regexp_extract(col("__block"), "<lastmod>\\s*([^<]+?)\\s*</lastmod>", 1)
          .as("lastmod"),
        regexp_extract(col("__block"), "<priority>\\s*([^<]+?)\\s*</priority>", 1)
          .as("priority"))
      .filter(length(col("loc")) > 0)
      .select(col(idCol), col("entry_index"), col("loc"),
        // absent optional fields surface as NULL, not '' (regexp_extract
        // returns '' on miss — normalize so downstream coalesce works)
        when(length(col("lastmod")) === 0, lit(null)).otherwise(col("lastmod"))
          .as("lastmod"),
        when(length(col("priority")) === 0, lit(null)).otherwise(col("priority"))
          .as("priority"))
  }
}
