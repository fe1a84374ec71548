#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala into per-family gate
registries under src/main/scala/graft/gates/ with zero behavior change
(VERDICT r10 item 2). Entries are moved VERBATIM; shared helpers and
oracle-SQL builder vals land in gates/Support.scala.

Run from the repo root. Idempotent only on the original file — keep a
git checkpoint before running.
"""
import os
import re
import sys
from collections import OrderedDict

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/gates"

FAMILIES = OrderedDict([
    ("ParityGates", """q01_agg_pricing q02_filter_pushdown q03_string_funs
        q04_dates q05_days_apart_join q06_join_star q07_topk q08_window_topn
        q09_distinct_agg q10_parse_logline q11_days_apart q31_compact_shape
        q62_accesslog_source"""),
    ("RelationalGates", """q19_sessionize q20_anti_join q21_rollup
        q27_skew_salted_join q29_setops q30_pivot q33_percentiles
        q34_running_sum q36_fuzzy_match q38_correlated_subquery q40_asof_join
        q41_range_join q42_grouping_sets q43_array_agg q44_unpivot
        q46_histogram q48_sliding_window q54_topk_per_group q55_session_window
        q57_gap_fill q58_moving_avg q61_cube q64_stat_moments
        q65_window_analytics q67_merge_upsert q71_funnel q73_skew_audit
        q74_cooccurrence q75_zscore_outliers q77_quantile_bins q78_full_outer
        q79_containment q96_bloom_prune_join q162_decay_counts q177_fuzzy_join
        q196_snapshot_diff q201_symspell_join q209_session_paths
        q223_retention_cohorts"""),
    ("DedupGates", """q12_dedup_exact q13_dedup_minhash q14_dedup_embedding
        q23_dedup_simhash q49_dedup_components q56_dedup_incremental
        q59_dedup_ngram_jaccard q60_fingerprint q70_dedup_survivors
        q82_decontaminate q97_duplicate_spans q98_span_decontaminate
        q110_paragraph_dedup q117_paragraph_dedup_incr q123_semantic_decontam
        q143_url_dedup q147_dedup_components_incr q175_image_neardup
        q204_multimodal_dedup"""),
    ("SimilarityGates", """q15_ann_bruteforce q16_ann_lsh q28_ann_ivf
        q52_embed_quantize q53_embed_centroids q80_ann_pq
        q86_random_projection q99_semantic_join q102_ivf_semantic_join
        q106_ivf_pq_semantic_join q169_feature_hashing q178_embed_moments
        q179_pca_project q185_spectral q195_hard_negatives q213_kmeans
        q214_cluster_balanced_mix q219_kmeans_silhouette"""),
    ("TextGates", """q17_text_stats q18_text_langid q37_langid_ngram
        q47_tfidf_topterms q68_bm25 q76_vocab_coverage q83_text_repetition
        q87_unigram_logprob q89_chunk_documents q90_pack_sequences
        q112_bpe_vocab q114_unicode_nfc q116_encoding_quality
        q119_bpe_tokenize q120_multi_pattern_scan q124_bigram_logprob
        q129_char_entropy q138_script_profile q142_trigram_logprob
        q153_sentences q173_phrase_match q181_charset_sniff q186_unigram_vocab
        q187_unigram_tokenize q191_perplexity_mix q197_fix_mojibake
        q200_mixed_language q210_repetition_signals q215_kneser_ney
        q218_readability q220_pack_concat"""),
    ("QualityGates", """q35_curate q66_profile q92_profile_drift
        q95_training_pipeline q121_nb_quality q126_gopher_rules q127_c4_clean
        q128_boilerplate_strip q130_domain_quality q144_crawl_curation
        q207_quality_percentile"""),
    ("WebGraphGates", """q85_html_strip q122_url_canonical q131_pagerank
        q132_pagerank_dangling q133_personalized_pagerank q134_crawl_prior
        q139_url_blocklist q149_hits q150_cocitation q151_robots
        q158_anchor_text q159_label_prop q163_frontier_score q164_hop_distance
        q165_triangles q168_reciprocal_links q180_sitemap q183_kcore
        q190_politeness q192_frontier_ingest q203_crawl_budget
        q205_robots_wildcard q206_change_magnitude q208_burst_signals
        q211_html_links q212_href_resolve q216_robots_parse q217_link_frontier
        q222_robots_politeness"""),
    ("MultimodalGates", """q24_multimodal_decode q25_frame_sample
        q50_audio_features q51_image_resize q93_bmp_decode q94_wav_decode
        q105_png_decode q107_jpeg_decode q111_gif_decode q136_jpeg_progressive
        q137_png_variants q140_g711_decode q145_adpcm_decode q146_audio_frames
        q155_qoi_decode q174_image_phash q189_trim_silence"""),
    ("StreamingGates", """q26_stream_daily_counts q81_stream_profile
        q84_stream_funnel q104_stream_span_dedup q118_stream_paragraph_dedup
        q135_stream_boilerplate q148_stream_components q157_stream_topk
        q184_stream_interval_join q194_stream_cdc q198_cdc_chunks
        q225_stream_cms q236_stream_reservoir q242_stream_bloom
        q247_stream_hdr q252_stream_hll"""),
    ("SketchGates", """q22_approx_distinct q39_group_sketch
        q224_cms_heavy_hitters q235_hll_distinct q238_hdr_quantiles
        q239_bloom_filter q240_kmv_distinct q241_ams_sketch q244_count_sketch
        q245_misra_gries q249_hll_by_group q250_hdr_by_group
        q251_kmv_set_algebra"""),
    ("RetrievalGates", """q170_auc q171_kappa q172_calibration q227_rrf_fusion
        q228_rank_eval q229_graded_ndcg q230_mrr_map q231_hybrid_retrieval
        q232_mmr_rerank q234_prf_expansion q253_interleaving"""),
    ("SamplingGates", """q45_sample_hash q72_stratified_sample
        q88_leakage_safe_split q91_per_group_sample q100_weighted_sample
        q101_weighted_per_group q103_weighted_targets q113_shuffle_shards
        q141_temperature_mix q156_kfold q182_importance_weights q221_hash_split
        q254_poisson_bootstrap q257_bootstrap_ab"""),
    ("FormatGates", """q32_json_props q115_export_pipeline q152_warc
        q154_mime_sniff q160_tar_members q161_gzip_roundtrip q166_jsonl_parse
        q167_orc_roundtrip q176_zstd_roundtrip q193_csv_parse
        q199_schema_evolution q256_avro_roundtrip"""),
    ("PrivacyGates", """q69_pii_redact q125_multi_redact q202_ip_anonymize
        q233_k_anonymity q246_dp_counts"""),
    ("InfraGates", """q63_zorder_cells q108_token_budget
        q109_token_budget_quality q188_bloom_layout q226_layout_audit
        q237_compaction_plan q243_ip_cidr_lookup q248_zonemap_prune
        q255_consistent_hash"""),
])

FAMILY_DOC = {
    "ParityGates": "reference parity (SURVEY.md SS2.1-2.9): log parse, Days Apart, core SQL surface, compaction shape, the access-log DSv2 source",
    "RelationalGates": "general relational operators: joins (asof/range/anti/full/skew/fuzzy), windows, rollup/cube/pivot, upsert/CDC-adjacent diffing",
    "DedupGates": "deduplication family: exact, MinHash, SimHash, n-gram Jaccard, embedding near-dup, span/paragraph dedup, connected components, decontamination",
    "SimilarityGates": "embedding/ANN family: brute-force, LSH, IVF, PQ, semantic joins, PCA/spectral, k-means and cluster diagnostics",
    "TextGates": "text analysis: language-ID, tokenization (BPE/unigram), LM scoring, entropy/repetition/readability, encoding repair, chunk/pack",
    "QualityGates": "document quality scoring and curation pipelines (Gopher/C4-style rules, profiles, the composed training-data capstones)",
    "WebGraphGates": "web/link-graph family: URL handling, robots, crawl planning, PageRank/HITS and friends, HTML link extraction",
    "MultimodalGates": "multimodal columns: image/audio codecs over binary columns, frame sampling, perceptual hashing",
    "StreamingGates": "Structured-Streaming gates: cross-batch state (dedup, sketches, components, CDC), interval joins, stream profiles",
    "SketchGates": "bounded-relation sketches: HLL, KMV, AMS, Bloom, count-sketch, Misra-Gries, HDR quantiles, CMS (batch + per-group forms)",
    "RetrievalGates": "retrieval & eval: fusion (RRF/hybrid), rank metrics (nDCG/MRR/MAP/AUC/kappa), MMR, PRF/RM3, interleaving",
    "SamplingGates": "sampling & splits: hash/stratified/weighted/reservoir-adjacent sampling, k-fold, leakage-safe splits, bootstrap inference",
    "FormatGates": "interchange formats: JSON/JSONL/CSV, ORC, gzip/zstd, tar, WARC, Avro containers, schema evolution",
    "PrivacyGates": "privacy family: PII redaction, IP anonymization, k-anonymity/l-diversity audit, DP count release",
    "InfraGates": "table-layout & infra: Z-order, zone maps, compaction planning, bloom layout, token budgets, CIDR LPM, consistent hashing",
}

fam_of = {}
for fam, names in FAMILIES.items():
    for n in names.split():
        assert n not in fam_of, f"{n} assigned twice"
        fam_of[n] = fam

lines = open(SRC, encoding="utf-8").read().split("\n")  # 0-indexed


def find(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    raise SystemExit(f"marker not found after line {start}")


qstart = find(lambda l: l.startswith("  def queries: Map[String, (SparkSession, String) => DataFrame] = Map("))
qend = find(lambda l: l == "  )", qstart)
ostart = find(lambda l: l.startswith("  def oracleSql: Map[String, String] = Map("), qend)
oend = find(lambda l: l == "  )", ostart)
flagship = find(lambda l: "---- flagship" in l or "-- flagship" in l)
objline = find(lambda l: l == "object SparkEntry {")
assert lines[-1] == "" and lines[-2] == "}", (lines[-2], lines[-1])

header = lines[:objline]          # package/imports/scaladoc
prelude = lines[objline + 1:flagship]
flag_block = lines[flagship:qstart - 1]  # flagship comment + entry()
blockA = lines[qend + 1:ostart]
tail = lines[oend + 1:len(lines) - 2]

ENTRY_RE = re.compile(r'^    "(q\d+[a-z0-9_]*)" ->')


def entries_of(body_lines):
    """body_lines: lines strictly inside Map( ... ). Returns list of
    (name, chunk_lines) with leading comments attached."""
    starts = [i for i, l in enumerate(body_lines) if ENTRY_RE.match(l)]
    assert starts, "no entries found"
    out = []
    # attach preceding comment/blank run to each entry
    chunk_begin = []
    for s in starts:
        b = s
        while b > 0 and (body_lines[b - 1].strip() == "" or
                         body_lines[b - 1].lstrip().startswith(("//", "*", "/*"))):
            b -= 1
        chunk_begin.append(b)
    bounds = chunk_begin + [len(body_lines)]
    for k, s in enumerate(starts):
        name = ENTRY_RE.match(body_lines[s]).group(1)
        chunk = body_lines[bounds[k]:bounds[k + 1]]
        # trim leading/trailing blank lines; re-add separator at render
        while chunk and chunk[0].strip() == "":
            chunk.pop(0)
        while chunk and chunk[-1].strip() == "":
            chunk.pop()
        # normalize: make sure final line ends with a comma (trailing
        # commas are legal in 2.13 before a newline+close-paren)
        assert not chunk[-1].lstrip().startswith(("//", "*", "/*")), \
            f"{name}: chunk ends with a comment line: {chunk[-1]!r}"
        if not chunk[-1].rstrip().endswith(","):
            chunk[-1] = chunk[-1] + ","
        out.append((name, chunk))
    return out


q_entries = entries_of(lines[qstart + 1:qend])
o_entries = entries_of(lines[ostart + 1:oend])

unassigned = sorted({n for n, _ in q_entries} - set(fam_of))
if unassigned:
    raise SystemExit(f"unassigned queries: {unassigned}")
orphans = sorted({n for n, _ in o_entries} - {n for n, _ in q_entries})
if orphans:
    raise SystemExit(f"oracle entries without queries: {orphans}")

IMPORTS = """import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.DaysApart
import graft.ext.{Dedup, Retrieval, Similarity, TextStats}
import graft.logs.LogLineParser
import Support._"""


def strip_private(ls):
    return [re.sub(r"^  private (val|def|lazy val) ", r"  \1 ", l) for l in ls]


os.makedirs(OUT_DIR, exist_ok=True)

# ---------------------------------------------------------------- Support
support = ["package graft", "package gates", ""]
support += IMPORTS.split("\n")[:7]  # everything except Support._ itself
support += ["",
  "/** Shared gate plumbing, verbatim from the pre-split SparkEntry.scala:",
  "  * table loading, cached per-(session, dir) fixtures, the synthetic",
  "  * log-line generator, and every cross-family oracle-SQL builder.",
  "  * `private[graft]` — the public surface stays `SparkEntry`.",
  "  */",
  "private[graft] object Support {"]
support += strip_private(prelude)
support += strip_private(blockA)
support += strip_private(tail)
support += ["}", ""]
open(os.path.join(OUT_DIR, "Support.scala"), "w", encoding="utf-8").write(
    "\n".join(support))

# ------------------------------------------------------------- GateFamily
open(os.path.join(OUT_DIR, "GateFamily.scala"), "w", encoding="utf-8").write(
    """package graft
package gates

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One per-family gate registry: a slice of the driver contract
  * (`SparkEntry.queries` / `SparkEntry.oracleSql`). Families are
  * composed — and checked for duplicate names — in `SparkEntry`.
  */
private[graft] trait GateFamily {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
""")

# ------------------------------------------------------------ family files
by_fam_q = OrderedDict((f, []) for f in FAMILIES)
by_fam_o = OrderedDict((f, []) for f in FAMILIES)
for n, chunk in q_entries:
    by_fam_q[fam_of[n]].append(chunk)
for n, chunk in o_entries:
    by_fam_o[fam_of[n]].append(chunk)

for fam in FAMILIES:
    f = ["package graft", "package gates", ""]
    f += IMPORTS.split("\n")
    f += ["",
          f"/** Gate registry — {FAMILY_DOC[fam]}.",
          "  * Entries are verbatim from the pre-split SparkEntry.scala",
          "  * (round-11 refactor; zero behavior change).",
          "  */",
          f"private[graft] object {fam} extends GateFamily {{",
          "",
          "  val queries: Map[String, (SparkSession, String) => DataFrame]" +
          " = Map(", ""]
    for chunk in by_fam_q[fam]:
        f += chunk + [""]
    if f[-1] == "":
        f.pop()
    f += ["  )", "", "  val oracleSql: Map[String, String] = Map(", ""]
    for chunk in by_fam_o[fam]:
        f += chunk + [""]
    if f[-1] == "":
        f.pop()
    f += ["  )", "}", ""]
    open(os.path.join(OUT_DIR, fam + ".scala"), "w", encoding="utf-8").write(
        "\n".join(f))

# ------------------------------------------------------------- SparkEntry
fam_list = ", ".join("gates." + f for f in FAMILIES)
entry_new = header + [
    "object SparkEntry {",
    "",
    "  import gates.Support.{syntheticLogLines, tbl}",
    ""]
entry_new += flag_block
entry_new += [
    "",
    "  // ---------------------------------------------------- registries",
    "",
    "  /** Per-family gate registries (the `gates` package) — split from",
    "    * the former single-file map in round 11 after the q227/q228",
    "    * process slip showed an 11.6k-line file is where review fails.",
    "    * Order is",
    "    * presentation-only; name collisions are rejected at load.",
    "    */",
    "  private val families: Seq[gates.GateFamily] = Seq(",
    f"    {fam_list})",
    "",
    "  private lazy val mergedQueries: Map[String, (SparkSession, String) => DataFrame] = {",
    "    val maps = families.map(_.queries)",
    "    val merged = maps.reduce(_ ++ _)",
    "    require(merged.size == maps.map(_.size).sum,",
    "      \"duplicate gate name across families\")",
    "    merged",
    "  }",
    "",
    "  private lazy val mergedOracles: Map[String, String] = {",
    "    val maps = families.map(_.oracleSql)",
    "    val merged = maps.reduce(_ ++ _)",
    "    require(merged.size == maps.map(_.size).sum,",
    "      \"duplicate oracle name across families\")",
    "    require(merged.keySet.subsetOf(mergedQueries.keySet),",
    "      \"oracle without a query: \" +",
    "        (merged.keySet -- mergedQueries.keySet).toSeq.sorted.mkString(\",\"))",
    "    merged",
    "  }",
    "",
    "  def queries: Map[String, (SparkSession, String) => DataFrame] = mergedQueries",
    "",
    "  def oracleSql: Map[String, String] = mergedOracles",
    "}",
    ""]
open(SRC, "w", encoding="utf-8").write("\n".join(entry_new))

print(f"queries entries: {len(q_entries)}; oracle entries: {len(o_entries)}")
for fam in FAMILIES:
    print(f"  {fam}: {len(by_fam_q[fam])} queries, {len(by_fam_o[fam])} oracles")
