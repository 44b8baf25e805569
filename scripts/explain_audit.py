"""Dump physical plans for the headline queries into PLANS.md.

Plan-quality audit artifact: for each query, the formatted physical plan
plus automated checks — parquet pushdown (PushedFilters / ReadSchema
pruning), join strategies (broadcast vs sort-merge), and whole-stage
codegen coverage. Pure planning (no execution), so it runs in seconds.

Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

AUDITED = [
    "kg_structural", "kg_imports", "kg_linked", "kg_canonical",
    "tpch_q1", "tpch_q3", "tpch_q5",
    "events_hourly", "events_sessions", "events_topn",
    "lang_id", "text_quality", "dedup_exact", "dedup_jaccard",
    "dedup_simhash", "embedding_topk", "dedup_minhash", "dedup_embedding",
    "kg_imports_resolved", "events_cube", "events_sliding", "events_median",
    "dedup_embedding_lsh", "embedding_ann",
    "multimodal_frames", "multimodal_resize", "embedding_ivf",
    "events_pivot", "events_asof", "events_range_join", "dedup_pipeline",
    "train_val_split", "term_stats", "data_mixing",
    "kg_defs", "kg_calls", "token_count", "doc_fingerprint",
    "events_json", "events_moving_avg", "cust_no_orders", "part_setops",
    "multimodal_meta", "multimodal_features",
    "pii_scrub", "doc_repetition", "decontam", "dedup_clusters",
    "kg_pagerank", "kg_triangles", "doc_filter",
    "kg_communities",
    "kg_bgp", "kg_bgp_selective", "kg_bgp_optional",
    "kg_incremental", "kg_sparql", "kg_sparql_agg", "kg_sparql_construct",
    "kg_sparql_graph", "kg_sparql_update",
    "kg_kcore", "kg_sssp", "embedding_kmeans", "doc_dup_spans",
    "doc_ols", "doc_top_terms", "doc_winnow", "events_gorilla",
    "events_hll", "embedding_anova", "embedding_centroids",
    "embedding_gram", "embedding_ncc", "events_calibration",
    "events_gapfill", "events_itemcf", "events_kth",
    "events_new_returning", "events_slo_burn", "events_streak",
    "kg_closeness", "kg_timetravel", "orders_dictenc",
    "tpch_q11", "tpch_q12", "tpch_q16", "tpch_q20",
    "events_sax", "embedding_jl", "events_mannwhitney", "doc_rake",
    "orders_rle", "events_stl", "events_lttb", "events_ks",
    "doc_codeswitch", "events_fifo", "kg_bipartite",
    "orders_merge", "orders_bloomskip", "events_critpath", "events_rrf",
    "doc_readability", "dedup_winnow", "embedding_mrl",
    "embedding_int8", "orders_apportion",
    "sample_stratified", "kg_sparql_star", "tpch_q6", "events_retention",
    "events_funnel", "dedup_incremental",
    "seq_packing", "doc_chunks", "doc_bm25", "embedding_pq",
    "kg_sparql_typed", "kg_clustering", "dedup_span_removal",
    "kg_rdfs", "kg_shacl", "kg_prov",
    "doc_length_stats", "inverted_index",
    "vocab_bpe", "kg_node_sim", "events_anomaly",
    "kg_sparql_exists", "kg_sparql_subselect", "doc_familiarity", "dedup_cross_source", "kg_sparql_alt", "kg_walks",
    "kg_skipgrams", "kg_charsets", "kg_void", "kg_bgp_stats", "events_cdc",
    "events_scd2",
    "kg_fuzzy_link",
    "kg_summary",
    "kg_negatives",
    "kg_linking_pr",
    "kg_ivm",
    "sample_exact",
    "events_grouping_sets",
    "events_cep",
    "doc_curation",
    "events_twap",
    "events_ohlc",
    "kg_ppr",
    "events_ewma",
    "events_kmv",
    "events_cms",
    "events_bloom",
    "kg_hits",
    "dedup_ppjoin",
    "sample_weighted",
    "events_paths",
    "events_concurrency",
    "events_kmv_setops",
    "events_zorder",
    "events_checksum",
    "kg_link_ra",
    "events_markov",
    "doc_hash_features",
    "vocab_collocations",
    "events_mad",
    "events_expectations",
    "vocab_kn",
    "events_seasonal",
    "events_attribution",
    "events_quantiles",
    "kg_butterflies",
    "tpch_q4",
    "tpch_q7",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
    "events_rfm",
    "events_cusum",
    "events_benford",
    "events_autocov",
    "events_target_encoding",
    "events_class_weights",
    "vocab_bigram_lm",
    "doc_lexical_richness",
    "events_histogram",
    "kg_assortativity",
    "kg_richclub",
    "doc_oov_rate",
    "events_drift",
    "doc_zipf",
    "events_interarrival",
    "tpch_q15",
    "tpch_q22",
    "events_gini",
    "doc_novelty",
    "events_holt",
    "events_abtest",
    "events_winsorize",
    "kg_reciprocity",
    "tpch_q8",
    "tpch_q13",
    "tpch_q17",
    "tpch_q19",
    "events_bitmap",
    "events_survival",
    "events_diversity",
    "events_backtest",
    "dedup_editdist",
    "kg_modularity",
    "events_auc",
    "dedup_containment",
    "events_holtwinters",
    "events_gains",
    "events_drawdown",
    "basket_rules",
    "events_conformal",
    "doc_nb",
    "events_seqpat",
    "events_kanon",
    "orders_mrr",
    "events_ate",
    "kg_comention",
    "dedup_eval",
    "kg_blocking_stats",
    "events_skew",
    "orders_churn_labels",
    "orders_cohort_ltv",
    "events_group_quantiles",
    "doc_compaction",
    "events_convert_time",
    "events_bursts",
    "events_profile",
    "kg_dangling",
    "kg_cycles",
    "events_segment_shift",
    "events_prcurve",
    "events_threshold",
    "dedup_mutual_best",
    "events_wau",
    "orders_abc",
    "tpch_q2",
    "tpch_q9",
    "tpch_q21",
    "orders_skipping",
    "orders_diff",
    "kg_edgecut",
    "events_joinest",
    "postings_codec",
    "events_rankeval",
    "events_dp_bound",
    "orders_skyline",
    "doc_cdc_chunks",
    "events_interval_diff",
    # r3-late + r4 additions (lazy plans only; iterative/eager and
    # streaming queries stay excluded as before)
    "events_theilsen",
    "events_viterbi",
    "events_runs",
    "orders_hhi",
    "vocab_heavy_hitters",
    "doc_block_dedup",
    "kg_canonical_star",
    "doc_fertility",
    # r5: action-driven batch queries (r4 verdict item 5). These
    # callables run bounded driver-coordinated actions while BUILDING
    # their DataFrame (CC rounds / BFS frontiers / peeling cascades /
    # convergence probes), so generating their entry executes those
    # rounds at the audit sf — seconds at sf0.01 — and the dumped plan
    # is the FINAL DataFrame's (the converged assignment join / last
    # frontier / post-peel aggregate), which is exactly the per-round
    # stage shape repeated at scale.
    "dedup_keep_best",
    "kg_coreness",
    "kg_truss",
    "kg_reachable",
    "kg_scc",
    "kg_wiener",
    "kg_sameas",
    "kg_owl",
    "kg_msf",
    "kg_densest",
    "kg_matching",
    "kg_mis",
    "kg_pathcount",
    "kg_condensation",
    "kg_sparql_path",
    "kg_store_bgp",
    "kg_canonical_incremental",
]
# events_kth keeps only its note: histogram-bisection rounds are
# driver-coordinated actions whose per-round plan is a plain bounded
# aggregation (and events_kth IS in AUDITED above).

#: Documented exemptions, written into PLANS.md: these queries execute
#: a full materialize-to-disk or a Structured Streaming job inside the
#: callable, so "explain" would run minutes of side effects and the
#: resulting plan would be a trivial scan over the just-written files.
#: Their data-path plans are covered by the audited constituent stages
#: (kg_* extraction + linking + canonical feed the roundtrips; each
#: stream_* job's batch-equivalent twin is audited above) and the read
#: side is a plain parquet/arrow scan.
EXEMPT = {
    "kg_roundtrip": "materializes .jelly streams to disk inside the callable",
    "kg_split_decode": "materializes + byte-concatenates streams inside the callable",
    "kg_grouped_roundtrip": "materializes grouped streams inside the callable",
    "kg_datasource_roundtrip": "DSv2 write+read job inside the callable",
    "kg_stream_ingest": "runs a Structured Streaming ingest job",
    "kg_stream_egress": "runs a Structured Streaming egress job",
    "stream_hourly": "Structured Streaming job (batch twin: events_hourly)",
    "stream_sessions": "Structured Streaming job (batch twin: events_sessions)",
    "stream_dedup": "Structured Streaming job (batch twin: dedup_exact)",
    "stream_join": "Structured Streaming job (batch twin: events_itemcf join shape)",
    "stream_anomaly": "Structured Streaming job (batch twin: events_anomaly)",
    "stream_enrich": "Structured Streaming job (broadcast-dim enrich)",
    "stream_cdc": "Structured Streaming job (batch twin: events_cdc)",
    "stream_topk": "Structured Streaming job (batch twin: events_topn)",
    "stream_kmv": "Structured Streaming job (batch twin: events_kmv)",
    "stream_session_window": "Structured Streaming session-window job",
}


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> list[str]:
    notes = []
    scans = plan.count("Scan parquet")
    if scans:
        notes.append(f"{scans} parquet scan(s)")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    real_pushed = [p for p in pushed if p.strip()]
    if real_pushed:
        notes.append(f"pushed filters: {len(real_pushed)} scan(s)")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) for s in schemas if s]
        notes.append(f"read-schema widths: {widths} (column pruning)")
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    if bhj or smj:
        notes.append(f"joins: {bhj} broadcast, {smj} sort-merge")
    wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    if wsc:
        notes.append(f"{wsc} whole-stage codegen span(s)")
    if "InMemoryTableScan" in plan:
        notes.append("uses cached relation")
    exchanges = plan.count("Exchange")
    notes.append(f"{exchanges} exchange(s)")
    return notes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyjelly_spark.queries import QUERIES
    from pyjelly_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        f"Generated by `python scripts/explain_audit.py {sf_dir}`. For each",
        "query: automated plan-quality notes, then the formatted physical",
        "plan (`df.explain('formatted')`). AQE is enabled, so final plans",
        "may further coalesce partitions / switch joins at runtime.",
        "",
        "## Exemptions",
        "",
        "The following queries are exempt from plan dumps — each runs a",
        "full materialize or a Structured Streaming job inside its",
        "callable, so `explain` would execute minutes of side effects and",
        "show only a trivial scan of the files it just wrote. Their",
        "data-path plans are covered by the audited constituent/batch-twin",
        "stages named per entry:",
        "",
        *[f"- `{name}` — {why}" for name, why in sorted(EXEMPT.items())],
        "",
    ]
    for name in AUDITED:
        df = QUERIES[name](spark, sf_dir)
        plan = plan_text(df)
        out.append(f"## {name}")
        out.append("")
        for note in audit(plan):
            out.append(f"- {note}")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(AUDITED)} queries)")


if __name__ == "__main__":
    main()
