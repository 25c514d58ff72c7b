"""Unified query registry: name → (spark_builder, duckdb_sql | None).

Aggregates the reference-parity relational queries and the
training-data operators (dedup / similarity / text analysis) into the
single registry consumed by ``__spark_entry__``.

Registry ORDER is the driver's sampling rotation: the correctness
driver verifies a fixed-size prefix of this dict per round, so entries
that have never had a driver CORRECTNESS row are emitted FIRST
(`_DRIVER_VERIFIED` below lists every name hash-green in at least one
of CORRECTNESS_r01–r04). New queries land ahead of already-verified
ones automatically — they are absent from the verified list. All
entries are equally covered in-repo either way: the pytest parity
sweep (tests/test_queries_parity.py) runs EVERY entry against its
DuckDB twin at sf0.001 on every test run.
"""

from __future__ import annotations

from pero_ocr_api_spark.plans.queries_relational import RELATIONAL_QUERIES

# Names hash-green in at least one driver CORRECTNESS_r*.json (r1-r4).
# Entries NOT in this set sort to the front of the registry so the
# driver's next fixed-size sample reaches them first.
_DRIVER_VERIFIED = {
    "ann_lsh_buckets", "ann_multiprobe_topk", "ann_self_near_pairs",
    "ann_topk", "argmin_fair_key", "auth_lookup", "avg_score",
    "benchmark_contamination", "cancel_anti_join", "clean_html_docs",
    "completion_ratio", "cosine_topk", "dedup_components",
    "dedup_keep_list", "embedding_near_dup", "engine_dict",
    "exact_dup_groups", "expiry_scan", "fair_dequeue", "format_dispatch",
    "in_list_filter", "incremental_dedup", "ivf_topk",
    "keys_with_waiting", "knn_label_vote", "lang_guess_counts",
    "latest_version", "line_char_counts", "link_graph",
    "lsh_bucket_histogram", "lsh_mega_bucket_pairs", "median_score",
    "minhash_lsh_pairs", "navigate_joins", "ngram_jaccard_pairs",
    "null_or_filter", "pii_redaction", "point_lookup",
    "point_lookup_malformed", "processed_counts", "quality_scores",
    "repetition_stats", "request_status", "simhash_buckets",
    "simhash_near_pairs", "sorted_page_names", "source_overlap",
    "state_histogram", "stratified_sample_counts", "table_profile",
    "timeout_requeue", "token_stats", "top_ngrams",
    "training_filter_pipeline", "union_window_live", "usage_statistics",
    "winnow_overlap",
}

_ALL: dict[str, tuple] = {}
_ALL.update(RELATIONAL_QUERIES)

try:  # text/dedup/similarity operators (added incrementally)
    from pero_ocr_api_spark.plans.queries_textops import TEXTOPS_QUERIES

    _ALL.update(TEXTOPS_QUERIES)
except ImportError:
    pass

try:  # event-log analytics (sessionization / funnel / as-of attribution)
    from pero_ocr_api_spark.plans.queries_events import EVENTS_QUERIES

    _ALL.update(EVENTS_QUERIES)
except ImportError:
    pass

QUERIES: dict[str, tuple] = {
    name: _ALL[name] for name in _ALL if name not in _DRIVER_VERIFIED
}
QUERIES.update(
    {name: _ALL[name] for name in _ALL if name in _DRIVER_VERIFIED}
)
