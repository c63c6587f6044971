"""Operator registry — the queries()/oracle_sql() inventory.

Each operator module exposes QUERIES (name → callable(spark, sf_dir)
→ DataFrame) and ORACLE (name → equivalent DuckDB SQL). The driver
contract (__spark_entry__.py) and the local pytest oracle harness both
consume this registry, so adding an operator here is the single step
that makes it tested, benched, and driver-visible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from indexr_spark.operators import (
    asof,
    events,
    multimodal,
    relational,
    similarity,
    skew,
    text,
)

# Ordered so the queries the driver has not yet scored come FIRST: the
# round-1 driver only evaluated the first 50 registry entries, so
# insertion order decides which operators earn a CORRECTNESS row.
# Round 2 priority: similarity/multimodal/asof/skew (never scored in
# r01) and text (d13 was r01's one red row; d09/d09b changed this
# round). The tail — late relational + events — was fully green in
# r01; rotate again in later rounds until every oracle query has
# appeared green in some CORRECTNESS_rN.
_MODULES = (similarity, multimodal, asof, skew, text, relational, events)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    _overlap = QUERIES.keys() & _m.QUERIES.keys()
    assert not _overlap, f"duplicate operator names: {_overlap}"
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)

# Every oracle must have a query (the reverse is allowed: rows-only ops).
assert set(ORACLE) <= set(QUERIES), sorted(set(ORACLE) - set(QUERIES))

# The driver scores only the first 50 registry entries per round, so
# the window must hold (a) queries whose code changed since their last
# green row — their old row no longer certifies HEAD — and (b) the
# stalest green rows. Round-6 window (exactly 50):
#   rule (a), 4 entries: d09_ngram_jaccard (refactored into the
#   parametrized jaccard_pairs for the suggest_bands deployment run —
#   same pinned constants, but the code path moved), and q17/q19/q39
#   (the snapshot commit/read path changed: scoped copy-on-write
#   upsert, files_of vacuum-race retry, _scan_paths managed-namespace
#   restriction).
#   rule (b): all 41 rows last scored in r4 (everything r5's window
#   did not cover — the stalest, at 2 rounds if unscored in r6).
#   last 5 slots: the round-6 additions (d27-d30, s12) — never
#   driver-scored, so they outrank spare refreshes of r5-green
#   flagships (those stay within the ≤1-round invariant unscored).
# After this round every registry query is green in r5∪r6 with
# <=1-round staleness.
_PRIORITY = [
    # rule (a): code path changed since last green row
    "d09_ngram_jaccard",
    "q17_union_hybrid",
    "q19_update_column_expr",
    "q39_pruned_catalog_scan",
    # rule (b): last scored r4 (41)
    "d01_token_stats",
    "d02_lang_id",
    "d03_quality_score",
    "d05_exact_dedup",
    "d06_canonical_dedup",
    "d09b_jaccard_allpairs",
    "d09r_jaccard_recall",
    "d11_bpe_tokens",
    "d13_stratified_sample",
    "d17_doc_chunking",
    "d18_sequence_packing",
    "d19_source_mixture",
    "d20_cluster_keep_best",
    "d21_tfidf_topterms",
    "d24_quality_filter",
    "d25_token_budget_sample",
    "d26_source_regression",
    "mm01_decode_metadata",
    "mm02_frame_sample",
    "mm03_resize_payload",
    "mm04_feature_extract",
    "mm05_audio_frames",
    "q02_filter_scan",
    "q25_asof_join",
    "q27_salted_agg",
    "q33_shipping_priority",
    "q38_retention",
    "q40_array_functions",
    "q41_grouping_sets",
    "q42_window_suite",
    "q43_null_semantics",
    "q44_date_functions",
    "q45_string_functions",
    "q46_scalar_subquery",
    "q47_moment_stats",
    "s01_cosine_topk",
    "s02_embedding_pairs",
    "s03_label_centroids",
    "s07_exact_percentiles",
    "s09_quantize_int8",
    "s10_ann_recall",
    # new in r6 — never driver-scored, so they outrank spare
    # refreshes for the last 5 slots (the displaced flagships were
    # scored green in r5 and stay within the ≤1-round invariant)
    "d27_unigram_logprob",
    "d28_incremental_dedup",
    "d29_entropy_profile",
    "d30_pipeline_funnel",
    "s12_kmeans_step",
]
_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"unknown priority names: {_missing}"
# duplicates would silently dedupe in the dict rebuild and shift which
# entries land inside the driver's first-50 scoring window
assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate priority names"
assert len(_PRIORITY) == 50, "window math documented above assumes 50"
QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
