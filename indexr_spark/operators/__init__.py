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
    pq,
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
_MODULES = (similarity, multimodal, asof, skew, text, pq, relational, events)

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
# green row — their old row no longer certifies HEAD — plus every
# never-scored new operator, and (b) the stalest green rows, under the
# staleness tiers REGISTRY.md defines (<=2 rounds by default, <=3 for
# frozen-code rows explicitly deferred there).
#
# REGISTRY CONVENTION (adopted r10, the d35 lesson): driver-row
# outputs are SCALAR columns only — no array/map/struct cells. The
# driver's canonicalizer sorts the result frame with pandas before
# hashing, and sort_values over numpy-array cells throws `unhashable
# type: 'numpy.ndarray'` before any comparison runs, so an array
# column makes a row permanently red regardless of semantics. Fold
# arrays to scalars (array_join / explode-with-pos / size) in BOTH
# the query and the oracle; keep the array form as a library function
# with a pytest pin if the reshape needs proving cosmetic.
#
# Round-12 window (exactly 50), executing REGISTRY.md's "r12 window
# must hold" pre-commitment:
#   tier-B dues, 5 entries: q40/q42/q43/q44/q45 — deferred r11, at
#   their 3-round ceiling now (relational.py file-frozen since their
#   r9 greens, full oracle parity in pytest at HEAD). MUST score.
#   rule (2), 2 entries: d40_dup_spans + d41_quality_classifier — the
#   scheduled r12 registrations (REGISTRY.md queue), both
#   pytest-oracle-proven since r9 (hand fixtures + both-SF DuckDB
#   parity + 1000×/100× scale evidence).
#   rule (1), 1 entry: s11_neardup_numpy — neardup_pairs_numpy's
#   presentation round switched from np.round to the shared HALF_UP
#   factory this round (the r11 verdict's task 6), so its r11 row no
#   longer certifies HEAD. Output provably unchanged off half-
#   boundaries, but changed code re-scores — the d35 precedent: a
#   rule-1 row displaces one more deferral than the projection.
#   rule (b): 42 of the 50 rows last scored r10. The 8 displaced rows
#   (q02_filter_scan, q09_sort_limit_offset, q11_except, q13_date_agg,
#   q14_conditional_agg, q15_window_running, q16_like_filters,
#   q39_pruned_catalog_scan — all relational.py bodies, the one
#   eligible family whose files r12 provably does not touch: this
#   round's diffs land in text.py registration dicts, similarity.py,
#   functions/compat.py, and bench tooling; q26 stays IN the window
#   because compat.py — its dependency — gains the hoisted rounding
#   factory this round) defer to r13 under tier B, named in
#   _DEFERRED_DUE below and REGISTRY.md. Full oracle parity for all 8
#   runs in pytest at HEAD.
_ROUND = 12  # the round this _PRIORITY window was built for

# Machine-readable tier-B ledger (r12, the r11 verdict's task 7):
# name → due round. A deferred row's staleness may reach 3 (the
# frozen-file ceiling); everything else is due within 2 rounds.
# tests/test_registry_window.py parses the CORRECTNESS_r*.json
# history and asserts every registry row's staleness ≤ its ceiling
# and every due row sits inside this window — the hand-maintained
# window math now has an automated slip-catcher.
_DEFERRED_DUE = {
    "q02_filter_scan": 13,
    "q09_sort_limit_offset": 13,
    "q11_except": 13,
    "q13_date_agg": 13,
    "q14_conditional_agg": 13,
    "q15_window_running": 13,
    "q16_like_filters": 13,
    "q39_pruned_catalog_scan": 13,
}

_PRIORITY = [
    # tier-B dues (green r9, frozen relational.py, ceiling = r12)
    "q40_array_functions",
    "q42_window_suite",
    "q43_null_semantics",
    "q44_date_functions",
    "q45_string_functions",
    # rule (2): registered this round
    "d40_dup_spans",
    "d41_quality_classifier",
    # rule (1): changed code this round (HALF_UP presentation round)
    "s11_neardup_numpy",
    # rule (b): last scored r10 (42 of 50; the 8 _DEFERRED_DUE rows
    # defer to r13)
    "d01_token_stats",
    "d02_lang_id",
    "d03_quality_score",
    "d05_exact_dedup",
    "d06_canonical_dedup",
    "d09b_jaccard_allpairs",
    "d11_bpe_tokens",
    "d13_stratified_sample",
    "d17_doc_chunking",
    "d18_sequence_packing",
    "d19_source_mixture",
    "d21_tfidf_topterms",
    "d24_quality_filter",
    "d25_token_budget_sample",
    "d26_source_regression",
    "d28_incremental_dedup",
    "d30_pipeline_funnel",
    "d32_simhash_pairs",
    "d34_bpe_merges",
    "d35_bpe_encode",
    "d36_redact_pii",
    "d37_tokenizer_fertility",
    "mm01_decode_metadata",
    "mm02_frame_sample",
    "mm03_resize_payload",
    "mm04_feature_extract",
    "mm05_audio_frames",
    "q21_sessionize",
    "q22_events_hourly",
    "q23_json_props",
    "q25_asof_join",
    "q26_div_zero_compat",
    "q27_salted_agg",
    "q38_retention",
    "q46_scalar_subquery",
    "s01_cosine_topk",
    "s02_embedding_pairs",
    "s03_label_centroids",
    "s07_exact_percentiles",
    "s09_quantize_int8",
    "s10_ann_recall",
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
