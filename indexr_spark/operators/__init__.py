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
# Round-14 window (exactly 50) — the second optimization round, so
# NO new registrations (mm06/d43's scheduled r14 slots defer to the
# next build round; an optimization round adds no features — both
# drafts stay pytest-oracle-proven at HEAD, REGISTRY.md):
#   tier-B dues, 13 entries: q03/q05/q10/q12/q28/q29/q30/q31/q32/
#   q33/q35/q36/q41 — deferred r13, at their 3-round ceiling now
#   (relational.py file-frozen since their r11 greens, full oracle
#   parity in pytest at HEAD). MUST score.
#   rule (1), 6 entries flagged by the r13 verdict (the r13 window
#   was frozen in the BUILD-window commit before the optimization
#   commits landed, so these changed-code rows escaped the r13
#   window): s01_cosine_topk, s02_embedding_pairs, s10_ann_recall,
#   d21_tfidf_topterms, d40_dup_spans, d34_bpe_merges. All six are
#   ALSO at their tier-A ceiling (last scored r12), so they re-enter
#   on both grounds.
#   rule (1), r14 optimization diffs: d09_ngram_jaccard (bitset
#   verify + candidate-respread removal), d09r_jaccard_recall
#   (embeds d09), d33_neardup_incremental (spread_scan before the
#   sig build), s14_ivfpq_probe (engine default literal → arrow),
#   d38_bigram_logprob + d42_perplexity_bucket (spread_scan before
#   the exploded-stream pin; d42 embeds d38) — each r13-green but
#   code-changed this round, each displacing one tier-B-eligible r12
#   row (mm01-mm05 + q25 → deferred r15; multimodal.py and asof.py
#   are file-frozen this round and pytest-oracle-covered at HEAD).
#   d32_simhash_pairs also changed (spread_scan before the sig build)
#   and was ALREADY in this window under rule (b) — no displacement.
#   Cross-cutting note: tables.load_table gained a per-session
#   RESOLVED-PLAN memo in r14 (metadata only — execution still scans
#   parquet every run). It sits on EVERY row's build path, which no
#   50-row window can hold; the risk is uniform (one shared 15-line
#   function), the r14 window spans every operator family through it,
#   and the full pytest oracle-parity suite (110 rows vs DuckDB)
#   passed at HEAD with the memo in place — the same machine-check
#   tier-B deferrals rest on.
#   rule (b): the remaining rows last scored r12 (46 total at their
#   2-round ceiling; 13 + 6-already-counted + 37 others = 59 > 50),
#   so 9 defer to r15 under tier B: q40/q42/q43/q44/q45/q46
#   (relational.py) + q21/q22/q23 (events.py) — the two eligible
#   families whose files r14 provably does not touch (this round's
#   diffs land in text.py, similarity.py, bench/test tooling), plus
#   the three mm deferrals above. Full oracle parity for all runs in
#   pytest at HEAD.
_ROUND = 14  # the round this _PRIORITY window was built for

# Machine-readable tier-B ledger (r12, the r11 verdict's task 7):
# name → due round. A deferred row's staleness may reach 3 (the
# frozen-file ceiling); everything else is due within 2 rounds.
# tests/test_registry_window.py parses the CORRECTNESS_r*.json
# history and asserts every registry row's staleness ≤ its ceiling
# and every due row sits inside this window — the hand-maintained
# window math now has an automated slip-catcher.
_DEFERRED_DUE = {
    "q40_array_functions": 15,
    "q42_window_suite": 15,
    "q43_null_semantics": 15,
    "q44_date_functions": 15,
    "q45_string_functions": 15,
    "q46_scalar_subquery": 15,
    "q21_sessionize": 15,
    "q22_events_hourly": 15,
    "q23_json_props": 15,
    "mm01_decode_metadata": 15,
    "mm02_frame_sample": 15,
    "mm03_resize_payload": 15,
    "mm04_feature_extract": 15,
    "mm05_audio_frames": 15,
    "q25_asof_join": 15,
}

_PRIORITY = [
    # tier-B dues (green r11, frozen relational.py, ceiling = r14)
    "q03_scalar_expr",
    "q05_distinct_agg",
    "q10_intersect",
    "q12_rollup",
    "q28_cube",
    "q29_anti_join",
    "q30_correlated_avg",
    "q31_outer_join",
    "q32_semi_join",
    "q33_shipping_priority",
    "q35_moving_avg",
    "q36_latest_per_user",
    "q41_grouping_sets",
    # rule (1): the six changed-code rows that escaped the r13 window
    # (r13 verdict item 2) — also at their r12 tier-A ceiling
    "s01_cosine_topk",
    "s02_embedding_pairs",
    "s10_ann_recall",
    "d21_tfidf_topterms",
    "d40_dup_spans",
    "d34_bpe_merges",
    # rule (1): r14 optimization diffs — r13-green rows whose executed
    # code changed this round
    "d09_ngram_jaccard",
    "d09r_jaccard_recall",
    "d33_neardup_incremental",
    "s14_ivfpq_probe",
    "d38_bigram_logprob",
    "d42_perplexity_bucket",
    # rule (b): the other rows last scored r12, at their 2-round
    # ceiling (34 of 40; q40/q42-q46 + q21/q22/q23 + mm01/mm02/mm03
    # defer to r15)
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
    "d24_quality_filter",
    "d25_token_budget_sample",
    "d26_source_regression",
    "d28_incremental_dedup",
    "d30_pipeline_funnel",
    "d32_simhash_pairs",
    "d36_redact_pii",
    "d41_quality_classifier",
    "q27_salted_agg",
    "q38_retention",
    "s03_label_centroids",
    "s07_exact_percentiles",
    "s09_quantize_int8",
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
