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
# Round-13 window (exactly 50), executing REGISTRY.md's "r13 window
# must hold" pre-commitment:
#   tier-B dues, 8 entries: q02/q09/q11/q13/q14/q15/q16/q39 —
#   deferred r12, at their 3-round ceiling now (relational.py
#   file-frozen since their r10 greens, full oracle parity in pytest
#   at HEAD). MUST score.
#   rule (2), 2 entries: s14_ivfpq_probe + d42_perplexity_bucket —
#   the scheduled r13 registrations (REGISTRY.md queue), both
#   pytest-oracle-proven at HEAD (s14: independent numpy replay of
#   the whole probe + frame-exact DuckDB parity at both SFs + the
#   Arrow deploy engine pinned frame-equal; d42: both-SF parity,
#   boundary pin, suggest-helper contract).
#   rule (1), 4 entries — code changed this round:
#   s11_neardup_numpy + q26_div_zero_compat (functions/compat.py's
#   HALF_UP suspect band now scales with magnitude — the r12 ADVICE
#   finding; s11 executes the factory, q26 shares the module, the
#   r12 precedent), d35_bpe_encode + d37_tokenizer_fertility
#   (D35_MERGES is now d34's learned prefix and the oracle replay
#   switched to whole-token double-separator matching — outputs
#   changed, both re-proven at both SFs in pytest).
#   rule (b): 36 of the 49 rows last scored r11. The 13 displaced
#   rows (q03/q05/q10/q12/q28/q29/q30/q31/q32/q33/q35/q36/q41 — all
#   relational.py bodies, the one eligible family whose file r13
#   provably does not touch: this round's diffs land in
#   functions/compat.py, text.py's BPE block + d42 registration
#   entries, pq.py's s14 registration entries, and test/bench
#   tooling) defer to r14 under tier B, named in _DEFERRED_DUE below
#   and REGISTRY.md. Full oracle parity for all 13 runs in pytest at
#   HEAD.
_ROUND = 13  # the round this _PRIORITY window was built for

# Machine-readable tier-B ledger (r12, the r11 verdict's task 7):
# name → due round. A deferred row's staleness may reach 3 (the
# frozen-file ceiling); everything else is due within 2 rounds.
# tests/test_registry_window.py parses the CORRECTNESS_r*.json
# history and asserts every registry row's staleness ≤ its ceiling
# and every due row sits inside this window — the hand-maintained
# window math now has an automated slip-catcher.
_DEFERRED_DUE = {
    "q03_scalar_expr": 14,
    "q05_distinct_agg": 14,
    "q10_intersect": 14,
    "q12_rollup": 14,
    "q28_cube": 14,
    "q29_anti_join": 14,
    "q30_correlated_avg": 14,
    "q31_outer_join": 14,
    "q32_semi_join": 14,
    "q33_shipping_priority": 14,
    "q35_moving_avg": 14,
    "q36_latest_per_user": 14,
    "q41_grouping_sets": 14,
}

_PRIORITY = [
    # tier-B dues (green r10, frozen relational.py, ceiling = r13)
    "q02_filter_scan",
    "q09_sort_limit_offset",
    "q11_except",
    "q13_date_agg",
    "q14_conditional_agg",
    "q15_window_running",
    "q16_like_filters",
    "q39_pruned_catalog_scan",
    # rule (2): registered this round
    "s14_ivfpq_probe",
    "d42_perplexity_bucket",
    # rule (1): changed code this round (compat.py band; D35_MERGES)
    "s11_neardup_numpy",
    "q26_div_zero_compat",
    "d35_bpe_encode",
    "d37_tokenizer_fertility",
    # rule (b): last scored r11 (36 of 49; the 13 _DEFERRED_DUE rows
    # defer to r14)
    "d04_fingerprint",
    "d07_minhash_lsh",
    "d08_simhash",
    "d09_ngram_jaccard",
    "d09r_jaccard_recall",
    "d10_embedding_neardup",
    "d12_dup_clusters",
    "d14_normalize_text",
    "d15_contamination",
    "d16_repetition_stats",
    "d20_cluster_keep_best",
    "d22_bigram_counts",
    "d23_ngram_contamination",
    "d27_unigram_logprob",
    "d29_entropy_profile",
    "d31_weighted_sample",
    "d33_neardup_incremental",
    "d38_bigram_logprob",
    "q01_pricing_summary",
    "q04_agg_having_limit_offset",
    "q06_join_broadcast",
    "q07_multi_join",
    "q08_window_topk",
    "q17_union_hybrid",
    "q18_sql_embedded",
    "q19_update_column_expr",
    "q20_events_rollup",
    "q24_events_pivot",
    "q34_range_join",
    "q37_funnel",
    "q47_moment_stats",
    "s04_ann_lsh_topk",
    "s05_approx_stats",
    "s06_ivf_topk",
    "s08_hll_sketch_union",
    "s13_pq_encode",
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
