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
# Round-11 window (exactly 50), executing REGISTRY.md's "r11 window
# must hold" pre-commitment:
#   tier-B dues, 4 entries: q03/q10/q33/q41 — deferred r10, at their
#   3-round ceiling now (relational.py file-frozen since their r8
#   greens, full oracle parity in pytest at HEAD). MUST score.
#   rule (2), 2 entries: d38_bigram_logprob + s13_pq_encode — the
#   scheduled r11 registrations (REGISTRY.md queue), both
#   pytest-oracle-proven since r8/r9; s13's output folded to a
#   dash-joined scalar at registration (the r10 convention), fold
#   pinned lossless in tests/test_pq.py.
#   rule (b): 44 of the 49 rows last scored r9. The 5 displaced rows
#   (q40_array_functions, q42_window_suite, q43_null_semantics,
#   q44_date_functions, q45_string_functions — relational.py, the one
#   eligible family whose file r11 provably does not touch: this
#   round's diffs land in text.py/pq.py/similarity.py/sizing.py)
#   defer to r12 under tier B, named in REGISTRY.md with their due
#   round. Full oracle parity for all 5 runs in pytest at HEAD.
_PRIORITY = [
    # tier-B dues (green r8, frozen relational.py, ceiling = r11)
    "q03_scalar_expr",
    "q10_intersect",
    "q33_shipping_priority",
    "q41_grouping_sets",
    # rule (2): registered this round
    "d38_bigram_logprob",
    "s13_pq_encode",
    # rule (b): last scored r9 (44 of 49; q40/q42/q43/q44/q45 defer
    # to r12)
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
    "q01_pricing_summary",
    "q04_agg_having_limit_offset",
    "q05_distinct_agg",
    "q06_join_broadcast",
    "q07_multi_join",
    "q08_window_topk",
    "q12_rollup",
    "q17_union_hybrid",
    "q18_sql_embedded",
    "q19_update_column_expr",
    "q20_events_rollup",
    "q24_events_pivot",
    "q28_cube",
    "q29_anti_join",
    "q30_correlated_avg",
    "q31_outer_join",
    "q32_semi_join",
    "q34_range_join",
    "q35_moving_avg",
    "q36_latest_per_user",
    "q37_funnel",
    "q47_moment_stats",
    "s04_ann_lsh_topk",
    "s05_approx_stats",
    "s06_ivf_topk",
    "s08_hll_sketch_union",
    "s11_neardup_numpy",
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
