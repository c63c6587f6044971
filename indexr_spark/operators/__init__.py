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
# stalest green rows. Round-5 window (exactly 50):
#   rule (a), 3 entries: s11_neardup_numpy (NEW this round — the
#   tolerance-verdict row for the BLAS path, r4 verdict task 6), and
#   q17/q39 (the catalog/snapshot read path changed: delta manifests +
#   lagging-sidecar prune reconciliation).
#   rule (b): all 40 rows last scored in r3 (everything r4's window
#   did not cover — they are now the stalest, at 2 rounds).
#   7 spare slots: flagship r4-green refreshes, led by d10 (its oracle
#   string was refactored into a shared CTE — byte-identical SQL, but
#   a driver row beats an argument) and the heavy LSH/IVF family.
# After this round every registry query is green in r4∪r5 with
# <=1-round staleness.
_PRIORITY = [
    # rule (a): new or code-changed since last green row
    "s11_neardup_numpy",
    "q17_union_hybrid",
    "q39_pruned_catalog_scan",
    # rule (b): last scored r3 (40)
    "d04_fingerprint",
    "d08_simhash",
    "d14_normalize_text",
    "d15_contamination",
    "d16_repetition_stats",
    "d22_bigram_counts",
    "d23_ngram_contamination",
    "q03_scalar_expr",
    "q04_agg_having_limit_offset",
    "q05_distinct_agg",
    "q06_join_broadcast",
    "q07_multi_join",
    "q08_window_topk",
    "q09_sort_limit_offset",
    "q10_intersect",
    "q11_except",
    "q12_rollup",
    "q13_date_agg",
    "q14_conditional_agg",
    "q15_window_running",
    "q16_like_filters",
    "q18_sql_embedded",
    "q19_update_column_expr",
    "q20_events_rollup",
    "q21_sessionize",
    "q22_events_hourly",
    "q23_json_props",
    "q24_events_pivot",
    "q26_div_zero_compat",
    "q28_cube",
    "q29_anti_join",
    "q30_correlated_avg",
    "q31_outer_join",
    "q32_semi_join",
    "q34_range_join",
    "q35_moving_avg",
    "q36_latest_per_user",
    "q37_funnel",
    "s05_approx_stats",
    "s08_hll_sketch_union",
    # spare slots: flagship refreshes (green r4)
    "d10_embedding_neardup",
    "d07_minhash_lsh",
    "d09_ngram_jaccard",
    "d12_dup_clusters",
    "s04_ann_lsh_topk",
    "s06_ivf_topk",
    "q01_pricing_summary",
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
