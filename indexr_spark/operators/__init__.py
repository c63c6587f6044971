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
# green row — their old row no longer certifies HEAD — and (b) rows
# last scored in round 1, now two rounds stale. Round-3 priority:
# the rewritten LSH family (d07/d09 + the new d09r recall scorer, and
# d12/d20 which consume d07's edges), the restructured sketch queries
# (s05/s08 — previously no_oracle, now tolerance-verdict-scored), then
# every r1-only row. Everything scored green in r2 is unchanged at
# HEAD and rotates to the tail. Keep pruning each round: new or
# changed operators enter at the head until their green row lands.
_PRIORITY = [
    # changed this round (LSH rewrite + sketch-verdict restructure)
    "d07_minhash_lsh",
    "d09_ngram_jaccard",
    "d09r_jaccard_recall",
    "d12_dup_clusters",
    "d20_cluster_keep_best",
    "s05_approx_stats",
    "s08_hll_sketch_union",
    # changed this round (token-array materialization rewrite) — their
    # r2 green rows predate the rewrite, so rule (a) applies to them
    # too even though the rewrite is result-identical by construction
    "d04_fingerprint",
    "d08_simhash",
    "d09b_jaccard_allpairs",
    "d16_repetition_stats",
    "d22_bigram_counts",
    "d23_ngram_contamination",
    # last scored in r1 (stale two rounds)
    "d14_normalize_text",
    "d15_contamination",
    "q01_pricing_summary",
    "q02_filter_scan",
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
    "q17_union_hybrid",
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
    "q33_shipping_priority",
    "q34_range_join",
    "q35_moving_avg",
    "q36_latest_per_user",
    "q37_funnel",
    # NOTE: 51 entries — q38_retention sits at position 51, just past
    # the 50-query scoring window. Changed-code entries outrank stale
    # rows (rule a > rule b); q38's code is unchanged since its r1
    # green row and it rotates into the r4 window.
    "q38_retention",
]
_missing = [n for n in _PRIORITY if n not in QUERIES]
assert not _missing, f"unknown priority names: {_missing}"
# duplicates would silently dedupe in the dict rebuild and shift which
# entries land inside the driver's first-50 scoring window
assert len(_PRIORITY) == len(set(_PRIORITY)), "duplicate priority names"
assert len(_PRIORITY) == 51, "window math documented above assumes 51"
QUERIES = {
    **{n: QUERIES[n] for n in _PRIORITY},
    **{n: f for n, f in QUERIES.items() if n not in _PRIORITY},
}
