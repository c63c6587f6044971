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
# green row — their old row no longer certifies HEAD — plus every
# never-scored new operator, and (b) the stalest green rows, under the
# staleness tiers REGISTRY.md defines (<=2 rounds by default, <=3 for
# frozen-code rows explicitly deferred there). Round-7 window
# (exactly 50):
#   rule (a), 3 entries: d08_simhash (its body moved into the shared
#   simhash_frame feeding d32), d27_unigram_logprob (min_count/top_k
#   vocab cap + OOV mass), d29_entropy_profile (sorted-run counting
#   replaced the per-distinct filter scan).
#   new, 4 entries: d31_weighted_sample, d32_simhash_pairs (the two
#   r6-verdict-flagged uncertified library operators),
#   d33_neardup_incremental (the doc_band_sigs/neardup_against_store
#   ingestion path), d34_bpe_merges (distributed BPE training —
#   rows-only: no SQL oracle, certified by test_bpe.py's plain-Python
#   reference implementation).
#   rule (b): 43 of the 46 rows last scored in r5 — all but d08
#   (already in under rule a) and the two frozen-code tier-B
#   deferrals q03_scalar_expr + q10_intersect (relational.py
#   untouched since their r5 green rows; REGISTRY.md records both —
#   due r8, 3-round ceiling).
# After this round every registry query is green in r6∪r7 except
# q03/q10 (green r5, frozen, due r8).
_PRIORITY = [
    # rule (a): code path changed since last green row
    "d08_simhash",
    "d27_unigram_logprob",
    "d29_entropy_profile",
    # new in r7 — never driver-scored
    "d31_weighted_sample",
    "d32_simhash_pairs",
    "d33_neardup_incremental",
    "d34_bpe_merges",
    # rule (b): last scored r5 (43 of 46; d08 above, q03/q10 deferred)
    "s11_neardup_numpy",
    "d04_fingerprint",
    "d14_normalize_text",
    "d15_contamination",
    "d16_repetition_stats",
    "d22_bigram_counts",
    "d23_ngram_contamination",
    "q04_agg_having_limit_offset",
    "q05_distinct_agg",
    "q06_join_broadcast",
    "q07_multi_join",
    "q08_window_topk",
    "q09_sort_limit_offset",
    "q11_except",
    "q12_rollup",
    "q13_date_agg",
    "q14_conditional_agg",
    "q15_window_running",
    "q16_like_filters",
    "q18_sql_embedded",
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
    "d10_embedding_neardup",
    "d07_minhash_lsh",
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
