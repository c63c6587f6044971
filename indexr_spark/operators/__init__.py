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
# frozen-code rows explicitly deferred there). Round-9 window
# (exactly 50):
#   tier-B dues, 6 entries: q40/q42/q43/q44/q45/q47 (green r6,
#   relational.py + events.py frozen, 3-round ceiling lands now).
#   rule (a) re-entries from r8's window, 9 entries: d31 (mantissa
#   saturation — the r8 ADVICE overflow fix, mirrored in its oracle),
#   d07/d09/d09r/d12/d20 (_lsh_group_pairs' capped branch now passes
#   repartition_probe=False — driver plans unchanged since the driver
#   runs uncapped, but the function changed: "when in doubt the row
#   goes in"), q17/q19 (the copy-on-write scoping cascade gained the
#   range-selective short-circuit on their snapshot paths), d10 (its
#   bucket join now passes repartition_probe=False — the r8 bench's
#   1.57x reading root-caused to the AUTO probe's physical-planning
#   pass, ~0.9 s per fresh call on d10's join lineage; see
#   similarity.py and COVERAGE.md r9).
#   rule (2), 1 entry: d35_bpe_encode — registered this round per the
#   REGISTRY.md schedule.
#   rule (b): 34 of the 44 rows last scored r7 — including the two
#   committed r9 changed-code rows d16 (sorted-run swap) and d33
#   (hash-aggregable re-attach maps), which were already in this base.
#   The 10 displaced frozen rows (q09/q11/q13/q14/q15/q16/q21/q22/q23
#   + q26, displaced late-r9 by d10's rule-(a) re-entry —
#   relational.py + events.py file-frozen since their r7 greens, full
#   oracle parity in pytest at HEAD) defer to r10 under tier B, named
#   in REGISTRY.md with their due round.
_PRIORITY = [
    # tier-B dues (green r6, frozen files, ceiling = r9)
    "q40_array_functions",
    "q42_window_suite",
    "q43_null_semantics",
    "q44_date_functions",
    "q45_string_functions",
    "q47_moment_stats",
    # rule (a): code path changed in r9
    "d31_weighted_sample",
    "d07_minhash_lsh",
    "d09_ngram_jaccard",
    "d09r_jaccard_recall",
    "d12_dup_clusters",
    "d20_cluster_keep_best",
    "q17_union_hybrid",
    "q19_update_column_expr",
    "d10_embedding_neardup",
    # rule (2): registered this round
    "d35_bpe_encode",
    # rule (a) within the r7 base: changed code this round
    "d16_repetition_stats",
    "d33_neardup_incremental",
    # rule (b): last scored r7 (33 more of 44; 9 deferred to r10)
    "d04_fingerprint",
    "d08_simhash",
    "d14_normalize_text",
    "d15_contamination",
    "d22_bigram_counts",
    "d23_ngram_contamination",
    "d27_unigram_logprob",
    "d29_entropy_profile",
    "q01_pricing_summary",
    "q04_agg_having_limit_offset",
    "q05_distinct_agg",
    "q06_join_broadcast",
    "q07_multi_join",
    "q08_window_topk",
    "q12_rollup",
    "q18_sql_embedded",
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
