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
# frozen-code rows explicitly deferred there). Round-8 window
# (exactly 50):
#   tier-B dues, 2 entries: q03_scalar_expr + q10_intersect (green r5,
#   relational.py frozen, 3-round ceiling lands this round).
#   rule (a), 6 entries — every query whose executed path changed in
#   r8: d31_weighted_sample (ulp-robust quantized A-ES ranking — the
#   r7 ADVICE structural-flap fix, mirrored in its oracle),
#   d34_bpe_merges (bpe_train now folds only the slice of words
#   containing the merge pair — bit-identical output, test_bpe.py
#   pins it), and d07/d10/d12/d32 (chunked_self_join gained the
#   1-partition-probe auto guard; their probes are well-partitioned
#   so their PLANS are unchanged — REGISTRY.md's "when in doubt the
#   row goes in" still applies at the function level).
#   rule (b): 42 of the 48 rows last scored r6; the remaining 6
#   (q40/q42/q43/q44/q45/q47 — relational.py + events.py, both
#   file-frozen since their r6 rows, full oracle parity in pytest at
#   HEAD) defer to r9 under tier B, named in REGISTRY.md with their
#   due round.
# After this round every registry query is green in r7∪r8 except the
# six named deferrals (green r6, frozen, due r9).
_PRIORITY = [
    # tier-B dues (green r5, frozen relational.py, ceiling = r8)
    "q03_scalar_expr",
    "q10_intersect",
    # rule (a): code path changed in r8
    "d31_weighted_sample",
    "d32_simhash_pairs",
    "d34_bpe_merges",
    "d07_minhash_lsh",
    "d10_embedding_neardup",
    "d12_dup_clusters",
    # rule (b): last scored r6 (42 of 48; q40/q42-q45/q47 deferred)
    "d09_ngram_jaccard",
    "q17_union_hybrid",
    "q19_update_column_expr",
    "q39_pruned_catalog_scan",
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
    "q41_grouping_sets",
    "q46_scalar_subquery",
    "s01_cosine_topk",
    "s02_embedding_pairs",
    "s03_label_centroids",
    "s07_exact_percentiles",
    "s09_quantize_int8",
    "s10_ann_recall",
    "d28_incremental_dedup",
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
