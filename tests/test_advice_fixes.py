"""Regression tests for the round-1 advisory findings (ADVICE.md).

Each test pins the exact failure mode that was reported:
supplementary-plane false skips in LikePrefix, the compact()-vs-live-
ingest delete race, all-null row groups vanishing from the sidecar
fold, vacuum() crashing on non-snapshot paths, and asof_join skipping
a legitimately-NULL latest right value.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from indexr_spark.operators.asof import asof_join
from indexr_spark.plans.rough_check import RS, ColStats, LikePrefix
from indexr_spark.sources.segments import write_sidecar
from indexr_spark.sources.snapshots import vacuum


# --- LikePrefix: prefix-aware bounds (no synthetic upper bound) -----

def test_like_prefix_supplementary_plane_not_skipped():
    # every value starts with 'pre' but contains a code point above
    # U+FFFF — sorts after 'pre￿', so the old bound skipped it
    emoji = "pre\U0001f600"
    stats = {"c": ColStats(min=emoji, max=emoji + "x", null_count=0)}
    assert LikePrefix("c", "pre").rough(stats) is RS.ALL

    # max entirely below the prefix → provably no match
    lo = {"c": ColStats(min="aa", max="ab", null_count=0)}
    assert LikePrefix("c", "pre").rough(lo) is RS.NONE

    # min sorts after the prefix without extending it → provably none
    hi = {"c": ColStats(min="q", max="z", null_count=0)}
    assert LikePrefix("c", "pre").rough(hi) is RS.NONE

    # min > prefix but still extends it → must scan (or ALL)
    mid = {"c": ColStats(min="prez", max="q", null_count=0)}
    assert LikePrefix("c", "pre").rough(mid) is not RS.NONE


# --- write_sidecar: all-null row groups keep their null counts ------

def test_sidecar_counts_nulls_in_statless_row_groups(tmp_path):
    table = pa.table({"v": pa.array([None, None, 7, 9], type=pa.int64())})
    d = tmp_path / "t"
    d.mkdir()
    # row_group_size=2 → first group is all-null (stats carry a
    # null_count but no min/max)
    pq.write_table(table, str(d / "part-0.parquet"), row_group_size=2)
    sidecar = write_sidecar(str(d))
    (entry,) = sidecar["files"]
    col = entry["columns"]["v"]
    assert col["null_count"] == 2  # previously 0 — unsound for RS.ALL
    assert col["min"] == 7 and col["max"] == 9


# --- vacuum: clean no-op on a path with no committed snapshots ------

def test_vacuum_no_snapshots_is_noop(tmp_path):
    assert vacuum(str(tmp_path)) == []


# --- compact(): only committed, pinned batches are moved/deleted ----

def test_compact_leaves_uncommitted_batch(spark, tmp_path):
    from indexr_spark.sources.catalog import Catalog, ColumnSpec, TableSpec
    from indexr_spark.streaming.ingest import compact

    cat = Catalog(str(tmp_path))
    cat.save(TableSpec(name="t", columns=[ColumnSpec("k", "int"), ColumnSpec("v", "bigint")]))
    rt = cat.rt_dir("t")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k int, v bigint")
    # batch=0 committed by Spark (writes _SUCCESS)
    df.write.parquet(os.path.join(rt, "batch=0"))
    # batch=1 mid-write: parquet data present but no _SUCCESS marker
    df.write.parquet(os.path.join(rt, "batch=1"))
    os.remove(os.path.join(rt, "batch=1", "_SUCCESS"))

    moved = compact(spark, cat, "t")
    assert moved == 2  # only batch=0
    assert not os.path.isdir(os.path.join(rt, "batch=0"))
    assert os.path.isdir(os.path.join(rt, "batch=1"))  # NOT deleted

    # once committed, the straggler batch compacts on the next run
    with open(os.path.join(rt, "batch=1", "_SUCCESS"), "w"):
        pass
    assert compact(spark, cat, "t") == 2
    assert not os.path.isdir(rt)
    assert cat.read(spark, "t").count() == 4


# --- asof_join: a NULL value on the latest right row is preserved ---

def test_asof_join_preserves_null_from_latest_right_row(spark):
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 1, 100.0), (1, 5, None)], "k int, rts int, val double"
    )
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["val"]).collect()
    # the latest right row (rts=5) has val NULL; native ASOF JOIN
    # yields that NULL — not the older row's 100.0
    assert len(out) == 1
    assert out[0]["val"] is None


# --- weighted_sample: vanishing weights must not overflow the bigint
# mantissa cast (r8 ADVICE: weight 1e-300 threw ANSI CAST_OVERFLOW
# because the AES_E_MAX decade clamp left k*scale outside int64) ---

def test_weighted_sample_vanishing_weight_saturates_not_overflows(spark):
    from indexr_spark.operators.text import weighted_sample

    rows = [
        (1, "a", 100.0),       # normal weight
        (2, "a", 50.0),        # normal weight
        (3, "a", 1e-300),      # vanishing: pre-fix this CRASHED the cast
        (4, "a", 1e-300),      # two saturated docs -> doc_id tiebreak
        (5, "a", 0.0),         # non-positive: excluded entirely
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got = weighted_sample(d, k=3, weight_col="w", strata_col="source")
    ids = [r.doc_id for r in got.orderBy("doc_id").collect()]
    # no crash; doc 5 excluded (w <= 0); the two heavy docs selected;
    # exactly one saturated doc fills the third slot by doc_id order
    assert len(ids) == 3
    assert 5 not in ids
    assert {1, 2} <= set(ids)
    assert 3 in ids and 4 not in ids  # doc_id breaks the saturated tie


def test_weighted_sample_saturated_docs_rank_below_in_range_docs(spark):
    from indexr_spark.operators.text import weighted_sample

    # every in-range doc must outrank every saturated doc: the
    # saturated mantissa is -2^62 at decade e=8, strictly worse than
    # any in-clamp (e, m)
    rows = [(i, "s", 10.0 + i) for i in range(1, 9)] + [
        (100, "s", 1e-300), (101, "s", 1e-200)
    ]
    d = spark.createDataFrame(rows, "doc_id long, source string, w double")
    got = {r.doc_id for r in
           weighted_sample(d, k=8, weight_col="w", strata_col="source").collect()}
    assert got == set(range(1, 9))
