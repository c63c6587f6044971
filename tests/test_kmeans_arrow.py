"""kmeans_assign_arrow — the BLAS assignment engine for training.

Pins: (1) single-round assignment equality with the certified literal
argmax given the same centroids (cells exact, ccos equal at 6dp);
(2) a full kmeans_fit run per engine converges to the same model
(same history length, final centroids element-close, final inertia
relatively close — float summation order differs between BLAS and
the JVM fold, so later rounds are compared with tolerances, not
bit-equality); (3) engine validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from indexr_spark.operators.similarity import (
    _as_double,
    _dot,
    kmeans_assign,
    kmeans_assign_arrow,
    kmeans_fit,
)
from tests.conftest import SMOKE_SF


def _normed(spark):
    emb = spark.read.parquet(f"{SMOKE_SF}/embeddings.parquet")
    e = _as_double(F.col("embedding"))
    return emb.select(
        "vec_id", e.alias("e"), F.sqrt(_dot(e, e)).alias("nrm")
    )


def _seed_cents(spark, k=8):
    base = _normed(spark)
    return [
        [round(float(x), 6) for x in r["e"]]
        for r in base.orderBy("vec_id").limit(k).collect()
    ]


def test_single_round_assignment_equality(spark):
    base = _normed(spark).localCheckpoint()
    cents = _seed_cents(spark)
    lit = {r["vec_id"]: (r["cell"], round(r["ccos"], 6))
           for r in kmeans_assign(base, cents).collect()}
    arr = {r["vec_id"]: (r["cell"], round(r["ccos"], 6))
           for r in kmeans_assign_arrow(base, cents).collect()}
    assert arr == lit
    assert len({c for c, _ in lit.values()}) > 1, "degenerate assignment"


def test_full_fit_converges_to_same_model(spark):
    emb = spark.read.parquet(f"{SMOKE_SF}/embeddings.parquet")
    c_lit, h_lit = kmeans_fit(emb, k=8, max_iters=5)
    c_arr, h_arr = kmeans_fit(emb, k=8, max_iters=5, assign="arrow")
    assert len(h_lit) == len(h_arr)
    assert math.isclose(
        h_lit[-1]["inertia"], h_arr[-1]["inertia"], rel_tol=1e-6
    )
    for a, b in zip(c_lit, c_arr):
        for x, y in zip(a, b):
            assert abs(x - y) < 1e-6


def test_engine_validation(spark):
    emb = spark.read.parquet(f"{SMOKE_SF}/embeddings.parquet")
    with pytest.raises(ValueError):
        kmeans_fit(emb, k=4, assign="blas")


def test_zero_norm_row_matches_literal_null(spark):
    """r10 ADVICE: a zero-norm embedding must yield NULL ccos in BOTH
    engines (the JVM's non-ANSI division does; the Arrow batch now
    mirrors it instead of emitting inf/NaN), so downstream aggregates
    skip the row identically."""
    rows = [(0, [0.0] * 8, 0.0), (1, [1.0] * 8, math.sqrt(8.0)),
            (2, [2.0] * 8, math.sqrt(32.0))]
    base = spark.createDataFrame(
        rows, "vec_id long, e array<double>, nrm double"
    )
    cents = [[1.0] * 8, [-1.0] * 8]
    lit = {r["vec_id"]: (r["cell"], r["ccos"])
           for r in kmeans_assign(base, cents).collect()}
    arr = {r["vec_id"]: (r["cell"], r["ccos"])
           for r in kmeans_assign_arrow(base, cents).collect()}
    assert lit[0][1] is None and arr[0][1] is None
    assert {k: (c, None if x is None else round(x, 9))
            for k, (c, x) in lit.items()} == \
           {k: (c, None if x is None else round(x, 9))
            for k, (c, x) in arr.items()}


def test_round_state_collect_is_k_rows(spark):
    """The kmeans_fit docstring's driver bound, asserted: the only
    per-round collect is the k-row (cell, n, inertia, c0..cd-1)
    aggregate — k·d doubles of driver state, never corpus-sized."""
    base = _normed(spark).localCheckpoint()
    k = 8
    cents = _seed_cents(spark, k=k)
    dim = len(cents[0])
    a = kmeans_assign(base, cents)
    agg = a.groupBy("cell").agg(
        F.count("*").alias("n"),
        F.sum(F.lit(1.0) - F.col("ccos")).alias("inertia"),
        *[F.avg(F.col("e")[i]).alias(f"c{i}") for i in range(dim)],
    )
    rows = agg.collect()
    assert 0 < len(rows) <= k
