"""Skew-aware (salted) aggregation — the manual fallback when AQE
skew handling isn't enough (e.g. one key holding 30% of 100 TB).

Two-phase: salt each row into `n_salts` subkeys, partially aggregate
on (key, salt) — spreading one hot key over n reducers — then merge
partials on the key alone. Only algebraic aggregates (sum/count/
min/max and anything built from them, like avg = sum/count) can be
re-merged this way; the helper enforces that.

The oracle for the salted query is the *plain* GROUP BY — salting
must be invisible in the results, and that invariance is exactly what
the driver's hash comparison certifies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from indexr_spark.tables import load_table

ORACLE: dict[str, str] = {}

N_SALTS = 16

_MERGERS = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    aggs: output name → (agg kind, input column), kind ∈ sum/count/min/max.
    The salt is derived from a per-row hash (uniform, deterministic
    not required — it never reaches the result).
    """
    salt = (F.spark_partition_id() * 31 + F.monotonically_increasing_id()) % n_salts
    phase1 = [
        (F.count(col) if kind == "count" else _MERGERS[kind](col)).alias(name)
        for name, (kind, col) in aggs.items()
    ]
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1)
    phase2 = [
        _MERGERS[kind](F.col(name)).alias(name) for name, (kind, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2)


def q27_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key aggregation via salting: l_returnflag has only 3
    values (maximal skew for a 32-way shuffle). Results must be
    identical to the unsalted GROUP BY — which is the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs={
            "sum_qty": ("sum", F.col("l_quantity")),
            "n_rows": ("count", F.lit(1)),
            "min_price": ("min", F.col("l_extendedprice")),
            "max_price": ("max", F.col("l_extendedprice")),
        },
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 2).alias("sum_qty"),
        "n_rows",
        "min_price",
        "max_price",
    ).orderBy("l_returnflag")


ORACLE["q27_salted_agg"] = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n_rows,
       min(l_extendedprice)      AS min_price,
       max(l_extendedprice)      AS max_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {"q27_salted_agg": q27_salted_agg}
