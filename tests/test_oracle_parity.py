"""Every registered operator vs its DuckDB oracle, value-for-value.

Mirrors the driver's t2 gate (BASELINE.json): row count, column names,
and order-insensitive value equality. Runs at sf0.001 by default for
speed; set INDEXR_TEST_SF_DIR=/root/testdata/sf0.01 for the full
correctness scale.
"""

from __future__ import annotations

import math

import pytest

from indexr_spark import operators
from tests.conftest import SMOKE_SF


def _normalize(rows, colnames):
    """Rows → sorted list of tuples with columns sorted by name and
    floats rounded to a comparable representation."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # final guard: compare at 1e-9 resolution
            return round(v, 9)
        return v

    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(operators.ORACLE))
def test_oracle_parity(spark, duck_smoke, name):
    sdf = operators.QUERIES[name](spark, SMOKE_SF)
    # Registry convention (r10, the d35 lesson — see operators/__init__):
    # driver-row outputs are SCALAR columns only. The driver's
    # canonicalizer pandas-sorts the frame before hashing; an
    # array/map/struct cell makes a row permanently red regardless of
    # values, so catch the contract violation here, the round the
    # operator is written, not in the driver.
    from pyspark.sql.types import ArrayType, MapType, StructType

    nested = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not nested, (
        f"{name}: non-scalar output columns {nested} would break the "
        "driver canonicalizer — fold to scalars (array_join / explode "
        "with a pos column / size) in both the query and the oracle"
    )
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck_smoke.sql(operators.ORACLE[name])
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(ns, nd)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a schema."""
    for name in sorted(set(operators.QUERIES) - set(operators.ORACLE)):
        df = operators.QUERIES[name](spark, SMOKE_SF)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
