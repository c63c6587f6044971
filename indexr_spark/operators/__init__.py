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

_MODULES = (relational, events, text, similarity, multimodal, asof, skew)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    _overlap = QUERIES.keys() & _m.QUERIES.keys()
    assert not _overlap, f"duplicate operator names: {_overlap}"
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)

# Every oracle must have a query (the reverse is allowed: rows-only ops).
assert set(ORACLE) <= set(QUERIES), sorted(set(ORACLE) - set(QUERIES))
