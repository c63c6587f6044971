"""Session-timezone hostility: results must not shift under a non-UTC
session zone.

The driver builds its own SparkSession with an arbitrary timezone;
`tables.load_table` pins UTC at analysis time so timestamp semantics
stay aligned with the UTC-naive DuckDB oracle. This suite re-runs the
timestamp-heavy queries under Asia/Tokyo and compares to the oracle —
the exact probe that caught a live bug in round 1.
"""

from __future__ import annotations

import pytest

from indexr_spark import operators
from tests.conftest import SMOKE_SF, make_duck

TS_QUERIES = [
    "q01_pricing_summary",   # shipdate filter + date grouping
    "q13_date_agg",          # month truncation
    "q20_events_rollup",     # events ts dims
    "q21_sessionize",        # ts gaps
    "q22_events_hourly",     # hour extraction
    "q25_asof_join",         # ts ordering across sides
    "q34_range_join",        # ts BETWEEN
    "q36_latest_per_user",   # max-by ts
    "q39_pruned_catalog_scan",  # pruning literal vs sidecar stats
]


@pytest.fixture(scope="module")
def tokyo(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", TS_QUERIES)
def test_hostile_timezone_parity(tokyo, name):
    duck = make_duck(SMOKE_SF)
    srows = sorted(tuple(r) for r in operators.QUERIES[name](tokyo, SMOKE_SF).collect())
    drows = sorted(tuple(r) for r in duck.sql(operators.ORACLE[name]).fetchall())
    assert srows == drows, f"{name} shifted under Asia/Tokyo"
