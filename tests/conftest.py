"""Shared fixtures: one SparkSession per test run, DuckDB oracle."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SMOKE_SF = os.environ.get("INDEXR_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF = os.environ.get("INDEXR_ORACLE_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from indexr_spark.session import get_spark

    s = get_spark(
        app_name="indexr-tests",
        cpus=int(os.environ.get("INDEXR_TEST_CPUS", "8")),
        driver_memory="8g",
    )
    yield s


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


@pytest.fixture(scope="session")
def duck_smoke():
    return make_duck(SMOKE_SF)
