"""Loaders for the driver-generated test tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

The only normalization performed here is the ``events.ts`` column:
the file stores TIMESTAMP(NANOS) which Spark reads (only) as a raw
long under ``spark.sql.legacy.parquet.nanosAsLong``; we convert to a
microsecond TIMESTAMP_NTZ so it behaves like every other timestamp
column (and matches DuckDB's ``CAST(ts AS TIMESTAMP)`` truncation).
All conversions are bound at analysis time under a UTC session zone,
so later session-timezone changes cannot shift results.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indexr_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, normalizing the events timestamp column."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns-long -> microsecond LTZ -> NTZ; the LTZ->NTZ cast resolves
        # its zone id at analysis time, which apply_runtime_confs just
        # pinned to UTC, making the round trip a pure truncation.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long")).cast(
                "timestamp_ntz"
            ),
        )
    return df


def spread_scan(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before CPU-dense per-row work.

    A small-by-bytes file scans as a handful of tasks (sf0.1's 580 KB
    documents table is ONE partition), which serializes work whose cost
    is per-ROW, not per-byte — tokenization, per-token digests, minhash
    families (measured: the d07/d09 canon-group build spent 3.1 s on
    1 core vs 0.6 s spread). The shuffle this inserts is bounded by the
    scan itself: it only fires when partition count is a small fraction
    of the cluster's slots, and each scanned partition is at most
    `spark.sql.files.maxPartitionBytes`, so the worst case moves
    (cores/4) x maxPartitionBytes. At 100 TB the corpus scans thousands
    of partitions wide and this is a metadata check + no-op — it exists
    for the small-input-heavy-CPU corner, which is exactly the local
    test shape.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # .rdd inspects the physical scan's partitioning — no job runs.
    # Spread when at least half the slots would sit idle: covers the
    # 1-partition scan even at parallelism 2-3, while a near-parity
    # scan (6000 partitions on 8000 cores) stays a no-op.
    if df.rdd.getNumPartitions() * 2 > target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can be written in pure SQL."""
    for n in names or TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
