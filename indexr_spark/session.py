"""SparkSession construction tuned for columnar OLAP scans.

The reference engine's performance levers (SURVEY.md §4): vectorized
columnar reads sized to cache (DefaultPackReader.java:44-52), off-heap
memory (IndexRRecordReader.java:41), partial+final aggregation
(query-opt Utils.java:24-74), locality-aware scan assignment
(SegmentAssigner.java:29-60). On Spark all of these are configuration,
not code: the vectorized Parquet reader, AQE, and whole-stage codegen
are on by default; we pin the handful of settings that matter for an
analytics workload and would matter more on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settings that are safe (and desirable) to flip on an existing session
# at runtime — e.g. the session the correctness driver hands us.
RUNTIME_CONFS = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark's reader
    # refuses by default; read as long and convert (tables.load_table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # DuckDB (the correctness oracle) is UTC-naive; pin the session so
    # any LTZ<->NTZ conversion is a no-op shift.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing + skew-join splitting. At 100 TB this is
    # the difference between a stuck straggler task and a re-planned
    # stage; locally it trims empty shuffle partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # AQE coalesces by shuffle BYTES, but vector/hash workloads are
    # CPU-dense per byte (a 2.5 MB embedding shuffle hides 50M-flop
    # folds); the default 1 MB floor collapses those stages to 1-3
    # tasks. A small floor keeps CPU-bound stages wide; at real scale
    # partitions dwarf either floor, so this only removes the
    # pathology, never adds partitions to big shuffles.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    # Arrow for any pandas-UDF boundary (the sanctioned slow path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Spark 4 defaults ANSI mode ON, where x/0 THROWS. The reference
    # engine is decidedly non-ANSI (div/mod by zero yields 0 —
    # functions/compat.py mirrors that), and every ratio expression in
    # this engine was written against NULL-on-zero-divide semantics:
    # an empty document or zero-norm embedding in a 100 TB corpus must
    # yield a NULL ratio that downstream filters drop, not kill the
    # whole job with SparkArithmeticException.
    #
    # The pin is WIDER than divide-by-zero, and the extra surface
    # matters at scale (r3 ADVICE): non-ANSI mode also (1) silently
    # WRAPS integer overflow — sum(int) widens to long automatically,
    # but a sum/product that exceeds long range wraps to garbage
    # instead of failing loudly — and (2) turns invalid casts into
    # NULLs instead of errors. Engine-side audit: every integer-domain
    # aggregate here is bounded far below long range (counts and token
    # totals top out ~1e13 at 100 TB vs long's 9.2e18; the minhash
    # family keeps h*A+B under 4e15 by construction) and monetary
    # aggregates fold in double/decimal, so wraparound needs ~1e6x the
    # design scale. Operators ADDED to this engine that sum products
    # of longs (or parse user-supplied strings) should widen to
    # double/decimal explicitly or use try_add/try_multiply rather
    # than lean on this pin. Oracle parity note: DuckDB hugeint sums
    # make overflow visible on the oracle side first — a hash mismatch,
    # not silent agreement.
    "spark.sql.ansi.enabled": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply session-settable confs; safe on a session we didn't build."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be marked static on some builds; every query we
            # emit must still be correct, just possibly slower.
            pass
    return spark


def get_spark(
    app_name: str = "indexr-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession for this engine.

    Local mode is a stand-in for a real cluster: ``local[N]`` = one JVM
    with N executor threads. Shuffle partitions default to the core
    count — on a real cluster this would instead be sized so that
    (input bytes / partitions) fits executor memory; AQE coalescing
    makes over-partitioning cheap, so erring high is fine at scale.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scan split sizing. The test tables are single files a
        # few MB each, so 128 MiB splits would scan them on ONE task —
        # measured 2.5x slower on TPC-H Q1 at sf0.1. 8 MiB keeps all 32
        # local cores busy. On a real cluster set
        # SPARK_GRAFT_MAX_PARTITION_BYTES back to 128-256 MiB: at 100 TB
        # that bounds the scan at ~800k tasks and amortizes task launch.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8388608"),
        )
        .config("spark.sql.files.openCostInBytes", "1048576")
        # Read/write Parquet with zstd: best scan-per-byte at scale.
        .config("spark.sql.parquet.compression.codec", "zstd")
        # localCheckpoint blocks (the LSH/CC operators' lineage cuts)
        # are released by the ContextCleaner only after a DRIVER GC
        # drops the RDD reference; the stock periodic-GC interval is
        # 30 min, so a long-lived service session that calls those
        # operators repeatedly accumulates superseded checkpoint
        # blocks between full GCs — measured 9.7 s -> 18.3 s drift
        # over six consecutive d07 runs (r4 verdict), while a 60 s
        # periodic GC held ~5 s steady. Session-level default (bench.py
        # sets the same), so EVERY session gets the flat profile, not
        # just the bench harness. Static conf: must be set at build
        # time, a getOrCreate against an existing session won't flip it.
        .config("spark.cleaner.periodicGC.interval", "60s")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
