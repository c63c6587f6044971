"""Streaming event sources — Kafka/JSON/CSV fetcher parity.

Reference fetchers (SURVEY.md §2.4): Kafka08Fetcher (JSON events →
rows; malformed events counted & dropped — Fetcher.java:60-77
`statFail`), CsvFetcher, ConsoleFetcher/TestFetcher. Spark mapping:

    Kafka08Fetcher   readStream.format("kafka") + parse_json_events
    CsvFetcher       readStream.csv(schema=...)
    TestFetcher      file/memory streams (how the tests drive ingest)

JSON parsing runs JVM-side via from_json with PERMISSIVE corrupt-
record capture — the UTF8JsonRowCreator behavior (parse what you can,
count what you can't) without a Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def parse_json_events(
    raw: DataFrame, schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Parse a string column of JSON events into typed columns.

    Malformed events land with `_corrupt` = true instead of failing
    the stream (Fetcher statFail parity) — the caller decides whether
    to drop, dead-letter, or alert on them. Works on batch and
    streaming DataFrames alike.
    """
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = raw.withColumn(
        "_parsed",
        F.from_json(
            F.col(value_col).cast("string"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    out = parsed.select(
        *[F.col(f"_parsed.{f.name}").alias(f.name) for f in schema.fields],
        F.col(f"_parsed.{CORRUPT_COL}").isNotNull().alias("_corrupt"),
    )
    return out


def drop_and_count_corrupt(df: DataFrame) -> DataFrame:
    """Drop malformed events; streaming metrics come from the sink's
    numInputRows vs the pre-filter count (observable via
    df.observe on Spark ≥3.3)."""
    return df.observe(
        "ingest", F.sum(F.col("_corrupt").cast("long")).alias("corrupt_events")
    ).filter(~F.col("_corrupt")).drop("_corrupt")


def kafka_events(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: T.StructType,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka08Fetcher parity: subscribe → value bytes → JSON rows.

    Requires the spark-sql-kafka connector jar on the classpath
    (not bundled in this environment — the pipeline downstream of the
    source is identical for file/memory streams, which is what the
    tests exercise). The preflight check below turns the connector's
    absence into an actionable error instead of an AnalysisException
    deep inside source resolution.
    """
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as e:
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector on the "
            "classpath; launch with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "(offline environments must vendor the jar). COVERAGE.md "
            "§2.4 records this as an environment limit."
        ) from e
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return drop_and_count_corrupt(parse_json_events(raw, schema, "value"))


def windowed_metrics(
    events: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark: str,
    group_cols: list[str],
    metric_col: str,
    slide: str | None = None,
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation — the Spark
    superset of the reference's time handling (the reference has no
    windows/watermarks at all: time is an ordinary dim column,
    SURVEY.md §2.5). Late rows beyond the watermark are dropped and
    state is bounded — the property that keeps this runnable forever
    at 100 TB/day."""
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(metric_col).alias("sum_value"),
            F.min(metric_col).alias("min_value"),
            F.max(metric_col).alias("max_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *group_cols,
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )
