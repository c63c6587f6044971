"""JSON event parsing + watermarked window aggregation tests."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from indexr_spark.streaming.sources import (
    drop_and_count_corrupt,
    parse_json_events,
    windowed_metrics,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_parse_json_counts_malformed(spark):
    raw = spark.createDataFrame(
        [
            ('{"ts": "2024-01-01 00:00:05", "k": "a", "v": 1.0}',),
            ("NOT JSON {",),
            ('{"ts": "2024-01-01 00:00:06", "k": "b", "v": 2.0}',),
            ('{"ts": "bogus-ts", "k": "c", "v": 3.0}',),
        ],
        "value string",
    )
    parsed = parse_json_events(raw, SCHEMA)
    rows = parsed.collect()
    assert [r._corrupt for r in rows] == [False, True, False, True]

    clean = drop_and_count_corrupt(parsed)
    assert clean.count() == 2
    assert "_corrupt" not in clean.columns


def test_streaming_dedup(spark, tmp_path):
    """Streaming exact dedup (dropDuplicates on a key) — the stream
    form of d05; duplicates across micro-batches are suppressed by
    keyed state."""
    src = str(tmp_path / "dup_in")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        for ts, k, v in [
            ("2024-01-01 00:00:01", "a", 1.0),
            ("2024-01-01 00:00:02", "a", 1.0),  # dup key in same batch
            ("2024-01-01 00:00:03", "b", 2.0),
        ]:
            f.write(json.dumps({"ts": ts, "k": k, "v": v}) + "\n")

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        stream.dropDuplicates(["k"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # second batch: all duplicates of already-seen keys
        with open(os.path.join(src, "b.jsonl"), "w") as f:
            f.write(json.dumps({"ts": "2024-01-01 00:00:09", "k": "a", "v": 9.0}) + "\n")
        q.processAllAvailable()
        ks = sorted(r.k for r in spark.sql("SELECT k FROM dedup_out").collect())
    finally:
        q.stop()
    assert ks == ["a", "b"]


def test_windowed_metrics_streaming(spark, tmp_path):
    """Drive a watermarked 10-minute tumbling window over a file
    stream to completion (guide pattern: memory sink +
    processAllAvailable)."""
    src = str(tmp_path / "in")
    os.makedirs(src)
    events = [
        ("2024-01-01 00:01:00", "a", 1.0),
        ("2024-01-01 00:05:00", "a", 2.0),
        ("2024-01-01 00:11:00", "a", 4.0),
        ("2024-01-01 00:03:00", "b", 8.0),
    ]
    with open(os.path.join(src, "e.jsonl"), "w") as f:
        for ts, k, v in events:
            f.write(json.dumps({"ts": ts, "k": k, "v": v}) + "\n")

    stream = spark.readStream.schema(SCHEMA).json(src)
    agg = windowed_metrics(
        stream, "ts", "10 minutes", "5 minutes", ["k"], "v"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.k): (r.n, r.sum_value)
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()
    assert got[("2024-01-01 00:00:00", "a")] == (2, 3.0)
    assert got[("2024-01-01 00:10:00", "a")] == (1, 4.0)
    assert got[("2024-01-01 00:00:00", "b")] == (1, 8.0)
