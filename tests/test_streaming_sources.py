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


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for user, ts, v in rows:
            f.write(json.dumps({"user_id": user, "ts": ts, "value": v}) + "\n")


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: an in-batch gap closes a
    session immediately; the trailing open session closes via
    event-time timeout once the watermark passes last + gap."""
    from indexr_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "sess_in")
    os.makedirs(src)
    # user 1: two events 5 min apart (one session), then a 2h gap
    # (in-batch close) and one more event; user 2: a single event.
    _write_jsonl(
        os.path.join(src, "a.jsonl"),
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:05:00", 2.0),
            (1, "2024-01-01 02:00:00", 4.0),
            (2, "2024-01-01 00:00:00", 8.0),
        ],
    )
    stream = spark.readStream.schema(SESSION_SCHEMA).json(src)
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r.user_id, str(r.session_start), r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
        # the 2h in-batch gap closed user 1's first session
        assert (1, "2024-01-01 00:00:00", 2, 3.0) in got1

        # far-future events advance the watermark past every open
        # session's timeout → state-timeout emissions
        _write_jsonl(
            os.path.join(src, "b.jsonl"), [(3, "2024-01-01 09:00:00", 0.5)]
        )
        q.processAllAvailable()
        got2 = {
            (r.user_id, str(r.session_start), r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
    finally:
        q.stop()
    assert (1, "2024-01-01 02:00:00", 1, 4.0) in got2
    assert (2, "2024-01-01 00:00:00", 1, 8.0) in got2


def test_session_window_builtin(spark, tmp_path):
    """Built-in F.session_window path produces the same three closed
    sessions for the same inputs."""
    from indexr_spark.streaming.stateful import session_window_metrics

    src = str(tmp_path / "sw_in")
    os.makedirs(src)
    _write_jsonl(
        os.path.join(src, "a.jsonl"),
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:05:00", 2.0),
            (1, "2024-01-01 02:00:00", 4.0),
            (2, "2024-01-01 00:00:00", 8.0),
        ],
    )
    stream = spark.readStream.schema(SESSION_SCHEMA).json(src)
    q = (
        session_window_metrics(stream, gap="30 minutes", watermark="1 minute")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sw_out")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_jsonl(
            os.path.join(src, "b.jsonl"), [(3, "2024-01-01 09:00:00", 0.5)]
        )
        q.processAllAvailable()
        got = {
            (r.user_id, str(r.session_start), r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM sw_out").collect()
        }
    finally:
        q.stop()
    assert (1, "2024-01-01 00:00:00", 2, 3.0) in got
    assert (1, "2024-01-01 02:00:00", 1, 4.0) in got
    assert (2, "2024-01-01 00:00:00", 1, 8.0) in got


def test_stream_static_enrichment(spark, tmp_path):
    """Stream-static join: each micro-batch broadcast-joins the static
    dimension (the streaming counterpart of q06 — the reference
    delegates ALL joins to host engines; Structured Streaming gets
    them per-batch for free). The static side is re-read per batch, so
    dimension updates between batches are picked up."""
    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k string, k_name string"
    )
    src = str(tmp_path / "enrich_in")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        for ts, k, v in [
            ("2024-01-01 00:00:01", "a", 1.0),
            ("2024-01-01 00:00:02", "b", 2.0),
            ("2024-01-01 00:00:03", "zz", 3.0),  # no dim row → dropped by inner join
        ]:
            f.write(json.dumps({"ts": ts, "k": k, "v": v}) + "\n")

    stream = spark.readStream.schema(SCHEMA).json(src)
    enriched = stream.join(F.broadcast(dim), "k")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.k, r.k_name, r.v)
            for r in spark.sql("SELECT k, k_name, v FROM enriched_out").collect()
        }
    finally:
        q.stop()
    assert got == {("a", "alpha", 1.0), ("b", "beta", 2.0)}


def test_kafka_missing_connector_error(spark):
    """The Kafka source preflights the connector classpath and raises
    an actionable error in this jar-less environment (COVERAGE.md §2.4
    records the limit; downstream transforms are file-stream-tested)."""
    import pytest
    from pyspark.sql import types as T

    from indexr_spark.streaming.sources import kafka_events

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_events(
            spark, "localhost:9092", "t",
            T.StructType([T.StructField("k", T.LongType())]),
        )


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-range
    condition (impressions ⋈ clicks within 10 minutes) — the Spark
    superset of the reference's streaming model (§2.5: it has no
    joins at all). Both sides carry watermarks so join state is
    bounded — the property that keeps this runnable forever."""
    imp_src = str(tmp_path / "imp")
    clk_src = str(tmp_path / "clk")
    os.makedirs(imp_src)
    os.makedirs(clk_src)
    with open(os.path.join(imp_src, "a.jsonl"), "w") as f:
        for ts, k in [("2024-01-01 00:01:00", "ad1"), ("2024-01-01 00:02:00", "ad2")]:
            f.write(json.dumps({"ts": ts, "k": k, "v": 1.0}) + "\n")
    with open(os.path.join(clk_src, "a.jsonl"), "w") as f:
        for ts, k in [
            ("2024-01-01 00:05:00", "ad1"),   # within 10 min of ad1 imp
            ("2024-01-01 00:55:00", "ad2"),   # too late for ad2 imp
        ]:
            f.write(json.dumps({"ts": ts, "k": k, "v": 1.0}) + "\n")

    imps = (
        spark.readStream.schema(SCHEMA).json(imp_src)
        .select(F.col("k"), F.col("ts").alias("imp_ts"))
        .withWatermark("imp_ts", "30 minutes")
    )
    clks = (
        spark.readStream.schema(SCHEMA).json(clk_src)
        .select(F.col("k"), F.col("ts").alias("clk_ts"))
        .withWatermark("clk_ts", "30 minutes")
    )
    joined = imps.join(
        clks,
        (imps.k == clks.k)
        & (clks.clk_ts >= imps.imp_ts)
        & (clks.clk_ts <= imps.imp_ts + F.expr("INTERVAL 10 MINUTES")),
    ).select(imps.k, "imp_ts", "clk_ts")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT k FROM ssj_out").collect()
    finally:
        q.stop()
    assert [r.k for r in rows] == ["ad1"]  # ad2's click fell outside the range
