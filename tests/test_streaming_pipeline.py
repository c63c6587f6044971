"""The streaming cleaning funnel: quality gate → in-batch canonical
dedup → store anti-join → snapshot append with per-epoch counters in
manifest meta (streaming/pipeline.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from indexr_spark.sources.snapshots import read_snapshot
from indexr_spark.streaming.pipeline import (
    CANON_COL,
    cleaning_pipeline_sink,
    pipeline_history,
)

SCHEMA = "doc_id LONG, text STRING, source STRING"

GOOD = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
       "lam mu nu xi omicron"  # 15 tokens, all distinct — passes the gate
GOOD2 = "one two three four five six seven eight nine ten eleven " \
        "twelve thirteen fourteen fifteen sixteen"


def _write_batch(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for doc_id, text, source in rows:
            f.write(
                json.dumps({"doc_id": doc_id, "text": text, "source": source})
                + "\n"
            )


def test_cleaning_pipeline_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    table = str(tmp_path / "clean")
    os.makedirs(src)
    # batch 1: one good doc, one word-order variant (canonical dup in
    # batch), one too-short (quality fail)
    _write_batch(src, "a.jsonl", [
        (1, GOOD, "s0"),
        (2, " ".join(reversed(GOOD.split())), "s1"),  # same token set
        (3, "too short", "s0"),
    ])

    stream = spark.readStream.schema(SCHEMA).json(src)
    q = (
        stream.writeStream.foreachBatch(
            cleaning_pipeline_sink(table, app_id="p1")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = read_snapshot(spark, table)
        assert sorted(r.doc_id for r in got1.collect()) == [1]
        assert CANON_COL in got1.columns  # hash persisted for later batches

        # batch 2: a cross-batch canonical dup of doc 1 + a novel good doc
        _write_batch(src, "b.jsonl", [
            (10, GOOD, "s2"),
            (11, GOOD2, "s2"),
        ])
        q.processAllAvailable()
        assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [1, 11]
    finally:
        q.stop()

    # the funnel is auditable from the table alone
    hist = {r.version: r for r in pipeline_history(spark, table).collect()}
    v1, v2 = sorted(hist)
    assert (hist[v1].n_total, hist[v1].n_quality, hist[v1].n_dedup, hist[v1].n_final) == (3, 2, 1, 1)
    assert (hist[v2].n_total, hist[v2].n_quality, hist[v2].n_dedup, hist[v2].n_final) == (2, 2, 2, 1)

    # replayed epoch: counters and contents unchanged (exactly-once)
    sink = cleaning_pipeline_sink(table, app_id="p1")
    sink(
        spark.createDataFrame([(99, GOOD2, "s9")], SCHEMA),
        0,  # stale epoch
    )
    assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [1, 11]


def test_cleaning_pipeline_matches_batch_funnel_semantics(spark, tmp_path):
    """Stream the sf0.001 documents through the pipeline in ONE batch:
    the survivors must be exactly d30's final set (same gates, same
    canonical dedup, no store — first epoch), pinning the streaming
    and batch implementations of the funnel to one semantics."""
    from indexr_spark import operators
    from indexr_spark.tables import load_table
    from tests.conftest import SMOKE_SF

    table = str(tmp_path / "clean")
    docs = load_table(spark, SMOKE_SF, "documents")
    sink = cleaning_pipeline_sink(table, app_id="b1")
    sink(docs.select("doc_id", "text", "source"), 0)

    got = read_snapshot(spark, table)
    funnel = {
        r.source: r for r in
        operators.QUERIES["d30_pipeline_funnel"](spark, SMOKE_SF).collect()
    }
    per_source = {
        r.source: r.n for r in
        got.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # d30's n_final additionally drops cross-SOURCE dups; the stream's
    # first-wins keeps one doc per canonical hash regardless of source,
    # so the stream's per-source totals must be >= d30's n_final and
    # its global total must equal d30's n_dedup total (one survivor
    # per quality-passing canonical hash)
    assert got.count() == sum(f.n_dedup for f in funnel.values())
    for s, f in funnel.items():
        assert per_source.get(s, 0) >= f.n_final


def test_pipeline_table_survives_maintenance(spark, tmp_path):
    """Lifecycle: a sink-built table goes through OPTIMIZE-style
    compaction and vacuum, and the pipeline keeps deduping correctly
    against the rewritten store — the maintenance path and the
    streaming path compose. The compaction's version shows NULL
    funnel counters in pipeline_history (it is not a pipeline epoch)."""
    from indexr_spark.sources.snapshots import latest_version, vacuum
    from indexr_spark.sources.tools import optimize_segments

    table = str(tmp_path / "clean")
    sink = cleaning_pipeline_sink(table, app_id="m1")
    sink(spark.createDataFrame([(1, GOOD, "s0")], SCHEMA), 0)
    sink(spark.createDataFrame([(2, GOOD2, "s0")], SCHEMA), 1)
    assert read_snapshot(spark, table).count() == 2

    files_before, files_after = optimize_segments(spark, table)
    assert files_after <= files_before
    vacuum(table, keep_versions=1, min_age_s=0)

    # the compacted + vacuumed store still rejects canonical dups and
    # admits novel docs — and the epoch guard survived the maintenance
    # (vacuum folds retired epochs into the meta watermark)
    sink(
        spark.createDataFrame(
            [(10, " ".join(reversed(GOOD.split())), "s9"),
             (11, GOOD2 + " seventeen", "s9")],
            SCHEMA,
        ),
        2,
    )
    got = sorted(r.doc_id for r in read_snapshot(spark, table).collect())
    assert got == [1, 2, 11]

    # replay of a pre-compaction epoch stays a no-op after vacuum
    sink(spark.createDataFrame([(99, GOOD, "s9")], SCHEMA), 1)
    assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [1, 2, 11]

    hist = {r.version: r for r in pipeline_history(spark, table).collect()}
    compaction_versions = [v for v, r in hist.items() if r.n_total is None]
    assert compaction_versions, "compaction version should carry NULL counters"
    assert latest_version(table) in hist
