"""The streaming cleaning funnel: quality gate → in-batch canonical
dedup → cross-source decontamination (incremental census) → store
anti-join → snapshot append with per-epoch counters in manifest meta
(streaming/pipeline.py), plus the retroactive decontaminate_table
maintenance job."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from indexr_spark.sources.snapshots import read_snapshot
from indexr_spark.streaming.pipeline import (
    CANON_COL,
    census_dir_for,
    cleaning_pipeline_sink,
    decontaminate_table,
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
    # batch 1: one good doc with a word-order variant under ANOTHER
    # source (canonical dup in batch AND cross-source contamination —
    # the winner itself must be dropped, exactly like batch d30), and
    # one too-short doc (quality fail)
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
        # the GOOD hash is multi-source from the start: contaminated,
        # so even its dedup winner does not land
        assert sorted(r.doc_id for r in got1.collect()) == []
        assert CANON_COL in got1.columns  # hash persisted for later batches

        # batch 2: the same canonical text under yet another source
        # (census-contaminated) + a novel good doc
        _write_batch(src, "b.jsonl", [
            (10, GOOD, "s2"),
            (11, GOOD2, "s2"),
        ])
        q.processAllAvailable()
        assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [11]
    finally:
        q.stop()

    # the funnel is auditable from the table alone
    hist = {r.version: r for r in pipeline_history(spark, table).collect()}
    v1, v2 = sorted(hist)
    assert (
        hist[v1].n_total, hist[v1].n_quality, hist[v1].n_dedup,
        hist[v1].n_decontam, hist[v1].n_final,
    ) == (3, 2, 1, 0, 0)
    assert (
        hist[v2].n_total, hist[v2].n_quality, hist[v2].n_dedup,
        hist[v2].n_decontam, hist[v2].n_final,
    ) == (2, 2, 2, 1, 1)

    # the census recorded every (hash, source) pair, quality-failed
    # docs included (a low-quality copy still contaminates its hash)
    census = read_snapshot(spark, census_dir_for(table))
    # (hG,s0) (hG,s1) (hshort,s0) from batch 1; (hG,s2) (hG2,s2) from 2
    assert census.count() == 5

    # replayed epoch: counters and contents unchanged (exactly-once)
    sink = cleaning_pipeline_sink(table, app_id="p1")
    sink(
        spark.createDataFrame([(99, GOOD2, "s9")], SCHEMA),
        0,  # stale epoch
    )
    assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [11]


def test_cleaning_pipeline_matches_batch_funnel_semantics(spark, tmp_path):
    """Stream the sf0.001 documents through the pipeline in ONE batch:
    the survivors must be exactly d30's final set per source (same
    gates, same canonical dedup, same cross-source decontamination —
    no store, first epoch), pinning the streaming and batch
    implementations of the funnel to ONE semantics."""
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
    assert got.count() == sum(f.n_final for f in funnel.values())
    for s, f in funnel.items():
        assert per_source.get(s, 0) == f.n_final, s
    # and the epoch counters agree with d30's totals stage by stage
    hist = pipeline_history(spark, table).collect()[-1]
    assert hist.n_total == sum(f.n_total for f in funnel.values())
    assert hist.n_quality == sum(f.n_quality for f in funnel.values())
    assert hist.n_dedup == sum(f.n_dedup for f in funnel.values())
    assert hist.n_decontam == sum(f.n_final for f in funnel.values())


def test_decontaminate_table_retroactive(spark, tmp_path):
    """A doc admitted BEFORE its hash turned multi-source is the
    sink's blind spot by construction (a stream cannot see the
    future); decontaminate_table is the maintenance job that closes
    it from the census. Also pins the no-op contract: a clean table
    keeps its version."""
    from indexr_spark.sources.snapshots import latest_version

    table = str(tmp_path / "clean")
    sink = cleaning_pipeline_sink(table, app_id="r1")
    sink(spark.createDataFrame([(1, GOOD, "s0"), (2, GOOD2, "s0")], SCHEMA), 0)
    assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [1, 2]

    # nothing contaminated yet: no-op, version unchanged
    v_before = latest_version(table)
    assert decontaminate_table(spark, table) == v_before

    # the GOOD hash turns multi-source in a later epoch; the incoming
    # copy is refused at ingest, but doc 1 is already stored
    sink(
        spark.createDataFrame(
            [(10, " ".join(reversed(GOOD.split())), "s1")], SCHEMA
        ),
        1,
    )
    assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [1, 2]

    v = decontaminate_table(spark, table)
    assert v > v_before
    assert sorted(r.doc_id for r in read_snapshot(spark, table).collect()) == [2]
    # idempotent: a second run finds nothing left to drop
    assert decontaminate_table(spark, table) == v


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

    # the compacted + vacuumed store still rejects canonical dups
    # (doc 10's hash is now multi-source AND in-store) and admits
    # novel docs — and the epoch guard survived the maintenance
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


def test_compact_census_bounds_rows_and_preserves_decisions(spark, tmp_path):
    """The census accumulates per-batch-distinct (hash, source) pairs,
    so a source re-sending the same document every batch grows it
    without adding information. compact_census must (a) bound the row
    count to the distinct pair count, (b) change no decontamination
    decision (the census is consumed as a set), and (c) leave the
    exactly-once epoch guard intact across its commit."""
    from indexr_spark.sources.snapshots import max_committed_meta
    from indexr_spark.streaming.pipeline import compact_census

    table = str(tmp_path / "clean")
    cdir = census_dir_for(table)
    sink = cleaning_pipeline_sink(table, app_id="c1")
    # the same doc under the same source, re-sent three epochs in a
    # row (plus one novel doc so the table is non-trivial)
    sink(spark.createDataFrame([(1, GOOD, "s0"), (2, GOOD2, "s0")], SCHEMA), 0)
    sink(spark.createDataFrame([(1, GOOD, "s0")], SCHEMA), 1)
    sink(spark.createDataFrame([(1, GOOD, "s0")], SCHEMA), 2)

    census = read_snapshot(spark, cdir)
    assert census.count() > census.distinct().count()  # the growth
    guard_before = max_committed_meta(cdir, "epoch_c1")

    v = compact_census(spark, cdir)
    assert v > 0
    compacted = read_snapshot(spark, cdir)
    assert compacted.count() == compacted.distinct().count()
    assert (
        sorted(map(tuple, compacted.collect()))
        == sorted(map(tuple, census.distinct().collect()))
    )

    # (c) the epoch guard survives: the max committed epoch is
    # unchanged and a replayed epoch is still refused by the sink
    assert max_committed_meta(cdir, "epoch_c1") == guard_before
    n_before = read_snapshot(spark, table).count()
    sink(spark.createDataFrame([(99, GOOD, "s0")], SCHEMA), 2)  # replay
    assert read_snapshot(spark, table).count() == n_before

    # (b) decisions preserved: GOOD turns multi-source AFTER
    # compaction exactly as it would have before — the incoming copy
    # is refused and the retroactive job still drops the stored one
    sink(
        spark.createDataFrame(
            [(10, " ".join(reversed(GOOD.split())), "s1")], SCHEMA
        ),
        3,
    )
    stored = sorted(r.doc_id for r in read_snapshot(spark, table).collect())
    assert stored == [1, 2]
    decontaminate_table(spark, table)
    stored = sorted(r.doc_id for r in read_snapshot(spark, table).collect())
    assert stored == [2]


def test_multi_epoch_soak_converges_to_one_batch_result(spark, tmp_path):
    """Epoch partitioning must be invisible: streaming the sf0.001
    corpus in 5 doc_id-ordered epochs — with every maintenance job
    interleaved mid-run (census compaction, OPTIMIZE-style segment
    compaction, vacuum, a mid-run retroactive decontamination) — must
    converge, after the final decontaminate_table, to EXACTLY the
    table the one-batch run produces (doc_id-level: with ordered
    epochs the first-wins dedup representative is the global one).
    This is the production ingestion story end-to-end: a pipeline
    operator can run the maintenance suite at any cadence without
    changing what the table converges to."""
    from indexr_spark.sources.snapshots import vacuum
    from indexr_spark.sources.tools import optimize_segments
    from indexr_spark.streaming.pipeline import compact_census
    from indexr_spark.tables import load_table
    from tests.conftest import SMOKE_SF

    docs = (
        load_table(spark, SMOKE_SF, "documents")
        .select("doc_id", "text", "source")
    )

    # reference: the whole corpus in one batch (semantics already
    # pinned to d30 by test_cleaning_pipeline_matches_batch_funnel_semantics)
    ref_table = str(tmp_path / "ref")
    cleaning_pipeline_sink(ref_table, app_id="soak-ref")(docs, 0)
    ref = sorted(r.doc_id for r in read_snapshot(spark, ref_table).collect())
    assert ref, "reference run admitted nothing — the gates are broken"

    # soak: 5 doc_id-range epochs with maintenance interleaved
    table = str(tmp_path / "soak")
    cdir = census_dir_for(table)
    sink = cleaning_pipeline_sink(table, app_id="soak")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    bounds = [ids[len(ids) * i // 5] for i in range(1, 5)] + [ids[-1] + 1]
    lo = min(ids)
    for epoch, hi in enumerate(bounds):
        sink(docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), epoch)
        lo = hi
        if epoch == 1:
            assert compact_census(spark, cdir) > 0
        if epoch == 2:
            decontaminate_table(spark, table)  # mid-run retro pass
            files_before, files_after = optimize_segments(spark, table)
            assert files_after <= files_before
            vacuum(table, keep_versions=1, min_age_s=0)

    decontaminate_table(spark, table)
    got = sorted(r.doc_id for r in read_snapshot(spark, table).collect())
    assert got == ref

    # the census converged too: same distinct (hash, source) pairs
    ref_census = read_snapshot(spark, census_dir_for(ref_table))
    soak_census = read_snapshot(spark, cdir)
    assert (
        sorted(map(tuple, soak_census.select(CANON_COL, "source").distinct().collect()))
        == sorted(map(tuple, ref_census.select(CANON_COL, "source").distinct().collect()))
    )

    # bounded-census claim end-to-end (r9): compaction at the cycle's
    # close leaves row count == distinct pair count — the census is
    # size-bounded by content, not by how many epochs re-sent a doc —
    # and a second pass is a no-op rewrite (already-distinct input)
    compact_census(spark, cdir)
    final = read_snapshot(spark, cdir)
    n_rows = final.count()
    assert n_rows == final.distinct().count()
    assert n_rows == soak_census.select(CANON_COL, "source").distinct().count()
