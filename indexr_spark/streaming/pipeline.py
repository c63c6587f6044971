"""The d30 cleaning funnel as a STREAMING ingestion pipeline — the
end-to-end training-data story in one exactly-once job: documents
arrive as a stream, each micro-batch runs quality gate → within-batch
canonical dedup → anti-join against the accumulated cleaned corpus,
and the survivors append to a snapshot table whose manifest meta
carries the per-epoch funnel counters. The output table IS the
pipeline state (d28/dedup_store_sink's posture): restarts, vacuums
and compactions cannot lose or double-count anything the manifests
don't.

Observability is structural, not logged: every epoch's counters
(n_total / n_quality / n_dedup / n_final) ride the commit itself, so
`pipeline_history` reconstructs the funnel over time from the table
alone — a silently over-aggressive gate shows up in the history, not
in a mysteriously small corpus.

Scale: one canonical-hash shuffle per batch (d30's fused topology) +
the store anti-join keyed on the same hash; the store side is the
cleaned corpus projected to ONE hash column (bucketed at 100 TB →
shuffle-free). Counters come from the same single classification
pass (one aggregation, one driver row).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indexr_spark.functions.text import distinct_tokens, tokens
from indexr_spark.operators.text import (
    FUNNEL_MAX_TOKENS,
    FUNNEL_MIN_TOKENS,
    FUNNEL_MIN_TTR,
    _canon_key,
)

CANON_COL = "_canon_h"  # persisted with each doc: the store-side join key


def cleaning_pipeline_sink(
    table_dir: str,
    app_id: str | None = None,
    min_tokens: int = FUNNEL_MIN_TOKENS,
    max_tokens: int = FUNNEL_MAX_TOKENS,
    min_ttr: float = FUNNEL_MIN_TTR,
):
    """foreachBatch sink: batches need (doc_id, text) plus any
    passthrough columns; survivors land with their canonical hash as
    `_canon_h` so later batches anti-join the store WITHOUT
    re-tokenizing the accumulated corpus (the hash is computed once,
    at ingest). Exactly-once via the epoch-meta guard (see
    streaming/ingest.snapshot_sink for the app_id contract)."""
    from indexr_spark.sources.snapshots import (
        append_snapshot,
        latest_version,
        max_committed_meta,
        read_snapshot,
    )

    epoch_key = f"epoch_{app_id}" if app_id else "epoch"

    def sink(batch: DataFrame, epoch_id: int) -> None:
        committed = max_committed_meta(table_dir, epoch_key)
        if committed is not None and epoch_id <= committed:
            logging.getLogger(__name__).warning(
                "cleaning_pipeline_sink %s: skipping epoch %d (<= "
                "committed max %d for %r)",
                table_dir,
                epoch_id,
                committed,
                epoch_key,
            )
            return
        from pyspark.sql import Window as W

        # the classification pass owns these names — a passthrough
        # column colliding with one would be silently overwritten and
        # then dropped from the output (refuse loudly instead)
        reserved = {"_n_toks", "_quality", "_dedup", "_in_store", "_final", CANON_COL}
        clash = reserved & set(batch.columns)
        if clash:
            raise ValueError(
                f"cleaning_pipeline_sink: batch columns {sorted(clash)} "
                "collide with the sink's reserved internal names — "
                "rename them upstream"
            )
        toks = tokens("text")
        dts = distinct_tokens("text")
        base = batch.withColumn("_n_toks", F.size(toks)).withColumn(
            CANON_COL, _canon_key(dts)
        )
        quality = (
            F.col("_n_toks").between(min_tokens, max_tokens)
            & (F.size(dts).cast("double") / F.col("_n_toks") >= F.lit(min_ttr))
        )
        base = base.withColumn("_quality", quality)
        w = W.partitionBy(CANON_COL)
        first_q = F.min(F.when(F.col("_quality"), F.col("doc_id"))).over(w)
        base = base.withColumn(
            "_dedup", F.col("_quality") & (F.col("doc_id") == first_q)
        )
        if latest_version(table_dir) > 0:
            store = read_snapshot(batch.sparkSession, table_dir).select(
                F.col(CANON_COL), F.lit(True).alias("_in_store")
            ).distinct()
            base = base.join(store, CANON_COL, "left")
        else:
            base = base.withColumn("_in_store", F.lit(None).cast("boolean"))
        base = base.withColumn(
            "_final", F.col("_dedup") & F.col("_in_store").isNull()
        )
        # one classification pass feeds BOTH the counters and the
        # output rows; localCheckpoint so the two consumers don't
        # recompute the store join
        base = base.localCheckpoint()
        c = base.agg(
            F.count("*").alias("n_total"),
            F.sum(F.col("_quality").cast("int")).alias("n_quality"),
            F.sum(F.col("_dedup").cast("int")).alias("n_dedup"),
            F.sum(F.col("_final").cast("int")).alias("n_final"),
        ).collect()[0]
        out = base.filter(F.col("_final")).drop(
            "_n_toks", "_quality", "_dedup", "_in_store", "_final"
        )
        append_snapshot(
            out,
            table_dir,
            meta={
                epoch_key: epoch_id,
                "funnel_total": int(c["n_total"]),
                "funnel_quality": int(c["n_quality"] or 0),
                "funnel_dedup": int(c["n_dedup"] or 0),
                "funnel_final": int(c["n_final"] or 0),
            },
        )

    return sink


def pipeline_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """Per-version funnel counters reconstructed from the manifests —
    (version, n_total, n_quality, n_dedup, n_final). Versions without
    counters (non-pipeline commits: compactions, manual appends) show
    NULLs; vacuumed versions age out of the audit window with their
    manifests, exactly like time travel."""
    from indexr_spark.sources.snapshots import _load_manifest, _manifest_versions

    rows = []
    for v in _manifest_versions(table_dir):
        m = _load_manifest(table_dir, v)
        rows.append(
            (
                v,
                m.get("funnel_total"),
                m.get("funnel_quality"),
                m.get("funnel_dedup"),
                m.get("funnel_final"),
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, n_total int, n_quality int, n_dedup int, n_final int",
    )
