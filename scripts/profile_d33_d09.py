#!/usr/bin/env python
"""Stage-level decomposition of d33 and d09 at sf0.1 (r13 measurement).

Each stage is timed with a noop-style count over just that subtree,
bracketed by the multicore cal so a throttle phase is visible.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from indexr_spark.operators import text as T  # noqa: E402
from indexr_spark.session import get_spark  # noqa: E402
from indexr_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(
        app_name="profile-d33-d09",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    out = {}

    def t(label, fn):
        t0 = time.time()
        r = fn()
        out[label] = round(time.time() - t0, 3)
        print(label, out[label], flush=True)
        return r

    out["cal0"] = bench._spark_calibration(spark)

    # ---- d33 ----
    d = load_table(spark, SF, "documents")
    store = t(
        "d33_store_sigs_ckpt",
        lambda: T.doc_band_sigs(d.filter(F.length("source") == 4)).localCheckpoint(),
    )
    batch = t(
        "d33_batch_sigs_ckpt",
        lambda: T.doc_band_sigs(d.filter(F.length("source") == 5)).localCheckpoint(),
    )
    cand = (
        batch.select("band", "sig", "doc_id")
        .join(
            store.select("band", "sig", F.col("doc_id").alias("store_id")),
            ["band", "sig"],
        )
        .select("doc_id", "store_id")
    )
    t("d33_cand_raw_count", cand.count)
    ded = cand.dropDuplicates(["doc_id", "store_id"])
    t("d33_cand_dedup_count", ded.count)
    t(
        "d33_full",
        lambda: T.neardup_against_store(batch, store, est_threshold=T.D33_EST_THRESHOLD)
        .orderBy("doc_id", "store_id")
        .count(),
    )
    out["cal1"] = bench._spark_calibration(spark)

    # ---- d09 ----
    from indexr_spark.functions.text import tokens, shingles, hash32
    from indexr_spark.tables import spread_scan

    dd = spread_scan(load_table(spark, SF, "documents"))
    shs = dd.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.array_distinct(
            F.transform(shingles(F.col("toks"), T.JACCARD_NGRAM), lambda s: hash32(s))
        ).alias("shs"),
    )
    t("d09_shs_ckpt", shs.localCheckpoint)
    cand9 = T._lsh_doc_pairs(spark, SF, T.JACCARD_BANDS, max_bucket=T._lsh_max_bucket())
    t("d09_cand_count", cand9.count)
    t(
        "d09_full",
        lambda: T.jaccard_pairs(
            spark, SF, bands=T.JACCARD_BANDS,
            threshold=T.JACCARD_THRESHOLD, max_bucket=T._lsh_max_bucket(),
        ).count(),
    )
    out["cal2"] = bench._spark_calibration(spark)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
