"""Dedicated best-of-3 capture for the vector family (s02/s04/s06) at
sf0.1 — the r6-verdict item 4 protocol (the same one that closed d12's
phase question in r6): a single capture is only meaningful at a
spark_cal matching the baseline's 2.189 s, so run this until the
calibration comes back calm, then record the row in COVERAGE.md.

Usage: python scripts/vec_family_recheck.py
Prints one JSON line; compare queries[*].best against
bench_baseline.json (s02 0.832, s04 0.653, s06 1.454) at the printed
spark_cal_sec."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from indexr_spark import operators  # noqa: E402
from indexr_spark.session import get_spark  # noqa: E402

QUERIES = ("s02_embedding_pairs", "s04_ann_lsh_topk", "s06_ivf_topk")


def main() -> None:
    load_before = bench._loadavg()
    spin = bench._cpu_calibration()
    spark = get_spark(
        app_name="vec-family-recheck",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    cal = bench._spark_calibration(spark)
    out = {
        "spark_cal_sec": cal,
        "cpu_spin_sec": spin,
        "loadavg_before": load_before,
        "queries": {},
    }
    for name in QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.time()
            operators.QUERIES[name](spark, "/root/testdata/sf0.1").count()
            runs.append(round(time.time() - t0, 3))
        out["queries"][name] = {"best": min(runs), "runs": runs}
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
