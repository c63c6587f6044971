"""Dedicated best-of-3 capture for the r7 small-query drift cluster —
the r7-verdict item 3 obligation (third application of the d12 /
vec-family protocol): BENCH_r07 was captured at loadavg ~4.2 /
machine_factor 1.113 and 13 sub-0.5 s queries drifted 1.2-1.7x raw,
all in the phase-noise signature (big queries flat, small queries
uniformly up). This script re-measures exactly those 13 on a CALM
machine at a spark_cal comparable to the baseline's 2.189 s; if any
row is still high after that, it is real and gets bisected — and no
baseline entry may be refreshed from a non-calm run.

Usage: check /proc/loadavg is quiet, then
    python scripts/small_query_recheck.py
Prints one JSON line; compare queries[*].best against
bench_baseline.json at the printed spark_cal_sec."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from indexr_spark import operators  # noqa: E402
from indexr_spark.session import get_spark  # noqa: E402

# the 13 drifted rows from BENCH_r07 vs bench_baseline.json (VERDICT
# r7 "What's wrong" item 3), with their baseline entries
QUERIES = (
    "q46_scalar_subquery",
    "d15_contamination",
    "d14_normalize_text",
    "q36_latest_per_user",
    "d17_doc_chunking",
    "d18_sequence_packing",
    "s09_quantize_int8",
    "d22_bigram_counts",
    "s11_neardup_numpy",
    "d21_tfidf_topterms",
    "d19_source_mixture",
    "d03_quality_score",
    "mm01_decode_metadata",
)

SF = "/root/testdata/sf0.1"


def main() -> None:
    load_before = bench._loadavg()
    spin = bench._cpu_calibration()
    spark = get_spark(
        app_name="small-query-recheck",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    # warm every table + the Arrow path once (these are sub-second
    # queries — the first run would otherwise measure scan planning)
    for t in ("documents", "embeddings", "lineitem", "orders", "events"):
        spark.read.parquet(f"{SF}/{t}.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    cal = bench._spark_calibration(spark)
    repo = Path(__file__).resolve().parent.parent
    base_doc = json.loads((repo / "bench_baseline.json").read_text())
    base = base_doc.get("queries", {})
    out = {
        "spark_cal_sec": cal,
        "cpu_spin_sec": spin,
        "loadavg_before": load_before,
        "baseline_spark_cal_sec": base_doc.get("spark_cal_sec"),
        "queries": {},
    }
    base_cal = base_doc.get("spark_cal_sec") or 2.189
    out["calm"] = cal <= 1.45 * base_cal  # the merge-guard threshold
    if not out["calm"]:
        print(json.dumps({"NOT_CALM": True, "spark_cal_sec": cal,
                          "baseline_spark_cal_sec": base_cal}))
    for name in QUERIES:
        runs = []
        for _ in range(3):
            t0 = time.time()
            operators.QUERIES[name](spark, SF).count()
            runs.append(round(time.time() - t0, 3))
        b = base.get(name)
        out["queries"][name] = {
            "best": min(runs),
            "runs": runs,
            "baseline": b,
            "ratio_raw": round(min(runs) / b, 2) if b else None,
        }
        spark.catalog.clearCache()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
