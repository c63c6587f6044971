#!/usr/bin/env python
"""Measure the round-6 HEADLINE additions calm and merge ONLY their
entries into bench_baseline.json (existing entries untouched — they
were captured calm earlier in round 6; a full recapture would risk
re-contaminating them if the machine phase shifts mid-run).

Refuses to merge unless the capture is genuinely calm: single-thread
spin ≤ 0.9 s and spark_cal within 1.45× of the committed baseline's
2.189 — i.e. inside the 2.2–3.2 calm band the r5 verdict's own
independent reproductions used (the multi-core cal flickers ±30%
even in calm phases; the spin guard catches the single-thread
throttle that actually contaminated the r5 baseline). Run:

    python scripts/merge_new_baseline_entries.py        # dry run
    python scripts/merge_new_baseline_entries.py --write
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

NEW_OPS = [
    "d27_unigram_logprob",
    "d28_incremental_dedup",
    "d29_entropy_profile",
    "d30_pipeline_funnel",
    "s12_kmeans_step",
]


def _spin() -> float:
    t0 = time.time()
    x = 0
    while x < 20_000_000:
        x += 1
    return time.time() - t0


def main() -> None:
    write = "--write" in sys.argv
    base_path = _REPO / "bench_baseline.json"
    base = json.loads(base_path.read_text())

    spin = _spin()
    if spin > 0.9:
        sys.exit(f"not calm: spin {spin:.2f}s > 0.9s — try again later")

    from bench import _spark_calibration  # reuse bench.py's exact cal job
    from indexr_spark import operators
    from indexr_spark.session import get_spark

    spark = get_spark(
        app_name="baseline-merge",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    sf = str(_REPO.parent / "testdata" / "sf0.1")
    # warm each query's code path once (JIT), then best-of-3
    for name in NEW_OPS:
        operators.QUERIES[name](spark, sf).count()
    # the multi-core cal flickers within a phase — best-of-3 with
    # breathing room, and retry the whole calm check for up to ~8
    # minutes before giving up (phases turn over on minute scales)
    deadline = time.time() + 480
    while True:
        cal = min(_spark_calibration(spark) for _ in range(3))
        ratio = cal / base["spark_cal_sec"]
        if (1 / 1.45) <= ratio <= 1.45 and _spin() <= 0.9:
            break
        if time.time() > deadline:
            sys.exit(
                f"not calm: spark_cal {cal:.3f} vs baseline "
                f"{base['spark_cal_sec']:.3f} (ratio {ratio:.2f} outside 1.45x)"
            )
        print(f"waiting for calm (cal {cal:.3f})...", flush=True)
        time.sleep(30)

    merged = {}
    for name in NEW_OPS:
        best = min(
            _timed(operators.QUERIES[name], spark, sf) for _ in range(3)
        )
        merged[name] = round(best, 3)
        print(f"{name}: {merged[name]} s (spin {_spin():.2f})", flush=True)

    print(f"capture spark_cal {cal:.3f} (baseline {base['spark_cal_sec']:.3f})")
    if write:
        base["queries"].update(merged)
        base["value"] = round(sum(base["queries"].values()), 3)
        base.setdefault("notes", {})["r6_additions"] = (
            "entries for the five r6 HEADLINE additions merged from a "
            f"dedicated calm capture (spark_cal {cal:.3f}, spin<=0.9 and "
            "the 2.2-3.2 cal band enforced, best-of-3 per query, warmed); "
            "pre-existing entries untouched"
        )
        base_path.write_text(json.dumps(base, indent=1) + "\n")
        print(f"wrote {base_path}")
    else:
        print("dry run — pass --write to merge")
    spark.stop()


def _timed(fn, spark, sf) -> float:
    t0 = time.time()
    fn(spark, sf).count()
    return time.time() - t0


if __name__ == "__main__":
    main()
