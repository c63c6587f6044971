#!/usr/bin/env python
"""Measure HEADLINE queries that have no bench_baseline.json entry yet
and ADD their entries (never overwrites an existing entry — the
baseline's sub-second values follow a max-not-min policy that a
mechanical re-run must not clobber; delete an entry by hand first to
intentionally re-capture it).

Refuses to merge unless the capture is calm: single-thread spin
≤ 0.9 s and spark_cal within 1.45× of the committed baseline's (the
multi-core cal flickers ±30% even in calm phases; the spin guard
catches the single-thread throttle that actually contaminated the r5
baseline). Run:

    python scripts/merge_new_baseline_entries.py        # dry run
    python scripts/merge_new_baseline_entries.py --write
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


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

    from bench import HEADLINE, _spark_calibration
    from indexr_spark import operators
    from indexr_spark.session import get_spark

    # add-only: entries the gate currently skips for lack of a baseline
    missing = [n for n in HEADLINE if n not in base["queries"]]
    if not missing:
        sys.exit("every HEADLINE query already has a baseline entry — "
                 "delete one by hand to intentionally re-capture it")
    print(f"missing baseline entries: {missing}", flush=True)

    spin = _spin()
    if spin > 0.9:
        sys.exit(f"not calm: spin {spin:.2f}s > 0.9s — try again later")

    spark = get_spark(
        app_name="baseline-merge",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    # same corpus the gate's captures use (bench.py honors this too)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm each query's code path once (JIT), then best-of-3
    for name in missing:
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
    for name in missing:
        best = min(
            _timed(operators.QUERIES[name], spark, sf) for _ in range(3)
        )
        merged[name] = round(best, 3)
        print(f"{name}: {merged[name]} s (spin {_spin():.2f})", flush=True)

    # the phase can flip MID-capture (the exact contamination the
    # guards exist for) — re-verify calm AFTER the measurements and
    # refuse to write values captured across a flip
    post_spin = _spin()
    post_cal = min(_spark_calibration(spark) for _ in range(2))
    post_ratio = post_cal / base["spark_cal_sec"]
    if post_spin > 0.9 or not (1 / 1.45) <= post_ratio <= 1.45:
        sys.exit(
            f"phase flipped mid-capture (post spin {post_spin:.2f}, "
            f"post cal {post_cal:.3f}) — measurements discarded, retry"
        )
    print(f"capture spark_cal {cal:.3f} (baseline {base['spark_cal_sec']:.3f}, "
          f"post-capture cal {post_cal:.3f})")
    if write:
        base["queries"].update(merged)
        base["value"] = round(sum(base["queries"].values()), 3)
        base.setdefault("notes", {})[f"added_{'_'.join(sorted(merged))[:40]}"] = (
            f"entries added from a dedicated calm capture (spark_cal "
            f"{cal:.3f}, guards: spin<=0.9 and cal within 1.45x of the "
            f"baseline's {base['spark_cal_sec']}; best-of-3 per query, "
            f"warmed; sf_dir={sf}); existing entries untouched. "
            "Sub-second entries may deserve a hand-raise to their "
            "bench-context reading (see the r6_additions note)."
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
