"""Bracketed interleaved recheck of the r11-verdict watch list — the
fallback instrument for a day whose phase schedule never holds calm
long enough for a full flat-bracket bench capture (the r12 hunt: the
machine held continuous external load from ~15:00, and every admitted
flicker collapsed mid-capture).

Protocol: ROUNDS passes; each pass runs the multicore cal, then every
watch row once, then the cal again — so every single reading carries
its own bracket. The reported value per row is the MINIMUM across
passes (each sub-second row only needs ONE pass to land near a calm
moment), normalized by the minimum of ITS OWN pass's bracket. This
does not replace an accepted calm capture (min-of-N under flicker is
a flicker-minimum — exactly what the baseline max-not-min policy
guards against), so the output must never feed a baseline refresh;
it answers one narrower question honestly: is any watch row's
normalized minimum STILL above its flag bar when the machine is at
its best moment of the session? A code regression would hold the
ratio up in every pass; latency noise collapses in at least one.

Usage:
    python scripts/watch_row_recheck.py [row1,row2,...]
Defaults to the r11 watch list; pass a comma list to recheck any
other flagged rows (the r12 verdict's weak five, say). Prints one
JSON line with per-row {min_sec, ratio_raw, ratio_norm, bracket}
plus the full per-pass trace.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from indexr_spark import operators  # noqa: E402
from indexr_spark.session import get_spark  # noqa: E402

# the r11 verdict "what's wrong" #3 watch list, by name
WATCH = (
    "q20_events_rollup",
    "q13_date_agg",
    "mm03_resize_payload",
    "mm05_audio_frames",
    "q02_filter_scan",
    "q27_salted_agg",
    "s06_ivf_topk",
)

SF = "/root/testdata/sf0.1"
ROUNDS = 4


def main() -> None:
    global WATCH
    if len(sys.argv) > 1:
        WATCH = tuple(sys.argv[1].split(","))
        unknown = [n for n in WATCH if n not in operators.QUERIES]
        if unknown:
            sys.exit(f"unknown rows: {unknown}")
    base = json.JSONDecoder().raw_decode(
        (Path(__file__).parent.parent / "bench_baseline.json").read_text()
    )[0]
    spark = get_spark(
        app_name="watch-row-recheck",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    # warm every row once (scan planning + JIT out of the timed path)
    for name in WATCH:
        operators.QUERIES[name](spark, SF).count()

    trace: list[dict] = []
    for rnd in range(ROUNDS):
        cal0 = bench._spark_calibration(spark)
        row = {"round": rnd, "cal_start": round(cal0, 3), "t": {}}
        for name in WATCH:
            t0 = time.time()
            operators.QUERIES[name](spark, SF).count()
            row["t"][name] = round(time.time() - t0, 3)
        row["cal_end"] = round(bench._spark_calibration(spark), 3)
        trace.append(row)
        print(f"pass {rnd}: bracket {row['cal_start']}/{row['cal_end']} "
              f"{row['t']}", flush=True)

    out = {}
    for name in WATCH:
        best = min(trace, key=lambda r: r["t"][name])
        mf = max(min(best["cal_start"], best["cal_end"])
                 / base["spark_cal_sec"], 1.0)
        bq = base["queries"][name]
        out[name] = {
            "min_sec": best["t"][name],
            "baseline_sec": bq,
            "ratio_raw": round(best["t"][name] / bq, 3),
            "ratio_norm": round(best["t"][name] / bq / mf, 3),
            "bracket": [best["cal_start"], best["cal_end"]],
        }
    doc = {
        "metric": "watch_row_recheck",
        "baseline_cal_sec": base["spark_cal_sec"],
        "rounds": ROUNDS,
        "rows": out,
        "trace": trace,
    }
    print(json.dumps(doc), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
