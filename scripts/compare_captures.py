#!/usr/bin/env python
"""Per-query comparison of two bench capture files.

    python scripts/compare_captures.py CAPTURE [BASELINE]

BASELINE defaults to the committed bench_baseline.json. Accepts any
bench.py output file — single-object, pretty-printed multi-line, or
the full+compact two-line form bench.py emits (the object with the
most `queries` entries wins). Prints capture metadata (cal bracket,
mf, spins), the worst/best per-query ratios, the median ratio, and
the raw total ratio — the post-hoc audit this round's hunt ran by
hand a half-dozen times (start-cal contamination, the tail-calm
mf-1.049 capture, and the pytest-overlap mf-1.114 one were all
diagnosed from exactly this view).
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def load_capture(path: str) -> dict:
    """First-or-richest JSON object in a file that may hold several."""
    raw = Path(path).read_text()
    dec = json.JSONDecoder()
    objs, i = [], 0
    while i < len(raw):
        while i < len(raw) and raw[i] in " \n\t\r":
            i += 1
        if i >= len(raw):
            break
        obj, i = dec.raw_decode(raw, i)
        objs.append(obj)
    if not objs:
        sys.exit(f"{path}: no JSON objects found")
    return max(objs, key=lambda d: len(d.get("queries", {})))


def main() -> None:
    # positionals = everything before the first --flag
    args = sys.argv[1:]
    pos = []
    for a in args:
        if a.startswith("--"):
            break
        pos.append(a)
    if not pos:
        sys.exit(__doc__)
    cap = load_capture(pos[0])
    base = load_capture(
        pos[1] if len(pos) > 1 else str(_REPO / "bench_baseline.json")
    )
    meta = {
        k: cap[k]
        for k in (
            "value",
            "machine_factor_vs_baseline",
            "spark_cal_sec",
            "spark_cal_start_sec",
            "spark_cal_end_sec",
        )
        if k in cap
    }
    print("capture:", meta)
    if "phase_trace" in cap:
        print("spins:", [p["spin_sec"] for p in cap["phase_trace"]])
    if cap.get("regressions"):
        print("REGRESSION FLAGS:", sorted(cap["regressions"]))

    qs, bq = cap["queries"], base["queries"]
    shared = sorted(set(qs) & set(bq))
    missing = sorted(set(qs) ^ set(bq))
    if missing:
        print("not in both files (skipped):", missing)
    ratios = sorted(
        ((qs[k] / bq[k] if bq[k] else float("inf"), k) for k in shared),
        reverse=True,
    )
    print("worst 8:")
    for r, k in ratios[:8]:
        print(f"  {k}: {qs[k]:.3f} vs {bq[k]:.3f} = {r:.2f}x")
    print("best 5:")
    for r, k in ratios[-5:]:
        print(f"  {k}: {qs[k]:.3f} vs {bq[k]:.3f} = {r:.2f}x")
    med = statistics.median(r for r, _ in ratios)
    tot_c = sum(qs[k] for k in shared)
    tot_b = sum(bq[k] for k in shared)
    print(
        f"median ratio {med:.3f} | shared-total {tot_c:.3f} vs {tot_b:.3f}"
        f" = {tot_c / tot_b:.3f}x raw over {len(shared)} queries"
    )
    # --watch a,b,c — print the named rows regardless of rank (the r11
    # verdict's watch-list protocol: the next accepted capture must
    # clear each by name, so the audit view must show them even when
    # they are nowhere near the worst-8)
    if "--watch" in sys.argv:
        i = sys.argv.index("--watch") + 1
        if i >= len(sys.argv):
            sys.exit("usage: --watch name1,name2,... (flag value missing)")
        names = sys.argv[i].split(",")
        mf = cap.get("machine_factor_vs_baseline") or 1.0
        print("watch list:")
        for k in names:
            if k not in qs or k not in bq:
                print(f"  {k}: not in both files")
                continue
            r = qs[k] / bq[k] if bq[k] else float("inf")
            print(
                f"  {k}: {qs[k]:.3f} vs {bq[k]:.3f} = {r:.2f}x raw, "
                f"{r / mf:.2f}x normalized (mf {mf:.3f})"
            )


if __name__ == "__main__":
    main()
