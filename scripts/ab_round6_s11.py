"""Interleaved A/B: the HALF_UP rounding factory vs the old np.round
path inside s11_neardup_numpy — the r12 verdict's task 3 for s11, the
one flagged row whose EXECUTED code changed in r12 (similarity.py:973
switched the presentation round from np.round to make_round6_half_up,
and the r13 ADVICE fix then widened the factory's suspect band).

The pin test proves the two paths differ in VALUE on half-boundaries;
this script measures whether they differ in TIME on the bench corpus.
Protocol mirrors watch_row_recheck: PASSES interleaved pairs, order
alternating per pass (A-first on even passes, B-first on odd) so a
monotone phase drift cannot masquerade as a variant effect; every
pass carries its own multicore cal bracket. The B arm restores the
old behavior exactly by monkey-patching the factory symbol s11 reads
at query-build time (similarity._make_round6_half_up), so both arms
run the identical plan, closure shipping included — only the rounder
differs.

Also prints a pure-numpy microbench of the two rounders at
block-representative sizes (1e4/1e5/1e6 cosines in [-1, 1]): the
factory's extra cost is ~3 vectorized passes plus the suspect-band
scan, predicted <10 ms per block at these sizes — the query-level A/B
checks that prediction end to end.

Usage:
    python scripts/ab_round6_s11.py [passes]
Prints one JSON line {"micro": {...}, "query": {...}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from indexr_spark.functions.compat import make_round6_half_up  # noqa: E402
from indexr_spark.operators import similarity as sim  # noqa: E402
from indexr_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def _np_round6_factory():
    """The pre-r12 presentation round: half-to-even np.round."""

    def np_round6(a):
        import numpy as np

        return np.round(np.asarray(a, dtype=np.float64), 6)

    return np_round6


def _micro() -> dict:
    rng = np.random.default_rng(13)
    r6 = make_round6_half_up()
    out = {}
    for n in (10_000, 100_000, 1_000_000):
        a = rng.uniform(-1.0, 1.0, n)
        # min-of-5 per rounder, interleaved
        th, tn = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            r6(a)
            th.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.round(a, 6)
            tn.append(time.perf_counter() - t0)
        out[str(n)] = {
            "half_up_ms": round(min(th) * 1e3, 3),
            "np_round_ms": round(min(tn) * 1e3, 3),
        }
    return out


def _run(spark, factory) -> float:
    orig = sim._make_round6_half_up
    sim._make_round6_half_up = factory
    try:
        t0 = time.time()
        sim.s11_neardup_numpy(spark, SF).count()
        return round(time.time() - t0, 3)
    finally:
        sim._make_round6_half_up = orig


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    micro = _micro()
    print(json.dumps({"micro": micro}), flush=True)

    spark = get_spark(
        app_name="ab-round6-s11",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()
    _run(spark, make_round6_half_up)  # warm both arms' shared plan
    trace = []
    for i in range(passes):
        cal0 = bench._spark_calibration(spark)
        if i % 2 == 0:
            t_half = _run(spark, make_round6_half_up)
            t_np = _run(spark, _np_round6_factory)
        else:
            t_np = _run(spark, _np_round6_factory)
            t_half = _run(spark, make_round6_half_up)
        cal1 = bench._spark_calibration(spark)
        trace.append(
            {
                "pass": i,
                "order": "half_first" if i % 2 == 0 else "np_first",
                "half_up": t_half,
                "np_round": t_np,
                "bracket": [cal0, round(cal1, 3)],
            }
        )
        print(f"pass {i}: half_up {t_half} np_round {t_np} "
              f"bracket {cal0}/{cal1}", flush=True)

    halves = [t["half_up"] for t in trace]
    nps = [t["np_round"] for t in trace]
    doc = {
        "metric": "ab_round6_s11",
        "micro": micro,
        "query": {
            "passes": passes,
            "half_up_min": min(halves),
            "np_round_min": min(nps),
            "half_up_median": sorted(halves)[len(halves) // 2],
            "np_round_median": sorted(nps)[len(nps) // 2],
            "delta_min_sec": round(min(halves) - min(nps), 3),
            "trace": trace,
        },
    }
    print(json.dumps(doc), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
