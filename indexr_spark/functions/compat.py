"""Reference-compatibility expression builders.

Small semantic deltas between the reference engine and Spark SQL,
packaged as explicit functions so a migrating user can opt into
bit-identical behavior instead of silently inheriting Spark's.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def indexr_div(a: Column, b: Column) -> Column:
    """Division with divide-by-zero → 0.

    The reference's integer divide returns 0 on a zero divisor
    (indexr-query-opt expr/arith/Divide.java — SURVEY.md §2.1 scalar
    table) where Spark SQL returns NULL. This builder reproduces the
    reference's answer for both integral and floating inputs.
    """
    return F.when(b == 0, F.lit(0)).otherwise(a / b)


def indexr_mod(a: Column, b: Column) -> Column:
    """Remainder with zero divisor → 0 (same contract as indexr_div;
    reference expr/arith/Remainder.java)."""
    return F.when(b == 0, F.lit(0)).otherwise(a % b)


def make_round6_half_up():
    """Factory for the numpy rounding that matches Spark's
    ``F.round(x, 6)`` exactly (the r10 ADVICE finding, hoisted here
    from operators/similarity.py in r12 so every Arrow engine shares
    ONE implementation): Spark rounds HALF_UP over the double's
    SHORTEST DECIMAL representation
    (BigDecimal(Double.toString(x)).setScale(6, HALF_UP)), while
    np.round is binary round-half-to-even — the two genuinely differ
    at 6dp half-boundaries (0.1234565 → 0.123457 in Spark but
    0.123456 under np.round). The fast path here is scaled-double
    HALF_UP (floor(|x|·1e6 + 0.5), sign restored — away-from-zero on
    halves, like Spark); values whose scaled fraction sits within
    1e-6 of 0.5 — the only band where binary scaling can disagree
    with decimal-string scaling (error < 1e-9) — are re-decided from
    Decimal(repr(x)), which is the same shortest-decimal value Java's
    Double.toString produces. NaN passes through untouched.

    Shaped as a factory returning a NESTED function so cloudpickle
    serializes it BY VALUE: executor closures (mapInPandas/
    applyInPandas bodies) capture the returned function without
    needing this package importable on workers — the same
    self-containment rule every Arrow closure in this repo follows.
    Equality with F.round is pinned in tests/test_semdedup_arrow.py
    on an explicit half-boundary battery, parameterized over every
    consumer site (r12)."""

    def round6_half_up(a):
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np

        a = np.asarray(a, dtype=np.float64)
        scaled = np.abs(a) * 1e6
        fl = np.floor(scaled)
        frac = scaled - fl
        out = np.copysign(np.where(frac >= 0.5, fl + 1.0, fl), a) / 1e6
        suspect = np.abs(frac - 0.5) < 1e-6
        if suspect.any():
            q = Decimal("0.000001")
            for pos in zip(*np.nonzero(suspect)):
                out[pos] = float(
                    Decimal(repr(float(a[pos]))).quantize(
                        q, rounding=ROUND_HALF_UP
                    )
                )
        return out

    return round6_half_up
