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
    halves, like Spark); values whose scaled fraction sits inside the
    suspect band around 0.5 — where binary scaling can disagree with
    decimal-string scaling — are re-decided from Decimal(repr(x)),
    which is the same shortest-decimal value Java's Double.toString
    produces. The band scales with magnitude, max(1e-6, scaled·4ulp):
    the error of |x|·1e6 grows with |x|, and the r12 fixed 1e-6 band
    provably diverged from F.round at half-boundaries for
    |x| ≳ 6.6e4 (66531.8903225 → .890322 vs Spark's .890323; ~800 of
    180k boundary doubles per decade — the r12 ADVICE finding, pinned
    across nine magnitude decades in tests/test_semdedup_arrow.py).
    Cost contract: for |x| ≳ 5.6e8 the band covers the whole fraction
    range, so EVERY element takes the per-element Decimal fallback —
    still exact, but no longer vectorized; consumers in that regime
    should round JVM-side with F.round instead. Every current
    consumer feeds cosines in [-1, 1], where suspects are rare and
    the fast path dominates. NaN passes through untouched.

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
        # magnitude-scaled suspect band: |x|*1e6 carries relative
        # error O(ulp), so the absolute uncertainty of `frac` grows
        # as scaled*2**-52; 4 ulps covers the multiply + subtract
        # chain with margin (exactness pinned over nine decades in
        # tests/test_semdedup_arrow.py)
        suspect = np.abs(frac - 0.5) < np.maximum(1e-6, scaled * 4.0 * 2.0**-52)
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
