"""Auto-sizing for the LSH/ANN dials — the scale formulas as code.

The oracle operators pin their constants for driver comparability
(ANN_PLANES=4, MINHASH_BANDS=2, JACCARD_BANDS=4 — similarity.py /
text.py), but a deployment at another corpus size must re-derive them.
Until round 5 the derivations lived in comments at the definition
sites ("planes ≈ log2(n / target_bucket)"; "the S-curve for b bands x
r rows crosses at (1/b)^(1/r)"); these helpers make them executable
and property-tested, and the scale spot-run scripts consume them so
the numbers printed next to a corpus are the numbers the formulas
give for that corpus.

Two cost models, one per dial:

* Hyperplane-LSH bucket count (`suggest_planes`) — every added plane
  halves the expected bucket, and the within-bucket pair work is
  quadratic in bucket size, so planes is THE dial that keeps the
  bucket self-join bounded as n grows. The r4 50x spot-run measured
  the fixed-plane worst case this formula exists to prevent.
* MinHash banding (`suggest_bands`) — detection probability for a
  pair at Jaccard j under b bands x r rows is 1-(1-j^r)^b, an
  S-curve crossing ~50% at j ≈ (1/b)^(1/r). Pick the banding whose
  crossover sits at the lowest Jaccard you must catch; more bands
  push the crossover down (recall up) at linearly more candidates.
  (The pinned 4x4 in d09 was additionally MEASURED: 0.933 recall at
  3x d07's candidates — use the formula to shortlist, then measure,
  as text.py:44-49 documents.)
"""

from __future__ import annotations

import math

_MAX_PLANES = 62  # bucket ids fold into a signed 64-bit long


def suggest_planes(n: int, target_bucket: int) -> int:
    """Fewest hyperplanes such that the EXPECTED bucket size n/2^p is
    at most `target_bucket` (uniform-bucket model; real buckets skew,
    which the chunked self-join and the logged max_bucket valve
    absorb). Minimality matters: each extra plane costs recall (a
    near-dup pair must agree on every sign bit), so this returns the
    recall-cheapest p that still bounds the quadratic bucket work.

    >>> suggest_planes(100_000, 6_250)
    4
    """
    if n <= 0:
        raise ValueError(f"corpus size must be positive, got {n}")
    if target_bucket <= 0:
        raise ValueError(f"target bucket must be positive, got {target_bucket}")
    p = max(1, math.ceil(math.log2(n / target_bucket))) if n > target_bucket else 1
    return min(p, _MAX_PLANES)


def detect_probability(j: float, bands: int, rows: int) -> float:
    """P(candidate) for a pair at Jaccard `j` under bands x rows
    MinHash banding: 1 - (1 - j^rows)^bands."""
    if not 0.0 <= j <= 1.0:
        raise ValueError(f"jaccard must be in [0,1], got {j}")
    return 1.0 - (1.0 - j**rows) ** bands


def band_crossover(bands: int, rows: int) -> float:
    """The Jaccard where the banding S-curve crosses ~50% detection:
    (1/bands)^(1/rows)."""
    return (1.0 / bands) ** (1.0 / rows)


def suggest_bands(threshold: float, k: int = 16) -> tuple[int, int]:
    """(bands, rows) over `k` total minhashes whose S-curve crossover
    is nearest the target Jaccard `threshold` — the comment formula at
    text.py:44-49 as code. Only exact factorizations bands*rows == k
    are considered (every minhash is used; the operators' band
    expression assumes it). Ties break toward FEWER bands (fewer
    candidates at equal crossover distance).

    >>> suggest_bands(0.7, 16)   # crossover (1/4)^(1/4) = 0.707
    (4, 4)
    >>> suggest_bands(0.9, 16)   # crossover (1/2)^(1/8) = 0.917
    (2, 8)
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0,1), got {threshold}")
    if k < 2:
        raise ValueError(f"need at least 2 minhashes, got {k}")
    best = None
    for b in range(1, k + 1):
        if k % b:
            continue
        r = k // b
        dist = abs(band_crossover(b, r) - threshold)
        if best is None or dist < best[0] - 1e-12:
            best = (dist, b, r)
    assert best is not None
    return best[1], best[2]


_MAX_SIMHASH_BITS = 60  # 15 md5 hex chars: exactly representable as a long


def simhash_chance_pairs(n: int, bits: int, max_hamming: int = 3) -> float:
    """Expected CHANCE hamming-≤k pairs among n independent simhashes:
    C(n,2) · Σ_{h≤k} C(bits,h) / 2^bits. This is the uniform model the
    simhash100x spot-run validated at 0.94x on 500k docs (COVERAGE.md:
    predicted 158,153 chance pairs at 32 bits, measured 148,352) —
    i.e. past ~10^5 docs a 32-bit hamming-≤3 threshold emits mostly
    noise, and the error you make trusting this formula is ~6%."""
    if n < 2:
        return 0.0
    if not 1 <= max_hamming < bits:
        raise ValueError(f"max_hamming={max_hamming} must be in [1, bits)")
    tail = sum(math.comb(bits, h) for h in range(max_hamming + 1))
    return (n * (n - 1) / 2) * tail / 2.0 ** bits


def simhash_candidate_floor(n: int, bits: int, bands: int = 4) -> float:
    """The corpus-INDEPENDENT candidate floor of the banded simhash
    join: n²·bands / 2^(width+1) with width = bits/bands — what
    uniformly-random hashes alone generate. Measured 1.52x of this at
    500k docs / 32 bits and 3.12x at 5M docs / 60 bits (correlation
    adds a corpus factor that SHRINKS relative to the floor as n
    grows — the floor takeover, COVERAGE.md simhash100x/1000x)."""
    if bits % bands:
        raise ValueError(f"bands={bands} must divide bits={bits}")
    return n * n * bands / 2.0 ** (bits // bands + 1)


def suggest_simhash_bits(
    n: int,
    bands: int = 4,
    max_hamming: int = 3,
    chance_budget: float = 1.0,
    candidate_budget: float | None = None,
) -> int:
    """Smallest simhash width (multiple of 4 and of `bands`, ≤ 60)
    whose expected chance-pair count stays under `chance_budget` AND
    (if given) whose banded-join candidate floor stays under
    `candidate_budget`. The two failure modes it sizes against are
    the measured ones: precision death (chance pairs grow n²/2^bits —
    148k measured at 500k docs / 32 bits) and saturation (candidates
    grow n²·bands/2^(width+1) — 2.96e9 measured at the same point).
    Raises when even 60 bits can't meet a budget — the remedies then
    are more bands (narrower verify margin) or accepting the valve's
    cap, both deliberate calls, not defaults.

    >>> suggest_simhash_bits(5_000)  # sf0.1 has ~16 chance pairs @32b
    40
    >>> suggest_simhash_bits(500_000)  # the measured corpus
    52
    >>> suggest_simhash_bits(500_000, candidate_budget=5e7)
    56
    >>> suggest_simhash_bits(5_000_000)  # the 1000x rung: max out
    60
    """
    if n <= 0:
        raise ValueError(f"corpus size must be positive, got {n}")
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} must exceed max_hamming={max_hamming} "
            "(the pigeonhole completeness bound)"
        )
    step = math.lcm(4, bands)
    for bits in range(step, _MAX_SIMHASH_BITS + 1, step):
        if bits <= max_hamming:
            continue
        if simhash_chance_pairs(n, bits, max_hamming) > chance_budget:
            continue
        if candidate_budget is not None and (
            simhash_candidate_floor(n, bits, bands) > candidate_budget
        ):
            continue
        return bits
    raise ValueError(
        f"no width <= {_MAX_SIMHASH_BITS} meets the budgets at n={n} "
        f"(chance<={chance_budget}, candidates<={candidate_budget}); "
        "raise bands or accept the chunked-join cap valve"
    )
