"""Property tests for the LSH/ANN auto-sizing helpers (r4 verdict
task: the scale formulas that lived in comments, now executable)."""

from __future__ import annotations

import pytest
from hypothesis import given
from hypothesis import strategies as st

from indexr_spark.functions.sizing import (
    band_crossover,
    detect_probability,
    suggest_bands,
    suggest_planes,
)


@given(
    n=st.integers(min_value=1, max_value=10**14),
    target=st.integers(min_value=1, max_value=10**9),
)
def test_suggest_planes_bounds_bucket_and_is_minimal(n, target):
    p = suggest_planes(n, target)
    assert 1 <= p <= 62
    # the expected bucket is bounded...
    if p < 62:
        assert n / 2**p <= target
    # ...and p is minimal: one fewer plane would overshoot (p=1 floor
    # exempt — at least one plane so a bucket structure exists at all)
    if p > 1:
        assert n / 2 ** (p - 1) > target


def test_suggest_planes_matches_spot_run_corpora():
    # the 50x vector corpus: 100k vectors, ~6k target bucket -> the
    # pinned ANN_PLANES=4 is exactly what the formula yields there
    assert suggest_planes(100_000, 6_250) == 4
    # 100 TB posture: ~1e11 vectors at 20k-vector buckets (the numpy
    # path's single-worker memory bound) needs ~23 planes
    assert suggest_planes(10**11, 20_000) == 23


@given(st.integers(min_value=1, max_value=64), st.integers(min_value=1, max_value=64))
def test_detect_probability_is_a_probability(b, r):
    for j in (0.0, 0.1, 0.5, 0.9, 1.0):
        p = detect_probability(j, b, r)
        assert 0.0 <= p <= 1.0
    # monotone in j
    ps = [detect_probability(j / 10, b, r) for j in range(11)]
    assert ps == sorted(ps)
    # exactly ~50% at the crossover (the defining property)
    assert detect_probability(band_crossover(b, r), b, r) == pytest.approx(
        1.0 - (1.0 - 1.0 / b) ** b, abs=1e-9
    )


@given(
    threshold=st.floats(min_value=0.01, max_value=0.99),
    k=st.sampled_from([8, 12, 16, 24, 32, 64]),
)
def test_suggest_bands_exact_factorization_and_optimality(threshold, k):
    b, r = suggest_bands(threshold, k)
    assert b * r == k
    dist = abs(band_crossover(b, r) - threshold)
    for cand_b in range(1, k + 1):
        if k % cand_b == 0:
            assert dist <= abs(band_crossover(cand_b, k // cand_b) - threshold) + 1e-9


@given(k=st.sampled_from([8, 16, 32]))
def test_suggest_bands_monotone_in_threshold(k):
    """Lower target Jaccard -> never fewer bands (crossover must come
    down, and it only comes down by adding bands)."""
    bands = [suggest_bands(t, k)[0] for t in (0.05, 0.2, 0.5, 0.7, 0.9)]
    assert bands == sorted(bands, reverse=True)


def test_suggest_bands_reproduces_pinned_constants_regime():
    # d07's 2x8 (crossover 0.917) is what you'd pick for exact-ish
    # near-dup families; d09's 4x4 (0.707) for mid-Jaccard overlap.
    assert suggest_bands(0.9, 16) == (2, 8)
    assert suggest_bands(0.7, 16) == (4, 4)


# ---- simhash width sizing (the r10 simhash100x/1000x laws as code) --

from indexr_spark.functions.sizing import (  # noqa: E402
    simhash_candidate_floor,
    simhash_chance_pairs,
    suggest_simhash_bits,
)


def test_chance_model_matches_the_measured_500k_point():
    """The uniform chance model the 100x spot-run validated at 0.94x:
    predicted ~158k pairs among 500k independent 32-bit simhashes
    (COVERAGE.md simhash100x — measured 148,352 cross-replica)."""
    e = simhash_chance_pairs(500_000, 32)
    # the spot-run's E excludes within-replica pairs (1% of C(n,2));
    # the all-pairs form here is that number plus the 1%
    assert abs(e - 159_751) < 1
    assert abs(148_352 / (e * 0.99) - 0.94) < 0.01


def test_candidate_floor_matches_the_measured_points():
    # 32-bit/4-band floor at 500k docs: census measured 1.52x of this
    assert abs(simhash_candidate_floor(500_000, 32) - 1.953125e9) < 1
    assert abs(2_962_021_031 / simhash_candidate_floor(500_000, 32) - 1.52) < 0.01
    # 60-bit floor at 5M: census measured 3.12x of this
    assert abs(4_766_223_891 / simhash_candidate_floor(5_000_000, 60) - 3.12) < 0.01


def test_suggest_simhash_bits_regimes():
    assert suggest_simhash_bits(5_000) == 40
    assert suggest_simhash_bits(500_000) == 52
    assert suggest_simhash_bits(500_000, candidate_budget=5e7) == 56
    assert suggest_simhash_bits(5_000_000) == 60
    # looser chance budget admits the certified 32-bit form at sf0.1
    assert suggest_simhash_bits(5_000, chance_budget=20.0) == 32


def test_suggest_simhash_bits_validation_and_infeasible():
    import pytest

    with pytest.raises(ValueError):
        suggest_simhash_bits(0)
    with pytest.raises(ValueError):
        suggest_simhash_bits(1000, bands=3, max_hamming=3)
    with pytest.raises(ValueError, match="raise bands"):
        # 5M docs with a 1e6-candidate ceiling: impossible at <= 60 bits
        suggest_simhash_bits(5_000_000, candidate_budget=1e6)
