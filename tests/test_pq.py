"""Product quantization (operators/pq.py): training convergence and
determinism, exact numpy-reference parity for encode and ADC (the
library layer's oracle, the test_bpe pattern — an independent
implementation sharing no expression machinery), and recall of the
ADC ranking against exact brute-force L2."""

from __future__ import annotations

import math

import numpy as np
import pytest

from indexr_spark.operators.pq import adc_tables, pq_adc_topk, pq_encode, pq_train
from indexr_spark.tables import load_table
from tests.conftest import SMOKE_SF

M, KSUB, ITERS = 16, 16, 4


def _corpus(spark):
    return load_table(spark, SMOKE_SF, "embeddings")


def _np_corpus(spark):
    rows = _corpus(spark).select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, X


def _np_encode(X: np.ndarray, codebooks) -> np.ndarray:
    """Independent argmin encoder: ties break toward the LOWER code
    (np.argmin's first-occurrence contract matches the Spark side's
    array_max over (score, -code) structs)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = np.empty((X.shape[0], m), dtype=np.int64)
    for j, cb in enumerate(codebooks):
        sub = X[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - np.asarray(cb)[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


@pytest.mark.slow
def test_pq_train_converges_and_is_deterministic(spark):
    cbs, hist = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=ITERS)
    assert len(cbs) == M and all(len(cb) == KSUB for cb in cbs)
    assert all(len(c) == 64 // M for cb in cbs for c in cb)
    assert len(hist) == ITERS
    # Lloyd's monotonicity (error measured under the round's START
    # codebooks, so hist[i+1] <= hist[i] exactly)
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9, hist
    assert hist[-1] < hist[0], "training never improved"
    # deterministic seeding -> bit-identical retrain
    cbs2, hist2 = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=ITERS)
    assert cbs == cbs2 and hist == hist2


def test_pq_encode_matches_numpy_reference(spark):
    cbs, _ = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=2)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(_corpus(spark), cbs).select("vec_id", "pq_code").collect()
    }
    ids, X = _np_corpus(spark)
    want = _np_encode(X, cbs)
    assert len(got) == len(ids)
    for i, vid in enumerate(ids):
        assert got[vid] == list(want[i]), vid


@pytest.mark.slow
def test_pq_adc_values_match_numpy_and_recall_beats_floor(spark):
    ids, X = _np_corpus(spark)
    cbs, _ = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=ITERS)
    coded = pq_encode(_corpus(spark), cbs)
    queries = [(ids[i], list(X[i])) for i in range(5)]

    k = 10
    top = pq_adc_topk(coded, queries, cbs, k=k).collect()
    assert {r["q_id"] for r in top} == {q for q, _ in queries}

    # ADC values: exact table-lookup parity with numpy
    codes = _np_encode(X, cbs)
    id_to_row = {vid: i for i, vid in enumerate(ids)}
    for r in top:
        q = next(v for q_, v in queries if q_ == r["q_id"])
        table = adc_tables(q, cbs)
        code = codes[id_to_row[r["vec_id"]]]
        want = sum(table[j * KSUB + int(c)] for j, c in enumerate(code))
        assert abs(r["adc"] - round(want, 6)) < 1e-6, (r["q_id"], r["vec_id"])

    def _recall(rows) -> float:
        hits = 0
        for qid, qvec in queries:
            d2 = ((X - np.asarray(qvec)) ** 2).sum(axis=1)
            order = [
                ids[i] for i in np.argsort(d2, kind="stable") if ids[i] != qid
            ]
            exact = set(order[:k])
            approx = {r["vec_id"] for r in rows if r["q_id"] == qid}
            hits += len(exact & approx)
        return hits / (len(queries) * k)

    # recall@10 against exact L2 (query row excluded both sides).
    # Measured on this corpus at m=16/ksub=16/iters=4: raw ADC 0.52 —
    # the synthetic near-uniform embeddings are PQ's hard case; floors
    # sit under the measurements but far above chance (10/499 ≈ 0.02)
    assert _recall(top) >= 0.4, _recall(top)

    # the production refinement: ADC shortlist R=100, exact L2 rerank
    # (measured 0.96; 1.00 at R=150). Exact distances must be true L2.
    rr = pq_adc_topk(coded, queries, cbs, k=k, rerank_from=100).collect()
    assert _recall(rr) >= 0.85, _recall(rr)
    for r in rr[:20]:
        q = next(v for q_, v in queries if q_ == r["q_id"])
        want = float(((X[id_to_row[r["vec_id"]]] - np.asarray(q)) ** 2).sum())
        assert abs(r["d2"] - round(want, 6)) < 1e-6

    # rerank can only help: its hit set must dominate raw ADC per query
    assert _recall(rr) >= _recall(top)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        pq_adc_topk(coded, queries, cbs, k=10, rerank_from=5)


def test_pq_degenerate_configs_refused(spark):
    with pytest.raises(ValueError):
        pq_train(_corpus(spark), m=7)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        pq_train(_corpus(spark), m=0)
    with pytest.raises(ValueError):
        pq_train(_corpus(spark).limit(3), ksub=16)  # corpus < ksub


def test_pq_compression_shape(spark):
    """The storage claim itself: m int codes replace D floats."""
    cbs, _ = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=1)
    row = pq_encode(_corpus(spark), cbs).select("pq_code").first()
    assert len(row["pq_code"]) == M
    assert all(0 <= c < KSUB for c in row["pq_code"])
    # 8 bytes/vector at the test config (64-dim float32 = 256 B: 32×)
    assert math.log2(KSUB) * M / 8 == 8.0


def test_s13_fixed_codebook_encode_matches_duckdb_replay(spark):
    """The s13 draft proven before registration (the d35 protocol):
    encode with the FIXED deterministic codebook must equal the
    generated DuckDB replay — both sides maximize the same
    2·dot − |c|² formula with ties to the lower code, and the codebook
    values are exactly representable doubles so only dot-product
    last-ulp rounding could ever diverge. Cross-checked against the
    independent numpy encoder as well, so the two engines cannot be
    wrong together."""
    import duckdb

    from indexr_spark.operators.pq import (
        S13_ORACLE_DRAFT,
        s13_codebooks,
        s13_pq_encode,
    )

    rows = s13_pq_encode(spark, SMOKE_SF).collect()
    # registered form is the dash-joined scalar (r10 convention);
    # the fold is lossless: parse back to ints for the numpy check
    assert all(isinstance(r["pq_code"], str) for r in rows)
    got = {r["vec_id"]: r["pq_code"] for r in rows}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SMOKE_SF}/embeddings.parquet')"
    )
    want = {vid: code for vid, code in con.execute(S13_ORACLE_DRAFT).fetchall()}
    assert got == want
    ids, X = _np_corpus(spark)
    np_codes = _np_encode(X, s13_codebooks())
    for i, vid in enumerate(ids):
        assert [int(c) for c in got[vid].split("-")] == list(np_codes[i]), vid


def test_pq_numpy_encode_and_sampled_train_match_catalyst(spark):
    """The two throughput dials must be behavior-preserving: the
    Arrow/BLAS encoder reproduces pq_encode code-for-code (same
    argmax formula, ties to lower code), and sample_limit with the
    full corpus AS the sample reproduces full training to float
    tolerance — NOT bit-for-bit: the sample's sort+checkpoint changes
    row order, and avg() summation order moves the last ulp (each
    path is individually bit-deterministic, asserted below)."""
    from indexr_spark.operators.pq import pq_encode_numpy

    cbs, hist = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=2)
    a = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(_corpus(spark), cbs).select("vec_id", "pq_code").collect()
    }
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode_numpy(_corpus(spark), cbs)
        .select("vec_id", "pq_code")
        .collect()
    }
    assert a == b

    n = _corpus(spark).count()
    cbs2, hist2 = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=2, sample_limit=n)
    for j in range(M):
        for c in range(KSUB):
            for x, y in zip(cbs[j][c], cbs2[j][c]):
                assert abs(x - y) < 1e-9, (j, c)
    for h, h2 in zip(hist, hist2):
        assert abs(h - h2) < 1e-9

    # a strict sample trains on fewer rows: still converges, still
    # deterministic, and refuses a sample smaller than ksub
    cbs3, hist3 = pq_train(
        _corpus(spark), m=M, ksub=KSUB, iters=2, sample_limit=128
    )
    assert hist3[-1] <= hist3[0] + 1e-9
    cbs4, _ = pq_train(_corpus(spark), m=M, ksub=KSUB, iters=2, sample_limit=128)
    assert cbs3 == cbs4
    with pytest.raises(ValueError):
        pq_train(_corpus(spark), m=M, ksub=KSUB, sample_limit=3)


def test_pq_codes_extend_incrementally_without_reencoding(spark):
    """The ingest contract pq_train's docstring claims: with FIXED
    codebooks, encoding arriving batches independently must equal the
    one-shot encode of the union — so a coded corpus column can be
    extended batch by batch (exactly how build_ivfpq_store's layout
    grows under streaming ingest) and ADC results over the union are
    identical either way."""
    from indexr_spark.operators.pq import pq_adc_topk

    full = _corpus(spark)
    cbs, _ = pq_train(full, m=M, ksub=KSUB, iters=2, sample_limit=256)
    b1 = full.filter("vec_id % 2 = 0")
    b2 = full.filter("vec_id % 2 = 1")
    inc = {
        r["vec_id"]: list(r["pq_code"])
        for b in (b1, b2)
        for r in pq_encode(b, cbs).select("vec_id", "pq_code").collect()
    }
    one = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(full, cbs).select("vec_id", "pq_code").collect()
    }
    assert inc == one

    ids, X = _np_corpus(spark)
    queries = [(ids[0], list(X[0]))]
    a = [tuple(r) for r in pq_adc_topk(
        pq_encode(b1, cbs).unionByName(pq_encode(b2, cbs)), queries, cbs, k=5
    ).collect()]
    b = [tuple(r) for r in pq_adc_topk(pq_encode(full, cbs), queries, cbs, k=5).collect()]
    assert a == b
