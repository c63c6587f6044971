"""BPE tokenizer training (bpe_train) and encoding (bpe_apply),
certified against a plain-Python REFERENCE implementation of the
Sennrich algorithm — d34 has no SQL oracle (iterative argmax-and-
rewrite is not one DuckDB query), so the independent check is an
algorithmic re-implementation, which is stronger than a value-hash:
it shares no code, no engine, and no expression semantics with the
Spark side."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from indexr_spark.operators.text import bpe_apply, bpe_train
from indexr_spark.tables import load_table
from tests.conftest import SMOKE_SF


def ref_bpe_train(texts, n_merges, min_freq=2):
    """Reference BPE: word counts → repeat (count adjacent pairs
    positionally, pick max with lexicographic tie-break, merge greedy
    left-to-right per word)."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    syms = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, f in words.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max freq, ties lexicographic on (left, right)
        (left, right), pf = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if pf < min_freq:
            break
        merges.append((rank, left, right, left + right, pf))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_reference_on_handmade_corpus(spark):
    texts = ["low low low lower lower lowest", "new newer newest low"]
    expect, _ = ref_bpe_train(texts, n_merges=8)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in bpe_train(
            spark.createDataFrame([(t,) for t in texts], "text string"),
            n_merges=8,
        ).orderBy("rank").collect()
    ]
    assert got == expect


def test_bpe_train_matches_reference_on_corpus(spark):
    """The d34 registry row's semantics, end-to-end on the driver's
    own corpus at smoke scale — every rank, symbol and count equal."""
    docs = load_table(spark, SMOKE_SF, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    expect, _ = ref_bpe_train(texts, n_merges=12)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["freq"])
        for r in bpe_train(docs, n_merges=12).orderBy("rank").collect()
    ]
    assert got == expect
    assert len(got) == 12  # this corpus supports at least 12 merges


def test_bpe_train_deterministic(spark):
    docs = load_table(spark, SMOKE_SF, "documents")
    a = bpe_train(docs, n_merges=5).collect()
    b = bpe_train(docs, n_merges=5).collect()
    assert a == b


def test_bpe_train_min_freq_stops(spark):
    # every word unique → every pair frequency 1 → no merge at the
    # default min_freq=2
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert bpe_train(df, n_merges=5).count() == 0


def test_bpe_apply_reproduces_training_segmentation(spark):
    """Encoding the training corpus with the learned table must
    reproduce the trained word symbols exactly (the fold and the
    rank-ordered encode are the same greedy semantics)."""
    texts = ["low low low lower lower lowest", "new newer newest low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=8).orderBy("rank").collect()
    _, ref_syms = ref_bpe_train(texts, n_merges=8)
    got = {
        r["doc_id"]: r["bpe_toks"]
        for r in bpe_apply(docs, merges).collect()
    }
    for i, t in enumerate(texts):
        expect = [s for w in t.split(" ") if w for s in ref_syms[w]]
        assert got[i] == expect, i


def test_d34_registry_row_shape(spark):
    from indexr_spark import operators

    df = operators.QUERIES["d34_bpe_merges"](spark, SMOKE_SF)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "rank", "left", "right", "merged", "freq",
    ]
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    # rows-only contract: d34 deliberately has no SQL oracle
    assert "d34_bpe_merges" not in operators.ORACLE


def test_bpe_train_slice_fold_matches_fold_everything(spark):
    """The r8 sliced fold (only words containing both merge symbols
    are re-folded) must be bit-identical to the fold-everything
    baseline it replaced — same merges, same frequencies, same
    ranks — since the fold is the identity on every excluded word."""
    texts = ["low low low lower lower lowest", "new newer newest low"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    sliced = bpe_train(docs, n_merges=8).orderBy("rank").collect()
    full = bpe_train(docs, n_merges=8, slice_fold=False).orderBy(
        "rank"
    ).collect()
    assert sliced == full
