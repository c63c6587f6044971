"""Equivalence pin for the dedup-first LSH candidate generator.

d07/d09's candidates now come from _lsh_doc_pairs: identical token
sets collapse to one group before the banded signature join, colliding
bands dedup via a first-match predicate, and group pairs re-expand to
doc pairs through joins. The claim that makes this safe is exact pair-
set equality with the naive doc-level construction (signatures are
pure functions of the distinct token set). This test checks that claim
on a synthetic corpus engineered to hit every edge at once:

* large duplicate clusters (identical texts),
* same-token-SET-different-order docs (canonical-group members whose
  texts differ),
* near-dup docs colliding in band 1 but not band 0 (first-match path),
* docs colliding in BOTH bands (the k-fold dup the first-match
  predicate must emit exactly once),
* singleton docs with no collisions.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from indexr_spark.functions.text import distinct_tokens, hash32
from indexr_spark.operators.text import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_P,
    MINHASH_SEEDS,
    _lsh_doc_pairs,
)

VOCAB = [f"w{i}" for i in range(12)]  # tiny vocab → dense collisions


def _corpus(seed: int, n: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    i = 0
    while len(docs) < n:
        kind = rng.random()
        words = rng.sample(VOCAB, rng.randint(2, 6))
        text = " ".join(words)
        docs.append((i, text)); i += 1
        if kind < 0.3 and len(docs) < n:  # exact-dup cluster
            for _ in range(rng.randint(1, 4)):
                if len(docs) < n:
                    docs.append((i, text)); i += 1
        elif kind < 0.5 and len(docs) < n:  # same set, different order
            docs.append((i, " ".join(reversed(words)))); i += 1
    return docs


def _naive_doc_pairs(spark, df, bands: int) -> set[tuple[int, int]]:
    """Round-2's doc-level construction: per-doc band signatures,
    bucket self-join, distinct — the reference semantics."""
    rows_per_band = MINHASH_SEEDS // bands
    toks = distinct_tokens("text")
    base = F.transform(toks, lambda t: hash32(t))

    def fam(j):
        a, b = MINHASH_A[j], MINHASH_B[j]
        return F.array_min(F.transform(base, lambda h: (h * a + b) % MINHASH_P))

    mh = [fam(j).cast("string").alias(f"mh{j}") for j in range(MINHASH_SEEDS)]
    sigs = [
        F.concat_ws(
            ",", *[F.col(f"mh{s}") for s in range(b * rows_per_band, (b + 1) * rows_per_band)]
        ).alias(f"sig{b}")
        for b in range(bands)
    ]
    per_doc = df.select("doc_id", *mh).select("doc_id", *sigs)
    stack = ", ".join(f"{b}, sig{b}" for b in range(bands))
    s = per_doc.selectExpr("doc_id", f"stack({bands}, {stack}) AS (band, sig)")
    a, b = s.alias("a"), s.alias("b")
    got = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .collect()
    )
    return {(r.a_id, r.b_id) for r in got}


@pytest.mark.parametrize("seed,bands", [(7, 2), (7, 4), (11, 2), (13, 8)])
def test_dedup_first_equals_doc_level(spark, tmp_path, seed, bands):
    docs = _corpus(seed, 60)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / f"docs{seed}_{bands}")
    df.write.parquet(f"{path}/documents.parquet")

    fast = _lsh_doc_pairs(spark, path, bands).collect()
    fast_pairs = [(r.a_id, r.b_id) for r in fast]
    # exactly-once emission: no pair may appear twice (the first-match
    # predicate and the disjoint within/cross legs guarantee it)
    assert len(fast_pairs) == len(set(fast_pairs))
    assert set(fast_pairs) == _naive_doc_pairs(spark, df, bands)


def test_bucket_cap_drops_oversized_and_logs(spark, tmp_path, caplog):
    """max_bucket: a corpus with one dominant signature bucket loses
    exactly that bucket's cross pairs, the drop is logged (never
    silent), and within-group dup pairs are untouched (the cap guards
    the cross-group join only)."""
    import logging as _logging

    # 20 docs sharing one token set (one giant bucket via identical
    # sigs is collapsed by dedup-first, so build DISTINCT sets that
    # still collide: vary one token, keep the minhash-dominant ones).
    # Simplest adversarial corpus: many distinct singleton-ish sets
    # that all share band signatures is hard to force; instead assert
    # the cap semantics directly at the group level with distinct sets
    # and cap=0-equivalent (max_bucket=1 drops every bucket of >=2).
    docs = [(i, f"shared common tokens plus w{i}") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    path = str(tmp_path / "capdocs")
    df.write.parquet(f"{path}/documents.parquet")

    uncapped_pairs = {
        (r.a_id, r.b_id) for r in _lsh_doc_pairs(spark, path, 2).collect()
    }
    assert uncapped_pairs  # non-vacuous: the corpus must collide uncapped
    # a cap no bucket reaches must reproduce the uncapped pair set
    # exactly — this pins the capped path's distinct-based dedup to the
    # uncapped path's first-match dedup
    huge_cap = {
        (r.a_id, r.b_id)
        for r in _lsh_doc_pairs(spark, path, 2, max_bucket=10**6).collect()
    }
    assert huge_cap == uncapped_pairs
    with caplog.at_level(_logging.WARNING, logger="indexr_spark.operators.text"):
        capped = _lsh_doc_pairs(spark, path, 2, max_bucket=1).count()
    assert capped < len(uncapped_pairs)
    assert any("LSH bucket cap" in r.message for r in caplog.records)
    # within-group pairs survive any cap: identical texts never route
    # through the bucket join
    dup = [(100, "dup dup text"), (101, "dup dup text")]
    ddf = spark.createDataFrame(dup, "doc_id long, text string")
    dpath = str(tmp_path / "dupdocs")
    ddf.write.parquet(f"{dpath}/documents.parquet")
    got = {(r.a_id, r.b_id) for r in _lsh_doc_pairs(spark, dpath, 2, max_bucket=1).collect()}
    assert got == {(100, 101)}


def test_dedup_action_pipeline_end_to_end(spark, tmp_path):
    """The user story the dedup family exists for: run d20 to get the
    keep-list, anti-join the corpus down to survivors, and prove the
    result is actually deduplicated — re-clustering the kept corpus
    yields only singleton clusters (every component was collapsed to
    its best member). This drives d07 -> d12 -> d20 -> action ->
    re-verify as one pipeline, the way a 100 TB dedup pass would."""
    from pyspark.sql import functions as F

    from indexr_spark.operators import text as T

    src = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{src}/documents.parquet")
    keep = T.QUERIES["d20_cluster_keep_best"](spark, src).select(
        F.col("keep_id").alias("doc_id")
    )
    kept = docs.join(keep, "doc_id")
    n_clusters = keep.count()
    assert kept.count() == n_clusters < docs.count()

    # write the deduped corpus and re-cluster it: all singletons
    out = str(tmp_path / "deduped")
    kept.write.parquet(f"{out}/documents.parquet")
    reclustered = T.QUERIES["d12_dup_clusters"](spark, out)
    assert reclustered.filter(F.col("n_members") > 1).count() == 0
    assert reclustered.count() == n_clusters


def test_spread_scan_widens_narrow_scans_only(spark, tmp_path):
    """spread_scan repartitions a single-partition scan to the session
    parallelism (per-row CPU work must not serialize on one task just
    because the file is small) and leaves an already-wide frame
    untouched (at scale the scan provides width; an extra full-corpus
    shuffle would be the bug)."""
    from indexr_spark.tables import spread_scan

    path = str(tmp_path / "tiny.parquet")
    spark.range(100).toDF("doc_id").coalesce(1).write.parquet(path)
    narrow = spark.read.parquet(path)
    assert narrow.rdd.getNumPartitions() == 1
    target = spark.sparkContext.defaultParallelism
    widened = spread_scan(narrow)
    assert widened.rdd.getNumPartitions() == target
    assert widened.count() == 100

    wide = spark.range(1000).repartition(target)
    assert spread_scan(wide) is wide  # no-op: returns the frame as-is


def test_lsh_max_bucket_env_valve(spark, monkeypatch):
    """INDEXR_LSH_MAX_BUCKET is the deployment dial for the bucket
    cap: unset, d07 emits the exact oracle pair set; set, oversized
    buckets are excluded BEFORE the self-join, so the capped output is
    a subset of the exact one (never new pairs) and strictly smaller
    when the cap actually bites."""
    from indexr_spark.operators import text as T

    src = "/root/testdata/sf0.001"
    monkeypatch.delenv("INDEXR_LSH_MAX_BUCKET", raising=False)
    exact = {
        (r["a_id"], r["b_id"]) for r in T.QUERIES["d07_minhash_lsh"](spark, src).collect()
    }
    monkeypatch.setenv("INDEXR_LSH_MAX_BUCKET", "2")
    capped = {
        (r["a_id"], r["b_id"]) for r in T.QUERIES["d07_minhash_lsh"](spark, src).collect()
    }
    assert capped <= exact
    assert len(capped) < len(exact)  # cap=2 must bite on this corpus
