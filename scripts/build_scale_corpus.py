#!/usr/bin/env python
"""Build the scale spot-run corpora (COVERAGE.md "Scale spot-run"
sections) so the numbers there are reproducible round over round.

Round 4 lesson: the first 10x/50x corpora were throwaway scripts, so
when they were rebuilt the dup structure differed (23.9M group-graph
edges vs 3.5M the first time — the suffix scheme changes how replica
families collide in LSH) and the old wall-times stopped being
comparable. This script IS the corpus definition now.

  python scripts/build_scale_corpus.py docs10x   # /tmp/sf1x10/documents.parquet
  python scripts/build_scale_corpus.py vecs50x   # /tmp/sfvec50/embeddings.parquet

docs10x — 50k docs (10x sf0.1): replica 0 is sf0.1 verbatim; replicas
r=1..9 shift doc_id by r*10000; docs with EVEN original ids stay exact
copies (heavy exact duplication, the web-crawl shape), ODD ids get a
single per-replica suffix token `xrep{r}` (distinct token sets that
are extreme near-dups of each other — the LSH stress shape).

vecs50x — 100k vectors (50x sf0.1): replicas shift vec_id by
r*100000 and add deterministic per-(replica, dim) jitter of at most
±0.005 derived from md5, so vectors are distinct but cluster
structure persists.

rel10x — 10x the RELATIONAL/EVENTS side (round-5 verdict task: dedup
and vectors had measured scale points, the SQL surface didn't):
orders and lineitem replicate with o_orderkey/l_orderkey shifted by
r*10M (join keys stay consistent within a replica; o_custkey and
l_partkey/l_suppkey unchanged, so each customer carries 10x orders —
the natural growth shape); events replicate with event_id AND user_id
shifted (10x users, per-user funnel shape identical — sessionize and
funnel costs scale with users, not rows-per-user). Dimension tables
(region/nation/customer/supplier/part) plus documents/embeddings are
symlinked verbatim: at 10x the fact tables they are exactly the
broadcast-sized sides the plan assertions check.
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from pyspark.sql import functions as F

from indexr_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def build_docs10x(out: str = "/tmp/sf1x10") -> None:
    spark = get_spark(app_name="build-docs10x")
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = [d]
    for r in range(1, 10):
        dr = (
            d.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 2 == 1,
                    F.concat("text", F.lit(f" xrep{r}")),
                ).otherwise(F.col("text")),
            )
            .withColumn("doc_id", F.col("doc_id") + F.lit(r * 10000))
        )
        reps.append(dr)
    alld = reps[0]
    for x in reps[1:]:
        alld = alld.union(x)
    alld.repartition(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"wrote {out}/documents.parquet")


def build_docs100x(out: str = "/tmp/sf1x100", reps: int = 100) -> None:
    """100x documents (500k docs) — the LINEAR-family scale corpus.

    Same replica scheme as docs10x (even original ids stay exact
    copies, odd ids get one per-replica suffix token) so the two
    corpora are structurally comparable — but this one exists for the
    operators whose COST is linear in docs (d05/d30/d28/d31/d34): the
    quadratic-OUTPUT ops (d07/d09/d32 — pair counts grow with
    dup-family size squared) are measured at 10x where their output
    is still countable; at 100x the same replica scheme would emit
    ~24B pairs, which is a property of the corpus generator, not the
    engine. A 100-deep union chain would build a 100-legs-deep plan
    tree; a (replica × doc) cross of a 100-row range keeps the build
    itself one scan."""
    spark = get_spark(app_name="build-docs100x")
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    r = F.col("rep")
    alld = (
        d.crossJoin(spark.range(reps).select(F.col("id").cast("int").alias("rep")))
        .withColumn(
            "text",
            F.when(
                (F.col("doc_id") % 2 == 1) & (r > 0),
                F.concat("text", F.lit(" xrep"), r.cast("string")),
            ).otherwise(F.col("text")),
        )
        .withColumn("doc_id", F.col("doc_id") + r.cast("long") * 10000)
        .drop("rep")
    )
    alld.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"wrote {out}/documents.parquet ({reps}x)")


def build_docsalt100x(out: str = "/tmp/sfsalt100", reps: int = 100) -> None:
    """100x documents (500k docs) with per-replica TOKEN SALTING — the
    span-dedup scale corpus (r10).

    docs100x's replica scheme makes every k-gram's document frequency
    grow with the replica count (even-id docs are exact copies, and an
    odd-id suffix token only perturbs the last k-1 shingles), so any
    pair-forming operator sees Θ(reps²) blowup per gram — a property
    of the GENERATOR, not the engine (the same argument that keeps
    d07/d09/d32 measured at 10x). Here every token of replica r>0 is
    prefixed `r{r}x`, making replica vocabularies pairwise DISJOINT:
    each replica reproduces sf0.1's natural duplication structure
    exactly, and no gram crosses replicas. That is the honest shape of
    "100x more data at the same duplication density" — what a 100 TB
    crawl shard looks like relative to a 1 TB one — and it carries an
    EXACT oracle: every span statistic must be precisely 100x the
    sf0.1 value (replica 0 is sf0.1 verbatim; salting is a bijection
    on each other replica's token stream, so gram equality structure
    is preserved within a replica and impossible across them, modulo
    ~2^-60 hash collisions)."""
    spark = get_spark(app_name="build-docsalt100x")
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    r = F.col("rep")
    salted = F.regexp_replace(
        F.col("text"),
        F.lit(r"(\S+)"),
        F.concat(F.lit("r"), r.cast("string"), F.lit("x$1")),
    )
    alld = (
        d.crossJoin(spark.range(reps).select(F.col("id").cast("int").alias("rep")))
        .withColumn("text", F.when(r > 0, salted).otherwise(F.col("text")))
        .withColumn("doc_id", F.col("doc_id") + r.cast("long") * 10000)
        .drop("rep")
    )
    alld.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print(f"wrote {out}/documents.parquet ({reps}x, token-salted)")


def build_vecs50x(out: str = "/tmp/sfvec50") -> None:
    spark = get_spark(app_name="build-vecs50x")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    reps = [e]
    for r in range(1, 50):
        jitter = F.transform(
            F.col("embedding"),
            # deterministic per-(replica, position) jitter in ±0.005
            lambda x, i: x
            + (
                F.conv(F.substring(F.md5(F.concat_ws("_", F.lit(r), i)), 1, 6), 16, 10)
                .cast("long")
                % 1001
                - 500
            ).cast("float")
            / F.lit(100000.0),
        )
        er = (
            e.withColumn("embedding", jitter)
            .withColumn("vec_id", F.col("vec_id") + F.lit(r * 100000))
        )
        reps.append(er)
    alle = reps[0]
    for x in reps[1:]:
        alle = alle.union(x)
    alle.repartition(16).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"wrote {out}/embeddings.parquet")


def build_vecs500x(out: str = "/tmp/sfvec500", reps: int = 500) -> None:
    """1M vectors (500x sf0.1) — the IVF-PQ scale corpus. Same jitter
    scheme as vecs50x but built as one (replica × vector) cross so the
    plan isn't a 500-legs union; the md5 jitter keys on (replica,
    position) exactly like vecs50x, so the 50x corpus is a strict
    prefix of this one's structure."""
    spark = get_spark(app_name="build-vecs500x")
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    r = F.col("rep")
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("rep").cast("string"), i)), 1, 6
                ),
                16,
                10,
            )
            .cast("long")
            % 1001
            - 500
        ).cast("float")
        / F.lit(100000.0),
    )
    alle = (
        e.crossJoin(spark.range(reps).select(F.col("id").cast("int").alias("rep")))
        .withColumn("embedding", F.when(r > 0, jitter).otherwise(F.col("embedding")))
        .withColumn("vec_id", F.col("vec_id") + r.cast("long") * 100000)
        .drop("rep")
    )
    alle.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print(f"wrote {out}/embeddings.parquet ({reps}x)")


def build_rel10x(out: str = "/tmp/sfrel10") -> None:
    import os

    spark = get_spark(app_name="build-rel10x")
    shifted = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
    }
    for tbl, cols in shifted.items():
        d = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        reps = [d]
        for r in range(1, 10):
            dr = d
            for c in cols:
                dr = dr.withColumn(c, F.col(c) + F.lit(r * 10_000_000))
            reps.append(dr)
        alld = reps[0]
        for x in reps[1:]:
            alld = alld.union(x)
        alld.repartition(16).write.mode("overwrite").parquet(
            f"{out}/{tbl}.parquet"
        )
        print(f"wrote {out}/{tbl}.parquet")
    for tbl in ("region", "nation", "customer", "supplier", "part",
                "documents", "embeddings"):
        dst = f"{out}/{tbl}.parquet"
        if not os.path.lexists(dst):
            os.symlink(f"{SRC}/{tbl}.parquet", dst)
    print(f"symlinked dimension tables from {SRC}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "docs10x"
    {"docs10x": build_docs10x, "docs100x": build_docs100x,
     "docs1000x": lambda: build_docs100x(out="/tmp/sf1x1000", reps=1000),
     "docsalt100x": build_docsalt100x,
     "docsalt1000x": lambda: build_docsalt100x(out="/tmp/sfsalt1000",
                                               reps=1000),
     "vecs50x": build_vecs50x, "vecs500x": build_vecs500x,
     "rel10x": build_rel10x}[which]()
