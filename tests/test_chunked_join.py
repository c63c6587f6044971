"""Property pin for functions/joins.chunked_self_join — the pairing
invariant (each unordered pair of same-key rows generated EXACTLY once,
no self-pairs) that both the LSH candidate join and the embedding
near-dup join rely on. A first-attempt variant of the same construction
silently dropped pairs under version races in snapshots (different
module, same class of subtle-join bug) — hence an exhaustive check here
rather than an example test."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from indexr_spark.functions.joins import chunked_self_join


def _pairs_via_chunked(spark, rows, C):
    df = spark.createDataFrame(rows, "k int, oid long")
    j = chunked_self_join(df, key_cols=["k"], order_col="oid", n_chunks=C)
    fwd = F.col("a.oid") < F.col("b.oid")
    out = j.select(
        F.when(fwd, F.col("a.oid")).otherwise(F.col("b.oid")).alias("lo"),
        F.when(fwd, F.col("b.oid")).otherwise(F.col("a.oid")).alias("hi"),
    ).collect()
    return Counter((r.lo, r.hi) for r in out)


def _expected_pairs(rows):
    by_key: dict[int, list[int]] = {}
    for k, oid in rows:
        by_key.setdefault(k, []).append(oid)
    exp = Counter()
    for oids in by_key.values():
        s = sorted(oids)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                exp[(s[i], s[j])] += 1
    return exp


def test_every_unordered_pair_exactly_once_across_chunk_counts(spark):
    """Sweep chunk counts (1, 2, 3, 7, 32) over a dataset with skewed
    keys (one bucket of 12, one of 3, singletons, an empty-key gap):
    the chunked join must emit exactly the same pair multiset as the
    plain O(k^2) construction, for every C."""
    rows = (
        [(1, i) for i in range(12)]
        + [(2, 100 + i) for i in range(3)]
        + [(3, 200)]
        + [(5, 500), (5, 501)]
    )
    exp = _expected_pairs(rows)
    for C in (1, 2, 3, 7, 32):
        got = _pairs_via_chunked(spark, rows, C)
        assert got == exp, (C, got - exp, exp - got)


def test_duplicate_order_values_do_not_pair_with_self(spark):
    """order_col must be unique per key group by contract; rows in
    DIFFERENT key groups may share order values without cross-talk."""
    rows = [(1, 7), (2, 7), (1, 8)]
    got = _pairs_via_chunked(spark, rows, 4)
    assert got == Counter({(7, 8): 1})


def test_single_partition_probe_auto_repartitions_with_warning(spark):
    """The silent failure mode the auto guard exists for: a
    1-partition probe under a broadcast join serializes every pair
    onto one core. With the default (auto), the valve must warn and
    put the (keys, chunk) exchange into the plan; with an explicit
    False it must do neither (the caller measured the exchange
    harmful and owns the decision)."""
    import warnings as w

    rows = [(1, i) for i in range(12)]
    one_part = spark.createDataFrame(rows, "k int, oid long").coalesce(1)
    assert one_part.rdd.getNumPartitions() == 1

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        j = chunked_self_join(one_part, key_cols=["k"], order_col="oid")
        auto_warns = [c for c in caught if "repartition_probe" in str(c.message)]
    assert auto_warns, "auto guard did not warn on a 1-partition probe"
    # the valve's OWN exchange is tagged REPARTITION_BY_COL — Catalyst's
    # ENSURE_REQUIREMENTS exchanges (e.g. under a sort-merge join on this
    # stats-free test frame) also say hashpartitioning, so the tag is the
    # assertion that distinguishes "the guard repartitioned" from "the
    # join planner did"
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_COL" in plan, plan
    # and the pairing invariant is intact through the auto exchange
    got = Counter(
        (min(r["lo"], r["hi"]), max(r["lo"], r["hi"]))
        for r in j.select(
            F.col("a.oid").alias("lo"), F.col("b.oid").alias("hi")
        ).collect()
    )
    assert got == _expected_pairs(rows)

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        j_off = chunked_self_join(
            one_part, key_cols=["k"], order_col="oid", repartition_probe=False
        )
        off_warns = [c for c in caught if "repartition_probe" in str(c.message)]
    assert not off_warns, "explicit False must stay silent"
    plan_off = j_off._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_COL" not in plan_off, plan_off


def test_well_partitioned_probe_stays_exchange_free_under_auto(spark):
    """The d12 regression guard: auto must NOT add the exchange (nor
    warn) when the probe is already distributed — forcing it on d12's
    checkpointed signatures measured 32 s -> 83 s at 10x."""
    import warnings as w

    rows = [(i % 4, i) for i in range(64)]
    multi = spark.createDataFrame(rows, "k int, oid long").repartition(8)
    assert multi.rdd.getNumPartitions() > 1

    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        j = chunked_self_join(multi, key_cols=["k"], order_col="oid")
        auto_warns = [c for c in caught if "repartition_probe" in str(c.message)]
    assert not auto_warns
    # the valve must add no exchange of its own: the only repartition
    # tag in the plan is the caller's round-robin, never the guard's
    # REPARTITION_BY_COL on (k, chunk)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_COL" not in plan, plan
