"""Pins of Spark behaviors this engine depends on (or defends against).

If a Spark upgrade flips one of these, operators relying on the
documented behavior need re-auditing — better a failing pin here than
a silent value change in production.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lateral_alias_resolution_differs_inside_lambdas(spark):
    """In one select list, a plain column reference resolves against
    the CHILD plan, but the same reference inside a higher-order-
    function lambda resolves against the select list's LATERAL alias.
    s09_quantize_int8 was silently corrupted by this (rounded scale
    fed to the reconstruction-error lambda); every operator now stages
    lambda-consumed columns before introducing shadowing aliases.
    If this test fails after a Spark upgrade, the resolution rules
    changed — re-audit the staging comments referencing it."""
    df = spark.createDataFrame([([1.0, 2.0], 0.123456789)], "v array<double>, s double")
    out = df.select(
        F.round("s", 2).alias("s"),
        (F.col("s") * 1).alias("plain_ref"),
        F.transform("v", lambda x: x * F.col("s")).alias("lambda_ref"),
    ).collect()[0]
    assert out.plain_ref == 0.123456789  # child wins outside lambdas
    assert out.lambda_ref[0] == 0.12  # lateral alias wins inside lambdas


def test_division_by_zero_yields_null_not_nan(spark):
    """Non-ANSI Spark division by zero returns NULL (not inf/NaN) for
    doubles — the Jaccard/cosine operators rely on `x/0 -> NULL ->
    filtered out` matching DuckDB's NULL-on-zero-divide."""
    row = spark.createDataFrame([(1.0, 0.0)], "a double, b double").select(
        (F.col("a") / F.col("b")).alias("q")
    ).collect()[0]
    assert row.q is None


def test_array_sort_structs_orders_by_fields_in_sequence(spark):
    """array_sort on structs orders by the first field, then the
    second — the in-row nprobe cell selection and the LSH tie-break
    (cos desc via reverse, then -cell for lower-cell-wins) depend on
    this field-order semantics."""
    rows = spark.createDataFrame([(1,)], "x int").select(
        F.reverse(
            F.array_sort(
                F.array(
                    F.struct(F.lit(1.0).alias("c"), F.lit(-2).alias("nc")),
                    F.struct(F.lit(1.0).alias("c"), F.lit(-1).alias("nc")),
                    F.struct(F.lit(0.5).alias("c"), F.lit(-3).alias("nc")),
                )
            )
        ).alias("sorted")
    ).collect()[0].sorted
    # reverse(asc) = c desc; ties on c -> nc desc = cell asc
    assert [(r.c, r.nc) for r in rows] == [(1.0, -1), (1.0, -2), (0.5, -3)]


def test_text_operators_survive_empty_documents(spark, tmp_path):
    """Hostile-corpus robustness: empty / whitespace-only / single-
    token documents must yield NULL ratios (dropped by downstream
    filters), never a SparkArithmeticException. Spark 4 defaults ANSI
    mode ON where x/0 throws; the engine pins ansi.enabled=false in
    its runtime confs (session.py) to match the reference's non-ANSI
    arithmetic — this test drives the operators most exposed to zero
    denominators over exactly such a corpus."""
    from pyspark.sql import functions as F

    from indexr_spark.operators import text as T

    docs = [(0, "a b c d"), (1, ""), (2, "word"), (3, "a b c d"), (4, "   ")]
    df = (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.col("doc_id").cast("string"))
        .withColumn("source", F.col("doc_id").cast("string"))
    )
    path = str(tmp_path / "hostile")
    df.write.parquet(f"{path}/documents.parquet")
    for name in (
        "d01_token_stats",
        "d02_lang_id",
        "d07_minhash_lsh",
        "d09_ngram_jaccard",
        "d11_bpe_tokens",
        "d14_normalize_text",
        "d16_repetition_stats",
    ):
        T.QUERIES[name](spark, path).count()  # must not raise


def test_lit_of_list_expands_to_create_array_not_literal(spark):
    """PySpark's F.lit(list) does NOT produce a single array Literal —
    it expands to an n-child CreateArray (one Literal per element).
    ConstantFolding collapses it in the OPTIMIZED plan, but building
    one such expression per centroid/plane still fans out analysis and
    codegen cost linearly (the r3 s06 3.7x regression). The fix that
    holds: one 2-D literal + one transform lambda (_argmax_cell). If
    this pin fails, lit(list) became a true Literal and the workaround
    can be revisited."""
    plan = (
        spark.range(1)
        .select(F.lit([1.0, 2.0, 3.0]).alias("a"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "array(1.0, 2.0, 3.0)" in plan  # CreateArray, not Literal


def test_argmax_cell_expression_stays_constant_size(spark):
    """Budget pin for the IVF assignment projection: the analyzed plan
    of _argmax_cell over k centroids must not grow with k beyond the
    2-D literal's own values — i.e. the expression is ONE transform
    lambda, not k per-centroid subtrees. Guards against the r3
    regression shape creeping back (10 centroids -> ~6,400 expression
    nodes -> 3.7x slowdown)."""
    from indexr_spark.operators.similarity import _argmax_cell

    df = spark.createDataFrame([([1.0] * 8,)], "e array<double>")

    def structure_nodes(k: int) -> tuple[int, int]:
        p = (
            df.select(_argmax_cell([[float(i + j) for j in range(8)] for i in range(k)]))
            ._jdf.queryExecution()
            .analyzed()
            .toString()
        )
        # the literal payload grows with k by design; the expression
        # STRUCTURE (lambda/fold nodes) must not
        return p.count("lambdafunction"), p.count("aggregate(")

    assert structure_nodes(20) == structure_nodes(2)


def test_lsh_oracle_parity_on_hostile_corpus(spark, tmp_path):
    """r3 ADVICE: docs with EMPTY token sets used to share the
    md5('') canon gid and pair with each other through the
    within-group leg, while the DuckDB oracle silently drops them
    (unnest over an empty token list emits no signature rows) — a
    latent hash mismatch on any corpus with >= 2 empty docs. The
    hostile test above only asserted no-raise; this one asserts full
    oracle parity on a corpus with two empty, one whitespace-only,
    and two single-token docs.

    Docs 8-10 pin the set-vs-sequence distinction that makes
    _canon_groups' representative-text fetch safe: all three share
    the distinct token SET {a, b} (one canon group, identical minhash
    signatures regardless of WHICH member's text computes them — the
    r4 rework switched any_text from min(text) to the rep's text),
    but their shingle sets differ (order/multiplicity), so d09's
    per-doc Jaccard verify must still read each doc's own sequence."""
    import duckdb

    from indexr_spark.operators import text as T

    docs = [
        (0, "a b c d e"),
        (1, ""),
        (2, ""),
        (3, "   "),
        (4, "word"),
        (5, "word"),
        (6, "a b c d e"),
        (7, "a b c d x"),
        (8, "b a"),
        (9, "a b"),
        (10, "a b b"),
    ]
    df = (
        spark.createDataFrame(docs, "doc_id long, text string")
        .withColumn("lang", F.lit("en"))
        .withColumn("source", F.lit("t"))
    )
    path = str(tmp_path / "hostile")
    df.write.parquet(f"{path}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{path}/documents.parquet/*.parquet')"
    )
    for name in ("d07_minhash_lsh", "d09_ngram_jaccard"):
        srows = sorted(tuple(r) for r in T.QUERIES[name](spark, path).collect())
        orows = sorted(tuple(r) for r in con.execute(T.ORACLE[name]).fetchall())
        assert srows == orows, (name, srows, orows)
