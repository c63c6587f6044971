#!/usr/bin/env python
"""Interleaved A/B of the r13 bigram_logprob token-stream pin.

Arm A = HEAD (pinned ex, lazy checkpoint whose materialization doubles
as the t_total count). Arm B = the r12 form reconstructed inline
(separate t_total pre-pass, un-pinned ex re-derived by all four
aggregations). Same session, alternating order per pass, each pass
cal-bracketed — the contention-robust protocol of ab_round6_s11.py.

Usage: python scripts/ab_d38_pin.py [passes] [d38|d42]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from indexr_spark import operators  # noqa: E402
from indexr_spark.functions.text import tokens  # noqa: E402
from indexr_spark.operators import text as T  # noqa: E402
from indexr_spark.session import get_spark  # noqa: E402
from indexr_spark.tables import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"


def bigram_logprob_old(d):
    """The r12 body, verbatim (no pin, separate t_total pass)."""
    base = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    t_total = float(base.select(F.sum(F.size("toks")).alias("t")).first()["t"])
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.get("toks", i).alias("w"),
            F.get("toks", i + 1).alias("w2"),
        ),
    )
    ex = base.select(
        "doc_id", F.size("toks").alias("n"), F.explode(pairs).alias("x")
    ).select("doc_id", "n", "x.pos", "x.w", "x.w2")
    uni = ex.groupBy("w").agg(
        F.count("*").alias("c_uni"), F.count("w2").alias("c_ctx")
    )
    bigr = ex.filter(F.col("w2").isNotNull())
    bg = bigr.groupBy("w", "w2").agg(F.count("*").alias("c_bg"))
    docbg = bigr.groupBy("doc_id", "w", "w2").agg(F.count("*").alias("m"))
    bgterm = (
        docbg.join(bg, ["w", "w2"])
        .join(uni.select("w", "c_ctx"), "w")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("m") * F.log(F.col("c_bg").cast("double") / F.col("c_ctx"))
            ).alias("lp_bg")
        )
    )
    first = (
        ex.filter(F.col("pos") == 0)
        .join(uni.select("w", "c_uni"), "w")
        .select(
            "doc_id",
            "n",
            F.log(F.col("c_uni").cast("double") / F.lit(t_total)).alias("lp0"),
        )
    )
    nll = F.round(
        -(F.col("lp0") + F.coalesce(F.col("lp_bg"), F.lit(0.0))) / F.col("n"), 6
    )
    return (
        first.join(bgterm, "doc_id", "left")
        .select("doc_id", F.col("n").alias("n_tokens"), nll.alias("nll"))
        .withColumn("ppl", F.round(F.exp("nll"), 6))
        .orderBy("doc_id")
    )


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    which = sys.argv[2] if len(sys.argv) > 2 else "d38"
    spark = get_spark(
        app_name="ab-d38-pin",
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1000).count()

    def run_new():
        if which == "d38":
            return operators.QUERIES["d38_bigram_logprob"](spark, SF).count()
        return operators.QUERIES["d42_perplexity_bucket"](spark, SF).count()

    def run_old():
        d = load_table(spark, SF, "documents")
        if which == "d38":
            return bigram_logprob_old(d).count()
        from pyspark.sql import Window as W

        b = (
            bigram_logprob_old(d)
            .withColumn(
                "bucket",
                F.when(F.col("ppl") < T.PPL_T1, F.lit("head"))
                .when(F.col("ppl") < T.PPL_T2, F.lit("middle"))
                .otherwise(F.lit("tail")),
            )
            .join(d.select("doc_id", "source"), "doc_id")
        )
        agg = b.groupBy("source", "bucket").agg(
            F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
        )
        share = F.round(
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(W.partitionBy("source")),
            6,
        )
        return (
            agg.select(
                "source", "bucket", "n_docs", "n_tokens",
                share.alias("token_share"),
            )
            .orderBy("source", "bucket")
            .count()
        )

    # warm both arms
    run_new()
    run_old()
    out = {"passes": [], "which": which}
    a_times, b_times = [], []
    for p in range(passes):
        cal0 = bench._spark_calibration(spark)
        order = ("new", "old") if p % 2 == 0 else ("old", "new")
        rec = {"pass": p, "cal_start": cal0, "order": list(order)}
        for arm in order:
            t0 = time.time()
            (run_new if arm == "new" else run_old)()
            dt = round(time.time() - t0, 3)
            rec[arm] = dt
            (a_times if arm == "new" else b_times).append(dt)
            spark.catalog.clearCache()
        rec["cal_end"] = bench._spark_calibration(spark)
        out["passes"].append(rec)
        print(json.dumps(rec), flush=True)
    out["new_min"] = min(a_times)
    out["old_min"] = min(b_times)
    out["new_wins"] = sum(1 for a, b in zip(a_times, b_times) if a < b)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
