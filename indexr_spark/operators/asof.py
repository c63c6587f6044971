"""As-of join — an operator Spark lacks natively, composed from
built-in window functions (preference order (a) from the build rules:
composition beats a Pandas UDF here — no Python boundary, one shuffle).

Semantics: for each left row, attach the most recent right row whose
timestamp is <= the left timestamp, per key (the classic trades ⋈
quotes join). Implementation: union both sides tagged, order by
(ts, side) per key, and carry the last-seen right value forward with
last(..., ignorenulls=True) — a single window pass, no range
explosion, no per-key Python. DuckDB verifies with its native
ASOF JOIN.

Scale: one shuffle on the key, one ordered window scan — the same
cost profile as DuckDB/kdb native as-of machinery; skew on the key is
the only hazard (AQE or key-salting applies as usual).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from indexr_spark.tables import load_table

ORACLE: dict[str, str] = {}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of join: left rows pick up the latest right row with
    right_ts <= left_ts for the same `on` key.

    Right-side ties on right_ts resolve to the row seen latest in the
    (ts, original order) sequence — pin order upstream if it matters.
    """
    lt = left.withColumn("_side", F.lit(1))
    # The carried value is a STRUCT of the right columns, present on
    # every right row — so last(ignorenulls) skips only left rows, and
    # a right row whose payload columns are legitimately NULL is still
    # "the latest right row" (native ASOF JOIN would surface its NULLs,
    # not an older row's values).
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_asof_payload"),
    )
    # union with side tags; each side's missing columns become nulls
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (_side 0 < 1), so a
    # left row sees a same-timestamp right row — ASOF's `>=` semantics
    w = (
        W.partitionBy(on)
        .orderBy(left_ts, "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    merged = merged.withColumn(
        "_asof_payload", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    for c in right_cols:
        merged = merged.withColumn(c, F.col("_asof_payload")[c])
    return merged.filter(F.col("_side") == 1).drop("_side", "_asof_payload")


def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase events pick up the user's most recent prior-or-equal
    click value (trades⋈quotes shape on the events table). Verified
    against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    joined = asof_join(
        purchases,
        clicks.withColumnRenamed("click_ts", "ts_r"),
        on="user_id",
        left_ts="ts",
        right_ts="ts_r",
        right_cols=["click_value"],
    )
    return (
        joined.filter(F.col("click_value").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("purchase_value"),
            F.round("click_value", 2).alias("click_value"),
        )
        .orderBy("user_id", "event_id")
    )


ORACLE["q25_asof_join"] = """
WITH p AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.event_id,
       round(p.value, 2)       AS purchase_value,
       round(c.click_value, 2) AS click_value
FROM p ASOF JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.user_id, p.event_id
"""


QUERIES = {"q25_asof_join": q25_asof_join}
