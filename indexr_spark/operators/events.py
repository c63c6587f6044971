"""Event-stream operators over the `events` table (batch form).

These are the batch equivalents of the reference's realtime-ingest
semantics (SURVEY.md §2.4): Druid-style rollup with
{sum,first,last,min,max} metric aggregators (rt/AggType.java:8-29,
rt/UTF8Row.java:39-64), time treated as an ordinary dimension column
(no windows/watermarks in the reference — §2.5), plus Spark-superset
event analytics (sessionization, hourly windows, JSON extraction,
pivot). The streaming forms live in indexr_spark/streaming/.

first/last parity note: the reference's FIRST/LAST pick the first/last
event *in arrival order* for a dim key (AggType.java:43-85). Batch
arrival order is undefined, so we pin order with the unique event_id:
first = min_by(value, event_id), last = max_by(value, event_id) —
deterministic and identical to DuckDB's arg_min/arg_max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from indexr_spark.tables import load_table

ORACLE: dict[str, str] = {}

SESSION_GAP_SEC = 1800.0


def q20_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-rollup parity: group by dims, merge metrics with
    {sum, min, max, first, last, count} (rt/AggType.java:8-29;
    rollup merge contract rt/UTF8Row.java:39-64). At scale this is a
    single map-side-combined hash aggregate over the dims."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.min_by("value", "event_id").alias("first_value"),
            F.max_by("value", "event_id").alias("last_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_date", "event_type")
    )


ORACLE["q20_events_rollup"] = """
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
       event_type,
       round(sum(value), 2)        AS sum_value,
       min(value)                  AS min_value,
       max(value)                  AS max_value,
       arg_min(value, event_id)    AS first_value,
       arg_max(value, event_id)    AS last_value,
       count(*)                    AS n_events
FROM events
GROUP BY 1, 2
ORDER BY event_date, event_type
"""


def q21_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min): lag + running flag-sum per
    user, then per-session aggregation. The reference has no session
    concept (SURVEY.md §2.5) — this is a required training-pipeline
    superset op. Both window and groupBy partition on user_id, so the
    second aggregation reuses the shuffle under AQE."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("double")
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.select("user_id", "event_id", sec.alias("sec")).withColumn(
        "new_sess",
        F.when(
            F.lag("sec").over(w).isNull()
            | ((F.col("sec") - F.lag("sec").over(w)) > SESSION_GAP_SEC),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.count("*").alias("n_events"),
            F.floor(F.max("sec") - F.min("sec")).alias("duration_sec"),
        )
        .orderBy("user_id", "session_seq")
    )


ORACLE["q21_sessionize"] = """
WITH e AS (
  SELECT user_id, event_id, epoch(CAST(ts AS TIMESTAMP)) AS sec FROM events
), flagged AS (
  SELECT user_id, event_id, sec,
         CASE WHEN lag(sec) OVER w IS NULL
                   OR sec - lag(sec) OVER w > 1800.0
              THEN 1 ELSE 0 END AS new_sess
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
), sess AS (
  SELECT user_id, event_id, sec,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(event_id)                          AS first_event_id,
       count(*)                               AS n_events,
       CAST(floor(max(sec) - min(sec)) AS BIGINT) AS duration_sec
FROM sess
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


def q22_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregation expressed as date+hour dims — exactly
    how the reference models time (ordinary dim columns, SURVEY.md
    §2.5; example_schema.json groups by `date`,`datetime`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.to_date("ts").alias("event_date"),
            F.hour("ts").alias("hr"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("event_date", "hr", "event_type")
    )


ORACLE["q22_events_hourly"] = """
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE)           AS event_date,
       CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER)  AS hr,
       event_type,
       count(*)                                      AS n,
       round(sum(value), 2)                          AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY event_date, hr, event_type
"""


ATTR_WINDOW_SEC = 300.0  # 5-minute click→purchase attribution window


def q34_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — the second time-join operator Spark
    lacks natively (with as-of, q25): every (click, purchase) pair of
    the same user where the purchase lands inside the click's
    5-minute window.

    Scale shape: a naive `p.ts BETWEEN c.ts AND c.ts+300` join plans
    as a nested loop over the user's cross product. Instead both
    sides are binned into window-sized time buckets — each interval
    explodes to the ≤2 buckets it covers, each point to exactly one —
    turning the range join into an equi-join on (user, bucket) with
    the exact predicate re-applied. Bucket width = window width
    bounds the blow-up at 2× and the equi-join shuffles on a
    well-distributed composite key. The oracle is the plain
    inequality join, proving the bucketing loses no pairs (floor is
    monotone, so a matching point's bucket always lies inside its
    window's bucket range)."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("double")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        sec.alias("p_sec"),
        F.floor(sec / ATTR_WINDOW_SEC).cast("long").alias("bucket"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        sec.alias("c_sec"),
        F.explode(
            F.sequence(
                F.floor(sec / ATTR_WINDOW_SEC).cast("long"),
                F.floor((sec + ATTR_WINDOW_SEC) / ATTR_WINDOW_SEC).cast("long"),
            )
        ).alias("bucket"),
    )
    return (
        p.join(c, ["user_id", "bucket"])
        .filter(
            (F.col("p_sec") >= F.col("c_sec"))
            & (F.col("p_sec") <= F.col("c_sec") + ATTR_WINDOW_SEC)
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.floor(F.col("p_sec") - F.col("c_sec")).cast("long").alias("lag_sec"),
        )
        .orderBy("user_id", "click_id", "purchase_id")
    )


ORACLE["q34_range_join"] = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch(CAST(ts AS TIMESTAMP)) AS p_sec
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, epoch(CAST(ts AS TIMESTAMP)) AS c_sec
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, click_id, purchase_id,
       CAST(floor(p_sec - c_sec) AS BIGINT) AS lag_sec
FROM p JOIN c ON p.user_id = c.user_id
            AND p_sec >= c_sec AND p_sec <= c_sec + 300.0
ORDER BY p.user_id, click_id, purchase_id
"""


def q23_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction — parity with the reference's UTF-8
    JSON event parsing at ingest (rt/UTF8JsonRowCreator.java:14-120,
    indexr-common UTF8JsonDeserializer). get_json_object runs JVM-side
    (no Python boundary) and column-prunes to the one string column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_k_gt50"),
        )
        .orderBy("event_type")
    )


ORACLE["q23_json_props"] = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6)       AS avg_k,
       CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
                     THEN 1 ELSE 0 END) AS BIGINT)                             AS n_k_gt50
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def q24_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into metric columns — one scan, one shuffle
    (Catalyst rewrites pivot to conditional aggregates)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", types)
        .agg(F.round(F.sum("value"), 2))
        .orderBy("event_date")
    )


ORACLE["q24_events_pivot"] = """
SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS event_date,
       round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
       round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
       round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
       round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
FROM events
GROUP BY 1
ORDER BY event_date
"""


def q35_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window: 7-day moving average of daily revenue per
    event type. The RANGE frame (value-based, vs q15's ROWS frame)
    picks up exactly the trailing week even when days are missing —
    the gap semantics ROWS frames get wrong. Partitioned by
    event_type, so the window state distributes; the daily pre-
    aggregation shrinks the window input to |types|×|days| rows."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("double") / 86400.0).cast("long")
    daily = (
        ev.groupBy("event_type", day.alias("day"))
        .agg(F.sum("value").alias("day_value"))
    )
    w = W.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    return (
        daily.select(
            "event_type",
            "day",
            F.round("day_value", 2).alias("day_value"),
            F.round(F.avg("day_value").over(w), 6).alias("week_avg"),
            F.count("*").over(w).alias("days_in_window"),
        )
        .orderBy("event_type", "day")
    )


ORACLE["q35_moving_avg"] = """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400.0) AS BIGINT) AS day,
         sum(value) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT event_type, day,
       round(day_value, 2) AS day_value,
       round(avg(day_value) OVER w, 6) AS week_avg,
       count(*) OVER w AS days_in_window
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


def q36_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group WITHOUT a window: max_by over a composite order
    struct gets each user's latest event in ONE partial+final
    aggregation — no per-partition sort, no row_number. At scale this
    beats the window formulation (q08) whenever k=1: the combiner
    keeps one row per user per partition instead of sorting each
    partition. Tie-break on event_id via the struct's second field."""
    ev = load_table(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts").cast("timestamp").cast("double"), F.col("event_id"))
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_id", ordkey).alias("last_event_id"),
            F.max_by("event_type", ordkey).alias("last_event_type"),
            F.round(F.max_by("value", ordkey), 2).alias("last_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


ORACLE["q36_latest_per_user"] = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       round(value, 2) AS last_value, n_events
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_events
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


def q37_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, the first click and the first
    purchase AFTER that click; conversion = both present in order.
    Two conditional aggregations over one scan — the min-over-filter
    pattern keeps it a single shuffle on user_id (no self-join, no
    window sort). The final rollup is a driver-friendly 1-row summary
    plus per-user detail, so both grains are checked."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("double")
    per_user = (
        ev.select("user_id", "event_type", sec.alias("sec"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("sec"))).alias(
                "first_click"
            ),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", sec.alias("p_sec")
    )
    conv = (
        per_user.join(purchases, "user_id", "left")
        .filter(F.col("p_sec") >= F.col("first_click"))
        .groupBy("user_id", "first_click")
        .agg(F.min("p_sec").alias("first_purchase_after"))
    )
    return (
        per_user.join(conv.select("user_id", "first_purchase_after"), "user_id", "left")
        .filter(F.col("first_click").isNotNull())
        .select(
            "user_id",
            F.floor("first_click").cast("long").alias("click_sec"),
            F.floor(F.coalesce("first_purchase_after", F.lit(-1.0)))
            .cast("long")
            .alias("purchase_sec"),
            F.col("first_purchase_after").isNotNull().alias("converted"),
        )
        .orderBy("user_id")
    )


ORACLE["q37_funnel"] = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click'
                  THEN epoch(CAST(ts AS TIMESTAMP)) END) AS first_click
  FROM events GROUP BY user_id
), conv AS (
  SELECT p.user_id, min(epoch(CAST(e.ts AS TIMESTAMP))) AS first_purchase_after
  FROM per_user p
  JOIN events e ON e.user_id = p.user_id AND e.event_type = 'purchase'
              AND epoch(CAST(e.ts AS TIMESTAMP)) >= p.first_click
  GROUP BY p.user_id
)
SELECT p.user_id,
       CAST(floor(first_click) AS BIGINT) AS click_sec,
       CAST(floor(coalesce(first_purchase_after, -1.0)) AS BIGINT) AS purchase_sec,
       first_purchase_after IS NOT NULL AS converted
FROM per_user p LEFT JOIN conv USING (user_id)
WHERE first_click IS NOT NULL
ORDER BY user_id
"""


def q38_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives + next-day retention: distinct users per day, and
    how many of them return the following day. The (user, day) grain
    is deduplicated FIRST (one map-side-combined distinct), so the
    self-join for "returned tomorrow" runs on |users×days| rows, not
    raw events — the standard cardinality-reduction move before any
    retention/cohort join. At 100 TB the dedup output is orders of
    magnitude smaller than the event log."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("timestamp").cast("double") / 86400.0).cast("long")
    ud = ev.select("user_id", day.alias("day")).distinct()
    nxt = ud.select("user_id", (F.col("day") - 1).alias("day"))
    retained = (
        ud.join(nxt, ["user_id", "day"], "left_semi")
        .groupBy("day")
        .agg(F.count("*").alias("n_retained"))
    )
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(retained, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)).cast("double") / F.col("dau"), 6
            ).alias("retention_rate"),
        )
        .orderBy("day")
    )


ORACLE["q38_retention"] = """
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400.0) AS BIGINT) AS day
  FROM events
), retained AS (
  SELECT a.day, count(*) AS n_retained
  FROM ud a
  WHERE EXISTS (SELECT 1 FROM ud b
                WHERE b.user_id = a.user_id AND b.day = a.day + 1)
  GROUP BY a.day
), dau AS (
  SELECT day, count(*) AS dau FROM ud GROUP BY day
)
SELECT d.day, d.dau,
       coalesce(r.n_retained, 0) AS n_retained,
       round(CAST(coalesce(r.n_retained, 0) AS DOUBLE) / d.dau, 6) AS retention_rate
FROM dau d LEFT JOIN retained r USING (day)
ORDER BY day
"""


def q47_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling per event type: variance, skewness, and
    excess kurtosis computed from raw power sums (Σv, Σv², Σv³, Σv⁴)
    with the moment algebra applied in the projection.

    Built-in skewness/kurtosis are NOT used deliberately: engines
    disagree on sample-vs-population adjustment (Spark emits the
    population form, DuckDB the sample-adjusted form), so the
    cross-engine-stable formulation is the raw sums — which is also
    the scale-friendly one: four map-combined sums per group, one
    shuffle, and the sums are exactly the mergeable state a streaming
    profiler would checkpoint."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    v = F.col("value").cast("double")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    var = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * F.col("s2") / n + 2 * mean * mean * mean
    m4 = (
        F.col("s4") / n
        - 4 * mean * F.col("s3") / n
        + 6 * mean * mean * F.col("s2") / n
        - 3 * mean * mean * mean * mean
    )
    return g.select(
        "event_type",
        "n",
        F.round(mean, 6).alias("mean_value"),
        F.round(var, 6).alias("var_pop"),
        F.round(m3 / F.pow(var, 1.5), 6).alias("skewness_pop"),
        F.round(m4 / (var * var) - 3, 6).alias("kurtosis_excess"),
    ).orderBy("event_type")


ORACLE["q47_moment_stats"] = """
WITH g AS (
  SELECT event_type,
         count(*) AS n,
         sum(value) AS s1,
         sum(value * value) AS s2,
         sum(value * value * value) AS s3,
         sum(value * value * value * value) AS s4
  FROM events
  WHERE value IS NOT NULL
  GROUP BY event_type
), m AS (
  SELECT event_type, n,
         s1 / n AS mean,
         s2 / n - (s1 / n) * (s1 / n) AS var,
         s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
         s4 / n - 4 * (s1 / n) * s3 / n + 6 * (s1 / n) * (s1 / n) * s2 / n
           - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
  FROM g
)
SELECT event_type, n,
       round(mean, 6)                 AS mean_value,
       round(var, 6)                  AS var_pop,
       round(m3 / pow(var, 1.5), 6)   AS skewness_pop,
       round(m4 / (var * var) - 3, 6) AS kurtosis_excess
FROM m
ORDER BY event_type
"""


QUERIES = {
    "q20_events_rollup": q20_events_rollup,
    "q21_sessionize": q21_sessionize,
    "q22_events_hourly": q22_events_hourly,
    "q23_json_props": q23_json_props,
    "q24_events_pivot": q24_events_pivot,
    "q34_range_join": q34_range_join,
    "q35_moving_avg": q35_moving_avg,
    "q36_latest_per_user": q36_latest_per_user,
    "q37_funnel": q37_funnel,
    "q38_retention": q38_retention,
    "q47_moment_stats": q47_moment_stats,
}
