"""Custom stateful streaming operators — applyInPandasWithState.

The reference has no stateful streaming at all (its realtime rollup is
dim-equality within one in-memory segment, SURVEY.md §2.5); these are
the Spark-superset operators a long-running ingest pipeline needs when
per-key state must outlive a micro-batch.

`sessionize_stream` is the canonical custom stateful op: per-user
sessions closed by an inactivity gap. In-batch gaps emit immediately;
the trailing open session is held in state with an *event-time*
timeout, so it closes exactly when the watermark passes last_seen +
gap — bounded state, deterministic against replays, and no wall-clock
dependence (replay-safe, unlike ProcessingTimeTimeout).

`session_window_metrics` is the built-in-operator alternative
(F.session_window): prefer it when plain per-session aggregates
suffice; the applyInPandasWithState form is for genuinely custom
state machines (e.g. emit-on-gap with custom merge or side outputs).

Scale: state is partitioned by the grouping key across executors; the
watermark bounds both late data and state lifetime. The per-key state
row is O(1) — four scalars — regardless of session length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
SESSION_STATE_SCHEMA = "start long, last long, n int, s double"


def _make_session_fn(gap_ms: int):
    """Build the per-key state function as a self-contained closure
    (cloudpickle by-value — Python workers never import indexr_spark).
    """

    def fn(key, pdfs, state):
        import pandas as pd

        def emit(start_ms, last_ms, n, s):
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.to_datetime(start_ms, unit="ms")],
                    "session_end": [pd.to_datetime(last_ms, unit="ms")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )

        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield emit(start, last, n, s)
            return

        data = pd.concat(list(pdfs)).sort_values("ts")
        ts_ms = (data["ts"].astype("int64") // 1_000_000).tolist()
        vals = data["value"].tolist()

        if state.exists:
            start, last, n, s = state.get
        else:
            start, last, n, s = ts_ms[0], ts_ms[0], 0, 0.0

        closed = []
        for t, v in zip(ts_ms, vals):
            if n > 0 and t - last > gap_ms:
                closed.append((start, last, n, s))
                start, last, n, s = t, t, 0, 0.0
            last = max(last, t)
            n += 1
            s += float(v)

        state.update((start, last, n, s))
        state.setTimeoutTimestamp(last + gap_ms)
        for c in closed:
            yield emit(*c)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-user session aggregation over a stream of (user_id, ts,
    value) events via applyInPandasWithState. Emits one row per
    *closed* session (append mode): closed by an observed in-batch
    gap, or by event-time timeout once the watermark passes
    last_event + gap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes * 60_000),
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_window_metrics(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in session windows (F.session_window): same sessions as
    sessionize_stream when only standard aggregates are needed —
    stays entirely JVM-side."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
