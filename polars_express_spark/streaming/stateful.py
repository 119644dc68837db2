"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9; the escape hatch for semantics F.session_window can't
express — here: sessions that also carry value totals and an event
count, emitted exactly once when the session closes).

State model (per user_id): one open session (start_us, end_us, n,
total) in micros-epoch longs. An incoming batch merges events in event-
time order: within `gap` of the open session extends it; a later event
closes the open session (emitted) and opens a new one. An event-time
timeout emits the open session once the watermark passes session end +
gap — so every session is emitted exactly once, with bounded state
(one row per active user).

At 100 TB: state lives in the state store keyed by user_id — the same
skew story as any shuffle key; the per-group pandas work is O(batch)
with no cross-group coupling.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint, total double"

US = 1_000_000


def session_stats(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Gap-sessionization with per-session value totals, exactly-once
    emission on close (event-time timeout)."""
    gap_us = gap_minutes * 60 * US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(sess):
            start_us, end_us, n, total = sess
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )

        if state.hasTimedOut:
            if state.exists:
                sess = tuple(state.get)
                state.remove()
                yield emit(sess)
            return

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ts")
        cur = tuple(state.get) if state.exists else None
        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if cur is not None and ts_us <= cur[1] + gap_us:
                cur = (cur[0], max(cur[1], ts_us), cur[2] + 1, cur[3] + float(value))
            else:
                if cur is not None:
                    yield emit(cur)
                cur = (ts_us, ts_us, 1, float(value))
        if cur is not None:
            state.update(cur)
            # emit once the watermark passes end + gap
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "total_value"
        )
    )


def batch_session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin of session_stats (same output schema) — the golden
    reference: sessionize with a lag/cumsum window instead of state.

    Gap compare runs in MICROSECONDS (unix_micros), the same precision
    the streaming operator uses — a seconds-cast here would sessionize
    events separated by gap ± sub-second amounts differently between the
    two formulations."""
    from pyspark.sql import Window as W

    gap_us = gap_minutes * 60 * US
    w = W.partitionBy("user_id").orderBy("ts")
    ts_us = F.unix_micros(F.col("ts"))
    new_sess = (ts_us - F.lag(ts_us).over(w) > gap_us).cast("int")
    sess_id = F.sum(F.coalesce(new_sess, F.lit(0))).over(
        W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        events.withColumn("sess_id", sess_id)
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("sess_id")
    )
