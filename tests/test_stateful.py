"""Golden tests for the applyInPandasWithState custom sessionizer
(SURVEY.md §2.9): hand-built micro-batches with known session structure,
plus streaming-equals-batch on a static directory once all sessions can
close.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from polars_express_spark.streaming.stateful import batch_session_stats, session_stats
from polars_express_spark.streaming.windows import stream_events


def _write_events(spark, rows, path):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    df.select(
        "event_id",
        (F.unix_micros("ts") * 1000).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.mode("append").parquet(path)


def test_stateful_sessionizer_golden(spark, tmp_path):
    """user 1: events at +0, +5 (one session), +120 (new session: closes
    the first). The second session closes via event-time timeout once the
    watermark (far-future user-9 event, 1 h lag) passes end + gap."""
    path = str(tmp_path / "sess_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    _write_events(
        spark,
        [
            (1, ts(0), 1, "click", 1.0, "{}"),
            (2, ts(5), 1, "click", 2.0, "{}"),
        ],
        path,
    )
    sessions = session_stats(stream_events(spark, path), gap_minutes=30)
    q = sessions.writeStream.outputMode("append").format("memory").queryName("t_sessz").start()
    try:
        q.processAllAvailable()
        # batch 2: +120 starts session 2 and closes session 1 inline
        _write_events(spark, [(3, ts(120), 1, "click", 4.0, "{}")], path)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM t_sessz").collect()
        assert [(r["user_id"], r["session_start"], r["n_events"], r["total_value"]) for r in rows] == [
            (1, t0, 2, 3.0)
        ]
        # batch 3: far-future event advances the watermark past
        # session-2-end + gap → timeout emits session 2 exactly once
        _write_events(spark, [(9, ts(600), 9, "click", 0.0, "{}")], path)
        q.processAllAvailable()
        _write_events(spark, [(10, ts(1200), 9, "click", 0.0, "{}")], path)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"], r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM t_sessz WHERE user_id = 1").collect()
        }
        assert got == {(1, t0, 2, 3.0), (1, ts(120), 1, 4.0)}
    finally:
        q.stop()


def test_stateful_sessionizer_equals_batch_twin(spark, tmp_path):
    """Multi-user random-ish fixture: every streaming-emitted session must
    match the batch window sessionization exactly (for sessions the
    watermark was able to close)."""
    path = str(tmp_path / "sess_eq")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    fixture = [
        (1, ts(0), 1, "a", 1.0, "{}"),
        (2, ts(10), 1, "a", 2.0, "{}"),
        (3, ts(70), 1, "a", 3.0, "{}"),
        (4, ts(5), 2, "a", 4.0, "{}"),
        (5, ts(90), 2, "a", 5.0, "{}"),
        (6, ts(95), 2, "a", 6.0, "{}"),
    ]
    _write_events(spark, fixture, path)
    q = (
        session_stats(stream_events(spark, path), gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_eq")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(spark, [(99, ts(2000), 9, "a", 0.0, "{}")], path)
        q.processAllAvailable()
        _write_events(spark, [(100, ts(4000), 9, "a", 0.0, "{}")], path)
        q.processAllAvailable()
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM t_sess_eq WHERE user_id IN (1,2)").collect()
        }
        batch_df = spark.createDataFrame(
            [(e[0], e[1], e[2], e[3], e[4], e[5]) for e in fixture],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )
        want = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
            for r in batch_session_stats(batch_df, gap_minutes=30).collect()
        }
        assert got == want and len(got) == 4
    finally:
        q.stop()
