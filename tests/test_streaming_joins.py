"""Golden tests for stream-static and stream-stream joins (SURVEY.md
§2.9 last row): stream-static enrichment must equal the equivalent batch
join; the stream-stream interval join is checked against a hand-built
micro-batch fixture with known matches.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.streaming.joins import clicks_before_errors, enrich_with_dims
from polars_express_spark.streaming.windows import run_to_memory, stream_events
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream_join")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "events.parquet")
    return str(d)


def test_stream_static_enrich_equals_batch(spark, events_dir):
    customer = load_table(spark, SF_DIR, "customer")
    nation = load_table(spark, SF_DIR, "nation")
    enriched = enrich_with_dims(stream_events(spark, events_dir), customer, nation)
    q = run_to_memory(enriched, "t_enrich", output_mode="append")
    try:
        got = {
            (r["event_id"], r["customer_name"], r["nation_name"])
            for r in spark.sql("SELECT event_id, customer_name, nation_name FROM t_enrich").collect()
        }
        batch = enrich_with_dims(load_table(spark, SF_DIR, "events"), customer, nation)
        want = {
            (r["event_id"], r["customer_name"], r["nation_name"])
            for r in batch.select("event_id", "customer_name", "nation_name").collect()
        }
        assert got == want and got
    finally:
        q.stop()


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


def test_stream_stream_interval_join(spark, tmp_path):
    """error@t+05 by user 1 matches clicks at t+01 and t+03 (within the
    10-min lookback) but not user 2's click, nor the click 40 min before
    the second error."""
    path = str(tmp_path / "ss_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    _write_events(
        spark,
        [
            (1, ts(1), 1, "click", 1.0, "{}"),
            (2, ts(3), 1, "click", 2.0, "{}"),
            (3, ts(2), 2, "click", 9.0, "{}"),
            (4, ts(5), 1, "error", 0.0, "{}"),
            (5, ts(10), 3, "click", 5.0, "{}"),
            (6, ts(50), 3, "error", 0.0, "{}"),  # click 40 min earlier: outside lookback
        ],
        path,
    )
    joined = clicks_before_errors(stream_events(spark, path), lookback="10 minutes")
    q = joined.writeStream.outputMode("append").format("memory").queryName("t_ss").start()
    try:
        q.processAllAvailable()
        # advance watermarks so buffered matches flush in append mode
        _write_events(spark, [(7, ts(600), 9, "click", 0.0, "{}"),
                              (8, ts(600), 9, "error", 0.0, "{}")], path)
        q.processAllAvailable()
        got = {
            (r["error_id"], r["user_id"], r["click_value"])
            for r in spark.sql("SELECT * FROM t_ss WHERE error_id <> 8").collect()
        }
        assert got == {(4, 1, 1.0), (4, 1, 2.0)}
    finally:
        q.stop()


def test_stream_static_range_join_equals_batch(spark, events_dir):
    """The bucketed range join is STATELESS (explode + equi-join +
    filter), so it runs unchanged on a streaming left side — the
    stream-static temporal-enrichment shape. Golden: streaming result ≡
    batch result on the same events."""
    from polars_express_spark.operators.range_join import bucketed_range_join
    from polars_express_spark.queries.advanced import daytime_intervals

    iv = daytime_intervals(spark)
    streamed = bucketed_range_join(
        stream_events(spark, events_dir).select("event_id", "ts"),
        iv, "ts", "w_start", "w_end", bucket_seconds=43200,
    ).select("event_id", "iv_id")
    q = run_to_memory(streamed, "t_range_join", output_mode="append")
    try:
        got = {
            (r["event_id"], r["iv_id"])
            for r in spark.sql("SELECT * FROM t_range_join").collect()
        }
        batch = bucketed_range_join(
            load_table(spark, SF_DIR, "events").select("event_id", "ts"),
            iv, "ts", "w_start", "w_end", bucket_seconds=43200,
        )
        want = {(r["event_id"], r["iv_id"]) for r in batch.collect()}
        assert got == want and got
    finally:
        q.stop()
