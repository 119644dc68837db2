"""Structured Streaming golden suite (SURVEY.md §2.9, §5.2.2).

No external oracle can replay streaming semantics, so the contract is:
(a) streaming window aggregates over a static directory must equal the
batch corpus results (Spark's unified-model guarantee), and (b) the
watermark/late-data and stateful-dedup behaviors are checked against
hand-built micro-batch fixtures (files appended between triggers become
separate micro-batches).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.queries.registry import all_queries
from polars_express_spark.streaming.windows import (
    dedup_events,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "events.parquet")
    return str(d)


def _rows(spark, name):
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def test_streaming_tumbling_equals_batch(spark, events_dir):
    q = run_to_memory(tumbling_counts(stream_events(spark, events_dir)), "t_tumble")
    try:
        got = _rows(spark, "t_tumble")
        want = {
            (r["win_start"], r["cnt"], float(r["sum_val"]))
            for r in all_queries()["q32_tumbling_window"](spark, SF_DIR).collect()
        }
        got_rounded = {(a, b, round(c, 6)) for a, b, c in got}
        want_rounded = {(a, b, round(c, 6)) for a, b, c in want}
        assert got_rounded == want_rounded
    finally:
        q.stop()


def test_streaming_sliding_equals_batch(spark, events_dir):
    q = run_to_memory(sliding_counts(stream_events(spark, events_dir)), "t_slide")
    try:
        got = {(a, b) for a, b, _ in _rows(spark, "t_slide")}
        want = {
            (r["win_start"], r["cnt"])
            for r in all_queries()["q33_sliding_window"](spark, SF_DIR).collect()
        }
        assert got == want
    finally:
        q.stop()


def test_streaming_session_equals_batch(spark, events_dir):
    q = run_to_memory(
        session_counts(stream_events(spark, events_dir)), "t_sess", output_mode="complete"
    )
    try:
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM t_sess").collect()
        }
        want = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in all_queries()["q_session_window"](spark, SF_DIR).collect()
        }
        assert got == want
    finally:
        q.stop()


def _write_events(spark, rows, path):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    # match the driver's physical layout: ts as nanos-long
    df.select(
        "event_id",
        (F.unix_micros("ts") * 1000).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode tumbling agg with a 10-min watermark: an event arriving
    after the watermark passed its window must be dropped (§2.9
    late-data row). Golden micro-batch fixture, hand-computed."""
    import datetime as dt

    path = str(tmp_path / "late_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    _write_events(
        spark,
        [(1, ts(1), 1, "click", 1.0, "{}"), (2, ts(2), 1, "click", 1.0, "{}")],
        path,
    )
    agg = tumbling_counts(stream_events(spark, path), width="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_late")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: event far in the future advances the watermark past
        # the [0,5) window; batch 3's late event for [0,5) must be dropped
        _write_events(spark, [(3, ts(60), 1, "click", 1.0, "{}")], path)
        q.processAllAvailable()
        _write_events(spark, [(4, ts(3), 1, "late", 9.0, "{}")], path)
        q.processAllAvailable()
        _write_events(spark, [(5, ts(120), 1, "click", 1.0, "{}")], path)
        q.processAllAvailable()
        rows = {
            (r["win_start"], r["cnt"], r["sum_val"])
            for r in spark.sql("SELECT * FROM t_late").collect()
        }
        first_window = [r for r in rows if r[0] == t0]
        # the [00:00,00:05) window emitted with ONLY the 2 on-time events;
        # the late value=9.0 event never appears
        assert first_window == [(t0, 2, 2.0)]
    finally:
        q.stop()


def test_stateful_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a replay of the same event_id within
    the watermark horizon is suppressed (§2.9 stateful dedup row)."""
    import datetime as dt

    path = str(tmp_path / "dup_events")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_events(
        spark,
        [
            (1, t0, 1, "click", 1.0, "{}"),
            (1, t0 + dt.timedelta(seconds=30), 1, "click", 1.0, "{}"),  # dup id
            (2, t0 + dt.timedelta(minutes=1), 1, "view", 2.0, "{}"),
        ],
        path,
    )
    dedup = dedup_events(stream_events(spark, path), watermark="30 minutes")
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = sorted(r["event_id"] for r in spark.sql("SELECT * FROM t_dedup").collect())
        assert ids == [1, 2]
    finally:
        q.stop()


def test_stream_starts_on_empty_source_dir(spark, tmp_path):
    """The kafka-stand-in usage is start-stream-first, drop-files-later:
    an empty (or not yet created) source directory must not crash the
    schema probe — the declared fallback schema takes over."""
    from polars_express_spark.streaming.windows import stream_events

    empty = tmp_path / "events_dir"
    empty.mkdir()
    s = stream_events(spark, str(empty))
    assert s.isStreaming and "ts" in s.columns


def test_streaming_parquet_sink_roundtrip(spark, tmp_path):
    """Watermarked tumbling counts written through the parquet sink
    (append mode, checkpointed) must read back equal to the same
    aggregation computed in batch — the durable-sink twin of the memory
    sink goldens. Two runs against ONE checkpoint: the first drains the
    source (append emits only windows older than the watermark), then a
    far-future flush file arrives and the RESTARTED query advances the
    watermark past every original window and emits the remainder —
    exactly-once file commits plus checkpoint recovery in one test."""
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polars_express_spark.catalog import load_table
    from polars_express_spark.streaming.windows import (
        run_to_parquet,
        stream_events,
        tumbling_counts,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    def run_once():
        stream = tumbling_counts(stream_events(spark, str(src)), watermark="1 hour")
        run_to_parquet(stream, str(out), str(ckpt))

    run_once()
    # flush: one event 10h past the end, written in the source's exact
    # physical schema, advances the watermark beyond all real windows
    orig = pq.read_table(str(src / "events.parquet"))
    pdf = orig.slice(0, 1).to_pandas()
    pdf["ts"] = orig.to_pandas()["ts"].max() + pd.Timedelta(hours=10)
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False).cast(orig.schema),
        str(src / "zz_flush.parquet"),
    )
    run_once()

    batch = tumbling_counts(load_table(spark, SF_DIR, "events")).collect()
    want = {(r["win_start"], r["cnt"], round(r["sum_val"], 6)) for r in batch}
    max_start = max(w[0] for w in want)
    got = {
        (r["win_start"], r["cnt"], round(r["sum_val"], 6))
        for r in spark.read.parquet(str(out)).collect()
        if r["win_start"] <= max_start  # exclude the flush row's window
    }
    assert got == want and got


def test_stream_foreach_batch_appends_to_lake(spark, tmp_path):
    """foreachBatch → DataLake.save(append): the streamed click rows
    must read back from the lake equal to the batch filter."""
    import shutil

    from polars_express_spark.catalog import DataLake, load_table
    from polars_express_spark.streaming.windows import (
        stream_append_to_lake,
        stream_events,
    )

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "events.parquet")
    lake = DataLake(spark, str(tmp_path / "lake"))
    clicks = stream_events(spark, str(src)).where("event_type = 'click'").select(
        "event_id", "user_id", "value"
    )
    stream_append_to_lake(clicks, lake, "clicks", str(tmp_path / "ckpt"))
    got = {
        (r["event_id"], r["user_id"], r["value"])
        for r in lake.load("clicks").collect()
    }
    want = {
        (r["event_id"], r["user_id"], r["value"])
        for r in load_table(spark, SF_DIR, "events")
        .where("event_type = 'click'")
        .collect()
    }
    assert got == want and got


def test_incremental_dedup_against_history_equals_batch(spark, events_dir):
    """Streamed events deduped against a static history key set (every
    3rd event_id) AND against in-stream repeats must equal the batch
    anti-join + distinct on the same inputs."""
    from polars_express_spark.streaming.windows import incremental_dedup

    batch_events = load_table(spark, SF_DIR, "events")
    history = batch_events.where(F.col("event_id") % 3 == 0).select("event_id")
    streamed = incremental_dedup(
        stream_events(spark, events_dir), history, key="event_id"
    ).select("event_id")
    q = run_to_memory(streamed, "t_incdedup", output_mode="append")
    try:
        got = {r["event_id"] for r in spark.sql("SELECT event_id FROM t_incdedup").collect()}
        want = {
            r["event_id"]
            for r in batch_events.join(history, "event_id", "left_anti")
            .select("event_id")
            .distinct()
            .collect()
        }
        assert got == want and got
    finally:
        q.stop()


def test_streaming_cms_merge_equals_batch(spark, tmp_path):
    """Monoid law under micro-batching: folding the stream through
    foreachBatch cms_update + merge must equal ONE batch sketch over
    the same rows, counter-for-counter (exact integers), regardless of
    how the files split into micro-batches."""
    from polars_express_spark.operators.cms import cms_update
    from polars_express_spark.streaming.sketch import stream_cms

    src = str(tmp_path / "etypes")
    batch_events = load_table(spark, SF_DIR, "events").select("event_type", "ts")
    # three files → availableNow consumes them as separate micro-batches
    batch_events.repartition(3).write.mode("overwrite").parquet(src)
    acc, q = stream_cms(
        stream_events(spark, src), "event_type", depth=4, width=64
    )
    try:
        want = {
            (r["i"], r["b"]): r["cnt"]
            for r in cms_update(
                spark.read.parquet(src), "event_type", depth=4, width=64
            ).collect()
        }
        assert acc.counters == want and want
        # point-query the accumulated sketch: never underestimates
        probe = spark.range(1).select(
            *[
                F.pmod(F.xxhash64(F.lit("view"), F.lit(i)), F.lit(64)).alias(f"b{i}")
                for i in range(4)
            ]
        ).collect()[0]
        exact = spark.read.parquet(src).where(F.col("event_type") == "view").count()
        est = acc.estimate([(i, probe[f"b{i}"]) for i in range(4)])
        assert est >= exact
    finally:
        q.stop()


def test_streaming_bloom_dedup_fixed_memory(spark, tmp_path):
    """Fixed-memory approximate stream dedup: with a generously-sized
    bitmap, survivors over 3 micro-batches equal the exact distinct key
    set (fp ≈ 0 at this load); true duplicates can never survive by
    construction; driver state stays exactly m/64 longs."""
    from polars_express_spark.streaming.sketch import stream_bloom_dedup

    src = str(tmp_path / "dedup_src")
    ev = load_table(spark, SF_DIR, "events").select(
        (F.col("event_id") % 500).alias("k"), "value"
    )
    ev.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    acc, q = stream_bloom_dedup(stream, "k", num_bits=1 << 16)
    try:
        got = sorted(r["k"] for r in acc.survivors)
        want = sorted(
            r["k"] for r in spark.read.parquet(src).select("k").distinct().collect()
        )
        assert got == want
        assert len(acc._bf.words) == (1 << 16) // 64  # state never grows
    finally:
        q.stop()


def test_streaming_bloom_probe_broadcasts_bitmap(spark):
    """r7 plan guard for the broadcast-probe rewire: absorb()'s pruned
    frame must attach the bitmap as a 1-row broadcast (exactly one BNLJ,
    the attach) and probe it with bit_get over the frame column —
    NOT rebuild an m/64-element CreateArray literal per row."""
    from polars_express_spark.streaming.sketch import StreamingBloomDedup

    plans: list[str] = []

    def capture(fresh, batch_id):
        plans.append(fresh._jdf.queryExecution().executedPlan().toString())
        fresh.count()  # drive it so the next absorb's bitmap merge is real

    acc = StreamingBloomDedup("k", num_bits=1 << 16, sink_fn=capture)
    batch = spark.range(100).selectExpr("concat('u', id % 40) AS k")
    acc.absorb(batch, 0)
    acc.absorb(batch, 1)
    for p in plans:
        assert "bit_get" in p
        assert p.count("BroadcastNestedLoopJoin") == 1
        assert "CartesianProduct" not in p
        # the 1024-word bitmap must not appear as an expression literal
        assert p.count(",") < 5000, "bitmap inlined as a giant array literal"


def test_streaming_sketch_exactly_once_and_restart(spark):
    """r7: foreachBatch is AT-LEAST-once (a restart re-delivers the last
    uncommitted batch), so both accumulators must treat a replayed
    batch_id as a no-op — same counters, same bitmap, NO duplicate sink
    emission — and snapshot → JSON round-trip → restore → continue must
    equal one uninterrupted run."""
    import json

    from polars_express_spark.streaming.sketch import (
        StreamingBloomDedup,
        StreamingCms,
    )

    b0 = spark.range(60).selectExpr("concat('u', id % 30) AS k")
    b1 = spark.range(60).selectExpr("concat('u', (id % 30) + 20) AS k")

    # --- CMS ---
    cms = StreamingCms("k", depth=4, width=64)
    cms.absorb(b0, 0)
    once = dict(cms.counters)
    cms.absorb(b0, 0)  # restart replay
    assert cms.counters == once
    cms.absorb(b1, 1)
    cms2 = StreamingCms("k", depth=4, width=64)
    cms2.absorb(b0, 0)
    snap = json.loads(json.dumps(cms2.snapshot()))  # proves serializable
    cms3 = StreamingCms.restore(snap)
    cms3.absorb(b0, 0)  # replayed after the restore → no-op
    cms3.absorb(b1, 1)
    assert cms3.counters == cms.counters and cms3.counters

    # --- Bloom dedup ---
    def sink_to(log):
        return lambda df, b: log.append((b, sorted(r["k"] for r in df.collect())))

    seen: list = []
    bd = StreamingBloomDedup("k", num_bits=1 << 14, sink_fn=sink_to(seen))
    bd.absorb(b0, 0)
    words_after0 = bd._bf.words
    bd.absorb(b0, 0)  # restart replay: no re-emit, no state change
    assert len(seen) == 1 and bd._bf.words == words_after0
    bd.absorb(b1, 1)

    seen2: list = []
    bd2 = StreamingBloomDedup("k", num_bits=1 << 14, sink_fn=sink_to(seen2))
    bd2.absorb(b0, 0)
    snap = json.loads(json.dumps(bd2.snapshot()))
    bd3 = StreamingBloomDedup.restore(snap, sink_fn=sink_to(seen2))
    bd3.absorb(b0, 0)  # replay after restore
    bd3.absorb(b1, 1)
    assert bd3._bf.words == bd._bf.words
    assert seen2 == seen


def test_lake_append_sink_idempotent_per_batch(spark, tmp_path):
    """r7: the foreachBatch lake sink must be replay-safe — re-writing
    the SAME batch_id (at-least-once restart replay) replaces that
    batch's partition instead of duplicating rows, while a NEW batch_id
    appends. Readers see the union of batch partitions exactly once."""
    from polars_express_spark.catalog import DataLake
    from polars_express_spark.streaming.windows import write_batch_idempotent

    lake = DataLake(spark, str(tmp_path / "lake"))
    b0 = spark.range(10).selectExpr("id", "id * 2 AS v")
    b1 = spark.range(10, 15).selectExpr("id", "id * 2 AS v")

    write_batch_idempotent(lake, "clicks", "parquet", b0, 0)
    write_batch_idempotent(lake, "clicks", "parquet", b0, 0)  # restart replay
    got = sorted(r["id"] for r in lake.load("clicks").collect())
    assert got == list(range(10)), "replayed batch duplicated rows"

    write_batch_idempotent(lake, "clicks", "parquet", b1, 1)  # new batch appends
    rows = lake.load("clicks").collect()
    assert sorted(r["id"] for r in rows) == list(range(15))
    # lineage column maps every row to the batch that wrote it
    assert {(r["id"] < 10, int(r["__batch_id"])) for r in rows} == {
        (True, 0), (False, 1)
    }


def test_idempotent_sink_refuses_flat_layout(spark, tmp_path):
    """r8 (ADVICE r7): a target populated by the legacy FLAT append
    (lake.save / idempotent=False) must be REFUSED by the partitioned
    idempotent sink — mixing flat part files and __batch_id=N/ dirs in
    one directory breaks Spark partition discovery. A partitioned
    target keeps accepting writes."""
    import pytest

    from polars_express_spark.catalog import DataLake
    from polars_express_spark.streaming.windows import write_batch_idempotent

    lake = DataLake(spark, str(tmp_path / "lake"))
    b = spark.range(5).selectExpr("id", "id * 2 AS v")
    lake.save(b, "legacy", fmt="parquet", mode="append")  # flat layout
    with pytest.raises(ValueError, match="flat"):
        write_batch_idempotent(lake, "legacy", "parquet", b, 0)
    # flat data untouched by the refusal
    assert sorted(r["id"] for r in lake.load("legacy").collect()) == list(range(5))
    # partitioned targets continue to accept both replays and new batches
    write_batch_idempotent(lake, "fresh", "parquet", b, 0)
    write_batch_idempotent(lake, "fresh", "parquet", b, 1)
    assert lake.load("fresh").count() == 10


def test_durable_bloom_dedup_crash_restore_equals_uninterrupted(spark, tmp_path):
    """r8 golden (VERDICT r7 next-step #6): the accumulator snapshot is
    persisted to the lake INSIDE the foreachBatch hook, after the
    batch's idempotent data write — so killing the driver at batch k and
    rebuilding from the lake, then replaying batch k (at-least-once),
    yields the SAME survivors dataset and the SAME bitmap as one
    uninterrupted run. Both crash positions are exercised: after the
    full hook (snapshot present) and between the data write and the
    snapshot (snapshot one batch behind the data)."""
    from polars_express_spark.catalog import DataLake
    from polars_express_spark.streaming.sketch import (
        durable_bloom_dedup,
        load_state,
    )
    from polars_express_spark.streaming.windows import write_batch_idempotent

    batches = [
        spark.range(60).selectExpr("concat('u', id % 30) AS k"),
        spark.range(60).selectExpr("concat('u', (id % 30) + 20) AS k"),
        spark.range(60).selectExpr("concat('u', (id % 30) + 45) AS k"),
    ]

    def read_sorted(lake):
        return sorted(
            (r["k"], int(r["__batch_id"])) for r in lake.load("surv").collect()
        )

    # uninterrupted twin
    lake_u = DataLake(spark, str(tmp_path / "lake_u"))
    acc_u, hook_u = durable_bloom_dedup(lake_u, "surv", key="k", num_bits=1 << 14)
    for i, b in enumerate(batches):
        hook_u(b, i)

    # crash AFTER batch 1's full hook (data + snapshot committed)
    lake_c = DataLake(spark, str(tmp_path / "lake_c"))
    acc1, hook1 = durable_bloom_dedup(lake_c, "surv", key="k", num_bits=1 << 14)
    hook1(batches[0], 0)
    hook1(batches[1], 1)
    del acc1, hook1  # driver process dies
    acc2, hook2 = durable_bloom_dedup(lake_c, "surv", key="k", num_bits=1 << 14)
    assert acc2._last_batch == 1, "construction must restore from the lake"
    hook2(batches[1], 1)  # at-least-once replay of the last batch
    hook2(batches[2], 2)
    assert acc2._bf.words == acc_u._bf.words
    assert read_sorted(lake_c) == read_sorted(lake_u)
    assert load_state(lake_c, "surv") == load_state(lake_u, "surv")

    # crash BETWEEN batch 1's data write and its snapshot: simulate by
    # writing batch 1's survivors directly (as the dead driver did),
    # with the snapshot still at batch 0
    lake_m = DataLake(spark, str(tmp_path / "lake_m"))
    acc3, hook3 = durable_bloom_dedup(lake_m, "surv", key="k", num_bits=1 << 14)
    hook3(batches[0], 0)
    snap_b0 = load_state(lake_m, "surv")
    # the doomed run gets through the data write of batch 1 only
    surv_b1_frame = spark.createDataFrame(
        [(k,) for k, b in read_sorted(lake_c) if b == 1], "k string"
    )
    write_batch_idempotent(lake_m, "surv", "parquet", surv_b1_frame, 1)
    assert load_state(lake_m, "surv") == snap_b0  # snapshot lagging — as on crash
    acc4, hook4 = durable_bloom_dedup(lake_m, "surv", key="k", num_bits=1 << 14)
    assert acc4._last_batch == 0  # restored one batch behind the data
    hook4(batches[1], 1)  # replay re-folds and REWRITES the partition
    hook4(batches[2], 2)
    assert acc4._bf.words == acc_u._bf.words
    assert read_sorted(lake_m) == read_sorted(lake_u)


def test_durable_cms_raw_write_crash_restore(spark, tmp_path):
    """r8: the CMS twin of the durable-restore golden — raw batches land
    idempotently via durable_foreach_batch(write_raw=True), the sketch
    snapshot rides the same hook; crash after batch k, restore from the
    lake, replay batch k → counters and lake rows equal an uninterrupted
    run."""
    from polars_express_spark.catalog import DataLake
    from polars_express_spark.streaming.sketch import (
        StreamingCms,
        durable_foreach_batch,
        load_state,
    )

    batches = [
        spark.range(50).selectExpr("concat('u', id % 25) AS k"),
        spark.range(50).selectExpr("concat('u', (id % 25) + 10) AS k"),
    ]

    lake_u = DataLake(spark, str(tmp_path / "lake_u"))
    cms_u = StreamingCms("k", depth=4, width=64)
    hook_u = durable_foreach_batch(lake_u, "raw", cms_u, write_raw=True)
    for i, b in enumerate(batches):
        hook_u(b, i)

    lake_c = DataLake(spark, str(tmp_path / "lake_c"))
    cms1 = StreamingCms("k", depth=4, width=64)
    hook1 = durable_foreach_batch(lake_c, "raw", cms1, write_raw=True)
    hook1(batches[0], 0)
    del cms1, hook1  # crash
    cms2 = StreamingCms.restore(load_state(lake_c, "raw"))
    hook2 = durable_foreach_batch(lake_c, "raw", cms2, write_raw=True)
    hook2(batches[0], 0)  # at-least-once replay — must be a no-op fold
    hook2(batches[1], 1)
    assert cms2.counters == cms_u.counters and cms2.counters
    assert sorted(
        (r["k"], int(r["__batch_id"])) for r in lake_c.load("raw").collect()
    ) == sorted((r["k"], int(r["__batch_id"])) for r in lake_u.load("raw").collect())
    assert load_state(lake_c, "raw") == load_state(lake_u, "raw")


def test_streaming_quantile_monoid_and_accuracy(spark):
    """DDSketch accumulator (r9): K micro-batch folds must equal ONE
    batch fold counter-for-counter (the monoid law), and estimates must
    sit within the α relative-error guarantee of the exact percentile
    on mixed-sign lognormal-ish data."""
    from polars_express_spark.streaming.sketch import StreamingQuantile

    df = spark.range(0, 30_000).select(
        "id",
        (
            F.exp((F.col("id") % 997).cast("double") / F.lit(100.0))
            * F.when(F.col("id") % 11 == 0, -1.0).otherwise(1.0)
        ).alias("v"),
    ).localCheckpoint()

    one = StreamingQuantile("v", alpha=0.02)
    one.absorb(df, 0)
    parts = StreamingQuantile("v", alpha=0.02)
    for i in range(4):
        parts.absorb(df.where(F.col("id") % 4 == i), i)
    assert parts.pos == one.pos and parts.neg == one.neg
    assert parts.zeros == one.zeros and parts.count() == 30_000

    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        exact = df.agg(F.percentile("v", F.lit(q))).collect()[0][0]
        est = one.estimate(q)
        assert abs(est - exact) <= 0.021 * abs(exact) + 1e-12, (q, est, exact)


def test_streaming_quantile_exactly_once_restore_and_collapse(spark):
    """Replayed batch ids are no-ops; snapshot → JSON → restore →
    continue ≡ uninterrupted; and the collapse rule bounds state at
    max_bins while keeping upper quantiles within α."""
    import json

    from polars_express_spark.streaming.sketch import StreamingQuantile

    b0 = spark.range(0, 5_000).select((F.col("id") + 1).cast("double").alias("v"))
    b1 = spark.range(5_000, 10_000).select((F.col("id") + 1).cast("double").alias("v"))

    acc = StreamingQuantile("v", alpha=0.02)
    acc.absorb(b0, 0)
    once = dict(acc.pos)
    acc.absorb(b0, 0)  # restart replay
    assert acc.pos == once
    acc.absorb(b1, 1)

    acc2 = StreamingQuantile("v", alpha=0.02)
    acc2.absorb(b0, 0)
    snap = json.loads(json.dumps(acc2.snapshot()))
    acc3 = StreamingQuantile.restore(snap)
    acc3.absorb(b0, 0)  # replay after restore → no-op
    acc3.absorb(b1, 1)
    assert acc3.pos == acc.pos and acc3.count() == acc.count()

    # collapse: tiny bin budget over a wide range — state stays bounded
    # and the upper quantiles (kept bins) still honor the guarantee
    tight = StreamingQuantile("v", alpha=0.02, max_bins=50)
    wide = spark.range(0, 20_000).select(
        F.exp((F.col("id") % 1400).cast("double") / F.lit(100.0)).alias("v")
    ).localCheckpoint()
    tight.absorb(wide, 0)
    assert len(tight.pos) <= 50
    exact99 = wide.agg(F.percentile("v", F.lit(0.99))).collect()[0][0]
    assert abs(tight.estimate(0.99) - exact99) <= 0.021 * exact99

    # negative store collapses its HIGHEST indices (most-negative
    # values — the far-left tail), so NEAR-ZERO negative quantiles stay
    # within α after overflow (r10: reference DDSketch collapse rule)
    tneg = StreamingQuantile("v", alpha=0.02, max_bins=50)
    wneg = wide.select((-F.col("v")).alias("v")).localCheckpoint()
    tneg.absorb(wneg, 0)
    assert len(tneg.neg) <= 50
    # p99 of the negated data = the least-negative tail = kept bins
    exact99n = wneg.agg(F.percentile("v", F.lit(0.99))).collect()[0][0]
    assert abs(tneg.estimate(0.99) - exact99n) <= 0.021 * abs(exact99n)


def test_streaming_quantile_e2e_equals_batch(spark, tmp_path):
    """File-stream e2e: folding events.value through micro-batches must
    produce the same sketch as one batch fold, and the p50/p95 estimates
    must track the exact percentiles within α."""
    from polars_express_spark.streaming.sketch import StreamingQuantile, stream_quantile

    src = str(tmp_path / "q_src")
    ev = load_table(spark, SF_DIR, "events").select("value")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    acc, q = stream_quantile(stream, "value", alpha=0.02)
    try:
        batch = StreamingQuantile("value", alpha=0.02)
        batch.absorb(spark.read.parquet(src), 0)
        assert acc.pos == batch.pos and acc.neg == batch.neg
        assert acc.zeros == batch.zeros and acc.count() > 0
        for p in (0.5, 0.95):
            exact = (
                spark.read.parquet(src).agg(F.percentile("value", F.lit(p))).collect()[0][0]
            )
            assert abs(acc.estimate(p) - exact) <= 0.021 * abs(exact) + 1e-12
    finally:
        q.stop()


def test_durable_quantile_crash_restore(spark, tmp_path):
    """r9: the DDSketch twin of the durable-restore goldens — snapshots
    persist through durable_foreach_batch; killing the driver at batch k
    and restoring from the lake, then replaying batch k, equals one
    uninterrupted run (same bins, same estimates)."""
    import json

    from polars_express_spark.catalog import DataLake
    from polars_express_spark.streaming.sketch import (
        StreamingQuantile,
        durable_foreach_batch,
        load_state,
    )

    batches = [
        spark.range(0, 2000).select((F.col("id") % 321 + 1).cast("double").alias("v")),
        spark.range(0, 2000).select((F.col("id") % 97 + 5).cast("double").alias("v")),
    ]

    # uninterrupted twin
    lake_u = DataLake(spark, str(tmp_path / "lake_u"))
    acc_u = StreamingQuantile("v", alpha=0.02)
    hook_u = durable_foreach_batch(lake_u, "qsketch", acc_u)
    for i, b in enumerate(batches):
        hook_u(b, i)

    # crash after batch 0's hook, restore from lake, replay batch 0
    lake_c = DataLake(spark, str(tmp_path / "lake_c"))
    acc1 = StreamingQuantile("v", alpha=0.02)
    hook1 = durable_foreach_batch(lake_c, "qsketch", acc1)
    hook1(batches[0], 0)
    del acc1, hook1  # driver dies
    state = load_state(lake_c, "qsketch")
    assert state is not None and state["last_batch"] == 0
    acc2 = StreamingQuantile.restore(json.loads(json.dumps(state)))
    hook2 = durable_foreach_batch(lake_c, "qsketch", acc2)
    hook2(batches[0], 0)  # at-least-once replay → no-op
    hook2(batches[1], 1)
    assert acc2.pos == acc_u.pos and acc2.zeros == acc_u.zeros
    assert acc2.estimate(0.5) == acc_u.estimate(0.5)
    assert load_state(lake_c, "qsketch") == acc_u.snapshot()


def test_streaming_hll_union_equals_batch_estimate(spark):
    """r9: register-max algebra — the union of per-batch HLL sketches
    must estimate EXACTLY what a direct batch build estimates (each
    register is an associative/idempotent max), replayed batch ids are
    no-ops, and snapshot/restore continues exactly."""
    import json

    from polars_express_spark.streaming.sketch import StreamingHll

    df = spark.range(0, 20_000).select(
        "id", F.concat(F.lit("u"), (F.col("id") % 3777)).alias("k")
    ).localCheckpoint()

    acc = StreamingHll("k", lgk=12)
    for i in range(4):
        acc.absorb(df.where(F.col("id") % 4 == i), i)
    batch_est = float(
        df.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("k", F.lit(12))).alias("e")
        ).collect()[0]["e"]
    )
    assert acc.estimate(spark) == batch_est
    exact = 3777
    assert abs(batch_est - exact) <= 0.05 * exact

    # replay no-op
    before = acc.sketch
    acc.absorb(df.where(F.col("id") % 4 == 0), 0)
    assert acc.sketch == before

    # snapshot → JSON → restore → continue ≡ uninterrupted
    half = StreamingHll("k", lgk=12)
    half.absorb(df.where(F.col("id") % 4 == 0), 0)
    half.absorb(df.where(F.col("id") % 4 == 1), 1)
    snap = json.loads(json.dumps(half.snapshot()))
    cont = StreamingHll.restore(snap)
    cont.absorb(df.where(F.col("id") % 4 == 1), 1)  # replay after restore
    cont.absorb(df.where(F.col("id") % 4 == 2), 2)
    cont.absorb(df.where(F.col("id") % 4 == 3), 3)
    assert cont.estimate(spark) == acc.estimate(spark)


def test_streaming_topk_monoid_exact_under_capacity(spark):
    """Misra–Gries accumulator (r10): when capacity covers the key
    space, K micro-batch folds must equal ONE batch fold — which must
    equal the exact groupBy counts, err = 0 (the same monoid golden as
    the CMS/HLL/DDSketch siblings)."""
    from polars_express_spark.streaming.sketch import StreamingTopK

    df = spark.range(0, 20_000).select(
        "id", F.concat(F.lit("t"), (F.col("id") % 150)).alias("k")
    ).localCheckpoint()

    one = StreamingTopK("k", capacity=200)
    one.absorb(df, 0)
    parts = StreamingTopK("k", capacity=200)
    for i in range(4):
        parts.absorb(df.where(F.col("id") % 4 == i), i)
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    assert one.counters == exact and one.err == 0
    assert parts.counters == exact and parts.err == 0
    # deterministic top-k enumeration — the thing CMS cannot do
    assert [k for k, _ in one.topk(5)] == sorted(exact, key=lambda k: (-exact[k], k))[:5]


def test_streaming_topk_guarantee_under_overflow(spark):
    """Under capacity pressure on zipf-ish data the MG invariant must
    hold: est ≤ true ≤ est + err for EVERY item, err ≤ n/(capacity+1),
    every item with true count > err is tracked, and the top hitters
    come back in exact-count order."""
    from polars_express_spark.streaming.sketch import StreamingTopK

    # three well-separated heavies (30%/20%/12.5% of the mass — gaps
    # wider than the err bound, so their order IS recoverable) over a
    # ~1500-key long tail of ~10 occurrences each
    r = F.col("id") % 4000
    df = spark.range(0, 40_000).select(
        F.when(r < 1200, F.lit("h0"))
        .when(r < 2000, F.lit("h1"))
        .when(r < 2500, F.lit("h2"))
        .otherwise(F.concat(F.lit("t"), r))
        .alias("k")
    ).localCheckpoint()

    # fold in 5 disjoint hash slices so batches differ
    acc = StreamingTopK("k", capacity=24)
    for i in range(5):
        acc.absorb(df.where(F.abs(F.xxhash64("k", F.lit(7))) % 5 == i), i)

    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    assert len(acc.counters) <= 24
    assert acc.err <= n // 25 + 1
    for k, est in acc.counters.items():
        assert est <= exact[k] <= est + acc.err, (k, est, exact[k], acc.err)
    for k, true in exact.items():
        if true > acc.err:
            assert k in acc.counters, (k, true, acc.err)
    top3_exact = sorted(exact, key=lambda k: (-exact[k], k))[:3]
    assert [k for k, _ in acc.topk(3)] == top3_exact


def test_streaming_topk_replay_restore_and_e2e(spark, tmp_path):
    """Replayed batch ids are no-ops; snapshot → JSON → restore →
    continue ≡ uninterrupted; and the file-stream e2e fold equals the
    direct batch fold."""
    import json

    from polars_express_spark.streaming.sketch import StreamingTopK, stream_topk

    df = spark.range(0, 12_000).select(
        "id", F.concat(F.lit("r"), (F.col("id") % 900)).alias("k")
    ).localCheckpoint()
    b = [df.where(F.col("id") % 3 == i) for i in range(3)]

    acc = StreamingTopK("k", capacity=64)
    acc.absorb(b[0], 0)
    once = (dict(acc.counters), acc.err)
    acc.absorb(b[0], 0)  # restart replay → no-op
    assert (dict(acc.counters), acc.err) == once
    acc.absorb(b[1], 1)
    acc.absorb(b[2], 2)

    half = StreamingTopK("k", capacity=64)
    half.absorb(b[0], 0)
    half.absorb(b[1], 1)
    snap = json.loads(json.dumps(half.snapshot()))
    cont = StreamingTopK.restore(snap)
    cont.absorb(b[1], 1)  # replay after restore → no-op
    cont.absorb(b[2], 2)
    assert cont.counters == acc.counters and cont.err == acc.err

    # e2e: availableNow file stream ≡ one batch fold
    src = str(tmp_path / "topk_src")
    df.select("k").repartition(4).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    sacc, q = stream_topk(stream, "k", capacity=2048)
    batch = StreamingTopK("k", capacity=2048)
    batch.absorb(spark.read.parquet(src), 0)
    assert sacc.counters == batch.counters and sacc.err == batch.err == 0


def test_durable_topk_crash_restore(spark, tmp_path):
    """Lake-durable twin: snapshots persist through
    durable_foreach_batch; killing the driver at batch k, restoring
    from the lake, then replaying batch k equals one uninterrupted run
    (same counters, same err, same persisted snapshot)."""
    import json

    from polars_express_spark.catalog import DataLake
    from polars_express_spark.streaming.sketch import (
        StreamingTopK,
        durable_foreach_batch,
        load_state,
    )

    batches = [
        spark.range(0, 3000).select(F.concat(F.lit("d"), (F.col("id") % 40)).alias("k")),
        spark.range(0, 3000).select(F.concat(F.lit("d"), (F.col("id") % 11)).alias("k")),
    ]

    lake_u = DataLake(spark, str(tmp_path / "lake_u"))
    acc_u = StreamingTopK("k", capacity=16)
    hook_u = durable_foreach_batch(lake_u, "topk", acc_u)
    for i, bt in enumerate(batches):
        hook_u(bt, i)

    lake_c = DataLake(spark, str(tmp_path / "lake_c"))
    acc1 = StreamingTopK("k", capacity=16)
    hook1 = durable_foreach_batch(lake_c, "topk", acc1)
    hook1(batches[0], 0)
    del acc1, hook1  # driver dies
    state = load_state(lake_c, "topk")
    assert state is not None and state["last_batch"] == 0
    acc2 = StreamingTopK.restore(json.loads(json.dumps(state)))
    hook2 = durable_foreach_batch(lake_c, "topk", acc2)
    hook2(batches[0], 0)  # at-least-once replay → no-op
    hook2(batches[1], 1)
    assert acc2.counters == acc_u.counters and acc2.err == acc_u.err
    assert load_state(lake_c, "topk") == acc_u.snapshot()
