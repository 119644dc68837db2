"""Streaming joins over the events stream (SURVEY.md §2.9 last row).

Absent in the reference (request/response only, src/main.rs:43-52);
driver-mandated Tier G. Two shapes:

- stream-static: each micro-batch joins against a static dimension
  snapshot. STATELESS — no watermark needed, no state store; with
  broadcast dims the join never shuffles the stream side. This is the
  100 TB enrichment pattern (events vs slowly-changing dims).
- stream-stream: both sides buffered in the state store; watermarks on
  BOTH sides plus an event-time range condition are mandatory so Spark
  can evict matched/expired rows instead of buffering forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dims(events: DataFrame, customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Stream-static join: attach customer name + nation to each event by
    user_id. The dim side is a static DataFrame (re-read per micro-batch
    if backed by files) and explicitly broadcast: the streaming side never
    shuffles, which is exactly what you want when events is the 100 TB
    firehose and dims are millions of rows."""
    dims = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("customer_name"),
            F.col("n_name").alias("nation_name"),
        )
    )
    return events.join(F.broadcast(dims), "user_id", "left")


def clicks_before_errors(
    events: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval self-join: for every 'error' event, the
    'click' events by the same user in the `lookback` window before it.

    Both sides carry watermarks and the join condition bounds click_ts to
    [err_ts - lookback, err_ts] — the two ingredients Structured
    Streaming needs to know when a buffered click can never match a
    future error and evict it. State per key is O(rows within lookback).
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        events.where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    cond = (
        (errors.user_id == clicks.user_id)
        & (clicks.click_ts >= errors.err_ts - F.expr(f"INTERVAL {lookback}"))
        & (clicks.click_ts <= errors.err_ts)
    )
    return errors.join(clicks, cond, "inner").select(
        "error_id", errors.user_id.alias("user_id"), "err_ts", "click_ts", "click_value"
    )
