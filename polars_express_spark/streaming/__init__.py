"""Structured Streaming operators over the events table (SURVEY.md §2.9)."""

from polars_express_spark.streaming.joins import (
    clicks_before_errors,
    enrich_with_dims,
)
from polars_express_spark.streaming.stateful import batch_session_stats, session_stats
from polars_express_spark.streaming.windows import (
    dedup_events,
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_events,
    tumbling_counts,
)

__all__ = [
    "clicks_before_errors",
    "enrich_with_dims",
    "batch_session_stats",
    "session_stats",
    "dedup_events",
    "run_to_memory",
    "session_counts",
    "sliding_counts",
    "stream_events",
    "tumbling_counts",
]
