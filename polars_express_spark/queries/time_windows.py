"""Time-window corpus: Q32/Q33 — batch equivalents of the streaming
tumbling/sliding windows (SURVEY.md §2.9; absent in the reference, which
is purely request/response — src/main.rs:43-52).

The same F.window() expressions run unchanged under readStream; the
streaming variants (plus watermarks/late data) are golden-tested in
tests/test_streaming.py. Spark window buckets are epoch-aligned, as is
DuckDB's time_bucket for sub-day intervals — so the batch oracle is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.queries._util import dsum, sql_dsum
from polars_express_spark.queries.registry import query


@query(
    "q32_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
           count(*) AS cnt,
           {sql_dsum("value", "sum_val")}
    FROM events GROUP BY 1 ORDER BY win_start
    """,
)
def q32_tumbling_window(spark, sf_dir):
    """Tumbling 10-minute window aggregate (§2.11 Q32)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_val"))
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_val")
        .orderBy("win_start")
    )


@query(
    "q33_sliding_window",
    oracle=f"""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) - k.k * INTERVAL '5 minutes' AS win_start,
             value
      FROM events CROSS JOIN (VALUES (0), (1)) k(k)
    )
    SELECT win_start, count(*) AS cnt, {sql_dsum("value", "sum_val")}
    FROM shifted GROUP BY win_start ORDER BY win_start
    """,
)
def q33_sliding_window(spark, sf_dir):
    """Sliding window: 10 minutes, sliding every 5 (§2.11 Q33). Each event
    lands in exactly two windows; the oracle materializes both starts
    explicitly (bucket and bucket−5min)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_val"))
        .select(F.col("w.start").alias("win_start"), "cnt", "sum_val")
        .orderBy("win_start")
    )
