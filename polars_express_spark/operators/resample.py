"""Time-series resampling: regular-grid downsample + forward fill
(§2.5/§2.9 temporal family, beside as-of join — the reference's linked
polars exposes the same shape as upsample/group_by_dynamic).

Semantics: per key, lay an equal-step grid of slots covering
[floor(min ts), floor(max ts)] in `step_seconds` buckets; each slot
takes the LAST observation inside it (latest ts, tie broken on
`tie_col` so the pick is total); empty slots forward-fill from the
nearest earlier slot. The first slot of every key holds that key's
first bucket by construction, so output values are never null unless
the observed value itself was null and nothing precedes it.

Scale shape: one groupBy(key) for bounds, one per-(key,bucket)
row_number pick, one equi-join grid⋈picks on (key, bucket), one
running window per key — every stage partitions on the key, no
driver state, grid cardinality = Σ_key (span/step) which the caller
controls via `step_seconds`. Gap-filling via sequence()+explode is
pure JVM row generation (same device as q_chunk_overlap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_seconds: int,
    tie_col: str | None = None,
) -> DataFrame:
    """Returns (key, slot_ts, value) — one row per key per grid slot.

    floor(unix_micros/step) is monotone even under double rounding
    (same argument as bucketed_range_join), so slot membership is
    stable; the within-slot pick orders by (ts, tie_col) DESC, making
    the result deterministic under duplicate timestamps.
    """
    step_us = int(step_seconds) * 1_000_000
    b = F.floor(F.unix_micros(F.col(ts)) / F.lit(step_us)).alias("__b")
    order = [F.col(ts).desc()]
    if tie_col is not None:
        order.append(F.col(tie_col).desc())
    picks = (
        df.select(key, ts, value, *([tie_col] if tie_col else []))
        .withColumn("__b", b)
        .withColumn(
            "__rn",
            F.row_number().over(Window.partitionBy(key, "__b").orderBy(*order)),
        )
        .where(F.col("__rn") == 1)
        .select(key, "__b", F.col(value).alias("__v"))
    )
    grid = (
        df.groupBy(key)
        .agg(F.min(b).alias("__lo"), F.max(b).alias("__hi"))
        .select(key, F.explode(F.sequence("__lo", "__hi")).alias("__b"))
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(picks, [key, "__b"], "left")
        .withColumn("__f", F.last("__v", ignorenulls=True).over(w))
        .select(
            key,
            F.timestamp_micros((F.col("__b") * F.lit(step_us)).cast("bigint")).alias(
                "slot_ts"
            ),
            F.col("__f").alias(value),
        )
    )
