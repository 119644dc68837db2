"""As-of (nearest-key temporal) join — composed operator (SURVEY.md §2.3).

The reference's polars build does NOT enable the asof_join feature
(absent from Cargo.toml:8), and Spark has no native as-of join either.
This is the union-marker composition (SURVEY.md §7.4): tag both sides,
union, sort within the key partition, carry the right side's latest
value forward with last(ignorenulls), keep left rows.

Scale: one shuffle on (by-key), one in-partition sort — same cost shape
as a window function; no range-explosion, no cross join. For very hot
keys, salt the by-key and merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value_cols of the latest right row
    with right.on <= left.on and matching by-key (backward as-of,
    pandas.merge_asof default direction).

    Ties on the `on` key resolve to the right row (marker sorts first).
    """
    lcols = [c for c in left.columns]
    tagged_r = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols if c not in (by, on)],
    )
    tagged_l = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in (by, on)],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        by,
        on,
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in (by, on)],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")
