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


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value_cols of the EARLIEST right row
    with right.on >= left.on and matching by-key (forward as-of,
    pandas.merge_asof direction='forward').

    Same union-marker shape as backward, mirrored: the marker sorts the
    left row BEFORE an equal-`on` right row so the forward frame
    [current, following] includes ties, and first(ignorenulls) carries
    the next right value backward through the partition.
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
        .orderBy(F.col(on).asc(), F.col("__side").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        by,
        on,
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in (by, on)],
        *[
            F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value_cols of the CLOSEST right row
    by |on gap| within the by-key; equidistant candidates resolve to the
    backward (earlier) row — pandas.merge_asof direction='nearest'.

    One union, one partition sort, two window passes (backward carry +
    forward carry) and a per-row gap comparison — still the
    no-range-explosion shape; right `on` values ride along so the gaps
    are computable without a second join.
    """
    lcols = [c for c in left.columns]
    tagged_r = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        F.col(on).alias("__r_on"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols if c not in (by, on)],
    )
    tagged_l = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        F.lit(None).cast(left.schema[on].dataType).alias("__r_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in (by, on)],
    )
    unioned = tagged_r.unionByName(tagged_l)
    wb = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("__side").desc())
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    from pyspark.sql import types as T

    def ordval(c):
        # exact integer microseconds for timestamps: a double conversion
        # (fractional seconds) rounds, which could flip an exact-μs tie
        # against the backward-preference rule
        if isinstance(left.schema[on].dataType, T.TimestampType):
            return F.unix_micros(c)
        return c.cast("double")

    b_on = F.last("__r_on", ignorenulls=True).over(wb)
    f_on = F.first("__r_on", ignorenulls=True).over(wf)
    gap_b = ordval(F.col(on)) - ordval(b_on)
    gap_f = ordval(f_on) - ordval(F.col(on))

    def pick(c):
        b = F.last(F.col(f"__r_{c}"), ignorenulls=True).over(wb)
        f = F.first(F.col(f"__r_{c}"), ignorenulls=True).over(wf)
        return (
            F.when(b_on.isNull(), f)
            .when(f_on.isNull(), b)
            .when(gap_b <= gap_f, b)  # tie → backward (pandas rule)
            .otherwise(f)
            .alias(f"asof_{c}")
        )

    carried = unioned.select(
        by,
        on,
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in (by, on)],
        *[pick(c) for c in value_cols],
    )
    return carried.where(F.col("__side") == 1).drop("__side")
