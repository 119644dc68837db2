"""As-of (nearest-key temporal) join — composed operator (SURVEY.md §2.3).

The reference's polars build does NOT enable the asof_join feature
(absent from Cargo.toml:8), and Spark has no native as-of join either.
This is the union-marker composition (SURVEY.md §7.4): tag both sides,
union, sort within the key partition, carry the nearest right row
through the partition with a window function, keep left rows. Three
directions share one scaffold:

- backward: latest right row with right.on <= left.on
  (last(ignorenulls) over [unboundedPreceding, current]);
- forward: earliest right row with right.on >= left.on
  (first(ignorenulls) over [current, unboundedFollowing]);
- nearest: both carries + an exact gap comparison, equidistant →
  backward (pandas.merge_asof tie rule).

The carried unit is a STRUCT of (on, value_cols), not the bare value
columns: the struct is non-null exactly for right rows, so
ignorenulls skips only the interleaved left rows — a matched right row
whose value column is NULL correctly yields NULL instead of the carry
skipping onward to an older/newer non-null row (and in `nearest` the
gap and the value always come from the same matched row).

Scale: one shuffle on (by-key), one in-partition sort — same cost shape
as a window function; no range-explosion, no cross join. For very hot
keys, salt the by-key and merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ord_expr(col, dtype):
    """Order value for exact gap arithmetic: integer microseconds for
    timestamps (double fractional-seconds rounds, which could flip an
    exact tie against the backward-preference rule), exact long for
    integral keys (a 2^53+ epoch-nanos long would lose its low bits in
    double), double only for genuinely fractional keys."""
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col)
    if isinstance(dtype, T.TimestampNTZType):
        # normalize through the session zone — consistent for every row
        # in the query, which is all a gap comparison needs
        return F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return col.cast("long")
    return col.cast("double")


def _asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    direction: str,
) -> DataFrame:
    lcols = list(left.columns)
    mtype = T.StructType(
        [T.StructField("__on", right.schema[on].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    tagged_r = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        # NULL-keyed right rows must never match: a struct with a null
        # field is itself non-null, so without this guard last/first
        # (ignorenulls) could pick a NULL-`on` right row — diverging from
        # pandas.merge_asof / DuckDB ASOF, which exclude NULL keys
        # (ADVICE r5). when() without otherwise yields NULL → skipped.
        F.when(
            F.col(on).isNotNull(),
            F.struct(F.col(on).alias("__on"), *[F.col(c) for c in value_cols]),
        ).alias("__m"),
        *[F.lit(None).alias(f"__l_{c}") for c in lcols if c not in (by, on)],
    )
    tagged_l = left.select(
        F.col(by),
        F.col(on),
        F.lit(1).alias("__side"),
        F.lit(None).cast(mtype).alias("__m"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols if c not in (by, on)],
    )
    unioned = tagged_r.unionByName(tagged_l)
    # backward frame: right rows sort BEFORE an equal-`on` left row, so
    # ties are inside [unboundedPreceding, current]; forward mirrors it
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
    mb = F.last("__m", ignorenulls=True).over(wb)
    mf = F.first("__m", ignorenulls=True).over(wf)
    if direction == "backward":
        match = mb
    elif direction == "forward":
        match = mf
    elif direction == "nearest":
        on_dtype = right.schema[on].dataType
        gap_b = _ord_expr(F.col(on), left.schema[on].dataType) - _ord_expr(
            mb["__on"], on_dtype
        )
        gap_f = _ord_expr(mf["__on"], on_dtype) - _ord_expr(
            F.col(on), left.schema[on].dataType
        )
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(gap_b <= gap_f, mb)  # tie → backward (pandas rule)
            .otherwise(mf)
        )
    else:  # pragma: no cover - programming error
        raise ValueError(f"unknown as-of direction {direction!r}")
    # a NULL-keyed LEFT row likewise matches nothing (DuckDB ASOF drops
    # NULL probes; pandas.merge_asof rejects them outright)
    match = F.when(F.col(on).isNotNull(), match)
    carried = unioned.select(
        by,
        on,
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in lcols if c not in (by, on)],
        *[match[c].alias(f"asof_{c}") for c in value_cols],
    )
    return carried.where(F.col("__side") == 1).drop("__side")


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value_cols of the latest right row
    with right.on <= left.on and matching by-key (backward as-of,
    pandas.merge_asof default direction). Ties on `on` resolve to the
    right row."""
    return _asof_join(left, right, on, by, value_cols, "backward")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the value_cols of the EARLIEST right
    row with right.on >= left.on and matching by-key (forward as-of,
    pandas.merge_asof direction='forward'). Ties on `on` resolve to the
    right row."""
    return _asof_join(left, right, on, by, value_cols, "forward")


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
    Gaps are computed exactly (integer microseconds / longs, see
    _ord_expr) from the SAME carried struct the values come from."""
    return _asof_join(left, right, on, by, value_cols, "nearest")
