"""Distributed prefix sums (scan) without a single global window partition.

A naive running total — ``SUM(x) OVER (ORDER BY k)`` with no PARTITION
BY — collapses the whole input into ONE window partition: on a
1000-executor cluster every row funnels through a single task, the
canonical accidental-serialization trap. The classic fix (the scan step
of parallel prefix-sum algorithms, Blelloch 1990) is two-level:

1. range-bucket the rows on the ordering key (``n_buckets`` ≈ shuffle
   parallelism), bounds derived from the data's own min/max so the
   operator costs one tiny aggregate + one pass;
2. per-bucket subtotals (partial→final agg, ``n_buckets`` rows) → each
   bucket's running offset via a window over just those few rows;
3. broadcast the offsets back and finish with an intra-bucket window
   partitioned by bucket — every task sees ~1/``n_buckets`` of the data.

The result equals ``SUM(v) OVER (ORDER BY order_col)`` exactly, but no
partition is ever global. Determinism: bucket bounds are floats, but
bucketing only *partitions* the work — each row's cumulative value is
bucket offset + intra-bucket running sum, independent of bucket count.

Caller contract: ``order_col`` is numeric and a TOTAL order (distinct
values) — pre-aggregate to distinct keys first (as the ECDF/KS caller
does), otherwise ties make any running sum order-dependent in every
engine. The input is read THREE times inside the operator (bounds,
per-bucket subtotals, the final offset-join pass) — Catalyst does not
dedupe common subplans, so an input behind an expensive lineage (that
dedup aggregation, a join) should be lazily ``localCheckpoint``ed by
the caller first (as the KS caller does); the operator does not force
one because a caller may pass a frame that is already cheap or pinned.

Reference analog: Polars cum_sum is a single-threaded column kernel
(linked surface, reference Cargo.toml:8); this is its shuffle-safe
distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Add ``cum_<c>`` = running sum of each value column over the total
    order of ``order_col``, computed with bounded per-task state."""
    bounds = df.agg(F.min(order_col).alias("__lo"), F.max(order_col).alias("__hi"))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(n_buckets)
    b = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "__bkt",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((F.col(order_col) - F.col("__lo")) / width).cast("int"),
                )
            ),
        )
        .drop("__lo", "__hi")
    )
    subtot = b.groupBy("__bkt").agg(
        *[F.sum(c).alias(f"__s_{c}") for c in value_cols]
    )
    # offset = sum of all STRICTLY EARLIER buckets' subtotals
    prev = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = subtot.select(
        "__bkt",
        *[
            F.coalesce(F.sum(f"__s_{c}").over(prev), F.lit(0)).alias(f"__off_{c}")
            for c in value_cols
        ],
    )
    intra = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = b.join(F.broadcast(offsets), "__bkt")
    for c in value_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"__off_{c}") + F.sum(c).over(intra))
    return out.drop("__bkt", *[f"__off_{c}" for c in value_cols])


def grouped_bucketed_cumsum(
    df: DataFrame,
    group: str,
    order_col: str,
    value_col: str,
    n_buckets: int = 64,
    bounds: DataFrame | None = None,
    with_total: bool = False,
) -> DataFrame:
    """Per-group running sum — ``SUM(v) OVER (PARTITION BY group ORDER
    BY order_col)`` — without ever sorting a whole group in one task.

    ``Window.partitionBy(group)`` is the GROUPED twin of the global-
    window trap above: with few distinct groups (returnflags, splits,
    languages) the whole input funnels through that many reducer tasks,
    however many executors exist. Same Blelloch cure, applied within
    each group: per-(group, value-range-bucket) subtotals, a window
    over the TINY (group × n_buckets)-row subtotal frame for each
    bucket's starting offset, then an intra-(group, bucket) running sum
    — every task sees ~1/n_buckets of its group.

    Caller contract: same as bucketed_cumsum — ``order_col`` must be a
    total order WITHIN each group (pre-aggregate duplicates first);
    exactness requires ``value_col`` sums to be associative (longs or
    decimals, not raw doubles). Bucket bounds derive from each group's
    own min/max (one tiny aggregate, broadcast back), so skewed groups
    still split evenly across their own value range. Output: input
    columns + ``cum_<value_col>``.

    ``bounds`` (optional): a (group, __lo, __hi) frame covering each
    group's order_col range. When ``df`` sits behind an expensive
    lineage (a pre-aggregation shuffle), pass bounds computed from the
    cheap upstream frame — min/max are the same over raw rows as over
    distinct values, and it saves re-deriving the shuffle for one tiny
    aggregate. Bounds only steer PARTITIONING, so a covering superset
    range is always correct.

    ``with_total=True`` additionally attaches ``tot_<value_col>`` — each
    group's grand total Σv — derived from the SAME per-(group, bucket)
    subtotal frame the offsets come from (one more tiny aggregate +
    broadcast join), so callers needing cum-vs-total predicates
    (weighted quantiles, ECDF normalization) never pay a separate
    full-input aggregation pass for the denominators.
    """
    if bounds is None:
        bounds = df.groupBy(group).agg(
            F.min(order_col).alias("__lo"), F.max(order_col).alias("__hi")
        )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(n_buckets)
    b = (
        df.join(F.broadcast(bounds), group)
        .withColumn(
            "__bkt",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor((F.col(order_col) - F.col("__lo")) / width).cast("int"),
                )
            ),
        )
        .drop("__lo", "__hi")
    )
    subtot = b.groupBy(group, "__bkt").agg(F.sum(value_col).alias("__s"))
    prev = (
        Window.partitionBy(group).orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = subtot.select(
        group,
        "__bkt",
        F.coalesce(F.sum("__s").over(prev), F.lit(0)).alias("__off"),
    )
    intra = (
        Window.partitionBy(group, "__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        b.join(F.broadcast(offsets), [group, "__bkt"])
        .withColumn(f"cum_{value_col}", F.col("__off") + F.sum(value_col).over(intra))
        .drop("__bkt", "__off")
    )
    if with_total:
        tots = subtot.groupBy(group).agg(F.sum("__s").alias(f"tot_{value_col}"))
        out = out.join(F.broadcast(tots), group)
    return out
