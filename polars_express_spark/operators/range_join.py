"""Range (interval) join — point-in-interval, bucketed (SURVEY.md §2.3
family; the reference's linked polars exposes join_where for the same
non-equi shape, Cargo.toml:8 → polars 0.42 join_where).

Spark's naive plan for `l.ts BETWEEN r.start AND r.end` is a broadcast
nested loop (or worse, a cartesian product with a filter) — O(|L|·|R|)
comparisons, the classic 100 TB range-join killer. The scale-safe
rewrite used by every production engine (and what AQE cannot derive by
itself) is BUCKETING:

- each left point belongs to exactly ONE time bucket
  floor(epoch / width);
- each right interval is exploded to the buckets it overlaps
  (sequence(floor(start), floor(end)) — expansion factor is
  interval_len / width + 1, chosen by the caller to stay small);
- join on bucket EQUALITY (a plain shuffled equi-join that partitions,
  combines map-side, and scales linearly), then re-check the exact
  range predicate to discard same-bucket non-overlaps.

Correctness: a point matches an interval iff their buckets collide on
the point's single bucket AND the exact predicate passes; the point has
one bucket, so no duplicate pairs are ever produced (no dedup pass
needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join left rows (point column `left_on`, timestamp) to right rows
    (interval [`start_col`, `end_col`), half-open) via bucket equality
    plus an exact residual predicate.

    `bucket_seconds` trades shuffle width against interval expansion:
    pick it near the TYPICAL interval length so each interval explodes
    to ~2 buckets. Returns all left and right columns (names must not
    collide aside from the join internals).

    Boundary safety: floor(unix_micros/width) evaluates in double, but
    x ↦ floor(x/c) is MONOTONE even under FP rounding, so
    start ≤ t < end always implies bucket(t) ∈ [bucket(start),
    bucket(end)] — a boundary-adjacent point can never fall outside its
    interval's exploded bucket list; the exact residual then decides.
    """
    width_us = F.lit(int(bucket_seconds) * 1_000_000)
    lb = left.withColumn("__bucket", F.floor(F.unix_micros(F.col(left_on)) / width_us))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / width_us),
                F.floor(F.unix_micros(F.col(end_col)) / width_us),
            )
        ),
    )
    exact = (F.col(left_on) >= F.col(start_col)) & (F.col(left_on) < F.col(end_col))
    return lb.join(rb, "__bucket", how).where(exact).drop("__bucket")
