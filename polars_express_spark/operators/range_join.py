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


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open: overlap iff
    ls < re AND rs < le), bucketed like the point variant.

    Both sides explode to their covered buckets, join on bucket
    equality, and re-check the exact predicate. Because an overlapping
    pair now shares potentially MANY buckets, the pair would duplicate;
    instead of a distinct (a full extra shuffle on the pair key), each
    pair is emitted only in ONE canonical bucket — the bucket of
    max(ls, rs), the overlap's left edge, which both rows always cover
    when they overlap. Zero-dedup, same linear-scaling equi-join shape.
    """
    width_us = F.lit(int(bucket_seconds) * 1_000_000)

    def buckets(s: str, e: str):
        return F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(s)) / width_us),
                F.floor(F.unix_micros(F.col(e)) / width_us),
            )
        )

    lb = left.withColumn("__bucket", buckets(left_start, left_end))
    rb = right.withColumn("__bucket", buckets(right_start, right_end))
    overlap = (F.col(left_start) < F.col(right_end)) & (
        F.col(right_start) < F.col(left_end)
    )
    canonical = F.col("__bucket") == F.floor(
        F.unix_micros(F.greatest(F.col(left_start), F.col(right_start))) / width_us
    )
    return lb.join(rb, "__bucket", "inner").where(overlap & canonical).drop("__bucket")
