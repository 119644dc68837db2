"""Weighted quantiles — the order statistic Spark has no built-in for
(§2.4 family; percentile/median weight every row equally, but curation
pipelines constantly need "the median document BY TOKEN MASS", not by
document count).

Definition (lower weighted quantile): for rows (v, w) in a group, the
q-quantile is the smallest v whose cumulative weight — over rows
ordered by (v, tiebreak) — reaches q · Σw. With decimal-exact weight
sums the crossing point is exact, so the result is an ACTUAL DATA VALUE
(no interpolation) and replays identically in SQL.

Shape: one sort-window per group (cumulative decimal sum) + one
min-aggregate over the crossing rows — the same single-shuffle cost as
any per-group window; no driver state, no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(38,12)"


def weighted_quantile(
    df: DataFrame,
    group: str,
    value: str,
    weight: str,
    q_num: int = 1,
    q_den: int = 2,
    tiebreak: str | None = None,
) -> DataFrame:
    """(group, wq_value, total_weight) — lower weighted q-quantile per
    group, q = q_num/q_den. Rows with null value or non-positive weight
    are ignored (they carry no mass). The crossing test is
    cum · q_den ≥ tot · q_num — decimal×small-integer products, exact
    and scale-stable on every engine (a decimal×decimal 0.5·tot would
    hit engine-specific precision/scale rules). `tiebreak` makes the
    cum-sum order total when equal values repeat; the result is
    tiebreak-independent anyway (equal values cross together)."""
    d = df.where(
        F.col(value).isNotNull() & F.col(weight).isNotNull() & (F.col(weight) > 0)
    )
    order = [F.col(value)]
    if tiebreak is not None:
        order.append(F.col(tiebreak))
    w_cum = (
        Window.partitionBy(group)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(group)
    dd = d.select(
        group,
        value,
        F.sum(F.col(weight).cast(DEC)).over(w_cum).alias("__cum"),
        F.sum(F.col(weight).cast(DEC)).over(w_tot).alias("__tot"),
    )
    crossed = dd.where(
        F.col("__cum") * F.lit(int(q_den)) >= F.col("__tot") * F.lit(int(q_num))
    )
    return crossed.groupBy(group).agg(
        F.min(value).alias("wq_value"),
        F.max(F.col("__tot").cast("double")).alias("total_weight"),
    )
