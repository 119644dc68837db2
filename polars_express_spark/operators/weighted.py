"""Weighted quantiles — the order statistic Spark has no built-in for
(§2.4 family; percentile/median weight every row equally, but curation
pipelines constantly need "the median document BY TOKEN MASS", not by
document count).

Definition (lower weighted quantile): for rows (v, w) in a group, the
q-quantile is the smallest v whose cumulative weight — over rows
ordered by (v, tiebreak) — reaches q · Σw. Weights ride the exact
4-dp scaled-long accumulator, so the crossing point is exact, the
result is an ACTUAL DATA VALUE (no interpolation), and it replays
identically in SQL.

Shape: one sort-window per group (cumulative long sum) + one
min-aggregate over the crossing rows — the same single-shuffle cost as
any per-group window; no driver state, no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# weights ride the 4-dp scaled-long contract (_util.scaled4): exact for
# non-negative ≤4-dp weights, and the cumulative sums are primitive long
# window adds — the decimal(38,12) cumsum this replaced paid a
# BigDecimal allocation per row (measured ~3× the whole query)
WEIGHT_SCALE = 10_000


def weighted_quantile(
    df: DataFrame,
    group: str,
    value: str,
    weight: str,
    q_num: int = 1,
    q_den: int = 2,
    tiebreak: str | None = None,
    fast4: bool = True,
) -> DataFrame:
    """(group, wq_value, total_weight) — lower weighted q-quantile per
    group, q = q_num/q_den. Rows with null value or non-positive weight
    are ignored (they carry no mass). The crossing test is
    cum · q_den ≥ tot · q_num — long×small-integer products, exact on
    every engine (a decimal×decimal 0.5·tot would hit engine-specific
    precision/scale rules; a double cumsum is partition-order noise).
    `tiebreak` makes the cum-sum order total when equal values repeat;
    the result is tiebreak-independent anyway (equal values cross
    together).

    Weight contract: the default ``fast4=True`` path rides the 4-dp
    scaled-long accumulator (_util.scaled4) — EXACT only for
    non-negative weights with ≤4 decimal places (token counts, prices,
    byte sizes). Weights with more precision are silently quantized to
    4 dp, which can move the crossing point. For arbitrary-precision
    weights pass ``fast4=False``: the cumulative sums run in
    decimal(38,12) — exact to 12 dp and still order-free, at the cost
    of a BigDecimal add per row (~3× on the window stage)."""
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
    from polars_express_spark.queries._util import scaled4

    w_expr = (
        scaled4(F.col(weight))
        if fast4
        else F.col(weight).cast("decimal(38,12)")
    )
    carry = [group, value] + ([tiebreak] if tiebreak is not None else [])
    dd = d.select(
        *carry,
        w_expr.alias("__w"),
    ).select(
        group,
        value,
        F.sum("__w").over(w_cum).alias("__cum"),
        F.sum("__w").over(w_tot).alias("__tot"),
    )
    crossed = dd.where(
        F.col("__cum") * F.lit(int(q_den)) >= F.col("__tot") * F.lit(int(q_num))
    )
    tot = (
        F.max("__tot").cast("double") / F.lit(float(WEIGHT_SCALE))
        if fast4
        else F.max("__tot").cast("double")
    )
    return crossed.groupBy(group).agg(
        F.min(value).alias("wq_value"),
        tot.alias("total_weight"),
    )
