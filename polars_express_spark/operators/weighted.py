"""Weighted quantiles — the order statistic Spark has no built-in for
(§2.4 family; percentile/median weight every row equally, but curation
pipelines constantly need "the median document BY TOKEN MASS", not by
document count).

Definition (lower weighted quantile): for rows (v, w) in a group, the
q-quantile is the smallest v whose cumulative weight — over rows
ordered by v — reaches q · Σw. Weights ride the exact 4-dp scaled-long
accumulator, so the crossing point is exact, the result is an ACTUAL
DATA VALUE (no interpolation), and it replays identically in SQL.

Shape (r7 rebuild): pre-aggregate to distinct (group, value) with
map-side-combined weight sums — equal values cross together, so this
loses nothing and removes ties — then the cumulative sum runs through
the grouped Blelloch two-level prefix scan (operators/prefix.py). The
previous shape, ``SUM(w) OVER (PARTITION BY group ORDER BY value)``,
funnels each group through ONE reducer task: with a handful of groups
(returnflags, languages, splits) a 1000-executor cluster does the sort
on ~3 cores. Now no task ever sorts more than ~1/n_buckets of a group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    ``tiebreak`` is accepted for API compatibility but has no effect:
    the operator pre-aggregates equal values (they cross together), so
    the internal order is total without it.

    Weight contract: the default ``fast4=True`` path rides the 4-dp
    scaled-long accumulator (_util.scaled4) — EXACT only for
    non-negative weights with ≤4 decimal places (token counts, prices,
    byte sizes). Weights with more precision are silently quantized to
    4 dp, which can move the crossing point. For arbitrary-precision
    weights pass ``fast4=False``: the sums run in decimal(38,12) —
    exact to 12 dp and still order-free, at the cost of a BigDecimal
    add per row (~3× on the scan stage). Headroom bound (fast4=False
    contract): the crossing test multiplies the decimal(38,12) sums by
    q_den/q_num, so total group weight must stay below ~10^25 / q_den
    — beyond that the product overflows decimal(38) and (non-ANSI)
    nulls out the predicate, silently dropping the group. Weights that
    large should be pre-scaled by the caller (they exceed any physical
    token/byte mass by orders of magnitude)."""
    from polars_express_spark.operators.prefix import grouped_bucketed_cumsum
    from polars_express_spark.queries._util import scaled4

    d = df.where(
        F.col(value).isNotNull() & F.col(weight).isNotNull() & (F.col(weight) > 0)
    )
    w_expr = (
        scaled4(F.col(weight))
        if fast4
        else F.col(weight).cast("decimal(38,12)")
    )
    # distinct (group, value) with combined mass: the partial→final agg
    # is the map-side combine a naive window never gets, and it makes
    # `value` a total order per group (the prefix-scan contract)
    base = d.select(group, value, w_expr.alias("__w"))
    dd = base.groupBy(group, value).agg(F.sum("__w").alias("__w"))
    # bounds AND totals both derive from dd itself (the scan's defaults /
    # with_total): AQE reuses dd's shuffle stage across the consumers, so
    # neither denominator nor bucket bounds re-scan the raw input — one
    # full-input pass total. (r8; the r7 shape computed bounds and Σw
    # from the pre-shuffle frame, paying two extra full scans — measured
    # slower locally and strictly worse at 100 TB, where a reused shuffle
    # output is cheap and an input re-scan is not.)
    cum = grouped_bucketed_cumsum(dd, group, value, "__w", with_total=True)
    crossed = cum.where(
        F.col("cum___w") * F.lit(int(q_den)) >= F.col("tot___w") * F.lit(int(q_num))
    )
    tot_out = (
        F.max("tot___w").cast("double") / F.lit(float(WEIGHT_SCALE))
        if fast4
        else F.max("tot___w").cast("double")
    )
    return crossed.groupBy(group).agg(
        F.min(value).alias("wq_value"),
        tot_out.alias("total_weight"),
    )
