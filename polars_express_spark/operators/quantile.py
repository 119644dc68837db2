"""Exact quantiles with bounded task memory (bracketed rank refine).

Spark's exact ``percentile`` buffers a value→count map (OpenHashMap) of
every DISTINCT value of a group inside one aggregation buffer and sorts
it in the final merge. For low-cardinality columns (l_quantity's 50
values) that is tiny and this operator is overkill; for near-unique
columns — prices, timestamps, measures — the map IS the column, so a
global median over 100 TB is one executor materializing it: the same
accidental-serialization trap the grouped prefix scan
(operators/prefix.py) removes from running totals.

This operator computes the SAME value — linear-interpolated order
statistic, bit-equal to ``F.percentile`` / DuckDB ``quantile_cont`` —
in three bounded passes:

1. **Bracket** (one GK pass): ``approx_percentile`` at q ± 4/accuracy.
   The Greenwald–Khanna sketch carries a *deterministic* rank guarantee
   (rank error ≤ n/accuracy — not probabilistic), so for n ≥ 2·accuracy
   the returned ``[lo, hi]`` values bracket the target ranks ⌊q·(n−1)⌋
   and ⌈q·(n−1)⌉ mathematically (the ±4ε margin dominates the ±ε
   sketch error plus the p·n-vs-q·(n−1) definition offsets by ≥ 5
   ranks); below that the bracket falls back to the group's [min, max]
   — a "whole group" of ≤ 2·accuracy rows, still bounded. A runtime
   raise still guards the invariant (defense in depth — one comparison
   per group, arithmetically entangled so it cannot be pruned).
2. **Anchor** (one counting pass): per group, ``n``, exact
   ``count(v < lo)`` and ``count(lo ≤ v ≤ hi)`` — plain partial→final
   counts, no buffering.
3. **Refine** (one pass over bracket rows only): rows inside
   ``[lo, hi]`` — at most ~8n/accuracy plus ties of the boundary
   values — are pre-aggregated to distinct (group, value, count), then
   a per-group window over that tiny frame converts bracket-local
   cumulative counts to GLOBAL ranks via the pass-2 anchor. The two
   order statistics are picked by conditional min, and the result is
   ``v_k1 + (v_k2 − v_k1) · (pos − ⌊pos⌋)`` with ``pos = q·(n−1)``
   computed in double exactly as Spark's Percentile does.

Task memory is bounded by the bracket's distinct-value count
(~8n/accuracy), tunable independently of data size — at 100 TB, raise
``accuracy`` so the bracket stays executor-sized; every other stage is
a constant-state streaming aggregate.

Reference analog: Polars ``quantile`` is a single-node column sort
(linked surface, reference Cargo.toml:8); this is its shuffle-safe
distributed form with identical interpolation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _null_safe_join(left: DataFrame, right: DataFrame, cols: list[str], how: str = "inner"):
    """Broadcast join on group columns, NULL keys matching NULL keys
    (percentile keeps NULL groups; a plain equi-join would drop them)."""
    r = right
    for c in cols:
        r = r.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in cols:
        eq = F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = left.join(F.broadcast(r), cond, how)
    return j.drop(*[f"__r_{c}" for c in cols])


def exact_quantile(
    df: DataFrame,
    value: str,
    q: float,
    group: list[str] | None = None,
    accuracy: int = 10_000,
    result_col: str = "quantile",
) -> DataFrame:
    """(group..., <result_col>) — exact linear-interpolated q-quantile
    per group, equal to ``F.percentile(value, q)`` (and DuckDB
    ``quantile_cont``), computed without ever buffering a whole group
    in one task. NULL values are ignored (as percentile does); a group
    with no non-null values is absent from the result (as groupBy over
    the filtered rows naturally yields). NULL group keys form their own
    group, as in groupBy.

    ``accuracy`` trades bracket size for sketch size: the refine stage
    touches ~8n/accuracy rows (plus ties of the two boundary values),
    so at larger n raise accuracy to keep the bracket executor-sized.

    The input is scanned three times (bracket / anchor / refine) — fine
    over a pruned columnar source, but CACHE OR CHECKPOINT a derived
    frame first (joins, per-key aggregates) or the upstream pipeline
    runs three times. Prefer plain grouped ``F.percentile`` when groups
    are many-and-small or values low-cardinality: its per-group
    distinct-value map is already bounded there, with one scan.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    gcols = list(group) if group else []
    vals = df.select(*gcols, F.col(value).alias("__v")).where(F.col("__v").isNotNull())

    # Rank-margin math (the bracket must contain order statistics k1 =
    # ⌊q(n−1)⌋ and k2 = ⌈q(n−1)⌉): GK at percentage p returns a value
    # whose rank is within εn of p·n (ε = 1/accuracy), and the p·n vs
    # q·(n−1) definition offset is ≤ 1. With a 4ε percentage margin,
    # rank(lo) ≤ (q−4ε)n + εn + 1 = qn − 3εn + 1 ≤ k1 whenever 3εn ≥ 6
    # — i.e. n ≥ 2·accuracy (symmetrically for hi). Below that the
    # margin cannot be guaranteed in ranks, so the bracket falls back to
    # [min, max]: the "whole group" there is ≤ 2·accuracy rows, still
    # bounded by construction.
    eps = 4.0 / accuracy
    q_lo, q_hi = max(0.0, q - eps), min(1.0, q + eps)

    # Pass 1 — GK bracket + n + min/max per group (one scan, mergeable).
    gb = vals.groupBy(*gcols)
    big = F.col("__n") >= F.lit(2 * accuracy)
    br = gb.agg(
        F.count("__v").alias("__n"),
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
        F.percentile_approx(
            "__v", F.array(F.lit(q_lo), F.lit(q_hi)), F.lit(accuracy)
        ).alias("__b"),
    ).select(
        *gcols,
        "__n",
        F.when(big, F.col("__b")[0]).otherwise(F.col("__mn")).alias("__lo"),
        F.when(big, F.col("__b")[1]).otherwise(F.col("__mx")).alias("__hi"),
    )

    # Pass 2 — exact anchors: count below the bracket, count inside it.
    if gcols:
        anchored = _null_safe_join(vals, br, gcols)
    else:
        anchored = vals.crossJoin(F.broadcast(br))
    stats = anchored.groupBy(*gcols, "__n", "__lo", "__hi").agg(
        F.count(F.when(F.col("__v") < F.col("__lo"), 1)).alias("__lt"),
        F.count(
            F.when(F.col("__v").between(F.col("__lo"), F.col("__hi")), 1)
        ).alias("__m"),
    )

    # Target order statistics — double pos exactly as Spark's Percentile:
    # pos = q·(n−1), lower = floor(pos), the fraction interpolates.
    pos = F.lit(float(q)) * (F.col("__n") - F.lit(1)).cast("double")
    k1 = F.floor(pos).cast("long")
    frac = pos - F.floor(pos)
    k2 = F.when(frac > 0, k1 + 1).otherwise(k1)
    # The margin math above makes the bracket sound by construction; if
    # it were ever violated the refine below would silently pick wrong
    # values, so fail loudly instead. The raise is entangled INTO the
    # rank the picks compare against (valid → +0, invalid → raise), an
    # arithmetic dependency the optimizer cannot simplify away (a plain
    # assert_true column, or when(c, k).otherwise(k), gets pruned).
    valid = (F.col("__lt") <= k1) & ((F.col("__lt") + F.col("__m")) > k2)
    guard0 = F.when(valid, F.lit(0)).otherwise(
        F.expr("raise_error('exact_quantile: bracket missed the target rank')").cast(
            "long"
        )
    )
    stats = stats.select(
        *gcols,
        "__lo",
        "__hi",
        "__lt",
        "__m",
        (k1 + guard0).alias("__k1"),
        k2.alias("__k2"),
        frac.alias("__frac"),
    )

    # Pass 3 — refine inside the bracket only: distinct values + counts,
    # tiny per-group window converts to global ranks via the anchor.
    bracket = anchored.where(F.col("__v").between(F.col("__lo"), F.col("__hi")))
    bv = bracket.groupBy(*gcols, "__v").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy(*gcols).orderBy("__v") if gcols else Window.orderBy("__v")
    bv = bv.withColumn("__cum", F.sum("__c").over(w))
    if gcols:
        picked = _null_safe_join(bv, stats, gcols)
    else:
        picked = bv.crossJoin(F.broadcast(stats))
    # Global rank range covered by value v: [lt + cum − c, lt + cum − 1].
    top_rank = F.col("__lt") + F.col("__cum") - F.lit(1)
    res = picked.groupBy(*gcols, "__frac").agg(
        F.min(F.when(top_rank >= F.col("__k1"), F.col("__v"))).alias("__v1"),
        F.min(F.when(top_rank >= F.col("__k2"), F.col("__v"))).alias("__v2"),
    )
    # Bit-for-bit Spark Percentile interpolation:
    # (higher − pos)·lowerValue + (pos − lower)·higherValue, short-
    # circuited to the exact value when pos is integral — NOT the
    # algebraically-equal v1 + (v2−v1)·frac, which rounds differently
    # in the last ulp.
    frac = F.col("__frac")
    out = (
        F.when(frac == 0, F.col("__v1").cast("double"))
        .otherwise(
            (F.lit(1.0) - frac) * F.col("__v1") + frac * F.col("__v2")
        )
        .alias(result_col)
    )
    return res.select(*gcols, out)
