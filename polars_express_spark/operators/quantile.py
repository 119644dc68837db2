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


def _null_safe_join(
    left: DataFrame,
    right: DataFrame,
    cols: list[str],
    how: str = "inner",
    broadcast_right: bool = True,
):
    """Join on group columns, NULL keys matching NULL keys (percentile
    keeps NULL groups; a plain equi-join would drop them). The right
    side is broadcast by default; pass ``broadcast_right=False`` when
    the join must preserve the right side (Spark cannot build a
    broadcast hash join from the outer side of a right outer join)."""
    if how == "right":
        # rename the LEFT (non-preserved) side: preserved right rows
        # with no match must keep their own key columns, not the
        # left's NULLs
        l2 = left
        for c in cols:
            l2 = l2.withColumnRenamed(c, f"__l_{c}")
        cond = None
        for c in cols:
            eq = F.col(f"__l_{c}").eqNullSafe(F.col(c))
            cond = eq if cond is None else (cond & eq)
        j = l2.join(F.broadcast(right) if broadcast_right else right, cond, how)
        return j.drop(*[f"__l_{c}" for c in cols])
    r = right
    for c in cols:
        r = r.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in cols:
        eq = F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = left.join(F.broadcast(r) if broadcast_right else r, cond, how)
    return j.drop(*[f"__r_{c}" for c in cols])


def exact_quantiles(
    df: DataFrame,
    value: str,
    qs: list[float],
    group: list[str] | None = None,
    accuracy: int = 10_000,
    result_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., <result_cols...>) — exact linear-interpolated quantiles
    per group, one output column per entry of ``qs``, each equal to
    ``F.percentile(value, q)`` (and DuckDB ``quantile_cont``), computed
    without ever buffering a whole group in one task.

    All quantiles share the three passes: ONE GK sketch evaluated at
    every bracket percentage, ONE counting pass carrying every
    bracket's below/inside anchors, and ONE refine over the union of
    bracket rows (each row tagged with the brackets it falls in via an
    expression-level ``filter(sequence(...))`` — brackets are tiny and
    rarely overlap, so the expansion factor is ~1). Asking for the
    5th/50th/95th percentiles therefore costs the same three input
    scans as asking for one.

    NULL values are ignored (as percentile does); a group with no
    non-null values is absent from the result. NULL group keys form
    their own group, as in groupBy.

    ``accuracy`` trades bracket size for sketch size: the refine stage
    touches ~8n/accuracy rows per quantile (plus ties of the boundary
    values), so at larger n raise accuracy to keep brackets
    executor-sized.

    The input is scanned three times (bracket / anchor / refine) — fine
    over a pruned columnar source, but CACHE OR CHECKPOINT a derived
    frame first (joins, per-key aggregates) or the upstream pipeline
    runs three times. Prefer plain grouped ``F.percentile`` when groups
    are many-and-small or values low-cardinality: its per-group
    distinct-value map is already bounded there, with one scan.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0, 1], got {q}")
    m = len(qs)
    if result_cols is None:
        result_cols = [f"quantile_{i}" for i in range(m)]
    if len(result_cols) != m:
        raise ValueError("result_cols must match qs in length")
    gcols = list(group) if group else []
    vals = df.select(*gcols, F.col(value).alias("__v")).where(F.col("__v").isNotNull())

    # Rank-margin math (each bracket must contain its order statistics
    # k1 = ⌊q(n−1)⌋ and k2 = ⌈q(n−1)⌉): GK at percentage p returns a
    # value whose rank is within εn of p·n (ε = 1/accuracy), and the
    # p·n vs q·(n−1) definition offset is ≤ 1. With a 4ε percentage
    # margin, rank(lo) ≤ (q−4ε)n + εn + 1 = qn − 3εn + 1 ≤ k1 whenever
    # 3εn ≥ 6 — i.e. n ≥ 2·accuracy (symmetrically for hi). Below that
    # the margin cannot be guaranteed in ranks, so every bracket falls
    # back to [min, max]: the "whole group" there is ≤ 2·accuracy rows,
    # still bounded by construction.
    eps = 4.0 / accuracy
    pcts: list[float] = []
    for q in qs:
        pcts += [max(0.0, q - eps), min(1.0, q + eps)]

    # Pass 1 — ONE GK sketch per group, evaluated at all 2m bracket
    # percentages, plus n and min/max (one scan, mergeable state).
    big = F.col("__n") >= F.lit(2 * accuracy)
    br = (
        vals.groupBy(*gcols)
        .agg(
            F.count("__v").alias("__n"),
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
            F.percentile_approx(
                "__v", F.array(*[F.lit(p) for p in pcts]), F.lit(accuracy)
            ).alias("__b"),
        )
        .select(
            *gcols,
            "__n",
            F.array(
                *[
                    F.when(big, F.col("__b")[2 * i]).otherwise(F.col("__mn"))
                    for i in range(m)
                ]
            ).alias("__los"),
            F.array(
                *[
                    F.when(big, F.col("__b")[2 * i + 1]).otherwise(F.col("__mx"))
                    for i in range(m)
                ]
            ).alias("__his"),
        )
    )

    # Pass 2 — exact anchors for every bracket in one counting
    # aggregate: count below lo_i, count inside [lo_i, hi_i].
    if gcols:
        anchored = _null_safe_join(vals, br, gcols)
    else:
        anchored = vals.crossJoin(F.broadcast(br))
    stats = anchored.groupBy(*gcols, "__n").agg(
        *[
            F.count(F.when(F.col("__v") < F.element_at("__los", i + 1), 1)).alias(
                f"__lt{i}"
            )
            for i in range(m)
        ],
        *[
            F.count(
                F.when(
                    F.col("__v").between(
                        F.element_at("__los", i + 1), F.element_at("__his", i + 1)
                    ),
                    1,
                )
            ).alias(f"__m{i}")
            for i in range(m)
        ],
    )

    # Per-quantile target order statistics, reshaped long (one row per
    # (group, quantile)) — double pos exactly as Spark's Percentile:
    # pos = q·(n−1), lower = floor(pos), the fraction interpolates.
    # The bracket-soundness raise is entangled INTO the rank the picks
    # compare against (valid → +0, invalid → raise), an arithmetic
    # dependency the optimizer cannot simplify away (a plain
    # assert_true column, or when(c, k).otherwise(k), gets pruned).
    per_q = []
    for i, q in enumerate(qs):
        pos = F.lit(float(q)) * (F.col("__n") - F.lit(1)).cast("double")
        k1 = F.floor(pos).cast("long")
        frac = pos - F.floor(pos)
        k2 = F.when(frac > 0, k1 + 1).otherwise(k1)
        lt_i, m_i = F.col(f"__lt{i}"), F.col(f"__m{i}")
        valid = (lt_i <= k1) & ((lt_i + m_i) > k2)
        guard0 = F.when(valid, F.lit(0)).otherwise(
            F.expr(
                "raise_error('exact_quantile: bracket missed the target rank')"
            ).cast("long")
        )
        per_q.append(
            F.struct(
                F.lit(i).alias("__qi"),
                (k1 + guard0).alias("__k1"),
                k2.alias("__k2"),
                frac.alias("__frac"),
                lt_i.alias("__lt"),
            )
        )
    stats_long = stats.select(*gcols, F.explode(F.array(*per_q)).alias("__s")).select(
        *gcols, "__s.*"
    )

    # Pass 3 — refine inside the brackets only, all quantiles in one
    # scan: each row explodes into the (usually 0 or 1) brackets it
    # belongs to, then distinct (group, quantile, value) counts and a
    # tiny per-(group, quantile) window convert bracket-local
    # cumulative counts to GLOBAL ranks via the pass-2 anchor.
    bracket = anchored.select(
        *gcols,
        "__v",
        F.explode(
            F.expr(
                f"filter(sequence(0, {m - 1}),"
                " i -> __v >= __los[i] AND __v <= __his[i])"
            )
        ).alias("__qi"),
    )
    bv = bracket.groupBy(*gcols, "__qi", "__v").agg(F.count(F.lit(1)).alias("__c"))
    pcols = [*gcols, "__qi"]
    w = Window.partitionBy(*pcols).orderBy("__v")
    bv = bv.withColumn("__cum", F.sum("__c").over(w))
    # RIGHT outer, stats_long preserved: an EMPTY bracket (m_i = 0 —
    # only reachable if the GK rank guarantee were violated) has no bv
    # rows, and an inner join would drop the guarded stats_long row
    # before any guard evaluates, silently emitting NULL (or dropping
    # the group). Preserving the spine keeps one all-NULL candidate row
    # per (group, quantile), which the __v1-null raise below turns into
    # a loud failure. No broadcast: Spark cannot build the broadcast
    # side opposite a right outer join, and bv (bracket-sized, up to
    # executor-sized at tuned accuracy) is the side that must stream —
    # its window shuffle on pcols is reused by this join.
    # SHUFFLE_HASH on the bracket side: a right outer join builds from
    # the left, and hashing bv (bounded by the bracket contract) skips
    # the sort-merge sorts of both sides.
    picked = _null_safe_join(
        bv.hint("SHUFFLE_HASH"), stats_long, pcols, how="right", broadcast_right=False
    )
    # Global rank range covered by value v: [lt + cum − c, lt + cum − 1].
    top_rank = F.col("__lt") + F.col("__cum") - F.lit(1)
    res = picked.groupBy(*pcols, "__frac").agg(
        F.min(F.when(top_rank >= F.col("__k1"), F.col("__v"))).alias("__v1"),
        F.min(F.when(top_rank >= F.col("__k2"), F.col("__v"))).alias("__v2"),
    )
    # Bit-for-bit Spark Percentile interpolation:
    # (higher − pos)·lowerValue + (pos − lower)·higherValue, short-
    # circuited to the exact value when pos is integral — NOT the
    # algebraically-equal v1 + (v2−v1)·frac, which rounds differently
    # in the last ulp.
    frac = F.col("__frac")
    out = F.when(frac == 0, F.col("__v1").cast("double")).otherwise(
        (F.lit(1.0) - frac) * F.col("__v1") + frac * F.col("__v2")
    )
    # Empty/missed-bracket raise: a sound non-empty bracket always
    # yields a non-null lower order statistic (some bracket row covers
    # rank k1). NULL here means the bracket held no rows at the target
    # rank — the case the __k1-entangled guard cannot see, because
    # `top_rank >= __k1` short-circuits on its NULL left operand before
    # evaluating __k1. The raise sits in the taken CASE branch, so it
    # cannot be pruned and never fires on the valid path.
    out = F.when(
        F.col("__v1").isNull(),
        F.expr(
            "raise_error('exact_quantile: bracket contained no rows"
            " at the target rank')"
        ).cast("double"),
    ).otherwise(out)
    long_out = res.select(*pcols, out.alias("__out"))
    # Back to one row per group: brackets are sound, so every group has
    # exactly one row per quantile — conditional max (never NULL) is a
    # deterministic pivot with statically-known quantile ids.
    return long_out.groupBy(*gcols).agg(
        *[
            F.max(F.when(F.col("__qi") == i, F.col("__out"))).alias(result_cols[i])
            for i in range(m)
        ]
    )


def exact_quantile(
    df: DataFrame,
    value: str,
    q: float,
    group: list[str] | None = None,
    accuracy: int = 10_000,
    result_col: str = "quantile",
) -> DataFrame:
    """(group..., <result_col>) — exact linear-interpolated q-quantile
    per group; the single-quantile form of :func:`exact_quantiles`
    (same passes, same contracts)."""
    return exact_quantiles(
        df, value, [q], group=group, accuracy=accuracy, result_cols=[result_col]
    )
