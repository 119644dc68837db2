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
in two bounded passes:

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
2. **Anchor + refine** (one fused pass, r11 tie-bounded): every
   non-bracket row's value is masked to NULL and the stream is
   pre-aggregated on (group, masked value) — bracket rows collapse to
   DISTINCT ``(value, count)`` pairs, all other rows of a group
   collapse into the single NULL-key row (which still carries the
   per-bracket exact ``count(v < lo)`` partials, so the anchor counts
   sum over ALL rows). The final aggregate collects each bracket's
   pairs into one sorted array per quantile: its buffer is bounded by
   the DISTINCT values inside the bracket — ≤ ~8n/accuracy + 2 by the
   GK rank guarantee, INDEPENDENT of tie mass. (The r10 shape
   collected raw bracket ROWS, so a mode straddling the target rank
   buffered its whole tie block — up to the whole group — in one
   aggregation buffer: the exact trap this module exists to avoid;
   r10 ADVICE.) Order statistics are cumulative-count picks over the
   deduped array (global rank ``k`` → first pair whose running count
   exceeds ``k − count(v < lo)``), interpolated with ``pos = q·(n−1)``
   computed in double exactly as Spark's Percentile does.

Task memory is bounded by the brackets' distinct-value count
(~8n/accuracy + 2 per quantile), tunable independently of data size —
at 100 TB, raise ``accuracy`` so the brackets stay executor-sized;
every other stage is a constant-state streaming aggregate. The
tie-collapse costs one extra exchange over the r10 two-shuffle shape,
but every exchange here moves combined partial buffers (GK sketches,
deduped pairs, per-group scalars) — never the full-width value stream.

Reference analog: Polars ``quantile`` is a single-node column sort
(linked surface, reference Cargo.toml:8); this is its shuffle-safe
distributed form with identical interpolation semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _null_safe_join(left: DataFrame, right: DataFrame, cols: list[str]):
    """Broadcast inner join on group columns, NULL keys matching NULL
    keys (percentile keeps NULL groups; a plain equi-join would drop
    them). The right side is the per-group bracket frame — group
    cardinality, always the broadcast side."""
    r = right
    for c in cols:
        r = r.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in cols:
        eq = F.col(c).eqNullSafe(F.col(f"__r_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = left.join(F.broadcast(r), cond, "inner")
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

    All quantiles share the two passes: ONE GK sketch evaluated at
    every bracket percentage, and ONE fused anchor+refine aggregate
    carrying every bracket's below-count and sorted bracket array.
    Asking for the 5th/50th/95th percentiles therefore costs the same
    two input scans as asking for one.

    NULL values are ignored (as percentile does); a group with no
    non-null values is absent from the result. NULL group keys form
    their own group, as in groupBy.

    ``accuracy`` trades bracket size for sketch size: the refine stage
    touches ~8n/accuracy rows per quantile (plus ties of the boundary
    values), so at larger n raise accuracy to keep brackets
    executor-sized.

    The input is scanned twice (bracket / fused anchor+refine) — fine
    over a pruned columnar source, but CACHE OR CHECKPOINT a derived
    frame first (joins, per-key aggregates) or the upstream pipeline
    runs twice. Prefer plain grouped ``F.percentile`` when groups
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
    stats = _bracketed_stats(vals, gcols, qs, accuracy)

    # Order-statistic picks (shared helper; see _pick_quantile).
    outs = [
        _pick_quantile(q, F.col(f"__lt{i}"), F.col(f"__sz{i}"), F.col(f"__arr{i}")).alias(
            result_cols[i]
        )
        for i, q in enumerate(qs)
    ]
    return stats.select(*gcols, *outs)


def _bracketed_stats(vals, gcols, qs, accuracy, extra_pre=(), extra_final=()):
    """The two bounded passes shared by exact_quantiles and
    winsorized_mean: (1) one GK sketch per group evaluated at every
    bracket percentage; (2) the fused anchor+refine aggregate. Returns
    the per-group ``stats`` frame carrying ``__n`` and, per quantile i,
    ``__lt{i}`` / ``__sz{i}`` / ``__arr{i}`` (below-count, bracket row
    count, sorted distinct (value, count) pairs).

    ``extra_pre`` / ``extra_final`` are callables receiving no args and
    returning extra aggregate Columns appended to the pre-aggregate
    (they may reference ``__v``, ``__n``, ``__los``, ``__his``) and the
    final aggregate (they may reference any pre output) — how
    winsorized_mean fuses its clipped-sum region partials into the same
    scan instead of paying a third pass (r19, guide §6 scan-sharing).
    """
    m = len(qs)
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

    # Pass 2 — FUSED anchor + refine (one scan), in TWO aggregate
    # stages so the collect buffer is tie-bounded (r11, ADVICE):
    #   2a. mask non-bracket values to NULL and pre-aggregate on
    #       (group, masked value): bracket rows collapse to distinct
    #       (value, count) pairs; every other row of a group collapses
    #       into the NULL-key row. The per-bracket below-counts
    #       (count(v < lo_i)) are partial-summed HERE, over ALL rows,
    #       so masking loses no anchor information. Map-side combine
    #       means the exchange carries distinct-bracket-values + one
    #       row per (map partition, group) — never raw rows.
    #   2b. per group, sum the below-counts and collect each bracket's
    #       (value, count) structs into one sorted array: the buffer is
    #       bounded by the bracket's DISTINCT values (≤ ~8n/accuracy
    #       + 2 boundary values by the GK rank guarantee), independent
    #       of tie mass — collecting raw rows here (the r10 shape) let
    #       a mode straddling the target rank pull its whole tie block
    #       into one buffer. Still no join after the bracket attach;
    #       one extra combined-partial exchange vs r10.
    if gcols:
        anchored = _null_safe_join(vals, br, gcols)
    else:
        anchored = vals.crossJoin(F.broadcast(br))
    in_any = None
    for i in range(m):
        bet = F.col("__v").between(
            F.element_at("__los", i + 1), F.element_at("__his", i + 1)
        )
        in_any = bet if in_any is None else (in_any | bet)
    masked = anchored.withColumn("__key", F.when(in_any, F.col("__v")))
    # __los/__his are group-constant: carry them through as first()
    # aggregates rather than grouping KEYS, so the hash aggregate never
    # hashes two arrays per input row
    pre_exprs = [
        F.count(F.lit(1)).alias("__c"),
        F.first("__los").alias("__los"),
        F.first("__his").alias("__his"),
    ]
    for i in range(m):
        lo_i = F.element_at("__los", i + 1)
        pre_exprs.append(
            F.count(F.when(F.col("__v") < lo_i, 1)).alias(f"__ltp{i}")
        )
    pre_exprs.extend(c() for c in extra_pre)
    pre = masked.groupBy(*gcols, "__n", "__key").agg(*pre_exprs)
    agg_exprs = []
    for i in range(m):
        lo_i = F.element_at("__los", i + 1)
        hi_i = F.element_at("__his", i + 1)
        in_i = F.col("__key").between(lo_i, hi_i)  # NULL key → NULL → skipped
        agg_exprs.append(F.sum(f"__ltp{i}").alias(f"__lt{i}"))
        agg_exprs.append(
            F.coalesce(F.sum(F.when(in_i, F.col("__c"))), F.lit(0)).alias(f"__sz{i}")
        )
        agg_exprs.append(
            F.sort_array(
                F.collect_list(
                    F.when(
                        in_i,
                        F.struct(
                            F.col("__key").cast("double").alias("v"),
                            F.col("__c").alias("c"),
                        ),
                    )
                )
            ).alias(f"__arr{i}")
        )
    agg_exprs.extend(c() for c in extra_final)
    return pre.groupBy(*gcols, "__n").agg(*agg_exprs)


def _pick_quantile(q: float, lt_i, sz_i, arr_i, n_col: str = "__n"):
    """Exact interpolated order-statistic pick over one bracket's sorted
    (value, count) array — double pos exactly as Spark's Percentile:
    pos = q·(n−1), lower = floor(pos), the fraction interpolates.
    Global rank k maps to bracket-local rank k − count(v < lo); the
    pick is a cumulative-count fold over the sorted (value, count)
    pairs: the first pair whose running count exceeds the local rank.
    The bracket-soundness raise is entangled INTO the fold's INIT
    accumulator (valid → cum starts at 0, invalid → raise) — the init
    evaluates even for an EMPTY array (the fold's finish applies to
    it), so an empty bracket (size 0 fails lt + sz > k2) raises
    instead of silently NULL-ing or dropping the group (r8 ADVICE
    regression, tested by faking the GK sketch), and cum is
    load-bearing in every merge step, an arithmetic dependency the
    optimizer cannot simplify away (a plain assert_true column, or
    when(c, k).otherwise(k), gets pruned)."""
    pos = F.lit(float(q)) * (F.col(n_col) - F.lit(1)).cast("double")
    k1 = F.floor(pos).cast("long")
    frac = pos - F.floor(pos)
    k2 = F.when(frac > 0, k1 + 1).otherwise(k1)
    valid = (lt_i <= k1) & ((lt_i + sz_i) > k2)
    guard0 = F.when(valid, F.lit(0).cast("long")).otherwise(
        F.expr(
            "raise_error('exact_quantile: bracket missed the target rank')"
        ).cast("long")
    )
    tgt1 = k1 - lt_i  # 0-based local ranks inside the bracket
    tgt2 = k2 - lt_i
    init = F.struct(
        guard0.alias("cum"),
        F.lit(None).cast("double").alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )

    def step(acc, x):
        cum2 = acc["cum"] + x["c"]
        return F.struct(
            cum2.alias("cum"),
            F.when(acc["v1"].isNull() & (cum2 > tgt1), x["v"])
            .otherwise(acc["v1"])
            .alias("v1"),
            F.when(acc["v2"].isNull() & (cum2 > tgt2), x["v"])
            .otherwise(acc["v2"])
            .alias("v2"),
        )

    picked = F.aggregate(arr_i, init, step)
    v1 = picked["v1"]
    v2 = picked["v2"]
    # Bit-for-bit Spark Percentile interpolation, short-circuited
    # to the exact value when pos is integral — NOT the
    # algebraically-equal v1 + (v2−v1)·frac, which rounds
    # differently in the last ulp.
    return F.when(frac == 0, v1).otherwise((F.lit(1.0) - frac) * v1 + frac * v2)


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


def winsorized_mean(
    df: DataFrame,
    value: str,
    q_lo: float,
    q_hi: float,
    group: list[str] | None = None,
    accuracy: int = 10_000,
    result_cols: tuple[str, str] = ("lo", "hi"),
    round_dp: int = 6,
) -> DataFrame:
    """(group..., n, <lo>, <hi>, win_mean) — exact per-group winsorized
    mean WITH its clip thresholds, in the SAME two bounded passes
    exact_quantiles pays for the thresholds alone (r19 optimization
    round, guide §6 scan-sharing + §5 bounded memory — the previous
    shape was exact_quantiles (2 scans) + a broadcast-join + a THIRD
    full scan for the clipped sum).

    <lo>/<hi> are the exact linear-interpolated q_lo/q_hi quantiles
    (≡ F.percentile ≡ DuckDB quantile_cont, same pick expressions as
    exact_quantiles). ``win_mean`` is avg(round(clip(v, lo, hi),
    round_dp)) with the sum carried as exact decimal(38,6) — order-free
    and bit-equal to summing round(clip(v),dp)::decimal row by row,
    which is what the three-pass join shape computed.

    Fusion argument: pass 2 already collects each bracket's distinct
    (value, count) pairs and counts rows below each bracket. Outside
    the brackets the clipped value is known WITHOUT the exact
    thresholds — v below the q_lo bracket clips to lo, v above the
    q_hi bracket clips to hi, and v strictly between the brackets keeps
    v — so the clipped sum decomposes into three region partials
    aggregated in the same scan, plus per-group folds over the
    already-collected bracket arrays once lo/hi are resolved. Brackets
    are rank-monotone values from ONE GK sketch (blo1 ≤ bhi1, blo2 ≤
    bhi2, blo1 ≤ blo2, bhi1 ≤ bhi2), and the five regions
    {v < blo1}, {blo1 ≤ v ≤ bhi1}, {bhi1 < v < blo2},
    {blo2 ≤ v ≤ bhi2 AND v > bhi1}, {v > bhi2} are disjoint and cover
    every row even when the brackets overlap (small-group [min, max]
    fallback: the q_lo bracket's array absorbs everything, the other
    regions are empty by construction).

    NULL values are ignored everywhere (n, sum, thresholds), exactly
    as percentile ignores them; a caller whose count contract differs
    should use exact_quantiles plus an explicit join instead.
    """
    if not 0.0 <= q_lo <= q_hi <= 1.0:
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, got {q_lo}, {q_hi}")
    dec = "decimal(38,6)"
    gcols = list(group) if group else []
    vals = df.select(*gcols, F.col(value).alias("__v")).where(F.col("__v").isNotNull())

    def _r(c):
        return F.round(c, round_dp).cast(dec)

    # region partials fused into pass 2a (see _bracketed_stats):
    # count above the q_hi bracket, and the exact-decimal sum of the
    # strictly-between-brackets region (those rows keep their value)
    def _gt_pre():
        return F.count(
            F.when(F.col("__v") > F.element_at("__his", 2), 1)
        ).alias("__gtp")

    def _mid_pre():
        return F.sum(
            F.when(
                (F.col("__v") > F.element_at("__his", 1))
                & (F.col("__v") < F.element_at("__los", 2)),
                _r(F.col("__v")),
            )
        ).alias("__midp")

    def _gt_final():
        return F.sum("__gtp").alias("__gt")

    def _mid_final():
        return F.coalesce(F.sum("__midp"), F.lit(0).cast(dec)).alias("__mid")

    def _his_final():
        # bracket bounds are group constants; the folds below need bhi1
        return F.first("__his").alias("__bhis")

    stats = _bracketed_stats(
        vals,
        gcols,
        [q_lo, q_hi],
        accuracy,
        extra_pre=(_gt_pre, _mid_pre),
        extra_final=(_gt_final, _mid_final, _his_final),
    )

    lo = _pick_quantile(q_lo, F.col("__lt0"), F.col("__sz0"), F.col("__arr0"))
    hi = _pick_quantile(q_hi, F.col("__lt1"), F.col("__sz1"), F.col("__arr1"))
    # Materialize the two pick expressions as COLUMNS of an intermediate
    # projection and let the folds below reference plain attributes —
    # inlining the full pick trees (an aggregate() fold each) into every
    # fold lambda multiplied the codegen'd expression and measured +0.6s
    # of compile per invocation on a 5-row frame (r19; interleaved med
    # 2.57 inlined vs 1.94 two-step vs 2.34 for the unfused three-pass
    # shape). CollapseProject leaves the split alone: the picks are
    # non-cheap producers consumed more than once.
    mid = stats.select(
        *gcols,
        "__n",
        "__lt0",
        "__gt",
        "__mid",
        "__arr0",
        "__arr1",
        "__bhis",
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    lo_c, hi_c = F.col("__lo"), F.col("__hi")

    def _clip_fold(arr, cond):
        # Σ round(clip(v, lo, hi), dp)::decimal · c over the bracket's
        # (value, count) pairs, restricted to `cond` (used to keep the
        # two brackets' regions disjoint when they overlap)
        return F.aggregate(
            arr,
            F.lit(0).cast(dec),
            lambda acc, x: (
                acc
                + F.coalesce(
                    F.when(
                        cond(x),
                        _r(F.least(F.greatest(x["v"], lo_c), hi_c))
                        * x["c"].cast("decimal(20,0)"),
                    ),
                    F.lit(0),
                ).cast(dec)
            ).cast(dec),
        )

    bhi1 = F.element_at("__bhis", 1)
    win_sum = (
        (_r(lo_c) * F.col("__lt0").cast("decimal(20,0)")).cast(dec)  # v < blo1 → lo
        + _clip_fold(F.col("__arr0"), lambda x: F.lit(True))  # q_lo bracket
        + F.col("__mid")  # strictly between brackets → v
        + _clip_fold(F.col("__arr1"), lambda x: x["v"] > bhi1)  # q_hi bracket \ overlap
        + (_r(hi_c) * F.col("__gt").cast("decimal(20,0)")).cast(dec)  # v > bhi2 → hi
    )
    return mid.select(
        *gcols,
        F.col("__n").alias("n"),
        lo_c.alias(result_cols[0]),
        hi_c.alias(result_cols[1]),
        (win_sum.cast("double") / F.col("__n").cast("double")).alias("win_mean"),
    )


def rolling_quantile_binned(
    df: DataFrame,
    value: str,
    q: float,
    partition: list[str],
    order: list[str],
    preceding: int,
    alpha: float = 0.05,
    result_col: str = "rq",
) -> DataFrame:
    """(input columns..., <result_col>_bin, <result_col>) — rolling
    q-quantile over a WIDE ``ROWS BETWEEN preceding PRECEDING AND
    CURRENT ROW`` frame with per-row window state bounded by the BIN
    count, not the frame width.

    The exact rolling median (queries/windows.py q_rolling_median)
    buffers and sorts the whole frame per row — fine at 7 rows, an
    executor-memory trap at thousands. This is the declared scale path:
    values are log-binned at relative resolution α (bin i covers
    (γ^(i−1), γ^i], γ = (1+α)/(1−α) — the DDSketch scheme shared with
    streaming/sketch.StreamingQuantile), and the windowed aggregate is
    Spark's Percentile over the SMALL INTEGER bin indices. Percentile's
    buffer is a value→count map of the frame, so binning caps it at the
    number of distinct bins the frame spans (a few hundred for any
    physical dynamic range) however wide the frame grows — while
    collect_list's buffer is the frame itself.

    ``<result_col>_bin`` is the bin-space rolling quantile (fractional
    between adjacent occupied bins, exactly Spark's / DuckDB's
    interpolation — for dyadic q over integer bins the doubles are
    bit-equal across engines, which is what the correctness hash
    pins). ``<result_col>`` maps it back to a value, 2γ^b/(γ+1):
    within α of the true rolling quantile whenever the target rank
    lands on a data point (odd-count frames at q=0.5); between the two
    adjacent bins' representatives (a geometric interpolation)
    otherwise.

    Positive values only (log bins): a non-positive or NULL value
    raises via the same arithmetically-entangled guard the exact
    operator uses (pruning-proof). NULL handling is therefore STRICTER
    than percentile's skip-NULLs — a rolling statistic that silently
    skipped rows would misalign frames with the caller's intent.
    """
    import math

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from pyspark.sql import Window

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)
    c = F.col(value).cast("double")
    # the guard sits INSIDE the log argument: a separate additive guard
    # term would be skipped by Add's null short-circuit (log(NULL) nulls
    # the left operand before the guard ever evaluates), silently
    # turning bad rows into percentile-skipped NULL bins
    guarded = F.when(c > 0, c).otherwise(
        F.expr(
            "raise_error('rolling_quantile_binned: value must be"
            " strictly positive (log bins)')"
        ).cast("double")
    )
    binned = df.withColumn(
        "__bin", F.ceil(F.log(guarded) / F.lit(lg)).cast("bigint")
    )
    w = (
        Window.partitionBy(*partition)
        .orderBy(*order)
        .rowsBetween(-preceding, Window.currentRow)
    )
    # pin the window expression in ONE intermediate select (the
    # q_rolling_median lesson: per-reference re-extraction otherwise)
    pinned = binned.withColumn(
        f"{result_col}_bin", F.percentile("__bin", F.lit(float(q))).over(w)
    ).drop("__bin")
    b = F.col(f"{result_col}_bin")
    est = F.lit(2.0) * F.pow(F.lit(gamma), b) / F.lit(gamma + 1.0)
    return pinned.withColumn(result_col, est)
