"""exact_quantile (operators/quantile.py): the bracketed three-pass
exact quantile must be BIT-EQUAL to Spark's buffering ``F.percentile``
on every path — min/max fallback bracket (small n), GK bracket
(n ≥ 2·accuracy), grouped and global, ties, NULL values, NULL group
keys, integer inputs — and its bracket-miss guard must survive the
optimizer (a prunable guard is no guard)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from polars_express_spark.operators.quantile import exact_quantile

QS = [0.0, 0.001, 0.25, 0.333, 0.5, 0.9, 0.999, 1.0]


def _expected_grouped(df, q):
    return {
        r["g"]: r["e"]
        for r in df.groupBy("g").agg(F.percentile("v", F.lit(q)).alias("e")).collect()
    }


def _got_grouped(df, q, **kw):
    return {
        r["g"]: r["quantile"]
        for r in exact_quantile(df, "v", q, group=["g"], **kw).collect()
    }


def test_matches_percentile_small_n_fallback(spark):
    """n < 2·accuracy → [min, max] bracket; values with ties, NULLs and
    NULL group keys, across the q sweep. Bit-equality, no tolerance."""
    rng = random.Random(7)
    rows = [
        (
            rng.choice(["a", "b", "c", None]),
            rng.choice([None, round(rng.gauss(0, 10), 2), float(rng.randint(-3, 3))]),
        )
        for _ in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, v double").repartition(7)
    for q in QS:
        assert _expected_grouped(df, q) == _got_grouped(df, q), f"q={q}"
        e = df.agg(F.percentile("v", F.lit(q)).alias("e")).collect()[0]["e"]
        g = exact_quantile(df, "v", q).collect()[0]["quantile"]
        assert e == g, f"global q={q}"


def test_matches_percentile_gk_bracket_path(spark):
    """accuracy=100 with 20k rows/group forces the GK bracket (the
    production path); interpolated positions must still be bit-equal."""
    df = (
        spark.range(0, 60_000)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.rand(seed=11) * 1000).alias("v"),
        )
        .localCheckpoint()
    )
    for q in (0.123, 0.5, 0.9, 0.999):
        assert _expected_grouped(df, q, ) == _got_grouped(
            df, q, accuracy=100
        ), f"q={q}"


def test_integer_values_and_heavy_ties(spark):
    """Integer column (percentile promotes to double) and a distribution
    that is almost all ties — the bracket must absorb boundary ties."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 7).cast("int").alias("v")
    )
    for q in (0.37, 0.5, 0.75):
        assert _expected_grouped(df, q) == _got_grouped(df, q), f"q={q}"


def test_gk_path_with_heavy_boundary_ties(spark):
    """A value holding ~40% of the mass sits exactly at the median, on
    the GK-bracket path (n ≥ 2·accuracy): the bracket must absorb the
    whole tie block and the rank math must stay exact through it."""
    df = (
        spark.range(0, 50_000)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.when(F.col("id") % 5 < 2, F.lit(100.0))
            .otherwise((F.col("id") * 17 % 1000).cast("double"))
            .alias("v"),
        )
        .localCheckpoint()
    )
    for q in (0.3, 0.5, 0.7):
        assert _expected_grouped(df, q) == _got_grouped(
            df, q, accuracy=100
        ), f"q={q}"


def test_single_row_and_all_equal(spark):
    one = spark.createDataFrame([("a", 5.0)], "g string, v double")
    assert _got_grouped(one, 0.5) == {"a": 5.0}
    same = spark.createDataFrame([("a", 2.0)] * 50, "g string, v double")
    assert _got_grouped(same, 0.7) == {"a": 2.0}


def test_non_finite_values_match_percentile(spark):
    """±Inf and NaN ride Spark's total order (NaN sorts above +Inf) —
    the GK bracket and the [min,max] fallback must both reproduce
    ``F.percentile`` through them. NaN equality is compared by isnan
    (nan != nan in Python)."""
    import math

    rows = []
    for i in range(20_000):
        if i % 100 == 0:
            v = float("inf")
        elif i % 101 == 0:
            v = float("-inf")
        elif i % 50 == 0:
            v = float("nan")
        else:
            v = float(i % 37)
        rows.append(("a", v))
    df = spark.createDataFrame(rows, "g string, v double").repartition(9)

    def same(a, b):
        return (
            a == b
            or (a is not None and b is not None and math.isnan(a) and math.isnan(b))
        )

    for q in (0.001, 0.5, 0.97, 1.0):
        for kw in ({"accuracy": 100}, {}):  # GK path, then fallback
            exp, got = _expected_grouped(df, q), _got_grouped(df, q, **kw)
            assert same(exp["a"], got["a"]), f"q={q} kw={kw}: {exp} vs {got}"


def test_mixed_bracket_paths_in_one_query(spark):
    """Group sizes straddling 2·accuracy exercise the [min,max]
    fallback and the GK bracket inside the SAME query — the per-group
    `big` switch must pick the right bracket for each."""
    import random

    rng = random.Random(42)
    rows = []
    for g, n in [("tiny", 5), ("small", 150), ("edge", 200), ("big", 5000)]:
        rows.extend((g, rng.lognormvariate(0, 3)) for _ in range(n))
    df = spark.createDataFrame(rows, "g string, v double").repartition(13)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        assert _expected_grouped(df, q) == _got_grouped(
            df, q, accuracy=100
        ), f"q={q}"


def test_all_null_group_absent(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None)], "g string, v double"
    )
    got = _got_grouped(df, 0.5)
    assert got == {"a": 2.0}  # b has no mass → absent, like groupBy-after-filter


def test_q_out_of_range_raises(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        exact_quantile(df, "v", 1.5)


def test_guard_survives_the_optimizer(spark):
    """The bracket-miss raise must still be in the OPTIMIZED plan — a
    when(c, k).otherwise(k) formulation was simplified away (observed:
    wrong silent results instead of a raise), so pin the fixed shape."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").cast("double").alias("v")
    )
    plan = (
        exact_quantile(df, "v", 0.5, group=["g"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "raise_error" in plan


def test_empty_bracket_raises_not_null(spark, monkeypatch):
    """r8 ADVICE: an EMPTY bracket (m_i = 0 — GK guarantee violated)
    used to be dropped by the refine inner join before any guard
    evaluated, emitting NULL / dropping the group instead of raising.
    Force the failure by faking the GK sketch to return brackets that
    contain no rows, on both sides of the data, and require a raise."""
    from pyspark.sql import functions as pf

    df = spark.range(0, 1000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    for bogus in (1e9, -1e9):  # bracket above all values / below all values
        monkeypatch.setattr(
            pf,
            "percentile_approx",
            lambda col, pcts, acc, _b=bogus: F.transform(pcts, lambda p: F.lit(_b)),
        )
        with pytest.raises(Exception, match="exact_quantile"):
            # accuracy=2 → every group takes the "big" GK-bracket path
            exact_quantile(df, "v", 0.5, group=["g"], accuracy=2).collect()
    monkeypatch.undo()


def test_no_full_width_shuffle_of_values(spark):
    """Scale shape (r11 tie-bounded refine): the GK sketch pass is
    present, the bracket values are pre-deduped to (value, count)
    pairs before any collect — the collect_list input is a struct of
    the masked key and its combined count, never the raw column — and
    the plan has NO window, NO generate/explode, and NO shuffle join
    (a Window or SMJ here would mean the full-width value stream is
    being re-sorted; the only join is the broadcast bracket attach).
    Exactly three exchanges, each moving combined partial buffers:
    sketch groupBy, masked (group, value) dedup, final per-group
    collect."""
    df = spark.range(0, 100_000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 37 % 9973).cast("double").alias("v"),
    )
    q = exact_quantile(df, "v", 0.5, group=["g"], accuracy=1000)
    # formatted explain — node toString truncates aggregate fn lists
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "percentile_approx" in plan  # GK sketch pass present
    assert "collect_list" in plan and "sort_array" in plan  # array refine
    assert "Window" not in plan  # no windowed re-sort of the values
    assert "Generate" not in plan  # no bracket explode — fused aggregate
    assert "SortMergeJoin" not in plan  # bracket attach is broadcast
    assert "BroadcastHashJoin" in plan
    import re

    n_shuffles = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_shuffles == 3, plan
    # the collect buffers deduped (value, count) structs, not raw rows
    assert re.search(r"collect_list\(CASE WHEN .*struct", plan) or (
        "collect_list" in plan and "__c" in plan
    ), plan


def test_tie_heavy_buffer_is_distinct_bounded(spark):
    """r10 ADVICE (the reason for the r11 refine shape): a constant
    column — EVERY row ties at the target value — must still match
    percentile, and the refine's collected array must hold ONE struct
    per distinct bracket value, not one entry per row. Checked by
    running the internal shape at a tiny accuracy over 200k rows of a
    3-value distribution whose mode straddles the median: bit-equal
    output proves the cumulative-count picks; the plan proof above
    pins that what is collected is the deduped struct."""
    df = (
        spark.range(0, 200_000)
        .select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.when(F.col("id") % 10 < 6, F.lit(7.0))
            .otherwise((F.col("id") % 10).cast("double"))
            .alias("v"),
        )
        .localCheckpoint()
    )
    for q in (0.3, 0.5, 0.7):
        assert _expected_grouped(df, q) == _got_grouped(
            df, q, accuracy=100
        ), f"q={q}"


# --- multi-quantile (exact_quantiles) ------------------------------------


def test_multi_matches_percentile_both_paths(spark):
    """One exact_quantiles call for [0.05, 0.5, 0.95] must be bit-equal
    to three grouped F.percentile aggregates — on the min/max fallback
    bracket (default accuracy ≫ n) AND the GK bracket (accuracy=100,
    20k rows/group), including disjoint far-apart brackets."""
    from polars_express_spark.operators.quantile import exact_quantiles

    df = (
        spark.range(0, 60_000)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.rand(seed=23) * 1000).alias("v"),
        )
        .localCheckpoint()
    )
    qs = [0.05, 0.5, 0.95]
    exp = {
        r["g"]: tuple(r[f"e{i}"] for i in range(3))
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", F.lit(q)).alias(f"e{i}") for i, q in enumerate(qs)])
        .collect()
    }
    for acc in (10_000, 100):  # fallback bracket / GK bracket
        got = {
            r["g"]: (r["lo"], r["mid"], r["hi"])
            for r in exact_quantiles(
                df, "v", qs, group=["g"], accuracy=acc,
                result_cols=["lo", "mid", "hi"],
            ).collect()
        }
        assert got == exp, f"accuracy={acc}"


def test_multi_duplicate_and_overlapping_qs(spark):
    """Duplicate quantiles and overlapping brackets (0.5 twice, 0.500001
    beside it) must not cross-contaminate the per-quantile refine."""
    from polars_express_spark.operators.quantile import exact_quantiles

    df = spark.range(0, 5_000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.rand(seed=5) * 10).alias("v"),
    )
    qs = [0.5, 0.5, 0.500001]
    got = exact_quantiles(
        df, "v", qs, group=["g"], result_cols=["a", "b", "c"]
    ).collect()
    exp = {
        r["g"]: (r["e0"], r["e2"])
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", F.lit(0.5)).alias("e0"),
            F.percentile("v", F.lit(0.500001)).alias("e2"),
        )
        .collect()
    }
    for r in got:
        assert r["a"] == r["b"] == exp[r["g"]][0]
        assert r["c"] == exp[r["g"]][1]


def test_multi_validation(spark):
    from polars_express_spark.operators.quantile import exact_quantiles

    df = spark.range(3).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.5, 1.5])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0.5], result_cols=["a", "b"])


# --- winsorized_mean (fused clipped mean, r19) -----------------------------


def _unfused_winsorized(df, q_lo, q_hi, group):
    """The r18 three-pass shape: exact_quantiles thresholds broadcast
    back onto the data, clipped values rounded to 6dp and summed as
    exact decimal — the reference winsorized_mean must equal."""
    from polars_express_spark.operators.quantile import exact_quantiles

    th = exact_quantiles(
        df, "v", [q_lo, q_hi], group=group, result_cols=["lo", "hi"]
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
    return (
        df.where(F.col("v").isNotNull())
        .join(F.broadcast(th), group)
        .groupBy(*group, "lo", "hi")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                F.sum(F.round(clipped, 6).cast("decimal(25,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("win_mean"),
        )
        .select(*group, "n", "lo", "hi", "win_mean")
    )


def test_winsorized_mean_matches_unfused_both_paths(spark):
    """The fused region decomposition (below-bracket→lo, bracket arrays
    →fold, between→v, above→hi) must reproduce the three-pass shape
    exactly — fallback [min,max] brackets (default accuracy ≫ n, where
    the two brackets fully overlap) AND real GK brackets (accuracy=100,
    20k rows/group), with ties and NULL values in the mix."""
    from polars_express_spark.operators.quantile import winsorized_mean

    rng = random.Random(41)
    rows = [
        (
            rng.choice(["a", "b", "c"]),
            rng.choice(
                [None, round(rng.gauss(100, 40), 2), float(rng.randint(0, 5))]
            ),
        )
        for _ in range(60_000)
    ]
    df = (
        spark.createDataFrame(rows, "g string, v double")
        .repartition(7)
        .localCheckpoint()
    )
    for acc in (10_000_000, 100):  # fallback bracket / GK bracket
        got = {
            r["g"]: (r["n"], r["lo"], r["hi"], r["win_mean"])
            for r in winsorized_mean(
                df, "v", 0.05, 0.95, group=["g"], accuracy=acc
            ).collect()
        }
        exp = {
            r["g"]: (r["n"], r["lo"], r["hi"], r["win_mean"])
            for r in _unfused_winsorized(df, 0.05, 0.95, ["g"]).collect()
        }
        assert got == exp, f"accuracy={acc}"


def test_winsorized_mean_global_and_validation(spark):
    from polars_express_spark.operators.quantile import winsorized_mean

    df = spark.range(0, 5_000).select(
        (F.rand(seed=9) * 1000).alias("v")
    ).localCheckpoint()
    got = winsorized_mean(df, "v", 0.1, 0.9).collect()[0]
    exp_th = df.agg(
        F.percentile("v", F.lit(0.1)).alias("lo"),
        F.percentile("v", F.lit(0.9)).alias("hi"),
    ).collect()[0]
    assert (got["lo"], got["hi"]) == (exp_th["lo"], exp_th["hi"])
    clipped = F.least(F.greatest(F.col("v"), F.lit(got["lo"])), F.lit(got["hi"]))
    exp_mean = df.agg(
        (
            F.sum(F.round(clipped, 6).cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("m")
    ).collect()[0]["m"]
    assert got["win_mean"] == exp_mean
    assert got["n"] == 5_000
    with pytest.raises(ValueError):
        winsorized_mean(df, "v", 0.9, 0.1)


# --- rolling_quantile_binned (wide-frame rolling quantile) -----------------


def test_rolling_binned_accuracy_at_integral_ranks(spark):
    """Where the target rank lands on a data point (odd frame counts at
    q=0.5), the value-space estimate must sit within alpha of the EXACT
    rolling median; everywhere it must sit between the adjacent bins'
    representatives (gamma-ratio envelope of the exact value)."""
    from pyspark.sql import Window as W

    from polars_express_spark.operators.quantile import rolling_quantile_binned

    df = spark.range(0, 4_000).select(
        (F.col("id") % 8).alias("g"),
        F.col("id").alias("i"),
        (F.exp((F.col("id") * 37 % 613).cast("double") / F.lit(100.0))).alias("v"),
    ).localCheckpoint()
    alpha = 0.05
    got = rolling_quantile_binned(
        df, "v", 0.5, partition=["g"], order=["i"], preceding=30, alpha=alpha
    ).collect()
    w = W.partitionBy("g").orderBy("i").rowsBetween(-30, W.currentRow)
    frames = {
        r["i"]: sorted(r["fr"])
        for r in df.select("i", F.collect_list("v").over(w).alias("fr")).collect()
    }
    checked_odd = 0
    for r in got:
        fr = frames[r["i"]]
        n = len(fr)
        v_lo = fr[(n - 1) // 2]  # lower/higher middle order statistics
        v_hi = fr[n // 2]
        if n % 2 == 1:
            assert abs(r["rq"] - v_lo) <= alpha * v_lo + 1e-12, (r["i"], r["rq"], v_lo)
            checked_odd += 1
        # envelope: between the adjacent order statistics, each
        # stretched by its bin's alpha slack (the documented guarantee
        # for fractional ranks — NOT within alpha of the value-space
        # interpolation, which can sit anywhere in (v_lo, v_hi))
        assert v_lo * (1 - alpha) - 1e-12 <= r["rq"] <= v_hi * (1 + alpha) + 1e-12
    assert checked_odd > 1000  # the alpha claim was actually exercised


def test_rolling_binned_rejects_nonpositive(spark):
    from polars_express_spark.operators.quantile import rolling_quantile_binned

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, 0.0)], "g string, i int, v double"
    )
    with pytest.raises(Exception, match="strictly positive"):
        rolling_quantile_binned(
            df, "v", 0.5, partition=["g"], order=["i"], preceding=5
        ).collect()


def test_rolling_binned_plan_buffers_bins_not_frame(spark):
    """Scale shape: the window aggregate is percentile over the INT bin
    column (frame buffer = distinct-bin map), with NO collect_list /
    sort_array anywhere — the wide-frame trap this operator exists to
    avoid is buffering the frame itself."""
    from polars_express_spark.operators.quantile import rolling_quantile_binned

    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("g"),
        F.col("id").alias("i"),
        (F.col("id") % 97 + 1).cast("double").alias("v"),
    )
    out = rolling_quantile_binned(
        df, "v", 0.5, partition=["g"], order=["i"], preceding=200
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile(__bin" in plan
    assert "collect_list" not in plan and "sort_array" not in plan
    assert "raise_error" in plan  # positive-domain guard not pruned
