"""bucketed_cumsum (operators/prefix.py): the two-level distributed
prefix sum must equal the naive global-window running total exactly,
independent of bucket count and input partitioning."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_express_spark.operators.prefix import bucketed_cumsum


def _naive(df, order_col, value_cols):
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in value_cols:
        out = out.withColumn(f"cum_{c}", F.sum(c).over(w))
    return out


def test_bucketed_cumsum_matches_global_window(spark):
    rng = random.Random(7)
    keys = rng.sample(range(-(10**6), 10**6), 500)
    rows = [(k, rng.randint(-50, 50), rng.randint(0, 9)) for k in keys]
    df = spark.createDataFrame(rows, "k long, a long, b long").repartition(7)
    for n_buckets in (1, 4, 64):
        got = {
            r["k"]: (r["cum_a"], r["cum_b"])
            for r in bucketed_cumsum(df, "k", ["a", "b"], n_buckets).collect()
        }
        want = {
            r["k"]: (r["cum_a"], r["cum_b"])
            for r in _naive(df, "k", ["a", "b"]).collect()
        }
        assert got == want, f"n_buckets={n_buckets}"


def test_bucketed_cumsum_single_key(spark):
    df = spark.createDataFrame([(5, 3)], "k long, a long")
    rows = bucketed_cumsum(df, "k", ["a"], 8).collect()
    assert len(rows) == 1 and rows[0]["cum_a"] == 3


def test_bucketed_cumsum_no_global_partition(spark):
    """The physical plan must not contain a windowing over an
    unpartitioned global sort of the full input — every Window's
    partition spec is the bucket column (the offsets frame is B rows)."""
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("a")
    )
    out = bucketed_cumsum(df, "k", ["a"], 32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the intra-bucket window runs partitioned; the only unpartitioned
    # window is over the 32-row offsets frame, whose input is the
    # aggregated subtotals, never the base relation
    assert "__bkt" in plan


def test_split4_sums_match_decimal_reference(spark):
    """The split-long accumulator must reproduce the decimal-exact sum
    bit-for-bit on random ≤2-dp non-negative data, at any partitioning
    (long sums are associative, so this is partition-invariant by
    construction — the test pins it anyway)."""
    import random
    from decimal import Decimal

    from pyspark.sql import functions as F

    from polars_express_spark.queries._util import combine4, scaled4, split4_aggs

    rng = random.Random(3)
    rows = [
        (round(rng.uniform(0, 99999), 2), round(rng.uniform(0, 99), 2))
        for _ in range(5000)
    ]
    want = float(
        sum(
            (Decimal(str(a)) * Decimal(str(b)) for a, b in rows),
            Decimal(0),
        )
    )
    df = spark.createDataFrame(rows, "x double, y double")
    for parts in (1, 7):
        got = (
            df.repartition(parts)
            .select(scaled4(F.col("x") * F.col("y")).alias("__v_s"))
            .agg(*split4_aggs(F.col("__v_s"), "s", scaled=True))
            .select(combine4("s"))
            .collect()[0]["s"]
        )
        assert got == want, f"parts={parts}: {got!r} != {want!r}"


def test_grouped_bucketed_cumsum_equals_window(spark):
    """The grouped scan must equal SUM(v) OVER (PARTITION BY g ORDER BY
    k) exactly — randomized longs across several groups, negative order
    keys, a single-value group, and a group with fewer rows than
    buckets; invariant under repartitioning and bucket count."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from polars_express_spark.operators.prefix import grouped_bucketed_cumsum

    rng = random.Random(11)
    rows = [
        (g, k, rng.randrange(0, 10_000))
        for g in ("a", "b", "c")
        for k in rng.sample(range(-500, 500), {"a": 400, "b": 3, "c": 1}[g])
    ]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["g"], r["k"]): r["c"]
        for r in df.select("g", "k", F.sum("v").over(w).alias("c")).collect()
    }
    for parts, n_buckets in ((1, 64), (7, 5)):
        got = {
            (r["g"], r["k"]): r["cum_v"]
            for r in grouped_bucketed_cumsum(
                df.repartition(parts), "g", "k", "v", n_buckets=n_buckets
            ).collect()
        }
        assert got == want, (parts, n_buckets)


def test_grouped_bucketed_cumsum_external_bounds(spark):
    """A covering bounds frame (computed from a superset range) only
    changes partitioning, never values."""
    from pyspark.sql import functions as F

    from polars_express_spark.operators.prefix import grouped_bucketed_cumsum

    df = spark.createDataFrame(
        [("x", k, 1) for k in range(50)], "g string, k long, v long"
    )
    bounds = spark.createDataFrame(
        [("x", -1000, 1000)], "g string, __lo long, __hi long"
    )
    got = {
        r["k"]: r["cum_v"]
        for r in grouped_bucketed_cumsum(df, "g", "k", "v", bounds=bounds).collect()
    }
    assert got == {k: k + 1 for k in range(50)}


def test_grouped_bucketed_cumsum_with_total(spark):
    """with_total=True attaches each group's grand total tot_v — equal to
    the group's last cumulative value on every row — derived from the
    scan's own subtotal frame (no extra full-input pass)."""
    import random

    from polars_express_spark.operators.prefix import grouped_bucketed_cumsum

    rng = random.Random(7)
    rows = [
        (g, k, rng.randrange(0, 1000))
        for g in ("a", "b")
        for k in rng.sample(range(-50, 50), {"a": 40, "b": 2}[g])
    ]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    want_tot = {}
    for g, _, v in rows:
        want_tot[g] = want_tot.get(g, 0) + v
    out = grouped_bucketed_cumsum(
        df.repartition(5), "g", "k", "v", n_buckets=8, with_total=True
    ).collect()
    assert {r["g"] for r in out} == set(want_tot)
    for r in out:
        assert r["tot_v"] == want_tot[r["g"]], r
    # the max cumulative value per group IS the total
    by_g = {}
    for r in out:
        by_g[r["g"]] = max(by_g.get(r["g"], 0), r["cum_v"])
    assert by_g == want_tot
