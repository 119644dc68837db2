"""Shared helpers for the correctness corpus.

The one non-obvious convention: **exact decimal sums for float
aggregates**. A distributed double sum is non-associative across
partition boundaries, so Spark-vs-DuckDB results can differ in the last
ulps and flip a rounded-to-6dp hash. Casting each addend to a fixed-scale
decimal makes the sum exact and order-free, then one final cast back to
double is deterministic on both engines. Cost is negligible (still
whole-stage-codegen'd JVM arithmetic) and it scales: precision 38 holds
sums far beyond 100 TB row counts.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

# 25,6: up to ~1e19 integral — fine for sums of prices/quantities at any SF.
DEC_SUM = "decimal(25,6)"
# 38,12: second moments (price², cross products) — ~1e26 integral headroom.
DEC_MOM = "decimal(38,12)"


def dsum(expr: Column | str, alias: str, dec: str = DEC_SUM) -> Column:
    """Exact, order-free sum of a double expression, returned as double."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(dec)).cast("double").alias(alias)


def sql_dsum(expr: str, alias: str, dec: str = "DECIMAL(25,6)") -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS {dec})) AS DOUBLE) AS {alias}"


# ---- split-long exact sums (the fast path for 4-dp product moments) ----
#
# Spark's decimal aggregate is exact and order-free but runs ~20x slower
# than a long/double sum (non-vectorized BigDecimal buffer). For moment
# sums of NON-NEGATIVE products that are exact at 4 decimals (products
# of <=2-dp source values), the classic multi-word accumulation gets
# decimal exactness at long-sum speed:
#
#   v  = round(x*y*1e4)          -- exact scaled product, < 2^53
#   lo = v & 0xFFFFF, mid = (v>>20) & 0xFFFFF, hi = v >> 40
#   sum each word as a plain long (associative, exact), then
#   S = ((sum_hi<<40) + (sum_mid<<20) + sum_lo) / 1e4   -- one row
#
# Overflow margins (long max 9.2e18): lo/mid sums bound by n*2^20 ->
# safe to ~8.8e12 rows; hi bound by n*(v_max>>40) -> for v_max ~ 2e13
# safe to ~5e17 rows. ANSI mode raises loudly if ever exceeded.
# The rounding recovers the EXACT 4-dp product because the double error
# of x*y*1e4 is far below 0.5 for v < 2^53.

_W = 20
_MASK = (1 << _W) - 1


def scaled4(expr: Column) -> Column:
    """The exact scaled-long form of a non-negative 4-dp-exact value —
    project this ONCE per moment before aggregating so the three word
    sums share it instead of re-deriving it per word.

    floor(x + 0.5), not ROUND: Spark's ROUND(double) routes through a
    BigDecimal allocation per value (measured 6× slower than the whole
    rest of a 14-moment aggregate); floor stays in primitive codegen
    math. Equal by the same margin argument as the contract above: the
    double error of the scaled product is a few ulps (≪ 0.5), so
    x + 0.5 lands strictly inside (N+0.45, N+0.55) and floor recovers
    the exact integer N — any value close enough to the .5 boundary to
    diverge would break ROUND too.

    PRECONDITION — non-negative inputs only: floor(x+0.5) is
    round-half-UP (differs from half-away-from-zero on negatives), and
    shiftrightunsigned word-splitting of a negative long scrambles all
    three words, so a signed caller would hash WRONG sums, not raise.
    With SPARK_GRAFT_DEBUG_ASSERT=1 (set by tests/conftest.py, off in
    production plans) every value is guarded by a raise_error branch so
    a future signed caller fails loudly instead. The DuckDB twin keeps
    ROUND, equal for the same reason. NULLs pass through as NULL either
    way (they fall out of sums)."""
    v = F.floor(expr * F.lit(10000.0) + F.lit(0.5)).cast("bigint")
    if os.environ.get("SPARK_GRAFT_DEBUG_ASSERT") == "1":
        return F.when((expr >= 0) | expr.isNull(), v).otherwise(
            F.raise_error(
                F.lit("scaled4: negative input breaks the split-long contract")
            ).cast("bigint")
        )
    return v


def split4_aggs(expr: Column, name: str, scaled: bool = False) -> list[Column]:
    """Three long-sum aggregate columns encoding the exact sum of a
    non-negative, 4-dp-exact product expression. Pass ``scaled=True``
    when ``expr`` is already the scaled4() long."""
    v = expr if scaled else scaled4(expr)
    return [
        F.sum(F.shiftrightunsigned(v, 2 * _W)).alias(f"__{name}_h"),
        F.sum(F.shiftrightunsigned(v, _W).bitwiseAND(F.lit(_MASK))).alias(
            f"__{name}_m"
        ),
        F.sum(v.bitwiseAND(F.lit(_MASK))).alias(f"__{name}_l"),
    ]


def combine4(name: str) -> Column:
    """Reconstruct the exact double sum from split4_aggs' three words
    (per-group decimal math on one row — cheap)."""
    total = (
        F.col(f"__{name}_h").cast("decimal(38,0)") * F.lit(1 << (2 * _W))
        + F.col(f"__{name}_m").cast("decimal(38,0)") * F.lit(1 << _W)
        + F.col(f"__{name}_l").cast("decimal(38,0)")
    )
    return (total.cast("double") / F.lit(10000.0)).alias(name)


def sql_split4(expr: str, name: str) -> tuple[str, str]:
    """DuckDB twin: (aggregate SELECT-list fragment, reconstruction
    fragment). The reconstruction divides the exact integer total by
    1e4 as ONE double op, matching combine4's tree."""
    v = f"CAST(ROUND(({expr}) * 10000.0, 0) AS BIGINT)"
    aggs = (
        f"SUM({v} >> {2 * _W}) AS __{name}_h, "
        f"SUM(({v} >> {_W}) & {_MASK}) AS __{name}_m, "
        f"SUM({v} & {_MASK}) AS __{name}_l"
    )
    comb = (
        f"CAST(CAST(__{name}_h AS DECIMAL(38,0)) * {1 << (2 * _W)}"
        f" + CAST(__{name}_m AS DECIMAL(38,0)) * {1 << _W}"
        f" + CAST(__{name}_l AS DECIMAL(38,0)) AS DOUBLE) / 10000.0 AS {name}"
    )
    return aggs, comb


def sql_moments_cte(
    table: str, keys: list[str], terms: list[tuple[str, str]], where: str = "TRUE"
) -> str:
    """DuckDB twin of fast_moments(): a SELECT yielding keys + n +
    one exact double moment column per (name, expr) term, built with
    the IDENTICAL split-word reconstruction tree so the final doubles
    are bit-equal to combine4's (a plain decimal sum can differ in the
    last ulp once the scaled total exceeds 2^53 — double-rounding)."""
    aggs = ", ".join(sql_split4(expr, name)[0] for name, expr in terms)
    combs = ", ".join(sql_split4(expr, name)[1] for name, expr in terms)
    ksel = "".join(f"{k}, " for k in keys)
    gb = f" GROUP BY {', '.join(keys)}" if keys else ""
    return (
        f"SELECT {ksel}n, {combs} FROM ("
        f"SELECT {ksel}count(*) AS n, {aggs} FROM {table} WHERE {where}{gb})"
    )


def fast_moments(df, keys: list[str], terms: list[tuple[str, Column]]):
    """groupBy(keys) (or global when keys=[]) aggregate of exact
    split-long sums for each named term expression, plus ``n`` =
    count(*). Output: keys + n + one double column per term, each the
    exact order-free sum — the fast path for the moment-based
    regression/corr/profiling queries (same values as the decimal
    route, ~20× cheaper; see the split4 contract above)."""
    pre = df.select(
        *keys, *[scaled4(expr).alias(f"__v_{name}") for name, expr in terms]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for name, _ in terms:
        aggs += split4_aggs(F.col(f"__v_{name}"), name, scaled=True)
    g = pre.groupBy(*keys).agg(*aggs) if keys else pre.agg(*aggs)
    return g.select(*keys, F.col("n"), *[combine4(name) for name, _ in terms])
