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
