"""Distributed iterative model training — k-round gradient descent
(§2.4 ML family, beside the closed-form OLS / normal-equation solvers:
those END in one aggregate; real training LOOPS — compute a gradient
over the corpus, update a kilobyte parameter vector on the driver,
broadcast it back, repeat).

Determinism contract (what makes the trained weights value-hash
against a SQL replay, which no stochastic trainer can):
- the activation is the RATIONAL sigmoid surrogate
  s(z) = 0.5 + z / (2·(1 + |z|))  with  s'(z) = 1 / (2·(1 + |z|)²)
  — pure IEEE arithmetic, bit-identical in Spark, DuckDB, and Python,
  where exp()'s last ulp is libm-dependent;
- per-row gradient contributions are rounded to 8 dp and summed as
  DECIMAL (exact, order-free), then cast to double ONCE;
- the weight update w ← w − lr·(g/n) runs in driver Python floats,
  which are the same IEEE doubles the oracle's CTE chain computes.

Scale shape: each round is ONE partial→final aggregate over the
corpus; only the gradient vector (#features doubles) reaches the
driver, and the updated weights ride back as literals in the next
round's plan — the classic parameter-server-free distributed GD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,12)"


def _round8(x):
    """ROUND(x, 8) half-away-from-zero in primitive codegen math —
    Spark's ROUND(double) allocates a BigDecimal per value (the same
    cost the split-long family avoids; measured 3× this whole query).
    floor(|x|·1e8 + 0.5) with the sign restored equals half-away
    rounding for EVERY value including exact .5 ties, and the final
    integer/1e8 division is the same correctly-rounded double ROUND
    produces — so the oracle's plain round() twin is unchanged."""
    pos = F.floor(x * F.lit(1e8) + F.lit(0.5))
    neg = -F.floor((-x) * F.lit(1e8) + F.lit(0.5))
    return F.when(x >= 0, pos).otherwise(neg) / F.lit(1e8)


def _surrogate(z):
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


def _surrogate_deriv(z):
    d = F.lit(1.0) + F.abs(z)
    return F.lit(1.0) / (F.lit(2.0) * d * d)


def gd_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    rounds: int = 3,
    lr: float = 0.5,
) -> tuple[list[float], int]:
    """Train w (bias first) by full-batch gradient descent on the
    squared error of the surrogate-sigmoid prediction. Returns
    (weights, n_rows). Deterministic per the module contract."""
    n = df.count()
    w = [0.0] * (len(feature_cols) + 1)
    xs = [F.lit(1.0)] + [F.col(c) for c in feature_cols]
    for _ in range(rounds):
        z = sum((F.lit(wj) * xj for wj, xj in zip(w[1:], xs[1:])), F.lit(w[0]))
        p = _surrogate(z)
        common = F.lit(2.0) * (p - F.col(label_col)) * _surrogate_deriv(z)
        aggs = [
            F.sum(_round8(common * xj).cast(DEC)).cast("double").alias(f"g{j}")
            for j, xj in enumerate(xs)
        ]
        g = df.agg(*aggs).collect()[0]
        w = [wj - lr * (g[f"g{j}"] / float(n)) for j, wj in enumerate(w)]
    return w, n
