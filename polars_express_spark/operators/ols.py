"""Multi-feature linear regression via the normal equations (§2.4
statistical family — the k-feature generalization of the reference's
single-feature OLS, src/main.rs:155-196, whose closed form is the
k=1 special case of this Gram solve).

Distributed shape: ONE partial→final aggregate computes every entry of
the Gram matrix X'X and moment vector X'y as decimal-EXACT sums (the
same device as the regr_*/corr queries — order-free, bit-stable at any
parallelism); the (k+1)×(k+1) solve happens on the driver (a few
floats — the same kilobyte boundary class as the IVF centroids). No
iteration, no gradient steps, no second data pass: at 100 TB the whole
fit is one scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_express_spark.queries._util import DEC_MOM, dsum


def gram_moments(df: DataFrame, y: str, xs: list[str], fast4: bool = False) -> DataFrame:
    """1-row frame of every Gram/moment sum for y ~ 1 + xs.

    Columns: n, s_<xi>, s_<xi>_<xj> (i ≤ j), s_y, s_<xi>_y, s_y_y —
    each an exact order-free sum cast to double. Rows with ANY null
    among y/xs are dropped (the standard complete-case contract).

    ``fast4=True`` switches the accumulation from decimal sums to the
    split-long exact accumulator (_util.split4_aggs — ~20× faster,
    same exact values) and is valid ONLY when the caller attests every
    y/xs value is non-negative with ≤ 2 decimals, so all products are
    exact at 4 dp. The default decimal path has no such restriction.
    """
    cols = [y, *xs]
    cc = df
    for c in cols:
        cc = cc.where(F.col(c).isNotNull())
    terms: list[tuple[str, object]] = []
    for i, xi in enumerate(xs):
        terms.append((f"s_{xi}", F.col(xi)))
        for xj in xs[i:]:
            terms.append((f"s_{xi}_{xj}", F.col(xi) * F.col(xj)))
    terms.append(("s_y", F.col(y)))
    for xi in xs:
        terms.append((f"s_{xi}_y", F.col(xi) * F.col(y)))
    terms.append(("s_y_y", F.col(y) * F.col(y)))
    if not fast4:
        aggs = [F.count(F.lit(1)).cast("double").alias("n")]
        aggs += [dsum(expr, name, DEC_MOM) for name, expr in terms]
        return cc.agg(*aggs)
    from polars_express_spark.queries._util import combine4, scaled4, split4_aggs

    pre = cc.select(*[scaled4(expr).alias(f"__v_{name}") for name, expr in terms])
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    combs = [F.col("n")]
    for name, _ in terms:
        aggs += split4_aggs(F.col(f"__v_{name}"), name, scaled=True)
        combs.append(combine4(name))
    return pre.agg(*aggs).select(*combs)


def solve_normal_equations(row, xs: list[str]):
    """Driver-side closed-form solve from the collected moment row:
    returns (beta [intercept first], r2). Raises on a singular Gram
    (collinear features) rather than returning garbage."""
    k = len(xs)
    n = row["n"]
    A = np.zeros((k + 1, k + 1))
    b = np.zeros(k + 1)
    A[0, 0] = n
    for i, xi in enumerate(xs):
        A[0, i + 1] = A[i + 1, 0] = row[f"s_{xi}"]
        for j in range(i, k):
            xj = xs[j]
            A[i + 1, j + 1] = A[j + 1, i + 1] = row[f"s_{xi}_{xj}"]
    b[0] = row["s_y"]
    for i, xi in enumerate(xs):
        b[i + 1] = row[f"s_{xi}_y"]
    if n < k + 1 or np.linalg.cond(A) > 1e12:
        raise ValueError("singular Gram matrix — collinear features")
    beta = np.linalg.solve(A, b)
    sse = row["s_y_y"] - beta @ b
    sst = row["s_y_y"] - row["s_y"] * row["s_y"] / n
    r2 = 1.0 - sse / sst if sst > 0 else None
    return beta, r2
