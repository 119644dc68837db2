"""Skyline (Pareto frontier) — the classic multi-criteria operator
(§2.6 family beside top-k: "best" when two objectives can't be folded
into one score; no SQL engine has it built in).

A distinct point p is in the 2-D maximize/maximize skyline iff no other
distinct point q has q.x ≥ p.x ∧ q.y ≥ p.y (q ≠ p). The textbook
distributed algorithm exploits that skyline is a REDUCTION:
skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)), so:

1. distinct (x, y) points with multiplicities (one hash aggregate —
   duplicates collapse BEFORE any quadratic-ish work);
2. LOCAL skylines per partition via the sorted linear scan (sort by
   x desc, y desc; keep while y strictly increases) — an Arrow-batched
   mapInPandas, output ≤ the partition's frontier;
3. one GLOBAL pass of the same scan over the unioned candidates —
   bounded by Σ local frontier sizes, which is tiny relative to n for
   any realistic distribution (worst case, a fully anti-correlated
   dataset, degrades to the frontier's own size — the operator's
   inherent output).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
    """Linear skyline scan over a sorted-by-(x desc, y desc) frame."""
    keep = []
    best_y = None
    for row in pdf.itertuples(index=False):
        if best_y is None or row.y > best_y:
            keep.append(row)
            best_y = row.y if best_y is None else max(best_y, row.y)
    return pd.DataFrame(keep, columns=pdf.columns)


def skyline2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """(x, y, n_rows) — the distinct maximize/maximize Pareto points
    with their multiplicities."""
    pts = df.groupBy(F.col(x).alias("x"), F.col(y).alias("y")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )

    def local(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            yield _scan(pdf.sort_values(["x", "y"], ascending=False))

    def global_pass(batches):
        # must see ALL candidates at once — a point dominated only by a
        # point in another Arrow batch would otherwise survive
        items = [p for p in batches if not p.empty]
        if not items:
            return
        all_pdf = pd.concat(items, ignore_index=True)
        yield _scan(all_pdf.sort_values(["x", "y"], ascending=False))

    schema = "x double, y double, n_rows long"
    cand = pts.select(
        F.col("x").cast("double"), F.col("y").cast("double"), "n_rows"
    ).mapInPandas(local, schema=schema)
    # global pass: one partition over the (small) candidate union
    return cand.repartition(1).mapInPandas(global_pass, schema=schema)
