"""Graph algorithms over edge lists (§2.10 iterative family, beside
connected components in queries/pipeline.py).

PageRank here is the centrality pass a web-scale curation pipeline runs
over link/near-dup graphs (harmonic/pagerank centrality as a document
quality prior). The shape is the standard bulk-synchronous iteration:
each round is one edge⋈rank equi-join plus a groupBy-sum on the
destination key — identical shuffle structure to connected components,
O(iters) rounds, lineage truncated per round with localCheckpoint.

DETERMINISM (what makes this oracle-able rather than golden-only): the
neighbor sum casts each contribution to decimal(38,12) before summing,
so every iteration is partition-order-free; ranks are then identical to
the bit on every run AND identical to a DuckDB replay of the same
expressions — the registered query hash-compares raw per-node ranks, a
far stronger check than a convergence invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(38,12)"


def pagerank(
    edges: DataFrame,
    a: str = "a_id",
    b: str = "b_id",
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank on the undirected graph given as an (a, b) edge list:
    fixed `iters` synchronous rounds of
    rank ← (1−d) + d · Σ_in rank(src)/deg(src), ranks initialized to 1.
    Returns (node, rank). Every node in the edge list has degree ≥ 1
    (symmetrized), so no dangling-mass term is needed."""
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).union(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("rank"))
    base = F.lit(float(1.0 - damping))
    for _ in range(iters):
        msgs = (
            sym.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("d")).alias("c"))
        )
        ranks = (
            msgs.groupBy("node")
            .agg(
                (
                    base
                    + F.lit(float(damping))
                    * F.sum(F.col("c").cast(DEC)).cast("double")
                ).alias("rank")
            )
            # eager: truncate lineage NOW so round k+1 plans against a
            # materialized table, not a k-deep join tree (lazy checkpoint
            # would defer materialization to the end, defeating the
            # truncation and spamming stale-accumulator errors)
            .localCheckpoint()
        )
    return ranks
