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


def triangle_stats(edges: DataFrame, a: str = "a_id", b: str = "b_id") -> DataFrame:
    """Global triangle census over an undirected edge list: one row of
    (n_edges, n_wedges, n_triangles, clustering_coeff).

    Scale shape — the degree-oriented join (the standard distributed
    triangle algorithm): orient every edge from its lower-(degree, id)
    endpoint, so each node's out-degree is bounded by √(2·|E|) even
    under power-law skew; wedges then come from a self-join on the low
    endpoint (quadratic only in OUT-degree, never in a hub's full
    degree), and closing edges from one more equi-join. Each triangle
    {x,y,z} with rank x<y<z is counted exactly once as the wedge
    (x→y, x→z) closed by y→z, because orientation by a total order is
    acyclic. n_wedges = Σ d(d−1)/2 (open+closed, undirected);
    clustering_coeff = 3·triangles / wedges (null when wedge-free).
    """
    e = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = e.select(F.col("u").alias("x"), F.col("v").alias("y")).union(
        e.select(F.col("v").alias("x"), F.col("u").alias("y"))
    )
    deg = sym.groupBy("x").agg(F.count(F.lit(1)).alias("d"))
    rank = deg.select(
        F.col("x"), F.struct(F.col("d"), F.col("x").alias("id")).alias("r")
    )
    # oriented edge src→dst with rank(src) < rank(dst); struct comparison
    # is lexicographic, giving the (degree, id) total order
    oriented = (
        sym.join(rank.withColumnRenamed("x", "x1").withColumnRenamed("r", "rx"), F.col("x") == F.col("x1"))
        .join(rank.withColumnRenamed("x", "y1").withColumnRenamed("r", "ry"), F.col("y") == F.col("y1"))
        .where(F.col("rx") < F.col("ry"))
        .select(F.col("x").alias("src"), F.col("y").alias("dst"), F.col("ry").alias("rdst"))
    )
    o1 = oriented.select(F.col("src"), F.col("dst").alias("v1"), F.col("rdst").alias("r1"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("v2"), F.col("rdst").alias("r2"))
    wedges = o1.join(o2, "src").where(F.col("r1") < F.col("r2"))
    closing = oriented.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
    tri = wedges.join(closing, ["v1", "v2"], "inner").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nw = deg.agg(
        F.coalesce(F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("bigint")), F.lit(0)).alias(
            "n_wedges"
        )
    )
    return (
        ne.crossJoin(nw)
        .crossJoin(tri)
        .select(
            F.col("n_edges").cast("bigint"),
            F.col("n_wedges").cast("bigint"),
            F.col("n_triangles").cast("bigint"),
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
            ).alias("clustering_coeff"),
        )
    )


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
