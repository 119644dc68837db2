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
    # r19: sym and deg are joined in EVERY round — materialize them once
    # so each round plans against two checkpointed tables instead of
    # re-deriving the edge list and the degree aggregate from the source
    # (5 rounds re-ran both; interleaved A/B at sf0.1: med 1.69 -> 1.37,
    # every paired pass faster, ranks bit-identical). Same eager
    # truncation the per-round ranks already use.
    sym = sym.localCheckpoint()
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
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


def kcore(
    edges: DataFrame,
    k: int = 2,
    max_rounds: int = 8,
    a: str = "a_id",
    b: str = "b_id",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    of degree < k (and their edges) until a fixpoint — the standard
    cohesion filter that separates dense duplicate cliques from pendant
    chains the clustering coefficient alone can't isolate.

    Returns (node, core_deg): the nodes surviving in the k-core with
    their degree WITHIN the core. Each round is one partial→final
    degree aggregate plus two key equi-joins (never a nested loop);
    lineage is truncated per round with an eager localCheckpoint, the
    same bulk-synchronous shape as connected components / pagerank.
    Peeling is monotone (the survivor set only shrinks), so the edge
    count is a convergence certificate; like connected components, a
    graph that has not stabilized after ``max_rounds`` RAISES instead
    of returning a superset of the core.
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).union(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    cur = sym.localCheckpoint(eager=True)
    n_cur = cur.count()
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") >= k).select("src")
        nxt = cur.join(keep, "src", "left_semi").join(
            keep.withColumnRenamed("src", "dst"), "dst", "left_semi"
        )
        nxt = nxt.localCheckpoint(eager=True)
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            break
        cur, n_cur = nxt, n_nxt
    else:
        raise RuntimeError(
            f"kcore did not stabilize in {max_rounds} rounds "
            f"({n_cur} -> {n_nxt} edges); raise max_rounds"
        )
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_deg"))
        .select(F.col("src").alias("node"), "core_deg")
    )
