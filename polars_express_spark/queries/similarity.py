"""Similarity search over the embeddings table (SURVEY.md §2.10).

Goal-state (Tier G) capability: approximate-nearest-neighbor over an
`array<float>` column. Three tiers:

- q35_cosine_topk — exact brute-force cosine top-k for a probe set: the
  correctness baseline, DuckDB-oracled. Dot products are exact decimal
  sums so Spark and the oracle agree bit-for-bit (see _util).
- q_embed_neardup — blocked near-duplicate detection (block key + exact
  verify): the scalable block-then-verify shape, also oracled.
- q_ann_lsh — random-hyperplane LSH bucketing (sign bits from
  deterministic hashes): the 100 TB path where the O(n²) cross join is
  replaced by bucket-equi-joins. Approximate → rows-only check + recall
  golden test in tests/test_pipeline_ops.py.

Scale notes: the exploded-join formulation shuffles (pos, value) pairs —
at 100 TB you bound the probe side (it is the small, broadcastable side)
and block the candidate space (label blocks / LSH buckets) before any
pairwise work. Nothing here materializes the full n² pair set.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.queries.registry import query

DEC = "decimal(18,9)"  # exact element grid; products are decimal(37,18)
N_PROBES = 10
TOP_K = 5


def _exploded(emb):
    """(vec_id, pos, v) with v on the exact decimal grid.

    Cached: norms, probe side, and candidate side all re-read this —
    without the cache the posexplode re-runs once per consumer.
    """
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", "pos", F.col("val").cast("double").cast(DEC).alias("v"))
        .cache()
    )


def _norms(ex):
    return ex.groupBy("vec_id").agg(F.sum(F.col("v") * F.col("v")).cast("double").alias("n2"))


@query(
    "q35_cosine_topk",
    oracle=f"""
    WITH ex AS (
      SELECT vec_id, gs.pos AS pos,
             CAST(CAST(embedding[gs.pos] AS DOUBLE) AS DECIMAL(18,9)) AS v
      FROM embeddings, unnest(generate_series(1, len(embedding))) gs(pos)
    ),
    norms AS (SELECT vec_id, CAST(SUM(v*v) AS DOUBLE) AS n2 FROM ex GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id,
             CAST(SUM(a.v * b.v) AS DOUBLE) AS dot
      FROM ex a JOIN ex b ON a.pos = b.pos AND b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_PROBES}
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT probe_id, neighbor_id,
             dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = probe_id
      JOIN norms nb ON nb.vec_id = neighbor_id
    ),
    ranked AS (
      SELECT probe_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT probe_id, neighbor_id, CAST(rnk AS INT) AS rnk, cosine
    FROM ranked WHERE rnk <= {TOP_K} ORDER BY probe_id, rnk
    """,
)
def q35_cosine_topk(spark, sf_dir):
    """Exact cosine top-k (§2.11 Q35): 10 probe vectors × top-5 neighbors,
    ties broken by neighbor id. Brute force = the correctness baseline the
    ANN variants are measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = _exploded(emb)
    norms = _norms(ex)
    probes = ex.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "pos", F.col("v").alias("pv")
    )
    dots = (
        probes.join(ex.withColumnRenamed("vec_id", "neighbor_id"), "pos")
        .where(F.col("neighbor_id") != F.col("probe_id"))
        .groupBy("probe_id", "neighbor_id")
        .agg(F.sum(F.col("pv") * F.col("v")).cast("double").alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("probe_id"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("vec_id").alias("neighbor_id"), F.col("n2").alias("nb2"))
    scored = (
        dots.join(F.broadcast(na), "probe_id")
        .join(nb, "neighbor_id")
        .select(
            "probe_id",
            "neighbor_id",
            (F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("probe_id", "neighbor_id", "rnk", "cosine")
        .orderBy("probe_id", "rnk")
    )


NEARDUP_TILES = 8  # sub-partitions per label block (skew bound for hot labels)


def _dec_vec(col):
    """Embedding cast onto the exact decimal grid (matches the oracle)."""
    return F.transform(col, lambda x: x.cast("double").cast(DEC))


def _dec_dot(x, y):
    """Exact sequential-fold dot product of two decimal vectors.

    products are decimal(37,18); the fold accumulator is pinned to
    decimal(38,18) each step so the type never drifts. Sums here are tiny
    (≤ dim · 4) so the cast is always exact — bit-identical to DuckDB's
    SUM over the same decimals, with no partition-order dependence at all
    (it is a per-row fold, not a distributed agg).
    """
    prods = F.zip_with(x, y, lambda a, b: a * b)
    return F.aggregate(
        prods,
        F.lit(0).cast("decimal(38,18)"),
        lambda acc, p: (acc + p).cast("decimal(38,18)"),
    )


@query(
    "q_embed_neardup",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, gs.pos AS pos,
             CAST(CAST(embedding[gs.pos] AS DOUBLE) AS DECIMAL(18,9)) AS v
      FROM embeddings, unnest(generate_series(1, len(embedding))) gs(pos)
    ),
    norms AS (SELECT vec_id, CAST(SUM(v*v) AS DOUBLE) AS n2 FROM ex GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST(SUM(a.v * b.v) AS DOUBLE) AS dot
      FROM ex a JOIN ex b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = a_id
    JOIN norms nb ON nb.vec_id = b_id
    WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.5
    ORDER BY a_id, b_id
    """,
)
def q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, blocked by `label` (§2.10).

    Block-then-verify with two scale bounds the exploded formulation lacked:

    - Pair generation joins the NARROW (vec_id, label) projection — the
      shuffle for the quadratic step carries id pairs, not pairs ×
      dimensions. Dot products run per-pair afterwards as an exact
      decimal zip_with/aggregate fold on the two arrays (JVM-side
      higher-order functions, no UDF, no posexplode).
    - The label join is TILED: the b-side is bucketed by vec_id %
      NEARDUP_TILES and the a-side replicated once per tile, so a hot
      label's pair space splits across NEARDUP_TILES shuffle keys instead
      of landing on one reducer. Results are identical (each pair is
      produced exactly once); only the key distribution changes. The
      Σ block² pair count is inherent to exact within-label all-pairs —
      the approximate path for bigger blocks is q_ann_lsh.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    vec = emb.select(
        "vec_id", "label", _dec_vec("embedding").alias("e")
    ).withColumn("n2", _dec_dot("e", "e").cast("double"))

    ids = vec.select("vec_id", "label")
    a_ids = (
        ids.select(F.col("vec_id").alias("a_id"), F.col("label").alias("lbl"))
        .withColumn("tile", F.explode(F.sequence(F.lit(0), F.lit(NEARDUP_TILES - 1))))
    )
    b_ids = ids.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("lbl"),
        (F.col("vec_id") % NEARDUP_TILES).cast("int").alias("tile"),
    )
    pairs = (
        a_ids.join(b_ids, ["lbl", "tile"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    va = vec.select(F.col("vec_id").alias("a_id"), F.col("e").alias("ea"), F.col("n2").alias("na2"))
    vb = vec.select(F.col("vec_id").alias("b_id"), F.col("e").alias("eb"), F.col("n2").alias("nb2"))
    return (
        pairs.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                _dec_dot("ea", "eb").cast("double") / (F.sqrt("na2") * F.sqrt("nb2"))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.5)
        .orderBy("a_id", "b_id")
    )


@query("q_ann_lsh")  # approximate → rows-only check; recall golden-tested
def q_ann_lsh(spark, sf_dir, n_tables: int = 8, planes_per_table: int = 6):
    """Random-hyperplane LSH ANN, multi-table (§2.10 scale path).

    Standard sign-LSH: L independent hash tables of k hyperplanes each.
    One table of k bits has P(match) = (1-θ/π)^k per neighbor — too
    sparse alone — so candidates are the union over L tables
    (recall ≈ 1-(1-p^k)^L). Plane weights are deterministic
    pseudo-randoms from xxhash64(plane, position): reproducible with no
    driver-side RNG, computed JVM-side. Candidates come from (table,
    bucket) equi-joins — the full cross join never exists; at 100 TB
    (table, bucket) is the shuffle key. Exact cosine then ranks the
    candidate union. Recall vs brute-force q35_cosine_topk is
    golden-tested (tests/test_pipeline_ops.py).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    ex = _exploded(emb)
    n_planes = n_tables * planes_per_table

    # Embedding dimension DERIVED from the data (a 1-row lookup), never
    # hardcoded: a plane table narrower than the vectors would silently
    # drop positions from every projection (wrong buckets, no error).
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"]) if first is not None else 0

    # plane weight ~uniform in (-2, 2): deterministic hash of (plane, pos)
    planes = (
        spark.range(n_planes)
        .withColumnRenamed("id", "plane")
        .crossJoin(spark.range(dim).withColumnRenamed("id", "pos"))
        .select(
            "plane",
            "pos",
            (
                (F.xxhash64(F.col("plane"), F.col("pos")) % 100000).cast("double") / 50000.0
            ).alias("w"),
        )
    )
    projected = (
        ex.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("v").cast("double") * F.col("w")).alias("proj"))
        .select(
            "vec_id",
            (F.col("plane") % n_tables).alias("table"),
            F.floor(F.col("plane") / n_tables).alias("table_bit"),
            F.when(F.col("proj") >= 0, F.lit(1)).otherwise(F.lit(0)).alias("bit"),
        )
        .groupBy("vec_id", "table")
        .agg(
            F.sum(
                F.col("bit") * F.pow(F.lit(2.0), F.col("table_bit")).cast("long")
            ).alias("bucket")
        )
    )
    probes = projected.where(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "table", "bucket"
    )
    cands = (
        probes.join(projected, ["table", "bucket"])
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id")
        .distinct()
    )

    pex = ex.select(F.col("vec_id").alias("probe_id"), "pos", F.col("v").alias("pv"))
    dots = (
        cands.select("probe_id", "vec_id")
        .join(pex, "probe_id")
        .join(ex, ["vec_id", "pos"])
        .groupBy("probe_id", "vec_id")
        .agg(F.sum(F.col("pv") * F.col("v")).cast("double").alias("dot"))
    )
    norms = _norms(ex)
    na = norms.select(F.col("vec_id").alias("probe_id"), F.col("n2").alias("na2"))
    scored = (
        dots.join(F.broadcast(na), "probe_id")
        .join(norms, "vec_id")
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("dot") / (F.sqrt("na2") * F.sqrt("n2"))).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .orderBy("probe_id", "rnk")
    )
