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
    Block-then-verify: candidate pairs only within a block (here the given
    label; at scale an LSH bucket), then exact cosine ≥ 0.5. The pair
    space never exceeds Σ block²."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "val"))
        .select("vec_id", "label", "pos", F.col("val").cast("double").cast(DEC).alias("v"))
        .cache()
    )
    norms = _norms(ex.select("vec_id", "v"))
    a = ex.select(
        F.col("vec_id").alias("a_id"), F.col("label").alias("lbl"), "pos", F.col("v").alias("av")
    )
    b = ex.select(
        F.col("vec_id").alias("b_id"), F.col("label").alias("lbl"), "pos", F.col("v").alias("bv")
    )
    dots = (
        a.join(b, ["lbl", "pos"])
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.sum(F.col("av") * F.col("bv")).cast("double").alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("a_id"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("vec_id").alias("b_id"), F.col("n2").alias("nb2"))
    return (
        dots.join(na, "a_id")
        .join(nb, "b_id")
        .select(
            "a_id", "b_id", (F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))).alias("cosine")
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

    # plane weight ~uniform in (-2, 2): deterministic hash of (plane, pos)
    planes = (
        spark.range(n_planes)
        .withColumnRenamed("id", "plane")
        .crossJoin(spark.range(64).withColumnRenamed("id", "pos"))
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
