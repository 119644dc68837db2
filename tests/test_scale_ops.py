"""Unit tests for the round-6 scale operators: Bloom runtime filter
(no false negatives, join equivalence, fp-rate sanity), count-min
sketch (never-underestimate, ε upper bound, mergeability), grid
resample + forward fill (vs a hand-built expectation), Z-order layout
(bit-exact Morton key vs a pure-Python reference; rectangle property),
and triangle counting (known graphs).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


# --- bloom ---------------------------------------------------------------


def test_bloom_no_false_negatives_and_sane_fp(spark):
    from polars_express_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_size_for,
    )

    keys = spark.range(0, 1000).select((F.col("id") * 7).alias("k"))
    bf = bloom_build(keys, "k", num_bits=bloom_size_for(1000), num_hashes=5)
    # every inserted key must pass (the guarantee the oracle relies on)
    hits = keys.where(bloom_might_contain(bf, "k")).count()
    assert hits == 1000
    # disjoint probe keys: fp rate should be far below 5% at 16 bits/key
    probes = spark.range(0, 10000).select((F.col("id") * 7 + 3).alias("k"))
    fp = probes.where(bloom_might_contain(bf, "k")).count()
    assert fp < 500, f"fp rate {fp / 10000} way above design point"


def test_bloom_pruned_join_equals_plain_join(spark):
    from polars_express_spark.operators.bloom import bloom_pruned_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 300).alias("fk"), F.col("id").alias("v")
    )
    dim = spark.range(0, 100).select((F.col("id") * 3).alias("dk"))
    pruned = bloom_pruned_join(fact, dim, "fk", "dk")
    plain = fact.join(dim, fact.fk == dim.dk)
    assert sorted(pruned.collect()) == sorted(plain.collect())


def test_bloom_null_keys_never_match(spark):
    from polars_express_spark.operators.bloom import bloom_build, bloom_might_contain

    df = spark.createDataFrame([(1,), (None,)], "k int")
    bf = bloom_build(df, "k", num_bits=4096, num_hashes=3)
    got = df.where(bloom_might_contain(bf, "k")).collect()
    assert [r["k"] for r in got] == [1]


# --- count-min sketch ----------------------------------------------------


def test_cms_bounds_and_merge(spark):
    from polars_express_spark.operators.cms import cms_estimate, cms_merge, cms_update

    # skewed stream: token i appears (50 - i) times, i in [0, 50)
    rows = [(f"t{i:02d}",) for i in range(50) for _ in range(50 - i)]
    df = spark.createDataFrame(rows, "t string")
    n = len(rows)
    sk = cms_update(df, "t", depth=4, width=256)
    truth = df.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    est = cms_estimate(sk, truth, "t", depth=4, width=256)
    bad_low = est.where(F.col("est") < F.col("c")).count()
    assert bad_low == 0  # CM never underestimates
    # ε upper bound with generous slack (deterministic for fixed seeds)
    bad_high = est.where(F.col("est") > F.col("c") + F.lit(3.0 * n / 256)).count()
    assert bad_high == 0
    # merge of two halves == sketch of the whole
    a = cms_update(df.where(F.col("t") < "t25"), "t", depth=4, width=256)
    b = cms_update(df.where(F.col("t") >= "t25"), "t", depth=4, width=256)
    merged = {(r["i"], r["b"]): r["cnt"] for r in cms_merge(a, b).collect()}
    whole = {(r["i"], r["b"]): r["cnt"] for r in sk.collect()}
    assert merged == whole


# --- resample + ffill ----------------------------------------------------


def test_resample_ffill_semantics(spark):
    from polars_express_spark.operators.resample import resample_ffill

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    # user 1: events in slots 0, 0, 3 (10-min slots) → slots 1, 2 ffill;
    # within-slot tie at ts(0): higher eid wins; user 2: single event
    rows = [
        (1, ts(0), 100, 1.0),
        (1, ts(0), 101, 2.0),  # same ts — eid tiebreak picks this
        (1, ts(5), 102, 3.0),  # later ts in slot 0 wins over both
        (1, ts(35), 103, 9.0),
        (2, ts(70), 200, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = resample_ffill(df, "user_id", "ts", "value", 600, tie_col="event_id")
    got = {(r["user_id"], r["slot_ts"], r["value"]) for r in out.collect()}
    assert got == {
        (1, ts(0), 3.0),
        (1, ts(10), 3.0),  # gap → ffill
        (1, ts(20), 3.0),  # gap → ffill
        (1, ts(30), 9.0),
        (2, ts(70), 5.0),
    }


# --- z-order -------------------------------------------------------------


def _py_morton2(x: int, y: int) -> int:
    def spread(v):
        v &= 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def test_morton_key_bit_exact(spark):
    from polars_express_spark.operators.zorder import morton2

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", morton2("x", "y").alias("z")).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_morton2(x, y), (x, y)


def test_zorder_layout_gives_rectangles(spark, tmp_path):
    """Z-ordered files must bound BOTH dimensions tightly; a single-
    column sort bounds only its own. Compare mean y-span across files."""
    from polars_express_spark.operators.zorder import zorder_layout

    n, files = 1 << 14, 16
    df = spark.range(n).select(
        (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("long").alias("y")
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_layout(df, "x", "y", files).write.mode("overwrite").parquet(zpath)
    df.repartitionByRange(files, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(spath)

    def mean_span(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        return per_file.agg(F.avg("span")).collect()[0][0]

    # both layouts: x is bounded; only z-order also bounds y
    assert mean_span(zpath, "y") < mean_span(spath, "y") / 2


# --- triangles -----------------------------------------------------------


def test_triangle_stats_known_graphs(spark):
    from polars_express_spark.operators.graph import triangle_stats

    # K4 (4 triangles, 12 wedges) plus a disjoint path a-b-c (0 tri, 1 wedge)
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    path = [(10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + path, "a_id long, b_id long")
    row = triangle_stats(edges).collect()[0]
    assert row["n_edges"] == 8
    assert row["n_triangles"] == 4
    assert row["n_wedges"] == 13
    assert abs(row["clustering_coeff"] - 12 / 13) < 1e-12


def test_triangle_stats_empty_and_duplicate_edges(spark):
    from polars_express_spark.operators.graph import triangle_stats

    empty = spark.createDataFrame([], "a_id long, b_id long")
    row = triangle_stats(empty).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_triangles"]) == (0, 0, 0)
    assert row["clustering_coeff"] is None
    # duplicates and reversed duplicates collapse to one edge
    dup = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3)], "a_id long, b_id long"
    )
    row = triangle_stats(dup).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (3, 1)


# --- product quantization ------------------------------------------------


def test_pq_train_encode_shapes_and_determinism(spark):
    import numpy as np

    from polars_express_spark.catalog import load_table
    from polars_express_spark.operators.pq import pq_encode, pq_train

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb = pq_train(emb, m=8, k=16, n_iters=2)
    assert cb.shape == (8, 16, 8)
    cb2 = pq_train(emb, m=8, k=16, n_iters=2)
    np.testing.assert_array_equal(cb, cb2)  # hash-seeded init → exact repeat
    codes = pq_encode(emb, cb).collect()
    assert len(codes) == emb.count()
    for r in codes[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_ann_recall_and_shortlist_monotonicity(spark):
    """Re-ranked PQ top-k must recover most of the exact top-k, and a
    larger ADC shortlist can only help (candidate set is a superset)."""
    from polars_express_spark.queries.similarity import (
        _exact_topk_shared,
        ann_pq_topk,
    )
    from tests.conftest import SF_DIR

    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in _exact_topk_shared(spark, SF_DIR).collect()
    }

    def recall(sl):
        got = {
            (r["probe_id"], r["neighbor_id"])
            for r in ann_pq_topk(spark, SF_DIR, shortlist=sl).collect()
        }
        return len(exact & got) / len(exact)

    r60 = recall(60)
    assert r60 >= 0.6, r60
    assert recall(120) >= recall(20) - 1e-9


def test_bloom_pruned_join_rejects_outer_joins(spark):
    """Pruning the fact side loses rows an outer join must keep — the
    operator must refuse rather than silently corrupt."""
    import pytest

    from polars_express_spark.operators.bloom import bloom_pruned_join

    fact = spark.range(3).select(F.col("id").alias("fk"))
    dim = spark.range(2).select(F.col("id").alias("dk"))
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_pruned_join(fact, dim, "fk", "dk", how="left")


def test_ivfpq_recall_and_component_reuse(spark):
    """The composed index must stay usefully close to exact (both
    approximations stacked) and must reuse the SAME memoized component
    frames as the standalone indexes (no duplicate training)."""
    from polars_express_spark.queries.similarity import (
        _exact_topk_shared,
        ann_ivfpq_topk,
    )
    from tests.conftest import SF_DIR

    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in _exact_topk_shared(spark, SF_DIR).collect()
    }
    got = {
        (r["probe_id"], r["neighbor_id"])
        for r in ann_ivfpq_topk(spark, SF_DIR).collect()
    }
    assert len(exact & got) / len(exact) >= 0.5
    # component reuse: the codebook cache holds exactly one entry for
    # this (sf, m, k) even after both PQ variants ran
    from polars_express_spark.queries import similarity as sim

    keys = [k for k in sim._PQ_CB if k[0] == SF_DIR]
    assert len(keys) == 1


def test_bloom_pruned_join_empty_dim(spark):
    """An empty build side yields an all-zero bitmap → every fact row
    prunes → empty result, exactly like the plain inner join."""
    from polars_express_spark.operators.bloom import bloom_pruned_join

    fact = spark.range(100).select(F.col("id").alias("fk"))
    dim = spark.range(0).select(F.col("id").alias("dk"))
    assert bloom_pruned_join(fact, dim, "fk", "dk").count() == 0


def test_skyline_hand_cases_and_partition_invariance(spark):
    """Hand-checked frontier incl. ties on one axis and duplicate
    points; result identical under any partitioning (the reduction
    law the distributed form relies on)."""
    from polars_express_spark.operators.skyline import skyline2d

    pts = [
        (1.0, 9.0), (1.0, 9.0),  # duplicate point on the frontier
        (5.0, 5.0), (9.0, 1.0),  # frontier
        (4.0, 5.0),  # dominated by (5,5)
        (5.0, 4.0),  # dominated by (5,5)
        (9.0, 0.5),  # dominated by (9,1)
    ]
    df = spark.createDataFrame(pts, "x double, y double")
    want = {(1.0, 9.0, 2), (5.0, 5.0, 1), (9.0, 1.0, 1)}
    got = {
        (r["x"], r["y"], r["n_rows"]) for r in skyline2d(df, "x", "y").collect()
    }
    assert got == want
    again = {
        (r["x"], r["y"], r["n_rows"])
        for r in skyline2d(df.repartition(5), "x", "y").collect()
    }
    assert again == want
