"""Unit tests for the round-6 advanced operators: bucketed range join
(boundary semantics, multi-bucket spans, overlapping intervals), SCD2
merge (update/insert/untouched row classes), and chunking edge shapes.
"""

from __future__ import annotations

import datetime as dt


T0 = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return T0 + dt.timedelta(seconds=seconds)


def test_range_join_boundaries_and_spans(spark):
    """start inclusive, end exclusive; an interval spanning many buckets
    still matches; a point in two overlapping intervals matches both."""
    from polars_express_spark.operators.range_join import bucketed_range_join

    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(59)), (3, _ts(60)), (4, _ts(1000)), (5, _ts(250))],
        "pid long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(0), _ts(60)),  # [0, 60): pids 1, 2 — not 3 (end excl)
            (11, _ts(30), _ts(2000)),  # spans many 60s buckets: 2,3,4,5
            (12, _ts(240), _ts(260)),  # overlaps 11: pid 5 matches both
        ],
        "iv long, s timestamp, e timestamp",
    )
    out = bucketed_range_join(left, right, "ts", "s", "e", bucket_seconds=60)
    got = {(r["pid"], r["iv"]) for r in out.collect()}
    assert got == {(1, 10), (2, 10), (2, 11), (3, 11), (4, 11), (5, 11), (5, 12)}


def test_range_join_empty_right(spark):
    from polars_express_spark.operators.range_join import bucketed_range_join

    left = spark.createDataFrame([(1, _ts(5))], "pid long, ts timestamp")
    right = spark.createDataFrame([], "iv long, s timestamp, e timestamp")
    assert bucketed_range_join(left, right, "ts", "s", "e", 60).count() == 0


def test_scd2_merge_row_classes(spark):
    """Untouched → 1 current row; updated → closed history + v2 current;
    inserted → v1 current."""
    from polars_express_spark.operators.scd2 import scd2_merge

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, old double")
    updates = spark.createDataFrame([(2, 25.0), (3, 30.0)], "k long, new double")
    rows = scd2_merge(base, updates, key="k", old_val="old", new_val="new").collect()
    got = {(r["k"], r["val"], r["version"], r["is_current"]) for r in rows}
    assert got == {
        (1, 10.0, 1, True),  # untouched
        (2, 20.0, 1, False),  # closed history
        (2, 25.0, 2, True),  # new current
        (3, 30.0, 1, True),  # insert
    }


def test_scd2_merge_delete_tombstones(spark):
    """A NULL new_val on a present update row is a DELETE: history row
    only, no current row; deleting an absent key emits nothing."""
    from polars_express_spark.operators.scd2 import scd2_merge

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, old double")
    updates = spark.createDataFrame(
        [(2, None), (9, None)], "k long, new double"
    )
    rows = scd2_merge(base, updates, key="k", old_val="old", new_val="new").collect()
    got = {(r["k"], r["val"], r["version"], r["is_current"]) for r in rows}
    assert got == {
        (1, 10.0, 1, True),  # untouched
        (2, 20.0, 1, False),  # deleted: closed history, no current
    }


def test_pack_next_fit_semantics_and_partition_invariance(spark):
    """Next-fit: fill until overflow, oversize docs get their own bin;
    output must be identical regardless of input partitioning (block
    membership and order are pure functions of the id)."""
    from polars_express_spark.operators.packing import pack_next_fit

    rows = [(0, 50), (1, 60), (2, 30), (3, 200), (4, 10), (100, 90), (101, 40)]
    d = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = {
        r["doc_id"]: (r["block"], r["bin_id"])
        for r in pack_next_fit(d, capacity=128, block_size=100).collect()
    }
    # block 0: 50 | +60=110 | +30>128 → bin1: 30 | +200>128 → bin2 (oversize alone)
    # | 10 doesn't fit after 200 → bin3; block 100: 90 | +40=130>128 → bin1
    assert out == {
        0: (0, 0), 1: (0, 0), 2: (0, 1), 3: (0, 2), 4: (0, 3),
        100: (100, 0), 101: (100, 1),
    }
    shuffled = pack_next_fit(d.repartition(7), capacity=128, block_size=100)
    assert {(r["doc_id"], r["block"], r["bin_id"]) for r in shuffled.collect()} == {
        (k, b, bi) for k, (b, bi) in out.items()
    }


def test_chunk_overlap_short_doc_single_chunk(spark):
    """A doc shorter than the stride yields exactly one chunk covering
    all its tokens."""
    import pandas as pd

    from polars_express_spark.queries.advanced import q_chunk_overlap

    # run the registered query at the test SF and check invariants
    out = q_chunk_overlap(spark, "/root/testdata/sf0.001").toPandas()
    assert (out["chunk_len"] >= 1).all()
    assert (out["chunk_len"] <= 40).all()
    # chunk 0 always starts at token 0
    first = out[out["chunk_id"] == 0]
    assert (first["start_tok"] == 0).all()
    # per-doc: starts are an arithmetic sequence at the stride
    g = out.groupby("doc_id")["start_tok"]
    assert ((g.max() % 25) == 0).all()
    assert isinstance(out, pd.DataFrame)


def test_pca_fit_orthonormal_and_deterministic(spark):
    """Components must be orthonormal with deterministic sign; two fits
    on the same data must agree exactly; projection preserves row
    count and k."""
    import numpy as np

    from polars_express_spark.catalog import load_table
    from polars_express_spark.operators.pca import pca_fit, pca_project

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    mean, comps, eigvals, n = pca_fit(emb, "embedding", k=3)
    assert comps.shape == (3, 64) and n == emb.count()
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-10)
    assert (eigvals[:-1] >= eigvals[1:]).all()  # descending
    mean2, comps2, eigvals2, _ = pca_fit(emb, "embedding", k=3)
    np.testing.assert_array_equal(comps, comps2)
    rows = pca_project(emb, mean, comps).collect()
    assert len(rows) == n and all(len(r["pc"]) == 3 for r in rows)


def test_merge_on_read_latest_wins_and_deletes(spark):
    """Base rows rank lowest; highest seq wins; a latest delete removes
    the key; an insert (log-only key) appears."""
    from polars_express_spark.operators.scd2 import merge_on_read

    base = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    log = spark.createDataFrame(
        [
            (2, 1, 25.0, "upsert"),  # update
            (2, 2, 26.0, "upsert"),  # later update wins
            (3, 1, None, "delete"),  # delete
            (4, 1, 40.0, "upsert"),  # insert
            (5, 1, 50.0, "upsert"),  # insert then delete → absent
            (5, 2, None, "delete"),
        ],
        "k long, seq long, v double, op string",
    )
    got = {(r["k"], r["v"]) for r in merge_on_read(base, log, "k", "seq", "v").collect()}
    assert got == {(1, 10.0), (2, 26.0), (4, 40.0)}


def test_interval_join_overlap_classes_no_duplicates(spark):
    """Touching endpoints (half-open) don't overlap; containment,
    partial overlap, and multi-bucket spans each yield EXACTLY one
    pair row (canonical-bucket emission, no dedup pass)."""
    from polars_express_spark.operators.range_join import bucketed_interval_join

    left = spark.createDataFrame(
        [
            (1, _ts(0), _ts(100)),  # overlaps A (partial), B (contains B)
            (2, _ts(100), _ts(200)),  # touches A's end: NO overlap with [50,100)
            (3, _ts(0), _ts(1000)),  # spans many buckets; overlaps A, B, C
        ],
        "lid long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(50), _ts(100)),  # A
            (11, _ts(20), _ts(30)),  # B
            (12, _ts(900), _ts(950)),  # C
        ],
        "rid long, rs timestamp, re timestamp",
    )
    out = bucketed_interval_join(left, right, "ls", "le", "rs", "re", 60)
    pairs = [(r["lid"], r["rid"]) for r in out.collect()]
    assert sorted(pairs) == sorted(
        [(1, 10), (1, 11), (3, 10), (3, 11), (3, 12)]
    )  # exactly once each — no bucket-collision duplicates


def test_snapshot_diff_row_classes(spark):
    """insert / delete / update classified; unchanged rows (including
    NULL == NULL) excluded; NULL→value and value→NULL are updates."""
    from polars_express_spark.operators.scd2 import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, None), (5, None)],
        "k long, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, None), (5, 55.0), (6, 60.0)],
        "k long, v double",
    )
    got = {
        (r["k"], r["change"], r["old_val"], r["new_val"])
        for r in snapshot_diff(old, new, "k", "v").collect()
    }
    assert got == {
        (2, "update", 20.0, 25.0),
        (3, "delete", 30.0, None),
        (5, "update", None, 55.0),
        (6, "insert", None, 60.0),
    }  # 1 unchanged, 4 NULL==NULL unchanged — both absent


def test_merge_agg_states_key_classes(spark):
    """Untouched keys pass through, shared keys add, delta-only keys
    appear, and NULL group keys merge null-safely."""
    from polars_express_spark.operators.incremental import merge_agg_states

    state = spark.createDataFrame(
        [("a", 10, 100.0), ("b", 5, 50.0), (None, 1, 1.0)],
        "k string, n long, s double",
    )
    delta = spark.createDataFrame(
        [("b", 2, 20.0), ("c", 7, 70.0), (None, 3, 3.0)],
        "k string, n long, s double",
    )
    got = {
        (r["k"], r["n"], r["s"])
        for r in merge_agg_states(state, delta, ["k"], ["n", "s"]).collect()
    }
    assert got == {("a", 10, 100.0), ("b", 7, 70.0), ("c", 7, 70.0), (None, 4, 4.0)}


def test_multireg_recovers_exact_plane_and_rejects_collinear(spark):
    """y = 3 + 2a − 5b exactly → solve recovers (3, 2, −5) with R²=1;
    a collinear feature pair must raise, not return garbage."""
    import numpy as np
    import pytest

    from polars_express_spark.operators.ols import (
        gram_moments,
        solve_normal_equations,
    )

    rows = [(float(a), float(b), 3.0 + 2.0 * a - 5.0 * b) for a in range(6) for b in range(4)]
    df = spark.createDataFrame(rows, "a double, b double, y double")
    mom = gram_moments(df, "y", ["a", "b"]).collect()[0]
    beta, r2 = solve_normal_equations(mom, ["a", "b"])
    np.testing.assert_allclose(beta, [3.0, 2.0, -5.0], atol=1e-9)
    assert abs(r2 - 1.0) < 1e-12
    bad = df.withColumn("b2", df.b * 2)
    mom2 = gram_moments(bad, "y", ["b", "b2"]).collect()[0]
    with pytest.raises(ValueError, match="collinear"):
        solve_normal_equations(mom2, ["b", "b2"])


def test_weighted_quantile_hand_cases(spark):
    """Hand-checked crossings: a heavy row dominates; an exact 50%
    boundary picks the crossing row (lower quantile); zero/negative
    weights carry no mass; q=1/4 crosses earlier."""
    from polars_express_spark.operators.weighted import weighted_quantile

    rows = [
        ("g1", 10.0, 1.0), ("g1", 20.0, 1.0), ("g1", 30.0, 8.0),  # mass at 30
        ("g2", 1.0, 2.0), ("g2", 2.0, 2.0),  # cum at v=1 is exactly half → 1
        ("g3", 5.0, 0.0), ("g3", 7.0, -3.0), ("g3", 9.0, 1.0),  # only 9 counts
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    med = {
        r["g"]: (r["wq_value"], r["total_weight"])
        for r in weighted_quantile(df, "g", "v", "w").collect()
    }
    assert med == {"g1": (30.0, 10.0), "g2": (1.0, 4.0), "g3": (9.0, 1.0)}
    q25 = {
        r["g"]: r["wq_value"]
        for r in weighted_quantile(df, "g", "v", "w", q_num=1, q_den=4).collect()
    }
    # g1 threshold is 10/4 = 2.5: cum is 1 at v=10, 2 at v=20, 10 at v=30
    assert q25["g1"] == 30.0
    # tiebreak column must survive the scaled-weight projection
    # (regression: the scaled-long rewrite dropped it — review r6)
    rows_tb = [("g1", 1.0, 1.0, "b"), ("g1", 1.0, 1.0, "a"), ("g1", 2.0, 2.0, "c")]
    df_tb = spark.createDataFrame(rows_tb, "g string, v double, w double, tb string")
    got = weighted_quantile(df_tb, "g", "v", "w", tiebreak="tb").collect()
    assert {(r["g"], r["wq_value"], r["total_weight"]) for r in got} == {("g1", 1.0, 4.0)}


def test_kcore_keeps_cycles_drops_chains(spark):
    """2-core of triangle{1,2,3} + chain 4-5-6 + pendant 3-7: only the
    triangle survives, each member with core-degree 2."""
    from polars_express_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (3, 7)], "a_id long, b_id long"
    )
    got = {(r["node"], r["core_deg"]) for r in kcore(edges, k=2).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_raises_on_round_budget_and_bad_args(spark):
    """A long chain peels only its two ends per round, so a tight round
    budget must RAISE (never return a superset of the core); and a
    non-positive budget is rejected up front instead of NameError-ing."""
    import pytest

    from polars_express_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="stabilize"):
        kcore(chain, k=2, max_rounds=3)
    with pytest.raises(ValueError, match="max_rounds"):
        kcore(chain, k=2, max_rounds=0)
    # with budget, the chain fully peels away: empty 2-core
    assert kcore(chain, k=2, max_rounds=20).count() == 0


def test_grouped_topk_matches_window_rank_across_partitionings(spark):
    """The two-phase bounded top-k must equal the window-rank answer for
    every input partitioning, including keys split across partitions
    and groups smaller than k."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from polars_express_spark.operators.topk import grouped_topk

    rng = random.Random(11)
    rows = [
        (f"g{rng.randint(0, 5)}", i, float(rng.randint(0, 40)))
        for i in range(300)
    ] + [("lonely", 9999, 1.0)]
    df = spark.createDataFrame(rows, "key string, id long, score double")
    w = W.partitionBy("key").orderBy(F.col("score").desc(), F.col("id"))
    want = {
        (r["key"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
        .collect()
    }
    for parts in (1, 3, 13):
        got = {
            (r["key"], r["id"])
            for r in grouped_topk(
                df.repartition(parts), ["key"], "score", 4, ["id"]
            ).collect()
        }
        assert got == want, f"parts={parts}"
