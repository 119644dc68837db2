"""Deterministic-sampler properties (SURVEY.md §2.10): reproducibility
under repartitioning, per-stratum fractions, and nested-split subset
structure — the guarantees df.sample cannot give."""

from __future__ import annotations

from polars_express_spark.catalog import load_table
from pyspark.sql import functions as F
from polars_express_spark.operators.sampling import deterministic_sample, stratified_sample
from tests.conftest import SF_DIR


def _ids(df):
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def test_sample_stable_under_repartition(spark):
    d = load_table(spark, SF_DIR, "documents")
    a = _ids(deterministic_sample(d, 0.3, ["doc_id"]))
    b = _ids(deterministic_sample(d.repartition(17), 0.3, ["doc_id"]))
    assert a == b and a


def test_sample_fraction_tolerance(spark):
    d = load_table(spark, SF_DIR, "documents")
    n = d.count()
    kept = len(_ids(deterministic_sample(d, 0.3, ["doc_id"])))
    assert abs(kept / n - 0.3) < 0.08


def test_nested_samples_are_subsets(spark):
    """Same seed, growing fraction → strictly nested kept-sets (the
    hash-threshold cut property)."""
    d = load_table(spark, SF_DIR, "documents")
    s10 = _ids(deterministic_sample(d, 0.1, ["doc_id"]))
    s30 = _ids(deterministic_sample(d, 0.3, ["doc_id"]))
    assert s10 <= s30


def test_stratified_fractions(spark):
    d = load_table(spark, SF_DIR, "documents")
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    some_lang = sorted(langs)[0]
    out = stratified_sample(
        d, "lang", {some_lang: 1.0}, key_cols=["doc_id"], default_fraction=0.0
    )
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got == {some_lang}
    assert out.count() == d.where(d.lang == some_lang).count()


def test_mixture_sample_caps_dominant_keeps_rare(spark):
    """Domain mixing: over-represented strata shrink toward their target
    share; strata already under target are kept WHOLE (never upsampled);
    the kept-set is partition-independent."""
    from polars_express_spark.operators.sampling import mixture_sample

    d = load_table(spark, SF_DIR, "documents")
    shares = {"en": 0.25, "de": 0.1875, "es": 0.1875, "fr": 0.1875, "zh": 0.1875}
    out = mixture_sample(d, "lang", shares, key_cols=["doc_id"])
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_corpus = sum(tot.values())
    for lang, n in tot.items():
        if n <= shares[lang] * n_corpus:  # under target → untouched
            assert kept.get(lang) == n, lang
        else:  # over target → capped near share·N
            expect = shares[lang] * n_corpus
            assert abs(kept[lang] - expect) <= 4 * (expect * (1 - expect / n)) ** 0.5 + 2, lang
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in mixture_sample(
            d.repartition(17), "lang", shares, key_cols=["doc_id"]
        ).select("doc_id").collect()
    }
    assert a == b


def test_mixture_sample_keeps_unlisted_strata_whole(spark):
    """A stratum absent from target_shares must survive untouched (no
    silent domain deletion); with default_share it is capped instead."""
    from polars_express_spark.operators.sampling import mixture_sample

    d = load_table(spark, SF_DIR, "documents")
    out = mixture_sample(d, "lang", {"en": 0.25}, key_cols=["doc_id"])
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in tot.items():
        if lang != "en":
            assert kept.get(lang) == n, lang
    assert kept["en"] < tot["en"]
    capped = mixture_sample(d, "lang", {"en": 0.25}, key_cols=["doc_id"], default_share=0.05)
    ck = {r["lang"]: r["n"] for r in capped.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_corpus = sum(tot.values())
    for lang, n in tot.items():
        if lang != "en":
            assert ck.get(lang, 0) < n, lang  # now capped below full size
            assert ck.get(lang, 0) > 0.05 * n_corpus * 0.4  # but near target


def test_hash_split_disjoint_cover_and_boundary_stability(spark):
    """Every row in exactly one split; nudging a weight boundary only
    moves rows across that boundary (train shrink → rows move to val,
    test membership untouched); invalid weights raise."""
    import pytest

    from polars_express_spark.operators.sampling import hash_split

    d = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(
        d, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"]).collect()}
    assert len(a) == 2000  # one split per row, no row lost
    b = {r["doc_id"]: r["split"] for r in hash_split(
        d, {"train": 0.7, "val": 0.2, "test": 0.1}, ["doc_id"]).collect()}
    for k in a:
        if a[k] != b[k]:
            assert (a[k], b[k]) == ("train", "val")  # only the moved boundary
    assert {k for k in a if a[k] == "test"} == {k for k in b if b[k] == "test"}
    with pytest.raises(ValueError):
        hash_split(d, {"train": 0.8, "val": 0.1}, ["doc_id"])


def test_weighted_sample_extremes_and_determinism(spark):
    """Weight 1 keeps surely, weight 0 drops surely; clamping handles
    out-of-range weights; repartitioning never changes the kept set."""
    from pyspark.sql import functions as F

    from polars_express_spark.operators.sampling import weighted_sample

    d = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.lit(1.5))   # clamps to 1 → kept
        .when(F.col("id") % 3 == 1, F.lit(-0.2))   # clamps to 0 → dropped
        .otherwise(F.lit(0.5))
        .alias("w"),
    )
    kept = {r["doc_id"] for r in weighted_sample(d, "w", ["doc_id"]).collect()}
    assert all(k in kept for k in range(0, 500, 3))
    assert all(k not in kept for k in range(1, 500, 3))
    half = [k for k in kept if k % 3 == 2]
    assert 0 < len(half) < len(range(2, 500, 3))  # genuinely probabilistic
    kept2 = {r["doc_id"] for r in weighted_sample(d.repartition(13), "w", ["doc_id"]).collect()}
    assert kept == kept2


def test_exact_k_sample_cardinality_and_partition_invariance(spark):
    """Exactly min(k, n) rows per stratum; membership is a pure
    function of the key — identical under any input partitioning."""
    from polars_express_spark.operators.sampling import exact_k_sample

    rows = [(i, "a" if i < 20 else ("b" if i < 23 else None)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = exact_k_sample(df, "lang", k=5, key_cols=["doc_id"]).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["a"]) == 5  # n=20 → exactly k
    assert len(by["b"]) == 3  # n=3 ≤ k → whole stratum
    assert len(by[None]) == 5  # NULL stratum sampled like any other
    again = exact_k_sample(df.repartition(7), "lang", k=5, key_cols=["doc_id"]).collect()
    assert {(r["doc_id"], r["lang"]) for r in again} == {
        (d, l) for l, ds in by.items() for d in ds
    }
