"""Training-encode corpus (queries/training.py): pure-Python reference
properties beyond the DuckDB oracle mirror — randomized inputs the
fixed parquet tables can't produce (gappy-but-closed key sets, skewed
vocab ties, docs with zero model hits).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _digit_root_depth(k: int) -> tuple[int, int]:
    s = str(k)
    return int(s[0]), len(s) - 1


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.sets(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=40))
def test_resolve_roots_matches_digit_formula(spark, keys):
    """Under parent(k) = k div 10 the root is k's leading digit and the
    depth is len(digits) - 1 — checked on random key sets CLOSED under
    parent() (the operator's contract), which contiguous ranges satisfy
    but these gappy sets only do after explicit closure."""
    from polars_express_spark.queries.training import resolve_roots

    closed = set()
    for k in keys:
        while k not in closed:
            closed.add(k)
            if k >= 10:
                k //= 10
    df = spark.createDataFrame([(k,) for k in sorted(closed)], "k long")
    got = {r["k"]: (r["root_key"], r["depth"]) for r in resolve_roots(df, "k").collect()}
    assert got == {k: _digit_root_depth(k) for k in closed}


_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"])
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)


def _py_vocab_encode(texts: list[str], v: int, maxlen: int):
    from collections import Counter

    toks = [t.split() for t in texts]
    counts = Counter(tok for ts in toks for tok in ts)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    vid = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
    out = {}
    for i, ts in enumerate(toks):
        if not ts:  # no tokens → no row (both engines drop it)
            continue
        ids = [vid.get(t, 0) for t in ts[:maxlen]]
        out[i] = (ids, len(ids), sum(1 for x in ids if x == 0))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_doc, min_size=1, max_size=12))
def test_tokenize_ids_python_reference(spark, texts):
    """Vocab build (count-desc, token-asc ties) + positional encode vs a
    pure-Python reference, with the vocab cut forced to split ties."""
    import polars_express_spark.queries.training as tr

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    orig_load, orig_v = tr.load_table, tr._VOCAB_V
    tr.load_table, tr._VOCAB_V = (lambda spark, sf_dir, name: d), 3
    try:
        got = {
            r["doc_id"]: (
                [int(x) for x in r["ids"].split(",")],
                r["n_enc"],
                r["n_oov"],
            )
            for r in tr.q_tokenize_ids(spark, "ignored").collect()
        }
    finally:
        tr.load_table, tr._VOCAB_V = orig_load, orig_v
    assert got == _py_vocab_encode(texts, 3, tr._ENC_MAXLEN)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(st.sampled_from(
    ["the", "spark", "slow", "fast", "zzz", "hash"]), min_size=1, max_size=8
).map(" ".join), min_size=1, max_size=10))
def test_classifier_score_python_reference(spark, texts):
    """Per-doc linear scores vs a pure-Python sum — exact equality, not
    approx: the 1/64-multiple weights make double sums order-free."""
    import polars_express_spark.queries.training as tr

    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    orig_load = tr.load_table
    tr.load_table = lambda spark, sf_dir, name: d
    try:
        got = {
            r["doc_id"]: (r["score"], r["n_hits"], r["keep"])
            for r in tr.q_classifier_score(spark, "ignored").collect()
        }
    finally:
        tr.load_table = orig_load
    w = dict(tr._MODEL_W)
    for i, t in enumerate(texts):
        hits = [w[tok] for tok in t.split() if tok in w]
        score = tr._MODEL_BIAS + sum(hits)
        assert got[i] == (score, len(hits), score > 0.0), (i, t)


def _py_gd(rows, rounds=3, lr=0.5):
    """Pure-Python replica of operators/gradient.gd_train: same
    surrogate, same left-associated IEEE trees, ROUND-half-up to 8 dp,
    exact (Fraction-free) summation via sorted-independent Decimal."""
    from decimal import ROUND_HALF_UP, Decimal

    def r8(x):
        return float(
            Decimal(repr(x)).quantize(Decimal("0.00000001"), rounding=ROUND_HALF_UP)
        )

    n = float(len(rows))
    w = [0.0, 0.0, 0.0]
    for _ in range(rounds):
        g = [Decimal(0), Decimal(0), Decimal(0)]
        for x1, x2, y in rows:
            z = w[0] + w[1] * x1 + w[2] * x2
            p = 0.5 + z / (2.0 * (1.0 + abs(z)))
            dp = 1.0 / (2.0 * (1.0 + abs(z)) * (1.0 + abs(z)))
            common = 2.0 * (p - y) * dp
            for j, xj in enumerate((1.0, x1, x2)):
                g[j] += Decimal(repr(r8(common * xj)))
        w = [wj - lr * (float(g[j]) / n) for j, wj in enumerate(w)]
    return w


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.tuples(
    st.integers(0, 64), st.integers(0, 64), st.integers(0, 1)
), min_size=2, max_size=30))
def test_gd_train_bit_exact_vs_python(spark, raw):
    """gd_train's weights must equal the pure-Python replica EXACTLY
    (==, not approx): the determinism contract says every arithmetic
    tree is IEEE-identical. Inputs on the 1/64 grid — binary fractions
    can never land on a k·1e-8 + 5e-9 rounding tie (5e-9 has a factor
    of 5^9 in its denominator), so the HALF_UP quantization is
    unambiguous on both sides."""
    from polars_express_spark.operators.gradient import gd_train

    rows = [(a / 64.0, b / 64.0, float(y)) for a, b, y in raw]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    w, n = gd_train(df, ["x1", "x2"], "y", rounds=3, lr=0.5)
    assert n == len(rows)
    assert w == _py_gd(rows)
