"""Deterministic sampling operators (SURVEY.md §2.10 pipeline surface).

`df.sample` draws from a per-partition RNG stream: the kept set changes
with partitioning, task retries, and cluster size — unacceptable for
reproducible training-data splits. These samplers decide per ROW as a
pure function of the row's key: keep iff
pmod(xxhash64(key..., seed), DENOM) < fraction · DENOM. Properties that
matter at 100 TB:

- reproducible anywhere: same rows kept on 1 executor or 1000, on
  retry, after repartition;
- no coordination: a narrow filter, fully pushdown/codegen friendly,
  never a shuffle;
- composable: a 1% sample is a SUBSET of the 10% sample at the same
  seed (both are hash < threshold cuts of the same ordering) — the
  standard trick for nested eval splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DENOM = 1_000_000


def _keep(key_cols: list[str], fraction: Column | float, seed: int) -> Column:
    h = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(DENOM))
    frac = F.lit(fraction) if isinstance(fraction, float) else fraction
    return h < (frac * DENOM).cast("long")


def deterministic_sample(
    df: DataFrame, fraction: float, key_cols: list[str], seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, decided by a hash of key_cols — stable
    under any partitioning/retry/scale."""
    return df.where(_keep(key_cols, fraction, seed))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep rare ones whole). Strata not in `fractions` fall back
    to default_fraction. The fraction lookup is a literal CASE chain —
    no join, the filter stays a narrow codegen stage."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return df.where(_keep(key_cols, frac, seed))


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
    default_share: float | None = None,
) -> DataFrame:
    """Resample toward a TARGET MIXTURE (domain/language mixing): the
    keep fraction per stratum is computed FROM THE DATA as
    min(1, share·N_total / n_stratum), so over-represented strata are
    downsampled toward their target share and under-represented ones are
    kept whole (this operator never upsamples — use it to cap dominant
    domains, not to duplicate rare ones).

    Strata NOT listed in target_shares (including a NULL stratum) are
    kept whole unless default_share is given, in which case they are
    capped at that share like a listed stratum — absence from the target
    mix never silently deletes a domain.

    Scale shape: one small aggregate (per-stratum counts + grand total)
    broadcast-joined back onto the corpus (NULL-safe, so NULL strata
    rows keep their fraction too), then the same deterministic hash
    filter as every sampler here — no corpus shuffle, reproducible on
    any partitioning, and nested-split composable at fixed seed.
    """
    ft = mixture_keep_fractions(df, strata_col, target_shares, default_share)
    ft = ft.select(F.col(strata_col).alias("__stratum"), "__frac")
    out = df.join(
        F.broadcast(ft), F.col(strata_col).eqNullSafe(F.col("__stratum")), "left"
    )
    frac = F.coalesce("__frac", F.lit(1.0))
    return out.where(_keep(key_cols, frac, seed)).drop("__stratum", "__frac")


def mixture_keep_fractions(
    df: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
    default_share: float | None = None,
) -> DataFrame:
    """The per-stratum keep-fraction table mixture_sample filters with:
    (strata_col, __n_stratum, __frac) where __frac = min(1,
    share·N_total / n_stratum) for listed strata, and 1.0 (or the
    default_share formula) for unlisted ones. Exposed so invariant
    checks (q_domain_mix) evaluate the SAME fraction expression the
    sampler applied — no copy-paste drift."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n_stratum"))
    total = df.agg(F.count(F.lit(1)).alias("__n_corpus"))
    share = F.lit(-1.0)  # sentinel: stratum not listed
    for value, s in sorted(target_shares.items()):
        share = F.when(F.col(strata_col) == value, F.lit(float(s))).otherwise(share)

    def capped(s: Column) -> Column:
        return F.least(F.lit(1.0), s * F.col("__n_corpus") / F.col("__n_stratum"))

    unlisted = (
        F.lit(1.0) if default_share is None else capped(F.lit(float(default_share)))
    )
    return counts.crossJoin(total).select(
        strata_col,
        "__n_stratum",
        F.when(share >= 0, capped(share)).otherwise(unlisted).alias("__frac"),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test split: adds a `split` column chosen
    by cumulative hash thresholds — every row lands in EXACTLY one split
    (disjoint + covering by construction), stable under any
    partitioning/retry/scale, and rows never migrate between splits
    when weights are nudged (a row moves only across the boundary that
    moved — the property that keeps eval sets stable across dataset
    versions). Weights must sum to 1; the last split takes the
    remainder so float rounding can't leave rows unassigned."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed)), F.lit(DENOM))
    names = list(weights)
    expr = F.lit(names[-1])  # remainder bucket
    cum = 0.0
    conds = []
    for name in names[:-1]:
        cum += weights[name]
        conds.append((name, int(round(cum * DENOM))))
    for name, thresh in reversed(conds):
        expr = F.when(h < thresh, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def weighted_sample(
    df: DataFrame, weight_col: str, key_cols: list[str], seed: int = 42
) -> DataFrame:
    """Per-row probability sampling: keep each row with probability
    equal to its own weight column (clamped to [0, 1]) — the
    quality-weighted resampling step of a curation pipeline (keep good
    documents surely, junk rarely). Same deterministic hash decision as
    every sampler here: a narrow filter, no shuffle, reproducible."""
    w = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(weight_col)))
    return df.where(_keep(key_cols, w, seed))


def exact_k_sample(
    df: DataFrame,
    stratum: str,
    k: int,
    key_cols: list[str],
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (the polars
    group_by().head(k)-after-shuffle / reservoir-sample shape): keep
    the k rows with the SMALLEST xxhash64(key) in each stratum — a
    uniform without-replacement draw that is reproducible on any
    cluster layout, and exact where fraction-based sampling is only
    binomial (a stratum with n ≤ k rows is kept whole, never padded).

    One hash-ordered row_number window per stratum — the same single
    shuffle a distributed reservoir would need; ties broken by the key
    itself so the pick is total even under hash collisions.
    """
    h = F.xxhash64(*[F.col(c) for c in key_cols])
    w = Window.partitionBy(stratum).orderBy(h, *key_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
