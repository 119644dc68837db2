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

from pyspark.sql import Column, DataFrame
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
) -> DataFrame:
    """Resample toward a TARGET MIXTURE (domain/language mixing): the
    keep fraction per stratum is computed FROM THE DATA as
    min(1, share·N_total / n_stratum), so over-represented strata are
    downsampled toward their target share and under-represented ones are
    kept whole (this operator never upsamples — use it to cap dominant
    domains, not to duplicate rare ones).

    Scale shape: one small aggregate (per-stratum counts + grand total)
    broadcast-joined back onto the corpus, then the same deterministic
    hash filter as every sampler here — no corpus shuffle, reproducible
    on any partitioning, and nested-split composable at fixed seed.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n_stratum"))
    total = df.agg(F.count(F.lit(1)).alias("__n_corpus"))
    share = F.lit(0.0)
    for value, s in sorted(target_shares.items()):
        share = F.when(F.col(strata_col) == value, F.lit(float(s))).otherwise(share)
    frac_tbl = counts.crossJoin(total).select(
        strata_col,
        F.least(F.lit(1.0), share * F.col("__n_corpus") / F.col("__n_stratum")).alias("__frac"),
    )
    out = df.join(F.broadcast(frac_tbl), strata_col)
    return out.where(_keep(key_cols, F.col("__frac"), seed)).drop("__frac")
