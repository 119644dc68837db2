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
