"""Distributed PCA over an embedding column — dimensionality reduction
for embedding compression / visualization in a training-data pipeline.

Scale shape (the only one that works at 100 TB for small dim d):

1. ONE pass computes per-partition moment partials — count, sum vector,
   d×d Gram matrix — inside an Arrow-batched mapInPandas (numpy
   ``M.T @ M`` per batch, no per-row Python). Partials are
   partition-count rows of ~d² doubles; for d=64 that is ~33 KB per
   partition — the driver sum is a kilobyte-scale boundary collect,
   same class as the IVF centroid collects (similarity.py).
2. The d×d covariance eigendecomposition runs on the driver with
   numpy — O(d³) on a matrix that fits in a cache line budget; no
   cluster work could help.
3. Projection back over the data is row-parallel: broadcast the (k×d)
   component matrix into a mapInPandas matmul.

Eigenvector SIGN is fixed deterministically (largest-|component|
coordinate made positive) so repeated fits agree.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _moment_partials(dim: int, vec_col: str):
    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            n += m.shape[0]
            s += m.sum(axis=0)
            g += m.T @ m
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]})

    return f


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 2):
    """Fit PCA on `df[vec_col]` (array<float>). Returns
    (mean[d], components[k×d], eigvals[d desc], n) as numpy/driver
    values — kilobytes, intended for broadcast into pca_project."""
    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("pca_fit: empty input")
    dim = len(first[0])
    parts = (
        df.select(vec_col)
        .mapInPandas(
            _moment_partials(dim, vec_col),
            schema="n long, s array<double>, g array<double>",
        )
        .collect()
    )
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]).reshape(dim, dim) for p in parts], axis=0)
    mean = s / n
    cov = g / n - np.outer(mean, mean)  # population covariance
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    comps = eigvecs[:, order].T[:k]  # k×d
    # deterministic sign: make the largest-|x| coordinate positive
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    return mean, comps, eigvals, int(n)


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    comps: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Row-parallel projection: (x − mean) @ componentsᵀ per row, numpy
    over whole Arrow batches."""
    k = comps.shape[0]
    mean_b = mean.copy()
    comps_t = comps.T.copy()

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype("float64") - mean_b
            p = m @ comps_t
            yield pd.DataFrame({id_col: pdf[id_col], "pc": list(p)})

    out_schema = f"{id_col} long, pc array<double>"
    assert k >= 1
    return df.select(id_col, vec_col).mapInPandas(proj, schema=out_schema)
