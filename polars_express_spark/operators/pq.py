"""Product quantization (PQ) — embedding compression for ANN at scale
(§2.10 similarity family, the third index beside IVF and sign-LSH).

Why: at 100 TB of float32 embeddings, even the IVF shortlist can't
afford to touch raw vectors. PQ splits each (unit-normalized) vector
into `m` subspaces and replaces every subvector with the id of its
nearest codeword from a per-subspace codebook of `k` entries — 64
doubles become `m` small ints (64 bytes at m=8), an ~64× compression
that still supports approximate scoring WITHOUT decompression:
ADC (asymmetric distance computation) precomputes, per query, an
(m × k) lookup table of query-subvector · codeword dot products; a
vector's approximate cosine is then m table lookups summed.

Distributed shapes (all the same machinery as the IVF trainer):
- TRAIN: per-subspace L2 Lloyd iterations — ONE Arrow-batched
  mapInPandas pass assigns all m subspaces per batch and emits
  per-(subspace, code) partial sums + counts; a groupBy finalizes;
  only the m·k·dsub codebook (kilobytes) ever reaches the driver.
- ENCODE: codebooks broadcast into mapInPandas, one argmin matmul per
  subspace per batch, zero shuffle — output is the narrow codes frame.
- SCORE (ADC): per-probe LUTs broadcast into mapInPandas over the
  CODES frame only; each batch emits just its local top-`shortlist`
  per probe (global top-s ⊆ union of batch top-s), so the scan output
  is bounded by batches × probes × s, never corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit_rows(M: np.ndarray) -> np.ndarray:
    n = np.sqrt((M * M).sum(axis=1))
    n[n == 0] = 1.0
    return M / n[:, None]


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> np.ndarray:
    """Train per-subspace codebooks; returns array (m, k, dim//m).

    Init is the same deterministic hash-spread sample as the IVF
    trainer (order by xxhash64(id) — stable, order-independent); each
    Lloyd round is one mapInPandas + one partial→final aggregate.
    Dead codewords keep their previous value.
    """
    seed = (
        emb.orderBy(F.xxhash64(F.col(id_col)), id_col)
        .limit(k)
        .select(col)
        .collect()
    )
    S0 = _unit_rows(np.array([[float(x) for x in r[col]] for r in seed]))
    if len(S0) == 0:
        return np.zeros((m, 0, 0))
    dim = S0.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible by m {m}"
    dsub = dim // m
    # (m, k, dsub) — subspace s starts from the seed's s-th slice
    C = np.stack([S0[:, s * dsub : (s + 1) * dsub] for s in range(m)])

    vecs = emb.select(F.col(col).cast("array<double>").alias("e"))
    for _ in range(n_iters):
        Cb = C  # broadcast by closure into the Arrow workers

        def partials(batches, Cb=Cb):
            for pdf in batches:
                if pdf.empty:
                    continue
                E = _unit_rows(np.stack(pdf["e"].to_numpy()))
                out = []
                for s in range(m):
                    X = E[:, s * dsub : (s + 1) * dsub]  # batch × dsub
                    # L2 argmin via -2x·c + |c|² (|x|² constant per row)
                    d = -2.0 * (X @ Cb[s].T) + (Cb[s] * Cb[s]).sum(axis=1)
                    code = np.argmin(d, axis=1)
                    S = np.zeros((k, dsub))
                    np.add.at(S, code, X)
                    n = np.bincount(code, minlength=k).astype(float)
                    nz = np.flatnonzero(n > 0)
                    out.append(
                        pd.DataFrame(
                            {
                                "s": np.full(len(nz) * dsub, s, dtype=np.int32),
                                "c": np.repeat(nz, dsub).astype(np.int32),
                                "j": np.tile(np.arange(dsub, dtype=np.int32), len(nz)),
                                "v": S[nz].ravel(),
                            }
                        )
                    )
                    out.append(
                        pd.DataFrame(
                            {
                                "s": np.full(len(nz), s, dtype=np.int32),
                                "c": nz.astype(np.int32),
                                "j": np.full(len(nz), -1, dtype=np.int32),  # count channel
                                "v": n[nz],
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)

        rows = (
            vecs.mapInPandas(partials, schema="s int, c int, j int, v double")
            .groupBy("s", "c", "j")
            .agg(F.sum("v").alias("v"))
            .collect()
        )
        S = np.zeros((m, k, dsub))
        N = np.zeros((m, k))
        for r in rows:
            if r["j"] < 0:
                N[r["s"], r["c"]] = r["v"]
            else:
                S[r["s"], r["c"], r["j"]] = r["v"]
        live = N > 0
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = S / N[:, :, None]
        C = np.where(live[:, :, None], mean, C)
    return C


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — the compressed index frame."""
    m, k, dsub = codebooks.shape

    def enc(batches, Cb=codebooks):
        for pdf in batches:
            if pdf.empty:
                continue
            E = _unit_rows(np.stack(pdf["e"].to_numpy()))
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                X = E[:, s * dsub : (s + 1) * dsub]
                d = -2.0 * (X @ Cb[s].T) + (Cb[s] * Cb[s]).sum(axis=1)
                codes[:, s] = np.argmin(d, axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "codes": list(codes)})

    vecs = emb.select(id_col, F.col(col).cast("array<double>").alias("e"))
    return vecs.mapInPandas(enc, schema=f"{id_col} long, codes array<int>")


def pq_adc_shortlist(
    codes: DataFrame,
    probe_vecs: dict[int, np.ndarray],
    codebooks: np.ndarray,
    shortlist: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC scan: for each probe, approximate-score every coded vector
    via its per-probe (m × k) LUT and emit each batch's local top-
    `shortlist` — (probe_id, vec_id, est). The global top-s is a subset
    of the union of batch top-s, so a window over this bounded frame
    recovers it exactly; the corpus-sized score matrix never exists."""
    m, k, dsub = codebooks.shape
    pids = sorted(probe_vecs)
    # LUTs: per probe, (m, k) of probe_subvector · codeword
    luts = np.stack(
        [
            np.stack(
                [
                    codebooks[s] @ _unit_rows(probe_vecs[p][None, :])[0, s * dsub : (s + 1) * dsub]
                    for s in range(m)
                ]
            )
            for p in pids
        ]
    )  # n_probes × m × k

    def scan(batches, luts=luts):
        for pdf in batches:
            if pdf.empty:
                continue
            codes_arr = np.stack(pdf["codes"].to_numpy())  # batch × m
            ids = pdf[id_col].to_numpy()
            out = []
            for pi, p in enumerate(pids):
                est = luts[pi][np.arange(m), codes_arr].sum(axis=1)
                s = min(shortlist, len(est))
                top = np.argpartition(-est, s - 1)[:s]
                out.append(
                    pd.DataFrame(
                        {"probe_id": p, "vec_id": ids[top], "est": est[top]}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return codes.mapInPandas(scan, schema="probe_id long, vec_id long, est double")


def pq_adc_score_pairs(
    pairs_with_codes: DataFrame,
    probe_vecs: dict[int, np.ndarray],
    codebooks: np.ndarray,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC-score an explicit (probe_id, vec_id, codes) candidate frame —
    the IVF+PQ composition path, where candidates come from the coarse
    index and only they are ever scored. Arrow-batched LUT gather per
    row; adds `est` to the pair frame."""
    m, k, dsub = codebooks.shape
    pids = sorted(probe_vecs)
    pid_index = {p: i for i, p in enumerate(pids)}
    luts = np.stack(
        [
            np.stack(
                [
                    codebooks[s]
                    @ _unit_rows(probe_vecs[p][None, :])[0, s * dsub : (s + 1) * dsub]
                    for s in range(m)
                ]
            )
            for p in pids
        ]
    )  # n_probes × m × k

    def score(batches, luts=luts, pid_index=pid_index):
        for pdf in batches:
            if pdf.empty:
                continue
            codes_arr = np.stack(pdf["codes"].to_numpy())  # batch × m
            pidx = pdf["probe_id"].map(pid_index).to_numpy()
            est = luts[pidx[:, None], np.arange(m)[None, :], codes_arr].sum(axis=1)
            yield pd.DataFrame(
                {
                    "probe_id": pdf["probe_id"].to_numpy(),
                    id_col: pdf[id_col].to_numpy(),
                    "est": est,
                }
            )

    return pairs_with_codes.mapInPandas(
        score, schema=f"probe_id long, {id_col} long, est double"
    )
