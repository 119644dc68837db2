"""Bounded-memory grouped top-k (partial top-k combine).

The textbook way to get "top k rows per group" is a ranked window —
``row_number() OVER (PARTITION BY key ORDER BY score)`` then filter.
That is correct but shuffles EVERY row to its key's reducer before any
row is discarded: at 100 TB the shuffle is the whole input. The classic
fix (the combiner pattern applied to order statistics) is two-phase:

1. **map-side prune**: within each input partition, keep only the top-k
   rows per key (Arrow-batched; state is a per-key k-row buffer, so
   memory is bounded by keys-seen-in-partition × k);
2. **final select**: shuffle the survivors — at most
   k × n_partitions rows per key, usually orders of magnitude smaller
   than the raw group — and take the per-key top-k of those.

Phase 1 can never drop a final-answer row: any row in a group's global
top-k is in the top-k of whatever partition it sits in.

Determinism: ties are broken by the caller-supplied ``tie_cols`` total
order, applied identically in both phases, so the result is exactly the
window-rank answer (which is how the oracle replays it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    tie_cols: list[str],
    descending: bool = True,
) -> DataFrame:
    """Top ``k`` rows per ``keys`` group by ``order_col`` (ties broken by
    ``tie_cols`` ascending), with bounded map-side state.

    Rows with a NULL ``order_col`` are dropped up front: a null has no
    rank, and leaving it in would make the two phases diverge — pandas
    ``sort_values`` places NaN/None LAST regardless of the ascending
    flag, while Spark's window rank (the oracle semantics) places nulls
    first for ascending — so the map-side prune could keep or drop
    different rows than the final select. The contract is therefore
    "window rank over the non-null-ordered rows"; ``tie_cols`` must
    still be a total order within each (keys, order_col) tie group."""
    df = df.where(df[order_col].isNotNull())
    sort_cols = [order_col, *tie_cols]
    ascending = [not descending] + [True] * len(tie_cols)

    def local_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        return (
            pdf.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(keys, sort=False, dropna=False)
            .head(k)
        )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fold batches into a per-partition buffer that never exceeds
        # (keys seen in this partition) × k rows
        buf: pd.DataFrame | None = None
        for pdf in batches:
            merged = pdf if buf is None else pd.concat([buf, pdf], ignore_index=True)
            buf = local_topk(merged)
        if buf is not None and len(buf):
            yield buf

    pruned = df.mapInPandas(partial, df.schema)
    return pruned.groupBy(keys).applyInPandas(
        lambda pdf: local_topk(pdf), df.schema
    )
