"""Sequence packing — greedy next-fit of documents into fixed token
budgets (the pre-tokenizer packing step of an LLM training pipeline:
short documents are concatenated into context windows so padding waste
stays low).

Distribution strategy: packing is inherently SEQUENTIAL (bin state
carries from row to row), so a 100 TB corpus can't be packed as one
global stream. The standard answer — used here — is BLOCKED packing:
rows are grouped into deterministic blocks (doc_id div block_size),
each block packs independently in doc_id order, and bin ids are local
to the block. Blocks are embarrassingly parallel, sized to thousands of
docs each, and the waste vs global packing is at most one partial bin
per block. The per-block scan runs in an Arrow-batched applyInPandas —
the grouped-map UDF surface (SURVEY.md §2.10) — never on the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


PACKED_SCHEMA = "doc_id bigint, block bigint, bin_id bigint, n_tok bigint"


def pack_next_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "n_tok",
    capacity: int = 512,
    block_size: int = 100,
) -> DataFrame:
    """Pack rows into bins of `capacity` tokens, next-fit in `id_col`
    order within deterministic blocks of `block_size` ids.

    Next-fit: keep one open bin; if the next doc fits, append, else
    open a new bin (a doc larger than capacity gets a bin of its own
    and the following doc opens fresh). Deterministic — independent of
    partitioning — because block membership and intra-block order are
    pure functions of the id.
    """
    from pyspark.sql import functions as F

    blocked = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) - (F.col(id_col) % block_size)).alias("block"),
        F.col(tok_col).cast("bigint").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids = []
        bin_id, fill = 0, 0
        for i, n in enumerate(pdf["n_tok"]):
            if i == 0:
                fill = n
            elif fill + n <= capacity:
                fill += n
            else:
                bin_id += 1
                fill = n
            bin_ids.append(bin_id)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        return pdf[["doc_id", "block", "bin_id", "n_tok"]]

    return blocked.groupBy("block").applyInPandas(pack, schema=PACKED_SCHEMA)
