"""Multimodal metadata query (SURVEY.md §2.10 Tier G).

The DuckDB oracle replays the deterministic fake-decode arithmetic in
SQL over the same payload bytes — so what's actually being differentially
tested is the real plumbing: binary encode, Arrow batch transfer, the
mapInPandas schema contract, and the join back.
"""

from __future__ import annotations

from polars_express_spark.catalog import load_table
from polars_express_spark.functions.multimodal import attach_payload, decode_media
from polars_express_spark.queries.registry import query


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM documents ORDER BY doc_id
    """,
)
def q_multimodal_meta(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return decode_media(attach_payload(d)).orderBy("doc_id")
