"""Multimodal metadata query (SURVEY.md §2.10 Tier G).

The DuckDB oracle replays the deterministic fake-decode arithmetic in
SQL over the same payload bytes — so what's actually being differentially
tested is the real plumbing: binary encode, Arrow batch transfer, the
mapInPandas schema contract, and the join back.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_express_spark.catalog import load_table
from polars_express_spark.functions.multimodal import (
    attach_payload,
    decode_media,
    sample_frames,
)
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


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT frame_no,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(frame_bytes) AS BIGINT) AS total_bytes
    FROM (
      SELECT doc_id, g.i AS frame_no,
             octet_length(encode(text)) // 4
               + CASE WHEN g.i < octet_length(encode(text)) % 4 THEN 1 ELSE 0 END
               AS frame_bytes
      FROM documents, unnest(generate_series(0, 3)) g(i)
    )
    GROUP BY frame_no ORDER BY frame_no
    """,
)
def q_multimodal_frames(spark, sf_dir):
    """Frame sampling rollup (§2.10): one payload row → 4 frame rows,
    aggregated per frame_no. The oracle replays numpy array_split's
    chunk-size arithmetic (first L%n chunks get the extra byte) in SQL —
    so the differential test covers the generator-shaped mapInPandas
    plumbing and the exact byte accounting."""
    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_payload(d), n_frames=4)
    return (
        frames.groupBy("frame_no")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame")).alias("total_bytes"),
        )
        .orderBy("frame_no")
    )
