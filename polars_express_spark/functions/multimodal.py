"""Multimodal columns (SURVEY.md §2.10 Tier G).

Design: media is an opaque `binary` payload column plus a typed metadata
struct — the standard Spark shape for image/audio/video at scale (the
payload never round-trips through Python except inside Arrow-batched
mapInPandas operators; partitioning/shuffles move only the bytes they
must).

The decode step (real JPEG/audio decoding) needs native libraries that
are NOT in this environment, so it is stubbed: `decode_media(...,
real_decode=True)` raises NotImplementedError where libjpeg/ffmpeg would
be called, and the default deterministic fake derives metadata purely
from the payload bytes. Everything around the stub — schema, Arrow batch
iteration, column plumbing — is real and oracle-tested (q_multimodal_meta
replays the fake's arithmetic in DuckDB SQL over the same bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "doc_id bigint, byte_len int, width int, height int, channels int"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary payload column (here: UTF-8 bytes of the text —
    stands in for image/audio bytes with identical plumbing)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_media(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas media decode: binary payload → typed metadata.

    Arrow-batched: each partition streams pandas batches through the
    decoder; no per-row Python dispatch. The fake is pure arithmetic on
    byte_len so it is deterministic and SQL-replayable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not present "
                    "in this environment; plug a decoder in here"
                )
            byte_len = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len.astype("int32"),
                    "width": (byte_len % 640).astype("int32"),
                    "height": (byte_len * 7 % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf)).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode, schema=MEDIA_META_SCHEMA)
