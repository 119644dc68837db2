"""Column-level function surfaces: multimodal plumbing + Python UDTF
(SURVEY.md §2.10)."""

from polars_express_spark.functions.multimodal import (
    attach_payload,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
)

__all__ = [
    "attach_payload",
    "decode_media",
    "extract_features",
    "resize_media",
    "sample_frames",
]
