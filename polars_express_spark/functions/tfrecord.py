"""TFRecord shard reader/writer (SURVEY.md §2.10 ingestion tier, r15).

The TensorFlow training-shard format — with WARC, tar/WebDataset, and
zip, this completes the set of containers a large-scale training
pipeline actually reads. The framing is tiny and FULLY CHECKSUMMED
(the strongest integrity posture in the archive family): each record is

    uint64le  length
    uint32le  masked_crc32c(length bytes)
    bytes     data[length]
    uint32le  masked_crc32c(data)

where crc32c is the Castagnoli CRC (reflected polynomial 0x82F63B78 —
NOT zlib's 0xEDB88320, so the table is built here) and the mask is the
TFRecord rotation `((crc >> 15) | (crc << 17)) + 0xa282ead8`. Both the
length CRC and the data CRC are verified on every record, so ANY
single-bit flip anywhere in a shard is detected — TFRecord sits with
PNG/FLAC/Ogg on the detected side of the §2.10 integrity asymmetry.

The record PAYLOAD is conventionally a serialized tf.Example protobuf;
decoding an ARBITRARY protobuf needs a schema registry and stays out
of envelope here — but tf.Example itself is a fixed public message,
and since r16 functions/protowire.py decodes it from the wire format
(read_tfexample_records composes parse_tfrecord with that walk). The
swap-in point for other payload schemas remains the record list — the
framing, splitting, and integrity layers are what a Spark reader owns.
parse_tfrecord returns raw record bytes; read_tfrecord_records is the
generator-shaped Arrow operator; encode_tfrecord is the independent
writer twin.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct


def _crc32c_table():
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_CRC32C = _crc32c_table()


def crc32c(data: bytes) -> int:
    """Castagnoli CRC-32 (reflected 0x82F63B78, init/xorout all-ones) —
    the iSCSI/TFRecord polynomial, distinct from zlib's CRC-32."""
    crc = 0xFFFFFFFF
    tbl = _CRC32C
    for b in data:
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def parse_tfrecord(payload: bytes):
    """REAL TFRecord parse: returns the list of raw record payloads or
    None. Both the length CRC and the data CRC are verified per record
    (mismatch, truncation, or trailing bytes → None — never a short
    read). Allocation is input-bounded: records are slices."""
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        if pos + 12 > n:
            return None
        (length,) = struct.unpack_from("<Q", payload, pos)
        (lcrc,) = struct.unpack_from("<I", payload, pos + 8)
        if _masked_crc(payload[pos : pos + 8]) != lcrc:
            return None
        if length > n - pos - 16:
            return None  # truncated record (also bounds the slice)
        data = payload[pos + 12 : pos + 12 + length]
        (dcrc,) = struct.unpack_from("<I", payload, pos + 12 + length)
        if _masked_crc(data) != dcrc:
            return None
        out.append(data)
        pos += 16 + length
    if not out:
        return None
    return out


def encode_tfrecord(records) -> bytes:
    """Independent TFRecord writer: length + masked length-CRC + data
    + masked data-CRC per record."""
    out = bytearray()
    for data in records:
        data = bytes(data)
        ln = struct.pack("<Q", len(data))
        out += ln + struct.pack("<I", _masked_crc(ln))
        out += data + struct.pack("<I", _masked_crc(data))
    return bytes(out)


TFRECORD_SCHEMA = (
    "doc_id bigint, rec_no int, size bigint, "
    "mean_b double, min_b int, max_b int"
)


def tfrecord_record_batches(batches):
    """Batch-iterator core of read_tfrecord_records (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            recs = parse_tfrecord(bytes(payload))
            if recs is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt or out-of-envelope TFRecord "
                    "shard (CRC32C failure or truncation)"
                )
            for rno, data in enumerate(recs):
                arr = np.frombuffer(data, dtype=np.uint8)
                rows.append(
                    (doc_id, rno, len(data),
                     float(arr.mean()) if arr.size else 0.0,
                     int(arr.min()) if arr.size else 0,
                     int(arr.max()) if arr.size else 0)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "rec_no", "size", "mean_b", "min_b",
                     "max_b"],
        ).astype({"rec_no": "int32", "min_b": "int32", "max_b": "int32"})


def read_tfrecord_records(df):
    """TFRecord extraction operator (the WARC/zip/tar operator shape):
    one shard row → one row per record with exact byte stats over the
    CRC-verified payload. Malformed shards raise. Arrow-batched
    mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        tfrecord_record_batches, schema=TFRECORD_SCHEMA
    )
