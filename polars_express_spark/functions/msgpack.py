"""MessagePack decoder/encoder — SURVEY.md §2.10 ingestion tier, r16.

The other self-describing binary serialization next to CBOR: Fluentd
ships log corpora as MessagePack streams and Redis/RPC stacks use it
as the compact JSON stand-in. Pure struct math over the public
msgpack spec (msgpack/spec.md):

    0x00-0x7f positive fixint     0xc4-0xc6 bin 8/16/32
    0x80-0x8f fixmap              0xca/0xcb float 32/64
    0x90-0x9f fixarray            0xcc-0xcf uint 8/16/32/64
    0xa0-0xbf fixstr              0xd0-0xd3 int 8/16/32/64
    0xc0 nil, 0xc2/0xc3 bools     0xd9-0xdb str 8/16/32
    0xe0-0xff negative fixint     0xdc/0xdd array 16/32
                                  0xde/0xdf map 16/32

Envelope (strict, None outside it): all int/str/bin/array/map/float/
bool/nil families above, with str payloads validated UTF-8 and map
keys restricted to int/str with duplicates rejected (the spec leaves
duplicate-key semantics implementation-defined; this module's
never-guess posture rejects). Out of envelope: the ext family
(0xc7-0xc9, 0xd4-0xd8 — application-defined types need a registry,
the tf.Example precedent), the never-used byte 0xc1, truncation, and
trailing bytes. Nesting is depth-capped at 64 (recursion bomb guard);
every length is bounds-checked against the remaining payload before
allocation. encode_msgpack writes the smallest representation (the
spec's recommendation); the decoder accepts non-minimal widths as the
spec requires.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct

from polars_express_spark.functions.cbor import CBOR_NULL

_MAX_DEPTH = 64

# NULL sentinel shared with the CBOR tier: None stays the error signal
MSGPACK_NULL = CBOR_NULL


def _decode(b: bytes, pos: int, depth: int):
    if depth > _MAX_DEPTH:
        return None
    if pos >= len(b):
        return None
    t = b[pos]
    pos += 1
    if t <= 0x7F:
        return t, pos
    if t >= 0xE0:
        return t - 256, pos
    if 0x80 <= t <= 0x8F:
        return _decode_map(b, pos, t & 0x0F, depth)
    if 0x90 <= t <= 0x9F:
        return _decode_array(b, pos, t & 0x0F, depth)
    if 0xA0 <= t <= 0xBF:
        return _decode_str(b, pos, t & 0x1F)
    if t == 0xC0:
        return MSGPACK_NULL, pos
    if t == 0xC2:
        return False, pos
    if t == 0xC3:
        return True, pos
    if t in (0xC4, 0xC5, 0xC6):
        r = _read_len(b, pos, 1 << (t - 0xC4))
        if r is None:
            return None
        ln, pos = r
        if ln > len(b) - pos:
            return None
        return b[pos : pos + ln], pos + ln
    if t == 0xCA:
        if pos + 4 > len(b):
            return None
        return struct.unpack_from(">f", b, pos)[0], pos + 4
    if t == 0xCB:
        if pos + 8 > len(b):
            return None
        return struct.unpack_from(">d", b, pos)[0], pos + 8
    if 0xCC <= t <= 0xCF:
        width = 1 << (t - 0xCC)
        if pos + width > len(b):
            return None
        return int.from_bytes(b[pos : pos + width], "big"), pos + width
    if 0xD0 <= t <= 0xD3:
        width = 1 << (t - 0xD0)
        if pos + width > len(b):
            return None
        return (
            int.from_bytes(b[pos : pos + width], "big", signed=True),
            pos + width,
        )
    if t in (0xD9, 0xDA, 0xDB):
        r = _read_len(b, pos, 1 << (t - 0xD9))
        if r is None:
            return None
        ln, pos = r
        return _decode_str(b, pos, ln)
    if t in (0xDC, 0xDD):
        r = _read_len(b, pos, 2 << (t - 0xDC))
        if r is None:
            return None
        ln, pos = r
        return _decode_array(b, pos, ln, depth)
    if t in (0xDE, 0xDF):
        r = _read_len(b, pos, 2 << (t - 0xDE))
        if r is None:
            return None
        ln, pos = r
        return _decode_map(b, pos, ln, depth)
    return None  # ext family (0xc7-0xc9, 0xd4-0xd8) and 0xc1


def _read_len(b: bytes, pos: int, width: int):
    if pos + width > len(b):
        return None
    return int.from_bytes(b[pos : pos + width], "big"), pos + width


def _decode_str(b: bytes, pos: int, ln: int):
    if ln > len(b) - pos:
        return None
    try:
        return b[pos : pos + ln].decode("utf-8"), pos + ln
    except UnicodeDecodeError:
        return None


def _decode_array(b: bytes, pos: int, count: int, depth: int):
    if count > len(b) - pos:
        return None  # each element takes >=1 byte
    out = []
    for _ in range(count):
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        v, pos = r
        out.append(v)
    return out, pos


def _decode_map(b: bytes, pos: int, count: int, depth: int):
    if count > (len(b) - pos) // 2:
        return None  # each entry takes >=2 bytes
    m: dict = {}
    for _ in range(count):
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        k, pos = r
        if not isinstance(k, (int, str)) or isinstance(k, bool):
            return None
        if k in m:
            return None  # never-guess posture: duplicates reject
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        m[k], pos = r
    return m, pos


def parse_msgpack(payload: bytes):
    """REAL MessagePack decode of one top-level object: returns the
    Python value (nil decodes to the shared MSGPACK_NULL sentinel so
    None remains the error signal) or None on anything outside the
    envelope, including trailing bytes."""
    if not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    r = _decode(payload, 0, 0)
    if r is None:
        return None
    value, end = r
    if end != len(payload):
        return None
    return value


def encode_msgpack(value) -> bytes:
    """Independent MessagePack writer in the smallest representation:
    ints (full uint64/int64 range), bytes (bin family), str, list,
    dict, bool, MSGPACK_NULL, and floats (written as float64; the
    decoder accepts both widths)."""
    if isinstance(value, bool):
        return b"\xc3" if value else b"\xc2"
    if value is MSGPACK_NULL or isinstance(value, type(MSGPACK_NULL)):
        return b"\xc0"
    if isinstance(value, int):
        if 0 <= value <= 0x7F:
            return bytes([value])
        if -32 <= value < 0:
            return bytes([value & 0xFF])
        if value >= 0:
            for code, width in ((0xCC, 1), (0xCD, 2), (0xCE, 4), (0xCF, 8)):
                if value < 1 << (8 * width):
                    return bytes([code]) + value.to_bytes(width, "big")
            raise ValueError("exceeds uint64")
        for code, width in ((0xD0, 1), (0xD1, 2), (0xD2, 4), (0xD3, 8)):
            if -(1 << (8 * width - 1)) <= value:
                return bytes([code]) + value.to_bytes(width, "big",
                                                      signed=True)
        raise ValueError("below int64")
    if isinstance(value, float):
        return b"\xcb" + struct.pack(">d", value)
    if isinstance(value, (bytes, bytearray)):
        n = len(value)
        for code, width in ((0xC4, 1), (0xC5, 2), (0xC6, 4)):
            if n < 1 << (8 * width):
                return bytes([code]) + n.to_bytes(width, "big") + bytes(value)
        raise ValueError("bin too long")
    if isinstance(value, str):
        raw = value.encode("utf-8")
        n = len(raw)
        if n <= 0x1F:
            return bytes([0xA0 | n]) + raw
        for code, width in ((0xD9, 1), (0xDA, 2), (0xDB, 4)):
            if n < 1 << (8 * width):
                return bytes([code]) + n.to_bytes(width, "big") + raw
        raise ValueError("str too long")
    if isinstance(value, list):
        n = len(value)
        body = b"".join(encode_msgpack(v) for v in value)
        if n <= 0x0F:
            return bytes([0x90 | n]) + body
        for code, width in ((0xDC, 2), (0xDD, 4)):
            if n < 1 << (8 * width):
                return bytes([code]) + n.to_bytes(width, "big") + body
        raise ValueError("array too long")
    if isinstance(value, dict):
        n = len(value)
        body = b""
        for k, v in value.items():
            if not isinstance(k, (int, str)) or isinstance(k, bool):
                raise ValueError("map keys must be int or str")
            body += encode_msgpack(k) + encode_msgpack(v)
        if n <= 0x0F:
            return bytes([0x80 | n]) + body
        for code, width in ((0xDE, 2), (0xDF, 4)):
            if n < 1 << (8 * width):
                return bytes([code]) + n.to_bytes(width, "big") + body
        raise ValueError("map too long")
    raise ValueError(f"unsupported type {type(value).__name__}")


MSGPACK_SCHEMA = (
    "doc_id bigint, rec_no int, id_val bigint, name string, "
    "bin_len int, bin_sum bigint, n_tags int, tags_sum bigint, "
    "score double, ok boolean"
)


def read_msgpack_records(df):
    """MessagePack extraction operator: one payload row → one row per
    element of a top-level array of maps with the fixed keys id/name/
    bin/tags/score/ok (the Fluentd-record shape) — decoded through the
    full spec walk with UTF-8, duplicate-key, and depth enforcement.
    Malformed payloads or a shape mismatch raise. Arrow-batched
    mapInPandas."""
    from collections.abc import Iterator

    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                top = parse_msgpack(bytes(payload))
                if top is None or not isinstance(top, list):
                    raise ValueError(
                        f"doc {doc_id}: corrupt or out-of-envelope "
                        "MessagePack"
                    )
                for rno, item in enumerate(top):
                    if (not isinstance(item, dict)
                            or not isinstance(item.get("id"), int)
                            or not isinstance(item.get("name"), str)
                            or not isinstance(item.get("bin"), bytes)
                            or not isinstance(item.get("tags"), list)
                            or not isinstance(item.get("score"), float)
                            or not isinstance(item.get("ok"), bool)):
                        raise ValueError(
                            f"doc {doc_id} record {rno}: shape mismatch"
                        )
                    binv = item["bin"]
                    tags = item["tags"]
                    rows.append(
                        (doc_id, rno, item["id"], item["name"], len(binv),
                         sum(binv), len(tags), sum(tags), item["score"],
                         item["ok"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "rec_no", "id_val", "name", "bin_len",
                         "bin_sum", "n_tags", "tags_sum", "score", "ok"],
            ).astype({"rec_no": "int32", "bin_len": "int32",
                      "n_tags": "int32"})

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=MSGPACK_SCHEMA
    )
