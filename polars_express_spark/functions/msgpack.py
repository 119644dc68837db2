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
never-guess posture rejects), plus (r17) the ONE ext type the spec
itself defines — timestamp, ext type -1, in all three layouts:
timestamp32 (fixext4: u32be seconds), timestamp64 (fixext8: 30-bit
nanoseconds over 34-bit seconds), timestamp96 (ext8 len 12: u32be
nanoseconds + i64be seconds), nanoseconds validated <= 999999999 per
spec; it decodes to the MsgpackTimestamp named tuple. Fluentd event
streams (this module's motivating corpus) carry event time as ext -1.
Out of envelope: every APPLICATION ext type (0xc7-0xc9, 0xd4-0xd8
with type != -1 need a registry, the tf.Example precedent), the
never-used byte 0xc1, truncation, and trailing bytes. Nesting is
depth-capped at 64 (recursion bomb guard); every length is
bounds-checked against the remaining payload before allocation.
encode_msgpack writes the smallest representation (the spec's
recommendation, including the smallest of the three timestamp
layouts); the decoder accepts non-minimal widths as the spec
requires.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from polars_express_spark.functions.cbor import CBOR_NULL

_MAX_DEPTH = 64

# NULL sentinel shared with the CBOR tier: None stays the error signal
MSGPACK_NULL = CBOR_NULL


class MsgpackTimestamp(NamedTuple):
    """The spec-defined timestamp extension (ext type -1): seconds
    since the epoch (signed) + nanoseconds in [0, 999999999]."""

    sec: int
    nsec: int


def _decode_timestamp(data: bytes):
    """Decode an ext -1 payload by its spec-fixed layout (4/8/12
    bytes); returns MsgpackTimestamp or None on any other length or
    out-of-range nanoseconds."""
    if len(data) == 4:
        return MsgpackTimestamp(struct.unpack(">I", data)[0], 0)
    if len(data) == 8:
        (d64,) = struct.unpack(">Q", data)
        nsec = d64 >> 34
        if nsec > 999_999_999:
            return None
        return MsgpackTimestamp(d64 & ((1 << 34) - 1), nsec)
    if len(data) == 12:
        nsec, sec = struct.unpack(">Iq", data)
        if nsec > 999_999_999:
            return None
        return MsgpackTimestamp(sec, nsec)
    return None


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
    # the ext family: ONLY the spec-defined timestamp (type -1) is in
    # envelope — fixext4 (0xd6) / fixext8 (0xd7) / ext8 len 12 (0xc7);
    # application types stay rejected (they need a registry)
    if t in (0xD6, 0xD7):
        width = 4 if t == 0xD6 else 8
        if pos + 1 + width > len(b) or b[pos] != 0xFF:
            return None
        ts = _decode_timestamp(b[pos + 1 : pos + 1 + width])
        if ts is None:
            return None
        return ts, pos + 1 + width
    if t == 0xC7:
        r = _read_len(b, pos, 1)
        if r is None:
            return None
        ln, pos = r
        if ln != 12 or pos + 1 + 12 > len(b) or b[pos] != 0xFF:
            return None
        ts = _decode_timestamp(b[pos + 1 : pos + 13])
        if ts is None:
            return None
        return ts, pos + 13
    return None  # application exts (0xc8-0xc9, 0xd4-0xd5, 0xd8), 0xc1


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
    dict, bool, MSGPACK_NULL, floats (written as float64; the decoder
    accepts both widths), and MsgpackTimestamp (ext -1, the smallest
    of the three spec layouts that fits)."""
    if isinstance(value, bool):
        return b"\xc3" if value else b"\xc2"
    if value is MSGPACK_NULL or isinstance(value, type(MSGPACK_NULL)):
        return b"\xc0"
    if isinstance(value, MsgpackTimestamp):
        sec, nsec = int(value.sec), int(value.nsec)
        if not 0 <= nsec <= 999_999_999:
            raise ValueError("nanoseconds out of range")
        if not -(1 << 63) <= sec < 1 << 63:
            raise ValueError("seconds out of int64 range")
        if nsec == 0 and 0 <= sec < 1 << 32:
            return b"\xd6\xff" + struct.pack(">I", sec)
        if 0 <= sec < 1 << 34:
            return b"\xd7\xff" + struct.pack(">Q", (nsec << 34) | sec)
        return b"\xc7\x0c\xff" + struct.pack(">Iq", nsec, sec)
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
    "score double, ok boolean, ts_sec bigint, ts_nsec int"
)


def msgpack_record_batches(batches):
    """Batch-iterator core of read_msgpack_records (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import pandas as pd

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
                        or not isinstance(item.get("ok"), bool)
                        or not isinstance(item.get("ts"),
                                          MsgpackTimestamp)):
                    raise ValueError(
                        f"doc {doc_id} record {rno}: shape mismatch"
                    )
                binv = item["bin"]
                tags = item["tags"]
                ts = item["ts"]
                rows.append(
                    (doc_id, rno, item["id"], item["name"], len(binv),
                     sum(binv), len(tags), sum(tags), item["score"],
                     item["ok"], ts.sec, ts.nsec)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "rec_no", "id_val", "name", "bin_len",
                     "bin_sum", "n_tags", "tags_sum", "score", "ok",
                     "ts_sec", "ts_nsec"],
        ).astype({"rec_no": "int32", "bin_len": "int32",
                  "n_tags": "int32", "ts_nsec": "int32"})


def read_msgpack_records(df):
    """MessagePack extraction operator: one payload row → one row per
    element of a top-level array of maps with the fixed keys id/name/
    bin/tags/score/ok/ts (the Fluentd-record shape; ts is the ext -1
    event timestamp Fluentd attaches, shipped as exact sec + nsec
    columns) — decoded through the full spec walk with UTF-8,
    duplicate-key, and depth enforcement. Malformed payloads or a
    shape mismatch raise. Arrow-batched mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        msgpack_record_batches, schema=MSGPACK_SCHEMA
    )
