"""CBOR decoder/encoder (RFC 8949) — SURVEY.md §2.10 ingestion tier,
r16.

The self-describing binary serialization a metadata-blob pipeline
meets constantly (COSE/WebAuthn envelopes, IoT telemetry, IPLD
blocks). Pure struct math over the public RFC 8949 layout: every data
item is an initial byte (3-bit major type + 5-bit additional info)
followed by the argument (direct 0-23, or 1/2/4/8 bytes for info
24-27) and, for strings/containers, the payload/children.

Envelope (strict, None on anything outside it):
- major 0/1 unsigned/negative integers at any argument width (the RFC
  tells decoders to accept non-minimal encodings; encode_cbor itself
  always writes the preferred minimal form);
- major 2/3 definite-length byte/text strings (text must be valid
  UTF-8 per §2);
- major 4/5 definite-length arrays and maps — map keys must be
  integers or text and duplicate keys reject (§5.6 calls such maps
  invalid);
- major 7 false/true/null and float16/32/64 (the half-precision path
  is struct's '<e'/'>e' format).
Out of envelope: indefinite lengths (info 31), tags (major 6), the
undefined simple value and unassigned simple values, truncation, and
trailing bytes after the top-level item. Nesting depth is capped at
64 (bomb guard — a deep [[[[...]]]] otherwise recurses unboundedly);
string/container sizes are bounds-checked against the remaining
payload before any allocation.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 64


def _decode(b: bytes, pos: int, depth: int):
    """One data item: returns (value, end_pos) or None. Maps decode to
    dicts with int/str keys; floats of all three widths decode to
    Python floats; bytes stay bytes; CBOR null decodes to CBOR_NULL."""
    if depth > _MAX_DEPTH:
        return None
    if pos >= len(b):
        return None
    major = b[pos] >> 5
    info = b[pos] & 0x1F
    pos += 1
    if major == 6:
        return None  # tags: out of envelope
    if major == 7:
        if info == 20:
            return False, pos
        if info == 21:
            return True, pos
        if info == 22:
            return CBOR_NULL, pos
        if info in (25, 26, 27):
            fmt = {25: ">e", 26: ">f", 27: ">d"}[info]
            width = {25: 2, 26: 4, 27: 8}[info]
            if pos + width > len(b):
                return None
            return struct.unpack_from(fmt, b, pos)[0], pos + width
        return None  # undefined (23), unassigned simples, reserved
    if info < 24:
        arg = info
    elif info <= 27:
        width = 1 << (info - 24)
        if pos + width > len(b):
            return None
        arg = int.from_bytes(b[pos : pos + width], "big")
        pos += width
    else:
        return None  # reserved 28-30 / indefinite 31
    if major == 0:
        return arg, pos
    if major == 1:
        return -1 - arg, pos
    if major in (2, 3):
        if arg > len(b) - pos:
            return None
        raw = b[pos : pos + arg]
        if major == 3:
            try:
                return raw.decode("utf-8"), pos + arg
            except UnicodeDecodeError:
                return None
        return raw, pos + arg
    if major == 4:
        if arg > len(b) - pos:
            return None  # each element takes >=1 byte
        out = []
        for _ in range(arg):
            r = _decode(b, pos, depth + 1)
            if r is None:
                return None
            v, pos = r
            out.append(v)
        return out, pos
    # major 5: map
    if arg > (len(b) - pos) // 2:
        return None  # each entry takes >=2 bytes
    m: dict = {}
    for _ in range(arg):
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        k, pos = r
        if not isinstance(k, (int, str)) or isinstance(k, bool):
            return None
        if k in m:
            return None  # §5.6: duplicate keys make the map invalid
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        m[k], pos = r
    return m, pos


class _Null:
    """Sentinel for CBOR null so that None stays the parse-error
    signal (the module-wide convention)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "CBOR_NULL"

    def __eq__(self, other) -> bool:
        return isinstance(other, _Null)

    def __hash__(self) -> int:
        return hash("CBOR_NULL")


CBOR_NULL = _Null()


def parse_cbor(payload: bytes):
    """REAL CBOR decode of one top-level data item: returns the Python
    value (CBOR null decodes to the CBOR_NULL sentinel so that None
    remains the error signal) or None on anything outside the
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


def encode_cbor(value) -> bytes:
    """Independent CBOR writer in the RFC's preferred (minimal-length)
    serialization: ints, bytes, str, list, dict, bool, CBOR_NULL, and
    floats (written as 64-bit; the decoder accepts all three
    widths)."""

    def head(major: int, n: int) -> bytes:
        if n < 24:
            return bytes([(major << 5) | n])
        for info, width in ((24, 1), (25, 2), (26, 4), (27, 8)):
            if n < 1 << (8 * width):
                return bytes([(major << 5) | info]) + n.to_bytes(width, "big")
        raise ValueError("argument exceeds 64 bits")

    if isinstance(value, bool):
        return bytes([0xF5 if value else 0xF4])
    if isinstance(value, _Null):
        return bytes([0xF6])
    if isinstance(value, int):
        return head(0, value) if value >= 0 else head(1, -1 - value)
    if isinstance(value, float):
        return bytes([0xFB]) + struct.pack(">d", value)
    if isinstance(value, (bytes, bytearray)):
        return head(2, len(value)) + bytes(value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return head(3, len(raw)) + raw
    if isinstance(value, list):
        return head(4, len(value)) + b"".join(encode_cbor(v) for v in value)
    if isinstance(value, dict):
        out = head(5, len(value))
        for k, v in value.items():
            if not isinstance(k, (int, str)) or isinstance(k, bool):
                raise ValueError("map keys must be int or text")
            out += encode_cbor(k) + encode_cbor(v)
        return out
    raise ValueError(f"unsupported type {type(value).__name__}")


CBOR_SCHEMA = (
    "doc_id bigint, rec_no int, id_val bigint, txt_len int, "
    "txt_sum bigint, score double, flag boolean"
)


def read_cbor_records(df):
    """CBOR extraction operator: one payload row → one row per element
    of a top-level CBOR array of maps with the fixed keys id/txt/
    score/flag (the metadata-blob shape) — the id integer, the byte
    string's length and byte-value sum, the float score, and the
    boolean, all decoded through the full RFC 8949 walk. Malformed
    payloads or a shape mismatch raise. Arrow-batched mapInPandas."""
    from collections.abc import Iterator

    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                top = parse_cbor(bytes(payload))
                if top is None or not isinstance(top, list):
                    raise ValueError(
                        f"doc {doc_id}: corrupt or out-of-envelope CBOR"
                    )
                for rno, item in enumerate(top):
                    if (not isinstance(item, dict)
                            or not isinstance(item.get("id"), int)
                            or not isinstance(item.get("txt"), bytes)
                            or not isinstance(item.get("score"), float)
                            or not isinstance(item.get("flag"), bool)):
                        raise ValueError(
                            f"doc {doc_id} record {rno}: shape mismatch"
                        )
                    txt = item["txt"]
                    rows.append(
                        (doc_id, rno, item["id"], len(txt), sum(txt),
                         item["score"], item["flag"])
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "rec_no", "id_val", "txt_len",
                         "txt_sum", "score", "flag"],
            ).astype({"rec_no": "int32", "txt_len": "int32"})

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=CBOR_SCHEMA
    )
