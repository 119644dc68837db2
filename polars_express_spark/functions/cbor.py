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
  is struct's '<e'/'>e' format);
- (r17) INDEFINITE lengths per §3.2: chunked byte/text strings (each
  chunk a definite-length string of the SAME major type, text chunks
  individually valid UTF-8 per §3.2.3 — a character may not straddle
  chunks), and indefinite arrays/maps running to the 0xff "break"
  (which must not split a map entry, and is malformed anywhere else);
- (r17) the two standard datetime TAGS of §3.4.1-2: tag 0 (an RFC
  3339 text item, validated — decodes to CborDateTime keeping the
  original string losslessly) and tag 1 (an integer or float epoch
  offset — decodes to CborEpochTime);
- (r18) DECIMAL FRACTION tag 4 and BIGFLOAT tag 5 (§3.4.4): an
  [exponent, mantissa] pair decoding to CborDecimal / CborBigfloat
  with both ints kept losslessly (mant * 10**exp / mant * 2**exp);
  the exponent must sit in the 65-bit head range per the spec's
  no-bignum-exponent rule, the mantissa may be a bignum;
- (r17) BIGNUM tags 2/3 (§3.4.3): a byte-string magnitude decoding to
  a plain Python int (tag 3 = -1 - n), so integers of any size
  round-trip — encode_cbor emits the preferred leading-zero-stripped
  form for ints past the 65-bit head range.
Out of envelope: every other tag (application semantics need a
registry), the undefined simple value and unassigned simple values,
truncation, and trailing bytes after the top-level item. Nesting
depth is capped at 64 (bomb guard — a deep [[[[...]]]] otherwise
recurses unboundedly); string/container sizes are bounds-checked
against the remaining payload before any allocation.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

_MAX_DEPTH = 64


class CborDateTime(NamedTuple):
    """Tag 0 (§3.4.1): a standard RFC 3339 date/time string, kept
    verbatim (lossless) after validation."""

    text: str


class CborDecimal(NamedTuple):
    """Tag 4 (§3.4.4): a decimal fraction — value = mant * 10**exp,
    both kept losslessly as ints."""

    exp: int
    mant: int


class CborBigfloat(NamedTuple):
    """Tag 5 (§3.4.4): a bigfloat — value = mant * 2**exp, both kept
    losslessly as ints."""

    exp: int
    mant: int


class CborEpochTime(NamedTuple):
    """Tag 1 (§3.4.2): epoch-based date/time — an int or float offset
    in seconds from 1970-01-01T00:00Z."""

    value: object  # int | float


def _valid_rfc3339(text: str) -> bool:
    """Tag-0 content validation: RFC 3339 date-time — full date, 'T',
    full time, and a mandatory offset ('Z' or ±HH:MM). Python's
    fromisoformat (3.11+) accepts this grammar; the tzinfo check
    enforces the offset RFC 3339 requires."""
    from datetime import datetime

    if len(text) < 20 or text[10] != "T":
        return False
    try:
        return datetime.fromisoformat(text).tzinfo is not None
    except ValueError:
        return False


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
    elif info == 31 and major in (2, 3, 4, 5):
        return _decode_indefinite(b, pos, major, depth)
    else:
        return None  # reserved 28-30; indefinite on majors 0/1/6
    if major == 6:
        return _decode_tagged(b, pos, arg, depth)
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


def _decode_indefinite(b: bytes, pos: int, major: int, depth: int):
    """An indefinite-length item (§3.2): string chunks or container
    children up to the 0xff break. Chunked strings require every chunk
    to be a DEFINITE-length string of the same major type (§3.2.3 —
    nesting indefinite chunks is malformed), text chunks individually
    valid UTF-8 (a character may not straddle chunks); the break may
    not split a map entry."""
    if major in (2, 3):
        parts = []
        while True:
            if pos >= len(b):
                return None
            if b[pos] == 0xFF:
                pos += 1
                break
            cm, ci = b[pos] >> 5, b[pos] & 0x1F
            pos += 1
            if cm != major or ci > 27:
                return None  # wrong chunk type or nested indefinite
            if ci < 24:
                ln = ci
            else:
                width = 1 << (ci - 24)
                if pos + width > len(b):
                    return None
                ln = int.from_bytes(b[pos : pos + width], "big")
                pos += width
            if ln > len(b) - pos:
                return None
            chunk = b[pos : pos + ln]
            pos += ln
            if major == 3:
                try:
                    parts.append(chunk.decode("utf-8"))
                except UnicodeDecodeError:
                    return None
            else:
                parts.append(chunk)
        if major == 3:
            return "".join(parts), pos
        return b"".join(parts), pos
    if major == 4:
        out = []
        while True:
            if pos >= len(b):
                return None
            if b[pos] == 0xFF:
                return out, pos + 1
            r = _decode(b, pos, depth + 1)
            if r is None:
                return None
            v, pos = r
            out.append(v)
    # major 5: indefinite map
    m: dict = {}
    while True:
        if pos >= len(b):
            return None
        if b[pos] == 0xFF:
            return m, pos + 1
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        k, pos = r
        if not isinstance(k, (int, str)) or isinstance(k, bool):
            return None
        if k in m:
            return None  # §5.6: duplicate keys make the map invalid
        if pos < len(b) and b[pos] == 0xFF:
            return None  # a break may not split a map entry
        r = _decode(b, pos, depth + 1)
        if r is None:
            return None
        m[k], pos = r


def _decode_tagged(b: bytes, pos: int, tag: int, depth: int):
    """Tags 0/1 — the standard date/time forms (§3.4.1-2) — and tags
    2/3 — bignums (§3.4.3: a byte string as an unsigned big-endian
    integer n, tag 3 meaning -1 - n; Python ints carry arbitrary
    precision, so bignums decode to plain ints exactly like the
    in-head range). Every other tag number stays out of envelope
    (application semantics need a registry, the ext-family
    precedent)."""
    if tag not in (0, 1, 2, 3, 4, 5):
        return None
    r = _decode(b, pos, depth + 1)
    if r is None:
        return None
    v, pos = r
    if tag == 0:
        if not isinstance(v, str) or not _valid_rfc3339(v):
            return None
        return CborDateTime(v), pos
    if tag == 1:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        return CborEpochTime(v), pos
    if tag in (2, 3):
        # bignums: content must be a byte string (definite or chunked)
        if not isinstance(v, bytes):
            return None
        n = int.from_bytes(v, "big")
        return (n if tag == 2 else -1 - n), pos
    # tags 4/5 (§3.4.4): an array of exactly [exponent, mantissa] —
    # the exponent an integer in the 65-bit head range (the spec
    # forbids bignum exponents; the value-range check enforces that
    # bound), the mantissa any integer incl. bignums
    if (not isinstance(v, list) or len(v) != 2
            or any(isinstance(x, bool) or not isinstance(x, int)
                   for x in v)
            or not -(1 << 64) <= v[0] < 1 << 64):
        return None
    cls = CborDecimal if tag == 4 else CborBigfloat
    return cls(v[0], v[1]), pos


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

    def bignum(n: int) -> bytes:
        # §3.4.3: preferred serialization strips leading zero bytes
        tag, mag = (2, n) if n >= 0 else (3, -1 - n)
        raw = mag.to_bytes((mag.bit_length() + 7) // 8 or 1, "big")
        return head(6, tag) + head(2, len(raw)) + raw

    if isinstance(value, bool):
        return bytes([0xF5 if value else 0xF4])
    if isinstance(value, _Null):
        return bytes([0xF6])
    if isinstance(value, CborDateTime):
        if not _valid_rfc3339(value.text):
            raise ValueError("tag 0 content must be RFC 3339 date-time")
        return head(6, 0) + encode_cbor(value.text)
    if isinstance(value, CborEpochTime):
        if isinstance(value.value, bool) or not isinstance(
            value.value, (int, float)
        ):
            raise ValueError("tag 1 content must be int or float")
        return head(6, 1) + encode_cbor(value.value)
    if isinstance(value, (CborDecimal, CborBigfloat)):
        if not -(1 << 64) <= value.exp < 1 << 64:
            raise ValueError("tag 4/5 exponents may not be bignums")
        tag_no = 4 if isinstance(value, CborDecimal) else 5
        return head(6, tag_no) + encode_cbor([value.exp, value.mant])
    if isinstance(value, int):
        if value >= 1 << 64 or value < -(1 << 64):
            return bignum(value)  # past the 65-bit head range: tags 2/3
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


def encode_cbor_indefinite(value, chunk: int = 7) -> bytes:
    """The indefinite-form writer twin (§3.2): byte/text strings split
    into <=``chunk``-size definite chunks (text splits at CHARACTER
    boundaries so every chunk stays valid UTF-8, as §3.2.3 requires),
    arrays and maps written indefinite to the 0xff break, recursively.
    Primitives, tags, and empty strings keep the preferred definite
    form (an indefinite string with zero chunks is legal but the
    writer has no reason to emit it)."""
    if isinstance(value, (bytes, bytearray)) and len(value) > 0:
        out = bytearray([0x5F])
        for at in range(0, len(value), chunk):
            out += encode_cbor(bytes(value[at : at + chunk]))
        return bytes(out + b"\xff")
    if isinstance(value, str) and value:
        out = bytearray([0x7F])
        for at in range(0, len(value), chunk):
            out += encode_cbor(value[at : at + chunk])
        return bytes(out + b"\xff")
    if isinstance(value, list):
        return b"\x9f" + b"".join(
            encode_cbor_indefinite(v, chunk) for v in value
        ) + b"\xff"
    if isinstance(value, dict):
        out = bytearray([0xBF])
        for k, v in value.items():
            out += encode_cbor(k)  # int/str keys: definite by nature
            out += encode_cbor_indefinite(v, chunk)
        return bytes(out + b"\xff")
    if isinstance(value, CborDateTime):
        return b"\xc0" + encode_cbor_indefinite(value.text, chunk)
    return encode_cbor(value)


CBOR_SCHEMA = (
    "doc_id bigint, rec_no int, id_val bigint, txt_len int, "
    "txt_sum bigint, score double, flag boolean, created string, "
    "ts_epoch bigint"
)


def cbor_record_batches(batches):
    """Batch-iterator core of read_cbor_records (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import pandas as pd

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
                        or not isinstance(item.get("flag"), bool)
                        or not isinstance(item.get("created"),
                                          CborDateTime)
                        or not isinstance(item.get("ts"),
                                          CborEpochTime)
                        or not isinstance(item["ts"].value, int)):
                    raise ValueError(
                        f"doc {doc_id} record {rno}: shape mismatch"
                    )
                txt = item["txt"]
                rows.append(
                    (doc_id, rno, item["id"], len(txt), sum(txt),
                     item["score"], item["flag"],
                     item["created"].text, item["ts"].value)
                )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "rec_no", "id_val", "txt_len",
                     "txt_sum", "score", "flag", "created",
                     "ts_epoch"],
        ).astype({"rec_no": "int32", "txt_len": "int32"})


def read_cbor_records(df):
    """CBOR extraction operator: one payload row → one row per element
    of a top-level CBOR array of maps with the fixed keys id/txt/
    score/flag/created/ts (the metadata-blob shape) — the id integer,
    the byte string's length and byte-value sum, the float score, the
    boolean, the tag-0 RFC 3339 string, and the tag-1 integer epoch,
    all decoded through the full RFC 8949 walk (definite or indefinite
    forms alike — the decoder normalizes). Malformed payloads or a
    shape mismatch raise. Arrow-batched mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        cbor_record_batches, schema=CBOR_SCHEMA
    )
