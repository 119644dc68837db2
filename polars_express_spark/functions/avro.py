"""Avro object-container reader/writer (SURVEY.md §2.10 ingestion
tier, r16).

The most-used data-engineering container family still missing from the
archive ladder (WARC/zip/tar/TFRecord): Kafka-adjacent and Hive-era
corpora ship as ``.avro`` object-container files. The container layer
is pure struct math per the public Avro 1.x spec:

    Obj\\x01                                    4-byte magic
    file metadata                               an Avro map<bytes>
    sync marker                                 16 bytes
    repeat >=1: count (long) | size (long) | serialized objects
               (after codec) | sync marker (must equal the header's)

Longs are zigzag varints (``zigzag(n) = (n << 1) ^ (n >> 63)``, then
little-endian base-128 groups with a continuation bit, at most 10
bytes). The metadata map must carry ``avro.schema`` (JSON); the
optional ``avro.codec`` may be ``null`` (default), ``deflate`` — RAW
RFC-1951 deflate, no zlib header, no checksum — inflated through the
capped-inflate bomb guard (the zip/WARC precedent; a bomb rejects,
never allocates), or (r17) ``snappy`` — the dependency-free raw-Snappy
decoder of functions/snappy.py, each block followed per spec by the
4-byte big-endian CRC32 of the UNCOMPRESSED data, verified (so snappy
blocks, unlike deflate, detect every flip), or (r18) ``zstandard``
— one RFC 8878 frame per block via functions/zstd.py (frames carrying
the checksum flag detect every flip). Other codecs (xz,
bzip2) stay out of envelope.

Record-body decode is schema-driven; the schema JSON lives IN the
file metadata (Avro containers are self-describing — no external
registry). In envelope: the two bare primitive schemas (``"bytes"``
and ``"string"`` — each datum a long length + payload, string
payloads valid UTF-8) and, since r17, ``"type": "record"`` schemas
whose fields are all flat self-delimiting primitives
(long/int/double/float/boolean/string/bytes — zigzag varints,
IEEE-754 LE fixed widths, a strict 0/1 boolean byte, length-prefixed
payloads; the common Kafka/Hive flat-record shape) including the
two-branch nullable union ["null", prim] in both orders (the
optional-field shape; null decodes to AVRO_NULL). Wider unions,
nesting, arrays/maps/enums/fixed and logical types that change the
raw layout stay out of envelope (None); the swap-in point for a
fuller datum reader is _read_datum.

Integrity honesty (SURVEY §2.10 asymmetry): Avro itself carries NO
data checksum. The sync markers and the varint framing detect
structural damage (a flipped sync byte, a lying block size, a
truncated block), and they are exactly what makes a 100 TB ``.avro``
corpus executor-splittable (a reader seeks to the next sync to align)
— but a bit flip inside a null-codec record body silently alters that
record, like tar member data; deflate-codec flips usually break the
stream but carry no guarantee. The EXCEPTION is the snappy codec,
whose spec-mandated per-block CRC32 of the uncompressed data makes
every flip DETECTED. parse_avro therefore promises no-crash/no-bomb
and exact framing for null/deflate, plus flip detection for
snappy.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import json
import zlib

_MAGIC = b"Obj\x01"
_MAX_INFLATE = 1 << 26  # total decompressed cap across all blocks
_SYNC_DEFAULT = bytes(range(0xA0, 0xB0))  # deterministic writer marker


def _read_long(b: bytes, pos: int):
    """Read a zigzag-varint Avro long: returns (value, end_pos) or None
    on truncation / overlong form (>10 bytes or bits past 64)."""
    result = 0
    shift = 0
    for _ in range(10):
        if pos >= len(b):
            return None
        byte = b[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            if result >= 1 << 64:
                return None  # overflows a 64-bit long
            return (result >> 1) ^ -(result & 1), pos
        shift += 7
    return None  # 10 continuation bytes: overlong


def _w_long(n: int) -> bytes:
    """Minimal zigzag-varint encoding of a signed 64-bit long."""
    if not -(1 << 63) <= n < 1 << 63:
        raise ValueError("out of range for an Avro long")
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        if z < 0x80:
            out.append(z)
            return bytes(out)
        out.append((z & 0x7F) | 0x80)
        z >>= 7


def _read_sized(b: bytes, pos: int):
    """Read a length-prefixed byte datum (the bytes/string layout):
    returns (payload_slice, end_pos) or None."""
    r = _read_long(b, pos)
    if r is None:
        return None
    ln, pos = r
    if ln < 0 or ln > len(b) - pos:
        return None
    return b[pos : pos + ln], pos + ln


def _parse_meta_map(payload: bytes, pos: int):
    """Walk the file-metadata map (an Avro map<bytes>): returns
    ({key: value_bytes}, end_pos) or None. Both the positive-count and
    the negative-count-with-block-size forms parse (the latter's
    declared byte size must match exactly); duplicate keys are
    malformed (strict posture — the spec gives them no meaning)."""
    meta: dict[str, bytes] = {}
    while True:
        r = _read_long(payload, pos)
        if r is None:
            return None
        count, pos = r
        if count == 0:
            return meta, pos
        declared_size = None
        if count < 0:
            count = -count
            r = _read_long(payload, pos)
            if r is None:
                return None
            declared_size, pos = r
            if declared_size < 0 or declared_size > len(payload) - pos:
                return None
        if count > len(payload) - pos:
            return None  # each entry needs >=2 bytes; cheap bomb bound
        block_start = pos
        for _ in range(count):
            r = _read_sized(payload, pos)
            if r is None:
                return None
            key_b, pos = r
            try:
                key = key_b.decode("utf-8")
            except UnicodeDecodeError:
                return None
            r = _read_sized(payload, pos)
            if r is None:
                return None
            val, pos = r
            if key in meta:
                return None
            meta[key] = val
        if declared_size is not None and pos - block_start != declared_size:
            return None


_REC_PRIMS = ("long", "int", "double", "float", "boolean", "string",
              "bytes")

# Avro null decodes to the shared sentinel so Python None stays the
# parse-error signal (the CBOR/MessagePack convention)
from polars_express_spark.functions.cbor import CBOR_NULL as AVRO_NULL  # noqa: E402


def _union_descr(ftype):
    """A field type given as a JSON list: in envelope ONLY for the
    two-branch nullable union — exactly ["null", prim] or
    [prim, "null"] with prim a flat primitive (the ubiquitous
    optional-field shape real Avro writers emit). Returns the
    order-preserving descriptor string 'null|long' / 'long|null', or
    None. Wider unions need real reader-schema resolution — gated."""
    if (len(ftype) != 2 or "null" not in ftype
            or not all(isinstance(t, str) for t in ftype)):
        return None
    other = ftype[1] if ftype[0] == "null" else ftype[0]
    if other not in _REC_PRIMS:
        return None
    return "|".join(ftype)


def _schema_descr(schema_json: bytes):
    """Resolve the avro.schema JSON to an in-envelope descriptor:
    'bytes' / 'string' (bare primitive schemas, both the bare-string
    and the {"type": ...} spellings), or ('record', ((field_name,
    field_type), ...)) for a named record of flat self-delimiting
    primitives (long/int/double/float/boolean/string/bytes — the r16
    verdict's "what a real Kafka/Hive user hits first"; field types
    accept both the bare-string and the one-level {"type": ...}
    spellings per the spec). Unions, nesting, arrays/maps/enums/fixed,
    logical types that change the raw layout, duplicate or missing
    field names, and a nameless record are all out of envelope →
    None (the documented datum-reader gate)."""
    try:
        s = json.loads(schema_json.decode("utf-8"))
    except (UnicodeDecodeError, ValueError):
        return None
    if isinstance(s, str):
        return s if s in ("bytes", "string") else None
    if not isinstance(s, dict):
        return None
    t = s.get("type")
    if t in ("bytes", "string"):
        return t
    if t != "record":
        return None
    name = s.get("name")
    if not isinstance(name, str) or not name:
        return None  # the spec requires a record name
    flds = s.get("fields")
    if not isinstance(flds, list) or not flds:
        return None
    fields = []
    seen = set()
    for f in flds:
        if not isinstance(f, dict):
            return None
        fname = f.get("name")
        ftype = f.get("type")
        if isinstance(ftype, dict):
            ftype = ftype.get("type")  # one-level {"type": ...} spelling
        if isinstance(ftype, list):
            ftype = _union_descr(ftype)  # nullable union → 'null|prim'
            if ftype is None:
                return None
        elif ftype not in _REC_PRIMS:
            return None  # a literal 'null|x' STRING is not an Avro type
        if not isinstance(fname, str) or not fname or fname in seen:
            return None
        seen.add(fname)
        fields.append((fname, ftype))
    return "record", tuple(fields)


def _read_datum(data: bytes, pos: int, ftype: str):
    """Decode one primitive datum at ``pos`` per the Avro binary
    encoding: returns (value, end_pos) or None. All seven in-envelope
    primitives are self-delimiting — zigzag varints (long/int, the int
    range-checked to 32 bits), IEEE-754 little-endian fixed widths
    (float/double), a strict 0/1 byte (boolean), and length-prefixed
    payloads (bytes/string, string UTF-8-validated). A nullable-union
    descriptor ('null|prim' / 'prim|null') reads the zigzag branch
    index first — 0 or 1 only — then null (the AVRO_NULL sentinel) or
    the primitive by the schema's branch order."""
    import struct

    if "|" in ftype:
        branches = ftype.split("|")
        r = _read_long(data, pos)
        if r is None:
            return None
        idx, pos = r
        if idx not in (0, 1):
            return None
        if branches[idx] == "null":
            return AVRO_NULL, pos
        return _read_datum(data, pos, branches[idx])
    if ftype in ("bytes", "string"):
        r = _read_sized(data, pos)
        if r is None:
            return None
        raw, pos = r
        if ftype == "string":
            try:
                return raw.decode("utf-8"), pos
            except UnicodeDecodeError:
                return None
        return raw, pos
    if ftype in ("long", "int"):
        r = _read_long(data, pos)
        if r is None:
            return None
        v, pos = r
        if ftype == "int" and not -(1 << 31) <= v < 1 << 31:
            return None  # int is a 32-bit value by spec
        return v, pos
    if ftype == "double":
        if pos + 8 > len(data):
            return None
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if ftype == "float":
        if pos + 4 > len(data):
            return None
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    # boolean: exactly one byte, 0 or 1 (strict posture)
    if pos >= len(data) or data[pos] > 1:
        return None
    return bool(data[pos]), pos + 1


def _w_datum(value, ftype: str) -> bytes:
    """Binary-encode one primitive datum (the writer twin of
    _read_datum); raises ValueError on a value outside the type. For
    a nullable union, None and AVRO_NULL both write the null branch;
    anything else writes the primitive branch (each prefixed by its
    zigzag branch index in the schema's order)."""
    import struct

    if "|" in ftype:
        branches = ftype.split("|")
        if value is None or value is AVRO_NULL or isinstance(
            value, type(AVRO_NULL)
        ):
            return _w_long(branches.index("null"))
        prim = branches[1 - branches.index("null")]
        return _w_long(branches.index(prim)) + _w_datum(value, prim)
    if ftype == "bytes":
        value = bytes(value)
        return _w_long(len(value)) + value
    if ftype == "string":
        raw = str(value).encode("utf-8")
        return _w_long(len(raw)) + raw
    if ftype in ("long", "int"):
        v = int(value)
        if ftype == "int" and not -(1 << 31) <= v < 1 << 31:
            raise ValueError("out of range for an Avro int")
        return _w_long(v)
    if ftype == "double":
        return struct.pack("<d", float(value))
    if ftype == "float":
        return struct.pack("<f", float(value))
    if ftype == "boolean":
        return b"\x01" if value else b"\x00"
    raise ValueError(f"unsupported field type {ftype!r}")


def parse_avro(payload: bytes):
    """REAL Avro object-container parse: returns
    (codec, schema, sync_marker, [[datum, ...], ...]) — one inner list
    per data block, so the block framing itself is an observable
    output — or None. ``schema`` is 'bytes'/'string' (datums are raw
    bytes) or ('record', fields) (each datum a {field: value} dict
    decoded by _read_datum).
    The metadata map, every block's count/size framing, every sync
    marker (all must equal the header's), and every datum length are
    verified; blocks must contain exactly ``count`` datums consuming
    exactly the block's decompressed bytes; string datums must be
    valid UTF-8. Deflate blocks inflate through a shared 64 MiB cap
    (bomb guard BEFORE allocation scales with the attacker's count).
    Truncation anywhere, trailing bytes after the last sync, or a
    header-only file (the spec requires >=1 data block) → None."""
    n = len(payload)
    if n < 4 + 2 + 16 or payload[:4] != _MAGIC:
        return None
    r = _parse_meta_map(payload, 4)
    if r is None:
        return None
    meta, pos = r
    if "avro.schema" not in meta:
        return None
    schema = _schema_descr(meta["avro.schema"])
    if schema is None:
        return None
    fields = schema[1] if isinstance(schema, tuple) else None
    codec = meta.get("avro.codec", b"null").decode("latin-1")
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        return None
    if pos + 16 > n:
        return None
    sync = payload[pos : pos + 16]
    pos += 16
    blocks: list[list[bytes]] = []
    total_inflated = 0
    while pos < n:
        r = _read_long(payload, pos)
        if r is None:
            return None
        count, pos = r
        r = _read_long(payload, pos)
        if r is None:
            return None
        size, pos = r
        if count < 1 or size < 0 or size > n - pos - 16:
            return None  # empty/negative block or truncated body+sync
        raw = payload[pos : pos + size]
        pos += size
        if codec == "deflate":
            cap = _MAX_INFLATE - total_inflated
            d = zlib.decompressobj(-15)
            try:
                data = d.decompress(raw, cap + 1)
            except zlib.error:
                return None
            if (len(data) > cap or not d.eof or d.unconsumed_tail
                    or d.unused_data):
                return None
        elif codec == "snappy":
            # r17 (lifting the standing gate via the dependency-free
            # raw-Snappy decoder): per the Avro spec each snappy block
            # is FOLLOWED by the 4-byte big-endian CRC32 of the
            # UNCOMPRESSED data — so unlike deflate, snappy-codec
            # blocks get real flip DETECTION
            from polars_express_spark.functions.snappy import (
                decompress_snappy,
            )

            if size < 4:
                return None
            data = decompress_snappy(
                raw[:-4], _MAX_INFLATE - total_inflated
            )
            if data is None:
                return None
            if zlib.crc32(data) != int.from_bytes(raw[-4:], "big"):
                return None
        elif codec == "zstandard":
            # r18 (lifting the standing gate via functions/zstd.py):
            # per the Avro spec each block is one zstd frame, no extra
            # CRC — frames with the checksum flag self-verify
            from polars_express_spark.functions.zstd import decode_zstd

            data = decode_zstd(raw, _MAX_INFLATE - total_inflated)
            if data is None:
                return None
        else:
            if size > _MAX_INFLATE - total_inflated:
                return None
            data = raw
        total_inflated += len(data)
        if count > len(data):
            return None  # every datum takes >=1 byte
        q = 0
        block: list = []
        for _ in range(count):
            if fields is not None:
                rec = {}
                for fname, ftype in fields:
                    r = _read_datum(data, q, ftype)
                    if r is None:
                        return None
                    rec[fname], q = r
                block.append(rec)
                continue
            r = _read_sized(data, q)
            if r is None:
                return None
            datum, q = r
            if schema == "string":
                try:
                    datum.decode("utf-8")
                except UnicodeDecodeError:
                    return None
            block.append(datum)
        if q != len(data):
            return None  # block must consume exactly its declared bytes
        if payload[pos : pos + 16] != sync:
            return None
        pos += 16
        blocks.append(block)
    if not blocks:
        return None  # the spec requires >=1 data block
    return codec, schema, sync, blocks


def encode_avro(
    records,
    codec: str = "null",
    schema: str = "bytes",
    sync: bytes = _SYNC_DEFAULT,
    objects_per_block: int = 0,
) -> bytes:
    """Independent Avro object-container writer: ``records`` is a list
    of bytes datums (must be valid UTF-8 when ``schema='string'``) —
    or, when ``schema`` is a list/tuple of (field_name, field_type)
    pairs, a list of {field: value} dicts encoded as a flat-primitive
    record schema (the metadata JSON gets the canonical
    {"type": "record", "name": "R", "fields": [...]} spelling).
    Datums are grouped ``objects_per_block`` per data block (0 → one
    block), each block deflated when ``codec='deflate'`` (raw
    RFC-1951) and terminated by the 16-byte ``sync`` marker."""
    if codec not in ("null", "deflate", "snappy", "zstandard"):
        raise ValueError(
            "codec must be 'null', 'deflate', 'snappy', or 'zstandard'"
        )
    fields = None
    if isinstance(schema, (list, tuple)):
        fields = [(str(n), str(t)) for n, t in schema]
        if not fields or any(
            t not in _REC_PRIMS and _union_descr(t.split("|")) != t
            for _, t in fields
        ):
            raise ValueError(
                "record fields must be flat primitives or 'null|prim' "
                "nullable unions"
            )
        schema_json = json.dumps(
            {"type": "record", "name": "R",
             "fields": [
                 {"name": n,
                  "type": t.split("|") if "|" in t else t}
                 for n, t in fields
             ]}
        ).encode()
    elif schema in ("bytes", "string"):
        schema_json = json.dumps(schema).encode()
    else:
        raise ValueError(
            "schema must be 'bytes', 'string', or record field pairs"
        )
    if len(sync) != 16:
        raise ValueError("sync marker is 16 bytes")
    if not records:
        raise ValueError("the spec requires at least one data block")
    meta = [(b"avro.schema", schema_json),
            (b"avro.codec", codec.encode())]
    out = bytearray(_MAGIC)
    out += _w_long(len(meta))
    for k, v in meta:
        out += _w_long(len(k)) + k + _w_long(len(v)) + v
    out += _w_long(0)
    out += sync
    step = objects_per_block if objects_per_block > 0 else len(records)
    for at in range(0, len(records), step):
        chunk = records[at : at + step]
        data = bytearray()
        for rec in chunk:
            if fields is not None:
                if set(rec) != {n for n, _ in fields}:
                    raise ValueError("record keys must match the schema")
                for n, t in fields:
                    data += _w_datum(rec[n], t)
                continue
            rec = bytes(rec)
            if schema == "string":
                rec.decode("utf-8")  # raises on a non-UTF-8 string datum
            data += _w_long(len(rec)) + rec
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = co.compress(bytes(data)) + co.flush()
        elif codec == "snappy":
            from polars_express_spark.functions.snappy import (
                encode_snappy,
            )

            raw = encode_snappy(bytes(data)) + zlib.crc32(
                bytes(data)
            ).to_bytes(4, "big")
        elif codec == "zstandard":
            from polars_express_spark.functions.zstd import encode_zstd

            raw = encode_zstd(bytes(data), content_size=False)
        else:
            raw = bytes(data)
        out += _w_long(len(chunk)) + _w_long(len(raw)) + raw + sync
    return bytes(out)


AVRO_SCHEMA = (
    "doc_id bigint, rec_no int, block_no int, codec string, "
    "schema_type string, size bigint, mean_b double, min_b int, max_b int"
)


def read_avro_records(df):
    """Avro extraction operator (the WARC/zip/tar/TFRecord operator
    shape): one container row → one row per record with the container's
    codec and schema (pinning the metadata-map decode under the hash),
    the record's block number (pinning the block framing), and exact
    byte stats over the datum. Malformed containers raise — a silent
    skip is a silent corpus hole. Arrow-batched mapInPandas; container
    bytes never leave the executor."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_avro(bytes(payload))
                if parsed is None:
                    raise ValueError(
                        f"doc {doc_id}: corrupt or out-of-envelope Avro "
                        "object container"
                    )
                codec, schema, _sync, blocks = parsed
                if isinstance(schema, tuple):
                    raise ValueError(
                        f"doc {doc_id}: record-schema container — use "
                        "read_avro_fields for typed field extraction"
                    )
                rno = 0
                for bno, block in enumerate(blocks):
                    for datum in block:
                        arr = np.frombuffer(datum, dtype=np.uint8)
                        rows.append(
                            (doc_id, rno, bno, codec, schema, len(datum),
                             float(arr.mean()) if arr.size else 0.0,
                             int(arr.min()) if arr.size else 0,
                             int(arr.max()) if arr.size else 0)
                        )
                        rno += 1
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "rec_no", "block_no", "codec",
                         "schema_type", "size", "mean_b", "min_b", "max_b"],
            ).astype({"rec_no": "int32", "block_no": "int32",
                      "min_b": "int32", "max_b": "int32"})

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=AVRO_SCHEMA
    )


AVRO_FIELDS_SCHEMA = (
    "doc_id bigint, rec_no int, block_no int, codec string, "
    "fname string, ftype string, is_null boolean, v_int bigint, "
    "v_dbl double, v_str string, v_len int, v_sum bigint"
)


def read_avro_fields(df):
    """Typed Avro record extraction (r17 — the record-schema datum
    reader the r16 verdict ranked the highest-leverage gap): one
    container row → one row per (record, field) in schema field order,
    with the value in the column its type owns — v_int for long/int/
    boolean (booleans as 0/1), v_dbl for double/float (a float32
    round-trips exactly into binary64), v_str for string (plus v_len),
    v_len + v_sum byte stats for bytes; nullable-union fields
    ('null|prim') ship the branch in is_null, with all value columns
    NULL on the null branch. The container must carry a
    record schema (that is what makes the file self-describing — the
    reader takes NO external schema); primitive-schema containers
    belong to read_avro_records. Malformed containers raise — a silent
    skip is a silent corpus hole. Arrow-batched mapInPandas; container
    bytes never leave the executor; the long format keeps the output
    schema fixed across arbitrary record schemas (no per-corpus
    DataFrame schema inference)."""
    from collections.abc import Iterator

    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_avro(bytes(payload))
                if parsed is None:
                    raise ValueError(
                        f"doc {doc_id}: corrupt or out-of-envelope Avro "
                        "object container"
                    )
                codec, schema, _sync, blocks = parsed
                if not isinstance(schema, tuple):
                    raise ValueError(
                        f"doc {doc_id}: primitive-schema container — "
                        "use read_avro_records"
                    )
                fields = schema[1]
                rno = 0
                for bno, block in enumerate(blocks):
                    for rec in block:
                        for fname, ftype in fields:
                            v = rec[fname]
                            v_int = v_dbl = v_str = v_len = v_sum = None
                            is_null = v is AVRO_NULL or isinstance(
                                v, type(AVRO_NULL)
                            )
                            base = (ftype.split("|")[0]
                                    if ftype.split("|")[0] != "null"
                                    else ftype.split("|")[-1]
                                    ) if "|" in ftype else ftype
                            if is_null:
                                pass  # nullable union's null branch
                            elif base in ("long", "int", "boolean"):
                                v_int = int(v)
                            elif base in ("double", "float"):
                                v_dbl = float(v)
                            elif base == "string":
                                v_str = v
                                v_len = len(v)
                            else:  # bytes
                                v_len = len(v)
                                v_sum = sum(v)
                            rows.append(
                                (doc_id, rno, bno, codec, fname, ftype,
                                 is_null, v_int, v_dbl, v_str, v_len,
                                 v_sum)
                            )
                        rno += 1
            pdf_out = pd.DataFrame(
                rows,
                columns=["doc_id", "rec_no", "block_no", "codec",
                         "fname", "ftype", "is_null", "v_int", "v_dbl",
                         "v_str", "v_len", "v_sum"],
            )
            pdf_out["rec_no"] = pdf_out["rec_no"].astype("int32")
            pdf_out["block_no"] = pdf_out["block_no"].astype("int32")
            yield pdf_out

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=AVRO_FIELDS_SCHEMA
    )
