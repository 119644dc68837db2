"""Protobuf wire-format walk + tf.Example decode (SURVEY.md §2.10
ingestion tier, r16).

Lifts the TFRecord tier's payload gate: functions/tfrecord.py ruled the
conventional tf.Example payload out of envelope because decoding an
ARBITRARY protobuf needs a schema registry — but tf.Example itself is a
FIXED message whose layout is published in TensorFlow's example.proto /
feature.proto, and the protobuf wire format is public struct math:

    field key = uvarint((field_number << 3) | wire_type)
    wire 0 = uvarint payload        wire 1 = 8 raw bytes
    wire 2 = uvarint length + bytes wire 5 = 4 raw bytes
    wire 3/4 (deprecated groups) — out of envelope

and the tf.Example layout over it:

    Example  { Features features = 1; }
    Features { map<string, Feature> feature = 1; }   // repeated
                                                     // entry{key=1,value=2}
    Feature  { oneof { BytesList bytes_list = 1;     // value=1 repeated bytes
                       FloatList float_list = 2;     // value=1 packed f32
                       Int64List int64_list = 3; } } // value=1 packed varint

Strictness envelope follows the proto3 spec exactly where the spec
speaks: unknown field numbers are SKIPPED by wire type (mandated
forward-compat), repeated scalar lists accept BOTH the packed (wire 2)
and unpacked (one element per tag) encodings, a re-occurring oneof or
map key takes the LAST value (spec merge semantics); where the spec
calls something invalid we return None — truncated varints/payloads,
overlong (>10 byte) varints, wire types 3/4/6/7, a non-UTF-8 map key,
trailing bytes inside a nested message. No allocation exceeds the
input (values are slices; lists are bounded by payload length).

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52); the swap-in ruling this lifts is
documented at functions/tfrecord.py:21.
"""

from __future__ import annotations

import struct


def _read_uvarint(b: bytes, pos: int):
    """Base-128 little-endian unsigned varint: (value, end_pos) or None
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
                return None
            return result, pos
        shift += 7
    return None


def _w_uvarint(n: int) -> bytes:
    if not 0 <= n < 1 << 64:
        raise ValueError("uvarint out of range")
    out = bytearray()
    while True:
        if n < 0x80:
            out.append(n)
            return bytes(out)
        out.append((n & 0x7F) | 0x80)
        n >>= 7


def parse_protowire(payload: bytes):
    """Schema-free protobuf field walk: returns
    [(field_no, wire_type, value), ...] or None, where value is an int
    for wire 0 and a bytes slice for wires 1/2/5 (8/len/4 bytes).
    Field numbers must be valid (>=1, <2^29); groups (3/4) and
    undefined wire types (6/7) are out of envelope."""
    out = []
    pos = 0
    n = len(payload)
    while pos < n:
        r = _read_uvarint(payload, pos)
        if r is None:
            return None
        key, pos = r
        field_no = key >> 3
        wt = key & 0x7
        if field_no < 1 or field_no >= 1 << 29:
            return None
        if wt == 0:
            r = _read_uvarint(payload, pos)
            if r is None:
                return None
            val, pos = r
        elif wt == 1:
            if pos + 8 > n:
                return None
            val = payload[pos : pos + 8]
            pos += 8
        elif wt == 2:
            r = _read_uvarint(payload, pos)
            if r is None:
                return None
            ln, pos = r
            if ln > n - pos:
                return None
            val = payload[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                return None
            val = payload[pos : pos + 4]
            pos += 4
        else:
            return None  # groups (3/4) and reserved (6/7): out of envelope
        out.append((field_no, wt, val))
    return out


def _parse_scalar_list(body: bytes, kind: str):
    """Decode a BytesList/FloatList/Int64List message body: value
    field = 1; floats/int64s accept packed (wire 2) AND unpacked
    (wire 5 / wire 0) per proto3; bytes entries are wire 2. Unknown
    fields skip. Returns the Python list or None."""
    fields = parse_protowire(body)
    if fields is None:
        return None
    vals = []
    for fno, wt, v in fields:
        if fno != 1:
            continue  # unknown field: spec-mandated skip
        if kind == "bytes":
            if wt != 2:
                return None
            vals.append(v)
        elif kind == "float":
            if wt == 5:
                vals.append(struct.unpack("<f", v)[0])
            elif wt == 2:
                if len(v) % 4:
                    return None
                vals.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                return None
        else:  # int64
            if wt == 0:
                vals.append(v - (1 << 64) if v >> 63 else v)
            elif wt == 2:
                q = 0
                while q < len(v):
                    r = _read_uvarint(v, q)
                    if r is None:
                        return None
                    u, q = r
                    vals.append(u - (1 << 64) if u >> 63 else u)
            else:
                return None
    return vals


_KINDS = {1: "bytes", 2: "float", 3: "int64"}


def _parse_feature(body: bytes):
    """One Feature message: returns (kind, values) or None. The oneof
    takes the last kind set (spec merge semantics); a Feature with no
    kind set is malformed here."""
    fields = parse_protowire(body)
    if fields is None:
        return None
    kind, vals = "", []
    for ffno, ffwt, ffv in fields:
        if ffno not in _KINDS:
            continue
        if ffwt != 2:
            return None
        got = _parse_scalar_list(ffv, _KINDS[ffno])
        if got is None:
            return None
        kind, vals = _KINDS[ffno], got  # oneof: last wins
    if not kind:
        return None
    return kind, vals


def _parse_map_entry(body: bytes):
    """One map<string, message> entry: returns (name, value_body_or_
    None) or None. A re-parsed key must be UTF-8; an absent key is the
    proto3 default ''."""
    kv = parse_protowire(body)
    if kv is None:
        return None
    name = ""
    val_body = None
    for kno, kwt, kv_ in kv:
        if kno == 1:
            if kwt != 2:
                return None
            try:
                name = kv_.decode("utf-8")
            except UnicodeDecodeError:
                return None
        elif kno == 2:
            if kwt != 2:
                return None
            val_body = kv_
    return name, val_body


def _parse_features(body: bytes, feats: dict):
    """A Features message (map<string, Feature>), merged into
    ``feats`` with last-wins map-key semantics. Returns feats or
    None."""
    entries = parse_protowire(body)
    if entries is None:
        return None
    for eno, ewt, ev in entries:
        if eno != 1:
            continue
        if ewt != 2:
            return None  # Features.feature map entries are messages
        r = _parse_map_entry(ev)
        if r is None:
            return None
        name, feat_body = r
        if feat_body is None:
            return None  # a Feature with no kind set: malformed here
        f = _parse_feature(feat_body)
        if f is None:
            return None
        feats[name] = f
    return feats


def parse_tf_example(payload: bytes):
    """REAL tf.Example decode from the wire format (no schema registry
    needed — the message layout is fixed and public): returns
    {name: (kind, [values...])} with kind in bytes/float/int64, or
    None. proto3 merge semantics: a repeated Features field merges, a
    re-occurring map key or oneof takes the last value; unknown fields
    anywhere skip by wire type."""
    top = parse_protowire(payload)
    if top is None:
        return None
    feats: dict[str, tuple[str, list]] = {}
    for fno, wt, v in top:
        if fno != 1:
            continue
        if wt != 2:
            return None  # Example.features is a message
        if _parse_features(v, feats) is None:
            return None
    return feats


def parse_tf_sequence_example(payload: bytes):
    """REAL tf.SequenceExample decode (r17 — the second fixed public
    TF training format, sequence_example.proto): returns
    (context, feature_lists) where context is the tf.Example-shaped
    {name: (kind, [values...])} dict (SequenceExample.context = 1, a
    Features message) and feature_lists maps name →
    [(kind, [values...]), ...] — one entry per SEQUENCE STEP
    (FeatureLists.feature_list = 1, a map<string, FeatureList>;
    FeatureList.feature = 1, repeated Feature). Returns None on
    anything the specs call invalid; unknown fields skip by wire type
    (mandated forward-compat); repeated context/feature_lists fields
    merge, re-occurring map keys take the last value."""
    top = parse_protowire(payload)
    if top is None:
        return None
    context: dict[str, tuple[str, list]] = {}
    flists: dict[str, list] = {}
    for fno, wt, v in top:
        if fno == 1:
            if wt != 2:
                return None  # SequenceExample.context is a message
            if _parse_features(v, context) is None:
                return None
        elif fno == 2:
            if wt != 2:
                return None  # SequenceExample.feature_lists likewise
            entries = parse_protowire(v)
            if entries is None:
                return None
            for eno, ewt, ev in entries:
                if eno != 1:
                    continue
                if ewt != 2:
                    return None
                r = _parse_map_entry(ev)
                if r is None:
                    return None
                name, fl_body = r
                steps = []
                if fl_body is not None:
                    fl = parse_protowire(fl_body)
                    if fl is None:
                        return None
                    for sno, swt, sv in fl:
                        if sno != 1:
                            continue
                        if swt != 2:
                            return None  # FeatureList.feature: messages
                        f = _parse_feature(sv)
                        if f is None:
                            return None
                        steps.append(f)
                flists[name] = steps  # map key: last wins
    return context, flists


def _w_feature(kind: str, vals, packed: bool) -> bytes:
    """One Feature message (the oneof wrapping a scalar list)."""
    if kind == "bytes":
        body = b"".join(
            _w_uvarint((1 << 3) | 2) + _w_uvarint(len(v)) + bytes(v)
            for v in vals
        )
        fno = 1
    elif kind == "float":
        if packed:
            raw = struct.pack(f"<{len(vals)}f", *vals)
            body = _w_uvarint((1 << 3) | 2) + _w_uvarint(len(raw)) + raw
        else:
            body = b"".join(
                _w_uvarint((1 << 3) | 5) + struct.pack("<f", v)
                for v in vals
            )
        fno = 2
    elif kind == "int64":
        uvals = [v & ((1 << 64) - 1) for v in vals]
        if packed:
            raw = b"".join(_w_uvarint(u) for u in uvals)
            body = _w_uvarint((1 << 3) | 2) + _w_uvarint(len(raw)) + raw
        else:
            body = b"".join(
                _w_uvarint((1 << 3) | 0) + _w_uvarint(u) for u in uvals
            )
        fno = 3
    else:
        raise ValueError("kind must be bytes/float/int64")
    return _w_uvarint((fno << 3) | 2) + _w_uvarint(len(body)) + body


def _w_map_entry(name: str, msg: bytes) -> bytes:
    """One map<string, message> entry body {key=1, value=2}."""
    name_b = name.encode("utf-8")
    return (
        _w_uvarint((1 << 3) | 2) + _w_uvarint(len(name_b)) + name_b
        + _w_uvarint((2 << 3) | 2) + _w_uvarint(len(msg)) + msg
    )


def _w_features(features: dict, packed: bool) -> bytes:
    """A Features message body: one map entry per feature."""
    out = bytearray()
    for name, (kind, vals) in features.items():
        entry = _w_map_entry(name, _w_feature(kind, vals, packed))
        out += _w_uvarint((1 << 3) | 2) + _w_uvarint(len(entry)) + entry
    return bytes(out)


def encode_tf_example(features: dict, packed: bool = True) -> bytes:
    """Independent tf.Example writer: ``features`` maps name →
    (kind, values) with kind in bytes/float/int64. ``packed`` selects
    the packed (wire 2) vs unpacked (per-element tag) encoding for the
    numeric lists — both are legal proto3 and parse_tf_example accepts
    both."""
    body = _w_features(features, packed)
    # Example.features: ONE Features message wrapping all map entries
    return _w_uvarint((1 << 3) | 2) + _w_uvarint(len(body)) + body


def encode_tf_sequence_example(
    context: dict, feature_lists: dict, packed: bool = True
) -> bytes:
    """Independent tf.SequenceExample writer (r17): ``context`` is the
    tf.Example-shaped feature dict, ``feature_lists`` maps name →
    [(kind, values), ...] with one entry per sequence step."""
    ctx = _w_features(context, packed)
    out = bytearray(
        _w_uvarint((1 << 3) | 2) + _w_uvarint(len(ctx)) + ctx
    )
    fl_body = bytearray()
    for name, steps in feature_lists.items():
        fl = b"".join(
            (lambda f: _w_uvarint((1 << 3) | 2)
             + _w_uvarint(len(f)) + f)(_w_feature(kind, vals, packed))
            for kind, vals in steps
        )
        entry = _w_map_entry(name, fl)
        fl_body += _w_uvarint((1 << 3) | 2) + _w_uvarint(len(entry)) + entry
    out += _w_uvarint((2 << 3) | 2) + _w_uvarint(len(fl_body)) + bytes(
        fl_body
    )
    return bytes(out)


TFEXAMPLE_SCHEMA = (
    "doc_id bigint, rec_no int, fname string, kind string, "
    "n_vals int, vsum double"
)


def tfexample_record_batches(batches):
    """Batch-iterator core of read_tfexample_records (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import numpy as np
    import pandas as pd
    from polars_express_spark.functions.tfrecord import parse_tfrecord

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            recs = parse_tfrecord(bytes(payload))
            if recs is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt TFRecord shard framing"
                )
            for rno, rec in enumerate(recs):
                feats = parse_tf_example(rec)
                if feats is None:
                    raise ValueError(
                        f"doc {doc_id} record {rno}: malformed "
                        "tf.Example wire format"
                    )
                for fname in sorted(feats):
                    kind, vals = feats[fname]
                    if kind == "bytes":
                        n = len(vals)
                        s = float(sum(
                            int(np.frombuffer(v, dtype=np.uint8)
                                .astype(np.int64).sum())
                            for v in vals
                        ))
                    else:
                        n = len(vals)
                        s = float(sum(vals))
                    rows.append((doc_id, rno, fname, kind, n, s))
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "rec_no", "fname", "kind", "n_vals",
                     "vsum"],
        ).astype({"rec_no": "int32", "n_vals": "int32"})


def read_tfexample_records(df):
    """tf.Example extraction operator: one TFRecord-shard row → one row
    per (record, feature) with the feature's kind, element count, and
    exact value sum (for bytes features: the sum over all byte values,
    so the full payload is pinned under the hash). Both the TFRecord
    framing CRCs and the wire-format walk must hold — malformed shards
    or records raise. Arrow-batched mapInPandas; shard bytes never
    leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        tfexample_record_batches, schema=TFEXAMPLE_SCHEMA
    )


TFSEQ_SCHEMA = (
    "doc_id bigint, rec_no int, fname string, step int, kind string, "
    "n_vals int, vsum double"
)


def tfseq_record_batches(batches):
    """Batch-iterator core of read_tfseq_records (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    import numpy as np
    import pandas as pd

    from polars_express_spark.functions.tfrecord import parse_tfrecord

    def fsum(kind, vals):
        if kind == "bytes":
            return float(sum(
                int(np.frombuffer(v, dtype=np.uint8)
                    .astype(np.int64).sum())
                for v in vals
            ))
        return float(sum(vals))

    for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                recs = parse_tfrecord(bytes(payload))
                if recs is None:
                    raise ValueError(
                        f"doc {doc_id}: corrupt TFRecord shard framing"
                    )
                for rno, rec in enumerate(recs):
                    parsed = parse_tf_sequence_example(rec)
                    if parsed is None:
                        raise ValueError(
                            f"doc {doc_id} record {rno}: malformed "
                            "tf.SequenceExample wire format"
                        )
                    context, flists = parsed
                    for fname in sorted(context):
                        kind, vals = context[fname]
                        rows.append((doc_id, rno, fname, -1, kind,
                                     len(vals), fsum(kind, vals)))
                    for fname in sorted(flists):
                        for step, (kind, vals) in enumerate(
                            flists[fname]
                        ):
                            rows.append((doc_id, rno, fname, step, kind,
                                         len(vals), fsum(kind, vals)))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "rec_no", "fname", "step", "kind",
                         "n_vals", "vsum"],
            ).astype({"rec_no": "int32", "step": "int32",
                      "n_vals": "int32"})

def read_tfseq_records(df):
    """tf.SequenceExample extraction operator (r17): one TFRecord-shard
    row → one row per (record, context feature) at step -1 plus one row
    per (record, feature list, SEQUENCE STEP), each with the kind,
    element count, and exact value sum (bytes features sum byte
    values, so full payloads are pinned under the hash). Both the
    TFRecord framing CRCs and the wire-format walk must hold —
    malformed shards or records raise. Arrow-batched mapInPandas;
    shard bytes never leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        tfseq_record_batches, schema=TFSEQ_SCHEMA
    )
