"""Snappy raw-format codec, dependency-free (SURVEY.md §2.10, r17).

Snappy is the compression real Avro/Parquet/Hadoop corpora actually
use; the r16 verdict carried "Avro snappy — no stdlib codec" as a
standing gate. But the RAW Snappy format (the one Avro's snappy codec
and Hadoop's SnappyCodec block stream wrap) is public struct math —
format_description.txt in the google/snappy repository — and far
simpler than the VP8L/FLAC decoders already in-tree:

    preamble: uvarint uncompressed length
    elements: tag byte, low 2 bits =
      00 literal — length = (tag >> 2) + 1 when <= 60, else the tag
         encodes 60..63 meaning 1..4 little-endian extra length bytes
         holding length - 1
      01 copy — length = ((tag >> 2) & 0x7) + 4 (4..11),
         offset = ((tag >> 5) << 8) | next byte  (11-bit, 1..2047)
      10 copy — length = (tag >> 2) + 1 (1..64), offset = u16le
      11 copy — length = (tag >> 2) + 1 (1..64), offset = u32le

Copies may overlap forward (offset < length replicates bytes — the
LZ77 run idiom), and offset 0 is always malformed. The decoder
enforces the preamble exactly: output shorter or longer than declared
is corruption, every copy must stay inside the bytes already
produced, and the declared length is bomb-capped BEFORE allocation.

encode_snappy is the independent writer twin: spec-conformant output
using literals plus simple self-referential run copies (a compressor
is free to choose any valid element sequence; decode∘encode = id is
the contract, byte-identity with other compressors is not).

Integrity honesty: raw Snappy carries NO checksum — wrappers add
their own (Avro appends a CRC-32 of the UNCOMPRESSED datum block;
the Hadoop block stream and the framing format carry lengths/CRCs).
Flips inside a raw block either break the structure (detected) or
alter output silently, like tar member data — the callers' checksums
are the detection layer, and parse-level guarantees are
no-crash/no-bomb/exact-length.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

_MAX_OUTPUT = 1 << 26  # 64 MiB bomb cap, the family-wide precedent


def _read_uvarint(b: bytes, pos: int):
    """Little-endian base-128 varint (the preamble): (value, end_pos)
    or None on truncation / overlong (>5 bytes — Snappy lengths are
    32-bit)."""
    result = 0
    shift = 0
    for _ in range(5):
        if pos >= len(b):
            return None
        byte = b[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            if result >= 1 << 32:
                return None
            return result, pos
        shift += 7
    return None


def decompress_snappy(payload: bytes, max_output: int = _MAX_OUTPUT):
    """REAL raw-Snappy decompression: returns the uncompressed bytes
    or None on anything malformed — a bad preamble, a declared length
    past ``max_output`` (rejected BEFORE allocation), a truncated
    element, a copy reaching before the start of the output, offset 0,
    or final output differing from the declared length (both short and
    trailing-input forms)."""
    if not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    r = _read_uvarint(payload, 0)
    if r is None:
        return None
    declared, pos = r
    if declared > max_output:
        return None  # bomb guard before any allocation
    out = bytearray()
    n = len(payload)
    while pos < n:
        if len(out) >= declared and pos < n:
            return None  # trailing elements past the declared length
        tag = payload[pos]
        pos += 1
        kind = tag & 0x3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59  # 1..4 length bytes
                if pos + extra > n:
                    return None
                ln = int.from_bytes(payload[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n or len(out) + ln > declared:
                return None
            out += payload[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                return None
            off = ((tag >> 5) << 8) | payload[pos]
            pos += 1
        elif kind == 2:
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                return None
            off = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
        else:
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                return None
            off = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out) or len(out) + ln > declared:
            return None
        start = len(out) - off
        if off >= ln:  # disjoint: one slice
            out += out[start : start + ln]
        else:
            for i in range(ln):  # overlap: byte-wise replication
                out.append(out[start + i])
    if len(out) != declared:
        return None
    return bytes(out)


def encode_snappy(data: bytes, runs: bool = True) -> bytes:
    """Independent raw-Snappy writer: the uvarint preamble followed by
    literal elements (chunked at the 1-byte extended-length ceiling)
    — and, when ``runs`` is True, byte-run sequences of length >= 8
    compressed as a 1-byte literal plus overlapping offset-1 copies
    (the LZ77 run idiom every real compressor uses, exercising the
    overlap path). Any element mix is spec-valid; decode∘encode = id
    is the contract."""
    data = bytes(data)
    out = bytearray()
    ln = len(data)
    out += bytearray(
        [(ln >> (7 * i)) & 0x7F | (0x80 if ln >> (7 * (i + 1)) else 0)
         for i in range((max(ln, 1).bit_length() + 6) // 7)]
    )

    def literal(chunk: bytes) -> bytes:
        if not chunk:
            return b""
        m = len(chunk) - 1
        if m < 60:
            return bytes([m << 2]) + chunk
        return bytes([60 << 2 | 0, m & 0xFF]) + chunk  # 1 length byte

    pos = 0
    while pos < ln:
        if runs:
            run_end = pos
            while (run_end < ln and run_end - pos < 64 + 4
                   and data[run_end] == data[pos]):
                run_end += 1
            if run_end - pos >= 8:
                out += literal(data[pos : pos + 1])
                rem = run_end - pos - 1
                while rem:
                    step = min(rem, 64)
                    if step < 4:
                        out += literal(
                            data[pos + 1 : pos + 1 + step]
                        )  # tail shorter than a copy's minimum
                    else:
                        # tag 10: 2-byte offset form, offset 1 overlaps
                        out += bytes([((step - 1) << 2) | 2, 1, 0])
                    rem -= step
                pos = run_end
                continue
        step = min(256, ln - pos)
        out += literal(data[pos : pos + step])
        pos += step
    return bytes(out)
