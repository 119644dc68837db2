"""LZ4 block + frame codec and xxHash32, dependency-free (SURVEY.md
§2.10, r17).

LZ4 is the other compression modern data infrastructure actually
runs — Kafka message sets, Hadoop's Lz4Codec, and bare ``.lz4`` files
— and both of its public layouts are pure struct math
(lz4_Block_format.md / lz4_Frame_format.md in the lz4/lz4 repository):

BLOCK format — a sequence of [token | literal-length extension |
literals | u16le match offset | match-length extension]:
    token high nibble = literal length (15 → 255-run extension bytes)
    token low nibble  = match length - 4 (15 → extension bytes)
    the LAST sequence has literals only (no offset/match follows);
    offset 0 is malformed; matches may overlap forward (runs).
End-of-block restrictions (the spec's parsing-safety rules — the last
sequence is literals-only) are enforced structurally: a block that
ends mid-sequence is malformed.

FRAME format — magic 0x184D2204 (u32le), FLG/BD descriptor bytes
(version 01, flags for block independence / block checksums / content
size / content checksum; reserved bits must be 0), an optional u64le
content size, and HC = (xxh32(descriptor) >> 8) & 0xFF; then data
blocks (u31le size with the high bit set meaning UNCOMPRESSED, each
optionally followed by its xxh32 block checksum), the 0x00000000
EndMark, and an optional xxh32 of the whole UNCOMPRESSED content.
Checksums are xxHash32 (seed 0), itself ~30 lines of public 32-bit
arithmetic, implemented here and pinned against the reference
vectors. Integrity: frames WITH checksums detect every flip
(PNG-tier); bare blocks carry none (tar-tier) — callers add their
own, exactly the Snappy asymmetry.

encode_lz4_block / encode_lz4_frame are the independent writer twins
(literals plus offset-1 run matches — any valid sequence mix is
spec-conformant; decode∘encode = id is the contract).

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct

_MAX_OUTPUT = 1 << 26  # the family-wide bomb cap

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (the public reference algorithm; pinned against the
    canonical b'' → 0x02CC5D05 and b'Nobody inspects the spammish
    repetition' vectors in the property suite)."""
    data = bytes(data)
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            a, b, c, d = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + a * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + b * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + c * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + d * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + k * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def decompress_lz4_block(
    payload: bytes, max_output: int = _MAX_OUTPUT, prefix: bytes = b""
):
    """REAL LZ4 block decompression: returns the uncompressed bytes or
    None on a truncated sequence, offset 0, a match reaching before
    the start, or output past ``max_output`` (checked as it grows —
    the block format declares no length, so the cap is the guard).
    ``prefix`` is the dictionary window for block-LINKED frames (the
    lz4 CLI default): matches may reach back into it, exactly the
    frame spec's cross-block window (offsets are u16 so 64 KiB of
    prefix always suffices). ``max_output`` bounds the NEW bytes
    produced, not the prefix."""
    if not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    prefix = bytes(prefix)
    plen = len(prefix)
    out = bytearray()
    pos = 0
    n = len(payload)
    if n == 0:
        return None  # even empty content needs one literals-only token
    while True:
        if pos >= n:
            return None  # a block ends inside the last sequence
        token = payload[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    return None
                b = payload[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n or len(out) + lit > max_output:
            return None
        out += payload[pos : pos + lit]
        pos += lit
        if pos == n:
            return bytes(out)  # the last sequence: literals only
        if pos + 2 > n:
            return None
        (off,) = struct.unpack_from("<H", payload, pos)
        pos += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    return None
                b = payload[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if off == 0 or off > len(out) + plen or len(out) + mlen > max_output:
            return None
        start = len(out) - off
        if start >= 0 and off >= mlen:
            out += out[start : start + mlen]
        else:
            for i in range(mlen):  # overlap / prefix: forward replication
                at = start + i
                out.append(out[at] if at >= 0 else prefix[plen + at])


def encode_lz4_block(data: bytes, runs: bool = True) -> bytes:
    """Independent LZ4 block writer: literal sequences (with 255-run
    length extensions) and — when ``runs`` is on — byte runs of >= 12
    compressed as one literal plus an overlapping offset-1 match,
    ending on the spec-required literals-only last sequence."""
    data = bytes(data)
    out = bytearray()

    def token_len(v: int) -> bytes:
        if v < 15:
            return b""
        ext = bytearray()
        v -= 15
        while v >= 255:
            ext.append(255)
            v -= 255
        ext.append(v)
        return bytes(ext)

    pos = 0
    n = len(data)
    while True:
        run_end = pos
        if runs:
            while run_end < n and data[run_end] == data[pos]:
                run_end += 1
        # the spec's encoder-side parsing restrictions: the last match
        # starts >= 12 bytes before block end and the last 5 bytes are
        # literals — so cap the run and fall back to literals near EOF
        stop = min(run_end, n - 5)
        if runs and pos + 1 <= n - 12 and stop - pos - 1 >= 4:
            mlen = stop - pos - 1
            lit_b = data[pos : pos + 1]
            tok = (1 << 4) | min(mlen - 4, 15)
            out.append(tok)
            out += lit_b + b"\x01\x00" + token_len(mlen - 4)
            pos = stop
            continue
        chunk = data[pos:n]
        out.append((min(len(chunk), 15)) << 4)
        out += token_len(len(chunk)) + chunk
        return bytes(out)


_FRAME_MAGIC = 0x184D2204


def parse_lz4_frame(payload: bytes, max_output: int = _MAX_OUTPUT):
    """REAL LZ4 frame parse: returns (content bytes, {"block_indep":
    bool, "block_checksums": bool, "content_size": int|None,
    "content_checksum": bool}) or None. The magic, version-01 FLG with
    zero reserved bits, the header-checksum byte (xxh32 >> 8 of the
    descriptor), every present block checksum, the EndMark, the
    declared content size, and the content checksum are ALL verified;
    every block (stored size word AND decompressed size) is bound by
    the BD descriptor's declared maximum; uncompressed blocks (high
    bit of the size word) pass through; block-LINKED frames (FLG
    independence bit clear — the lz4 CLI default) thread the last
    64 KiB of output into the next block as the match window; DictID
    frames and legacy frames are out of envelope."""
    if not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    n = len(payload)
    if n < 7 or struct.unpack_from("<I", payload, 0)[0] != _FRAME_MAGIC:
        return None
    flg = payload[4]
    bd = payload[5]
    if flg >> 6 != 0b01:
        return None  # version must be 01
    if flg & 0b00000011:
        return None  # reserved bit + DictID (out of envelope)
    indep = bool(flg & 0x20)
    blk_cs = bool(flg & 0x10)
    has_size = bool(flg & 0x08)
    content_cs = bool(flg & 0x04)
    if bd & 0b10001111 or (bd >> 4) not in (4, 5, 6, 7):
        return None  # BD reserved bits; block max size 64KB..4MB
    # the descriptor's declared maximum binds every block (spec frame
    # grammar): both the stored size word and the decompressed size
    bd_max = 1 << (8 + 2 * (bd >> 4))
    pos = 6
    content_size = None
    if has_size:
        if pos + 8 > n:
            return None
        (content_size,) = struct.unpack_from("<Q", payload, pos)
        pos += 8
        if content_size > max_output:
            return None  # bomb guard before allocation
    if pos >= n:
        return None
    hc = payload[pos]
    pos += 1
    if (xxh32(payload[4:pos - 1]) >> 8) & 0xFF != hc:
        return None  # header checksum
    out = bytearray()
    while True:
        if pos + 4 > n:
            return None
        (word,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if word == 0:
            break  # EndMark
        raw_flag = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        if size > n - pos or size > bd_max:
            return None  # past payload, or over the declared maximum
        blk = payload[pos : pos + size]
        pos += size
        if blk_cs:
            if pos + 4 > n:
                return None
            (cs,) = struct.unpack_from("<I", payload, pos)
            pos += 4
            if xxh32(blk) != cs:
                return None  # per-block corruption DETECTED
        if raw_flag:
            if len(out) + size > max_output:
                return None
            out += blk
        else:
            dec = decompress_lz4_block(
                blk,
                min(bd_max, max_output - len(out)),
                prefix=b"" if indep else bytes(out[-65536:]),
            )
            if dec is None:
                return None
            out += dec
    if content_cs:
        if pos + 4 > n:
            return None
        (cs,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if xxh32(bytes(out)) != cs:
            return None
    if pos != n:
        return None  # trailing bytes after the frame
    if content_size is not None and content_size != len(out):
        return None
    return bytes(out), {
        "block_indep": indep,
        "block_checksums": blk_cs,
        "content_size": content_size,
        "content_checksum": content_cs,
    }


def encode_lz4_frame(
    data: bytes,
    block_size: int = 65536,
    block_checksums: bool = False,
    content_size: bool = True,
    content_checksum: bool = True,
    store_uncompressed: bool = False,
    linked: bool = False,
) -> bytes:
    """Independent LZ4 frame writer: version-01 descriptor (block
    independence set by default — each block compresses alone, the
    splittable form; ``linked=True`` clears it, declaring the CLI's
    block-linked mode — this writer's blocks are self-contained either
    way, which is valid linked output), optional content size /
    per-block and content xxh32 checksums, blocks of ``block_size``
    (``store_uncompressed`` forces the high-bit raw form), the
    EndMark."""
    data = bytes(data)
    flg = (0b01 << 6) | (0 if linked else 0x20)
    if block_checksums:
        flg |= 0x10
    if content_size:
        flg |= 0x08
    if content_checksum:
        flg |= 0x04
    # smallest BD code whose declared maximum covers block_size
    bd_code = next(
        (c for c in (4, 5, 6) if block_size <= 1 << (8 + 2 * c)), 7
    )
    if block_size > 1 << 22:
        raise ValueError("block_size exceeds the 4 MiB frame maximum")
    desc = bytes([flg, bd_code << 4])
    if content_size:
        desc += struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", _FRAME_MAGIC) + desc)
    out.append((xxh32(desc) >> 8) & 0xFF)
    for at in range(0, len(data), block_size):
        chunk = data[at : at + block_size]
        comp = encode_lz4_block(chunk)
        if store_uncompressed or len(comp) >= len(chunk):
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
            blk = chunk
        else:
            out += struct.pack("<I", len(comp)) + comp
            blk = comp
        if block_checksums:
            out += struct.pack("<I", xxh32(blk))
    out += struct.pack("<I", 0)
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)


LZ4_SCHEMA = (
    "doc_id bigint, n_bytes bigint, bsum bigint, mean_b double, "
    "blk_cs boolean, csize bigint"
)


def lz4_content_batches(batches):
    """Batch-iterator core of read_lz4_content (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            parsed = parse_lz4_frame(bytes(payload))
            if parsed is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt or out-of-envelope "
                    "LZ4 frame"
                )
            content, flags = parsed
            arr = np.frombuffer(content, dtype=np.uint8)
            rows.append(
                (doc_id, len(content),
                 int(arr.astype(np.int64).sum()) if arr.size else 0,
                 float(arr.mean()) if arr.size else 0.0,
                 flags["block_checksums"],
                 flags["content_size"]
                 if flags["content_size"] is not None else -1)
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "bsum", "mean_b",
                     "blk_cs", "csize"],
        )


def read_lz4_content(df):
    """LZ4 frame extraction operator (r17): one ``.lz4`` payload row →
    one row with exact content stats plus the frame's verified
    integrity posture (block-checksum flag, declared content size or
    -1). Malformed frames raise — every xxh32 layer (header byte,
    per-block, whole-content) has already been enforced by
    parse_lz4_frame. Arrow-batched mapInPandas; frame bytes never
    leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        lz4_content_batches, schema=LZ4_SCHEMA
    )
