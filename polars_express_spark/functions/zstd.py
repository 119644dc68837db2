"""Zstandard (RFC 8878) decoder + frame writer, dependency-free
(SURVEY.md §2.10, r18).

Zstd is the compression modern LLM corpora actually ship in —
``.jsonl.zst`` shards, Kafka attributes codec 4, Hadoop's
ZStandardCodec, Avro's ``zstandard`` codec — and RFC 8878 is public
struct math. This module implements the FULL decode side:

    frame = magic 0xFD2FB528 | Frame_Header (descriptor byte,
    optional window descriptor / dictionary id / content size) |
    blocks | optional 4-byte content checksum (xxh64 low 32 bits)

    block = 3-byte LE header (last bit, type Raw/RLE/Compressed,
    21-bit size) | content

    compressed block = Literals_Section (Raw / RLE / Huffman-
    Compressed / Treeless, 1 or 4 streams with a 6-byte jump table)
    + Sequences_Section (count, then per-type tables for literals-
    length / offset / match-length codes in Predefined_Mode /
    RLE_Mode / FSE_Compressed_Mode / Repeat_Mode, then one backward
    bitstream of interleaved FSE states and value bits)

Entropy layers implemented exactly per the RFC: the FSE normalized-
count description (accuracy-log header, small-value peeking, 2-bit
zero-run repeats) and table build (the (tsize>>1)+(tsize>>3)+3 spread
step, low-probability cells at the table end); Huffman weights in
both the direct 4-bit form and the FSE-compressed two-alternating-
states form, the implicit last weight completing a power of two; the
canonical prefix-code table (longest codes first, natural symbol
order within a weight); the three repeat offsets with the
literals-length-0 rotation and the ``Repeated_Offset1 - 1`` case.

Strictness: reserved bits/block types, a dictionary id, an offset
past the window or the decoded start, any bitstream not consumed
EXACTLY, a jump-table overrun, a non-power-of-two weight remainder,
an FSE description not summing to the table size, a declared content
size mismatch, and a failed checksum all return None. Bomb guards:
window size and every growth step are bound by ``max_output``; block
regenerated sizes are bound by min(window, 128 KiB) per spec.

Integrity asymmetry (the family's documented posture): frames WITH
the content-checksum flag detect every flip (xxh64 low-32 verified);
frames without it detect most flips structurally (entropy streams
must consume exactly) but raw/RLE block bodies are unchecked —
callers layer their own CRCs, exactly the LZ4/Snappy situation.

``encode_zstd`` is the independent writer twin: store/RLE frames
(raw blocks, RLE blocks for byte runs, optional content size,
optional checksum, single-segment or windowed headers) — compressed-
path coverage comes from decoding libzstd's own output (pyarrow's
bundled codec) in the cross-verification suite; decode ∘ encode = id
is the twin contract here as in the LZ4 tier.

``decode_zstd`` walks a multi-frame stream (concatenated frames plus
RFC 8878 skippable frames), the ``.jsonl.zst`` shard form.

xxh64 is the public reference algorithm, pinned against the
canonical empty-input vector and cross-checked against Spark's JVM
``xxhash64`` (seed 42) in the property suite.

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) like the other §2.10 ingestion tiers.
"""

from __future__ import annotations

import struct

_MAX_OUTPUT = 1 << 26  # the family-wide bomb cap

_FRAME_MAGIC = 0xFD2FB528
_SKIP_MAGIC_MIN = 0x184D2A50
_SKIP_MAGIC_MAX = 0x184D2A5F

_M64 = (1 << 64) - 1
_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64_round(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """xxHash64 (the public reference algorithm; the frame checksum is
    its low 32 bits). Pinned against b'' -> 0xEF46DB3751D8E999 and
    Spark's JVM xxhash64 in the property suite."""
    data = bytes(data)
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while pos + 32 <= n:
            a, b, c, d = struct.unpack_from("<QQQQ", data, pos)
            v1 = _xxh64_round(v1, a)
            v2 = _xxh64_round(v2, b)
            v3 = _xxh64_round(v3, c)
            v4 = _xxh64_round(v4, d)
            pos += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12)
             + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xxh64_round(0, v)) * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h = ((_rotl64(h ^ _xxh64_round(0, k), 27) * _P64_1) + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h = ((_rotl64(h ^ (k * _P64_1 & _M64), 23) * _P64_2) + _P64_3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl64(h ^ (data[pos] * _P64_5 & _M64), 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


# ---------------------------------------------------------------- bits


class _Fwd:
    """Forward LSB-first bit reader (FSE table descriptions)."""

    __slots__ = ("data", "bp", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.nbits = len(data) * 8

    def read(self, n: int):
        p = self.bp
        if p + n > self.nbits:
            return None
        self.bp = p + n
        if n == 0:
            return 0
        lo = p >> 3
        hi = (p + n - 1) >> 3
        chunk = int.from_bytes(self.data[lo : hi + 1], "little")
        return (chunk >> (p & 7)) & ((1 << n) - 1)

    def rewind(self, n: int) -> None:
        self.bp -= n

    def bytes_used(self) -> int:
        return (self.bp + 7) >> 3


class _Back:
    """Backward bit reader: the stream's last byte carries a 1-bit
    sentinel at its highest set position; reads walk DOWN from there.
    ``pos`` < 0 after a read = the stream overflowed (reads past the
    start return zero-padded values, the FSE end-of-stream idiom)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def peek(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos - n
        if p >= 0:
            lo = p >> 3
            hi = (self.pos - 1) >> 3
            chunk = int.from_bytes(self.data[lo : hi + 1], "little")
            return (chunk >> (p & 7)) & ((1 << n) - 1)
        avail = self.pos
        if avail <= 0:
            return 0
        chunk = int.from_bytes(
            self.data[0 : ((avail - 1) >> 3) + 1], "little"
        ) & ((1 << avail) - 1)
        return chunk << (n - avail)

    def read(self, n: int) -> int:
        v = self.peek(n)
        self.pos -= n
        return v


def _back_init(data: bytes):
    if not data or data[-1] == 0:
        return None  # a bitstream must end on its sentinel bit
    return _Back(data)


# ----------------------------------------------------------------- FSE


def _fse_distribution(fwd: _Fwd, max_sym: int, max_al: int):
    """The RFC 8878 §4.1.1 normalized-count description: 4-bit
    accuracy-log header (+5), values with small-value peeking, 2-bit
    repeat flags after zero probabilities. Returns (counts, AL) with
    counts in [-1, tsize] summing (abs) to exactly 1 << AL, or None."""
    al = fwd.read(4)
    if al is None:
        return None
    al += 5
    if al > max_al:
        return None
    remaining = (1 << al) + 1
    counts: list[int] = []
    while remaining > 1:
        if len(counts) > max_sym:
            return None
        n = remaining.bit_length()
        val = fwd.read(n)
        if val is None:
            return None
        low = (1 << (n - 1)) - 1
        small_max = (1 << n) - 1 - remaining
        if (val & low) < small_max:
            fwd.rewind(1)
            val &= low
        elif val > low:
            val -= small_max
        proba = val - 1
        counts.append(proba)
        remaining -= -proba if proba < 0 else proba
        if proba == 0:
            while True:
                rep = fwd.read(2)
                if rep is None:
                    return None
                counts.extend([0] * rep)
                if rep != 3:
                    break
                if len(counts) > max_sym + 1:
                    return None
    if remaining != 1 or len(counts) > max_sym + 1:
        return None
    return counts, al


def _fse_build(counts: list[int], al: int):
    """FSE decode table: (symbols, nbits, baselines, al) — low-prob
    (-1) symbols take the tail cells in declaration order, the rest
    spread by the spec's fixed step; cell i's next-state rule is
    baseline + read(nbits)."""
    tsize = 1 << al
    syms = [0] * tsize
    high = tsize
    total = 0
    for s, c in enumerate(counts):
        if c == -1:
            high -= 1
            if high < 0:
                return None
            syms[high] = s
            total += 1
        elif c > 0:
            total += c
    if total != tsize:
        return None
    step = (tsize >> 1) + (tsize >> 3) + 3
    mask = tsize - 1
    pos = 0
    for s, c in enumerate(counts):
        if c > 0:
            for _ in range(c):
                syms[pos] = s
                pos = (pos + step) & mask
                while pos >= high:
                    pos = (pos + step) & mask
    if pos != 0:
        return None
    occ = [1 if c == -1 else c for c in counts]
    nbits = [0] * tsize
    base = [0] * tsize
    for i in range(tsize):
        s = syms[i]
        x = occ[s]
        occ[s] = x + 1
        nb = al - (x.bit_length() - 1)
        nbits[i] = nb
        base[i] = (x << nb) - tsize
    return syms, nbits, base, al


def _fse_rle(sym: int):
    """The RLE_Mode table: one cell, zero bits — always ``sym``."""
    return [sym], [0], [0], 0


# ------------------------------------------------------------- Huffman


def _huf_weights(data: bytes):
    """Huffman tree description: header byte >= 128 -> direct 4-bit
    weights; < 128 -> an FSE-compressed weight stream (accuracy log
    <= 6) decoded with two alternating states until the bitstream
    empties. Returns (weights-with-implicit-last, consumed) or None."""
    if not data:
        return None
    h = data[0]
    if h >= 128:
        nw = h - 127
        nbytes = (nw + 1) >> 1
        if 1 + nbytes > len(data):
            return None
        ws = []
        for i in range(nw):
            byte = data[1 + (i >> 1)]
            ws.append(byte >> 4 if i % 2 == 0 else byte & 0xF)
        consumed = 1 + nbytes
    else:
        if 1 + h > len(data):
            return None
        comp = data[1 : 1 + h]
        fwd = _Fwd(comp)
        dist = _fse_distribution(fwd, max_sym=255, max_al=6)
        if dist is None:
            return None
        counts, al = dist
        tab = _fse_build(counts, al)
        if tab is None:
            return None
        syms, nbits, base, _ = tab
        back = _back_init(comp[fwd.bytes_used():])
        if back is None:
            return None
        s1 = back.read(al)
        s2 = back.read(al)
        if back.pos < 0:
            return None
        ws = []
        while True:
            ws.append(syms[s1])
            s1 = base[s1] + back.read(nbits[s1])
            if back.pos < 0:
                ws.append(syms[s2])
                break
            ws.append(syms[s2])
            s2 = base[s2] + back.read(nbits[s2])
            if back.pos < 0:
                ws.append(syms[s1])
                break
            if len(ws) > 254:
                return None
        consumed = 1 + h
    if len(ws) > 255 or any(w > 11 for w in ws):
        return None
    # the last weight is implicit: it completes the next power of two
    total = sum((1 << (w - 1)) for w in ws if w)
    if total == 0:
        return None
    tl = total.bit_length()
    if tl > 11:
        return None
    left = (1 << tl) - total
    if left & (left - 1):
        return None  # remainder must be a clean power of two
    ws.append(left.bit_length())
    return ws, consumed


def _huf_build(ws: list[int]):
    """Canonical prefix-code decode table, direct-lookup form: weight
    w -> code length tablelog+1-w filling 2^(w-1) consecutive cells,
    longest codes (weight 1) first, natural symbol order within a
    weight."""
    total = sum((1 << (w - 1)) for w in ws if w)
    if total == 0 or total & (total - 1):
        return None  # weights (incl. the implicit last) fill 2^tablelog
    tl = total.bit_length() - 1
    tsize = 1 << tl
    syms = bytearray(tsize)
    bits = bytearray(tsize)
    idx = 0
    for w in range(1, tl + 2):
        cnt = 1 << (w - 1)
        nb = tl + 1 - w
        for s, sw in enumerate(ws):
            if sw == w:
                if idx + cnt > tsize:
                    return None
                for k in range(idx, idx + cnt):
                    syms[k] = s
                    bits[k] = nb
                idx += cnt
    if idx != tsize:
        return None
    return syms, bits, tl


def _huf_stream(table, stream: bytes, regen: int):
    """Decode one backward Huffman stream to exactly ``regen`` bytes;
    the stream must be consumed exactly."""
    syms, bits, tl = table
    back = _back_init(stream)
    if back is None:
        return None
    out = bytearray()
    for _ in range(regen):
        v = back.peek(tl)
        out.append(syms[v])
        back.pos -= bits[v]
        if back.pos < 0:
            return None
    if back.pos != 0:
        return None
    return bytes(out)


# ------------------------------------------------------------ literals


def _decode_literals(b: bytes, prev_huf):
    """The Literals_Section: returns (literals, consumed, huf_table)
    or None; huf_table is the table to carry forward for Treeless
    blocks (new on Compressed, unchanged otherwise)."""
    if not b:
        return None
    h0 = b[0]
    btype = h0 & 3
    sf = (h0 >> 2) & 3
    if btype in (0, 1):  # Raw / RLE
        if sf in (0, 2):  # 1-bit size format: 5-bit size
            regen, hlen = h0 >> 3, 1
        elif sf == 1:
            if len(b) < 2:
                return None
            regen, hlen = (h0 >> 4) | (b[1] << 4), 2
        else:
            if len(b) < 3:
                return None
            regen, hlen = (h0 >> 4) | (b[1] << 4) | (b[2] << 12), 3
        if regen > 1 << 20:
            return None  # literals can't exceed the 1 MiB field space
        if btype == 0:
            if hlen + regen > len(b):
                return None
            return b[hlen : hlen + regen], hlen + regen, prev_huf
        if hlen + 1 > len(b):
            return None
        return bytes([b[hlen]]) * regen, hlen + 1, prev_huf
    # Compressed (2) / Treeless (3)
    if sf == 0:
        nstreams, hlen, rbits = 1, 3, 10
    elif sf == 1:
        nstreams, hlen, rbits = 4, 3, 10
    elif sf == 2:
        nstreams, hlen, rbits = 4, 4, 14
    else:
        nstreams, hlen, rbits = 4, 5, 18
    if len(b) < hlen:
        return None
    v = int.from_bytes(b[:hlen], "little")
    regen = (v >> 4) & ((1 << rbits) - 1)
    comp = (v >> (4 + rbits)) & ((1 << rbits) - 1)
    if hlen + comp > len(b):
        return None
    content = b[hlen : hlen + comp]
    if btype == 2:
        r = _huf_weights(content)
        if r is None:
            return None
        ws, used = r
        table = _huf_build(ws)
        if table is None:
            return None
        streams = content[used:]
    else:
        if prev_huf is None:
            return None  # Treeless without a previous table
        table = prev_huf
        streams = content
    if nstreams == 1:
        lit = _huf_stream(table, streams, regen)
        if lit is None:
            return None
        return lit, hlen + comp, table
    if len(streams) < 6:
        return None
    s1, s2, s3 = struct.unpack_from("<HHH", streams, 0)
    rest = streams[6:]
    if s1 + s2 + s3 > len(rest):
        return None
    r13 = (regen + 3) >> 2
    r4 = regen - 3 * r13
    if r4 < 0:
        return None
    parts = (rest[:s1], rest[s1 : s1 + s2],
             rest[s1 + s2 : s1 + s2 + s3], rest[s1 + s2 + s3 :])
    lits = bytearray()
    for part, want in zip(parts, (r13, r13, r13, r4)):
        lit = _huf_stream(table, part, want)
        if lit is None:
            return None
        lits += lit
    return bytes(lits), hlen + comp, table


# ----------------------------------------------------------- sequences

# Literals-length codes (RFC 8878 Table: baseline / extra bits)
_LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64,
                              128, 256, 512, 1024, 2048, 4096, 8192,
                              16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11,
                       12, 13, 14, 15, 16]
# Match-length codes
_ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67,
                                 83, 99, 131, 259, 515, 1027, 2051,
                                 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]

# Predefined distributions (RFC 8878 §3.1.1.3.2.2)
_LL_DEFAULT_DIST = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                    -1, -1, -1, -1]
_ML_DEFAULT_DIST = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                    -1, -1, -1, -1, -1]
_OF_DEFAULT_DIST = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_DEFAULT = _fse_build(_LL_DEFAULT_DIST, 6)
_ML_DEFAULT = _fse_build(_ML_DEFAULT_DIST, 6)
_OF_DEFAULT = _fse_build(_OF_DEFAULT_DIST, 5)
assert _LL_DEFAULT and _ML_DEFAULT and _OF_DEFAULT

_SEQ_SPECS = (  # (slot, max code, FSE accuracy-log cap, default table)
    ("ll", 35, 9, _LL_DEFAULT),
    ("of", 31, 8, _OF_DEFAULT),
    ("ml", 52, 9, _ML_DEFAULT),
)


def _decode_sequences(b: bytes, pos: int, fse_prev: dict):
    """The Sequences_Section from ``pos`` to the end of the block:
    returns (sequences as (ll, offset_value, ml) triples, updated
    repeat-table dict) or None. Table descriptions come in LL, OF, ML
    order; the bitstream then initializes states LL, OF, ML and per
    sequence reads offset bits, ML extra bits, LL extra bits, with
    LL, ML, OF state updates between sequences (none after the last);
    the stream must be consumed exactly."""
    n = len(b)
    if pos >= n:
        return None
    b0 = b[pos]
    pos += 1
    if b0 == 0:
        return ([], fse_prev) if pos == n else None
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        if pos >= n:
            return None
        nseq = ((b0 - 128) << 8) + b[pos]
        pos += 1
    else:
        if pos + 2 > n:
            return None
        nseq = b[pos] + (b[pos + 1] << 8) + 0x7F00
        pos += 2
    if pos >= n:
        return None
    mc = b[pos]
    pos += 1
    if mc & 3:
        return None  # reserved mode bits
    modes = {"ll": mc >> 6, "of": (mc >> 4) & 3, "ml": (mc >> 2) & 3}
    tables = dict(fse_prev)
    for slot, max_code, max_al, default in _SEQ_SPECS:
        mode = modes[slot]
        if mode == 0:
            tables[slot] = default
        elif mode == 1:
            if pos >= n:
                return None
            sym = b[pos]
            pos += 1
            if sym > max_code:
                return None
            tables[slot] = _fse_rle(sym)
        elif mode == 2:
            fwd = _Fwd(b[pos:])
            dist = _fse_distribution(fwd, max_sym=max_code, max_al=max_al)
            if dist is None:
                return None
            tab = _fse_build(*dist)
            if tab is None:
                return None
            tables[slot] = tab
            pos += fwd.bytes_used()
        else:
            if tables.get(slot) is None:
                return None  # Repeat_Mode without a previous table
    back = _back_init(b[pos:])
    if back is None:
        return None
    ll_syms, ll_nb, ll_base, ll_al = tables["ll"]
    of_syms, of_nb, of_base, of_al = tables["of"]
    ml_syms, ml_nb, ml_base, ml_al = tables["ml"]
    ll_s = back.read(ll_al)
    of_s = back.read(of_al)
    ml_s = back.read(ml_al)
    if back.pos < 0:
        return None
    seqs = []
    for i in range(nseq):
        ofc = of_syms[of_s]
        if ofc > 31:
            return None
        ofv = (1 << ofc) + back.read(ofc)
        mlc = ml_syms[ml_s]
        ml = _ML_BASE[mlc] + back.read(_ML_BITS[mlc])
        llc = ll_syms[ll_s]
        ll = _LL_BASE[llc] + back.read(_LL_BITS[llc])
        if back.pos < 0:
            return None
        seqs.append((ll, ofv, ml))
        if i != nseq - 1:
            ll_s = ll_base[ll_s] + back.read(ll_nb[ll_s])
            ml_s = ml_base[ml_s] + back.read(ml_nb[ml_s])
            of_s = of_base[of_s] + back.read(of_nb[of_s])
            if back.pos < 0:
                return None
    if back.pos != 0:
        return None
    return seqs, tables


def _exec_sequences(seqs, literals: bytes, out: bytearray, rep: list,
                    window: int, max_output: int):
    """Replay the sequences against the literals buffer and the
    decoded-so-far frame output (matches may cross block boundaries
    within the window). Mutates ``out`` and ``rep``; True or None."""
    lit_pos = 0
    for ll, ofv, ml in seqs:
        if ll > len(literals) - lit_pos:
            return None
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if ofv > 3:
            offset = ofv - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = ofv + 1 if ll == 0 else ofv
            if idx == 1:
                offset = rep[0]
            elif idx == 2:
                offset = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            elif idx == 3:
                offset = rep[2]
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:  # literals length 0, offset_value 3: rep1 - 1
                offset = rep[0] - 1
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        if offset <= 0 or offset > len(out) or offset > window:
            return None
        if len(out) + ml > max_output:
            return None
        start = len(out) - offset
        if offset >= ml:
            out += out[start : start + ml]
        else:
            for k in range(ml):  # overlap: forward replication
                out.append(out[start + k])
    out += literals[lit_pos:]
    return True


# -------------------------------------------------------------- frames


def _parse_one_frame(payload: bytes, pos: int, max_output: int):
    """One zstd frame starting at ``pos`` (magic already matched):
    (content_bytes, info_dict, end_pos) or None."""
    n = len(payload)
    pos += 4
    if pos >= n:
        return None
    fhd = payload[pos]
    pos += 1
    if fhd & 0x08:
        return None  # reserved bit (the unused bit 4 is accepted)
    fcs_flag = fhd >> 6
    single = bool(fhd & 0x20)
    has_checksum = bool(fhd & 0x04)
    did_size = (0, 1, 2, 4)[fhd & 3]
    window = None
    if not single:
        if pos >= n:
            return None
        wd = payload[pos]
        pos += 1
        wbase = 1 << (10 + (wd >> 3))
        window = wbase + (wbase >> 3) * (wd & 7)
    if did_size:
        if pos + did_size > n:
            return None
        did = int.from_bytes(payload[pos : pos + did_size], "little")
        pos += did_size
        if did != 0:
            return None  # external dictionaries are out of envelope
    fcs_size = (0, 2, 4, 8)[fcs_flag]
    if fcs_flag == 0 and single:
        fcs_size = 1
    content_size = None
    if fcs_size:
        if pos + fcs_size > n:
            return None
        content_size = int.from_bytes(payload[pos : pos + fcs_size],
                                      "little")
        pos += fcs_size
        if fcs_size == 2:
            content_size += 256
    if single:
        if content_size is None:
            return None
        window = content_size
    if window > max_output or (content_size is not None
                               and content_size > max_output):
        return None  # bomb guard before any allocation
    block_max = min(window if window > 0 else 1, 1 << 17)
    out = bytearray()
    huf_prev = None
    fse_prev: dict = {"ll": None, "of": None, "ml": None}
    rep = [1, 4, 8]
    while True:
        if pos + 3 > n:
            return None
        v = int.from_bytes(payload[pos : pos + 3], "little")
        pos += 3
        last = v & 1
        btype = (v >> 1) & 3
        bsize = v >> 3
        if btype == 3 or bsize > block_max:
            return None  # reserved type; over Block_Maximum_Size
        before = len(out)
        if btype == 0:  # Raw
            if pos + bsize > n or len(out) + bsize > max_output:
                return None
            out += payload[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: bsize = regenerated count, 1 body byte
            if pos >= n or len(out) + bsize > max_output:
                return None
            out += bytes([payload[pos]]) * bsize
            pos += 1
        else:  # Compressed
            if pos + bsize > n:
                return None
            content = payload[pos : pos + bsize]
            pos += bsize
            r = _decode_literals(content, huf_prev)
            if r is None:
                return None
            literals, used, huf_prev = r
            r = _decode_sequences(content, used, fse_prev)
            if r is None:
                return None
            seqs, fse_prev = r
            if _exec_sequences(seqs, literals, out, rep, window,
                               max_output) is None:
                return None
        if len(out) - before > block_max:
            return None  # a block may not regenerate past the maximum
        if last:
            break
    if content_size is not None and len(out) != content_size:
        return None
    if has_checksum:
        if pos + 4 > n:
            return None
        (cs,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != cs:
            return None  # content corruption DETECTED
    return bytes(out), {
        "window_size": window,
        "single_segment": single,
        "content_size": content_size,
        "checksum": has_checksum,
    }, pos


def parse_zstd_frame(payload: bytes, max_output: int = _MAX_OUTPUT):
    """REAL Zstandard frame decode: returns (content bytes,
    {"window_size", "single_segment", "content_size" (None when
    undeclared), "checksum"}) or None. The payload must be exactly
    one complete frame (trailing bytes reject); see the module
    docstring for the strictness and integrity contract."""
    if not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    if len(payload) < 4 or struct.unpack_from("<I", payload, 0)[0] != \
            _FRAME_MAGIC:
        return None
    r = _parse_one_frame(payload, 0, max_output)
    if r is None or r[2] != len(payload):
        return None
    return r[0], r[1]


def parse_zstd_stream(payload: bytes, max_output: int = _MAX_OUTPUT):
    """Multi-frame zstd stream decode (the ``.jsonl.zst`` shard form):
    concatenated data frames plus RFC 8878 skippable frames, contents
    concatenated under one shared output cap. Returns (content bytes,
    [per-data-frame info dicts]) or None on any malformed frame, an
    empty stream (zero data frames), or trailing garbage."""
    if not isinstance(payload, (bytes, bytearray, memoryview)):
        return None
    payload = bytes(payload)
    n = len(payload)
    out = bytearray()
    infos = []
    pos = 0
    while pos < n:
        if pos + 4 > n:
            return None
        (magic,) = struct.unpack_from("<I", payload, pos)
        if _SKIP_MAGIC_MIN <= magic <= _SKIP_MAGIC_MAX:
            if pos + 8 > n:
                return None
            (sz,) = struct.unpack_from("<I", payload, pos + 4)
            if sz > n - pos - 8:
                return None
            pos += 8 + sz
            continue
        if magic != _FRAME_MAGIC:
            return None
        r = _parse_one_frame(payload, pos, max_output - len(out))
        if r is None:
            return None
        content, info, pos = r
        out += content
        infos.append(info)
    if not infos:
        return None
    return bytes(out), infos


def decode_zstd(payload: bytes, max_output: int = _MAX_OUTPUT):
    """parse_zstd_stream's content-only form (the codec-gate entry
    point for Kafka / SequenceFile / Avro)."""
    r = parse_zstd_stream(payload, max_output)
    return None if r is None else r[0]


ZSTD_SCHEMA = (
    "doc_id bigint, n_bytes bigint, bsum bigint, mean_b double, "
    "n_lines bigint, n_frames int, all_ck boolean, csize bigint"
)


def zstd_content_batches(batches):
    """Batch-iterator core of read_zstd_content (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            parsed = parse_zstd_stream(bytes(payload))
            if parsed is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt or out-of-envelope "
                    "zstd stream"
                )
            content, infos = parsed
            arr = np.frombuffer(content, dtype=np.uint8)
            declared = [i["content_size"] for i in infos]
            rows.append(
                (doc_id, len(content),
                 int(arr.astype(np.int64).sum()) if arr.size else 0,
                 float(arr.mean()) if arr.size else 0.0,
                 int((arr == 10).sum()),
                 len(infos),
                 all(i["checksum"] for i in infos),
                 -1 if any(d is None for d in declared)
                 else sum(declared))
            )
        pdf_out = pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "bsum", "mean_b",
                     "n_lines", "n_frames", "all_ck", "csize"],
        )
        pdf_out["n_frames"] = pdf_out["n_frames"].astype("int32")
        yield pdf_out


def read_zstd_content(df):
    """Zstd shard extraction operator (r18): one ``.zst`` payload row
    (a frame or a multi-frame stream with skippables) → one row with
    exact content stats — byte count/sum/mean plus the newline count
    (the ``.jsonl.zst`` shard's record count) — and the stream's
    verified posture: data-frame count, whether EVERY frame carried
    the xxh64 content checksum, and the summed declared content size
    (-1 when any frame left it undeclared). Malformed streams raise —
    every frame's entropy framing and any present checksums have
    already been enforced by parse_zstd_stream. Arrow-batched
    mapInPandas; compressed bytes never leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        zstd_content_batches, schema=ZSTD_SCHEMA
    )


def encode_zstd(
    data: bytes,
    block_size: int = 65536,
    content_size: bool = True,
    checksum: bool = True,
    single_segment: bool = False,
    rle: bool = True,
) -> bytes:
    """Independent zstd frame writer (the store/RLE subset — any
    raw/RLE block mix is spec-conformant output; the compressed paths
    are exercised by decoding libzstd's own frames in the tests):
    optional declared content size, optional xxh64-low32 checksum,
    single-segment or windowed headers, RLE blocks for byte runs."""
    data = bytes(data)
    block_size = max(1, min(block_size, 1 << 17))
    fhd = 0x04 if checksum else 0
    header = bytearray()
    if single_segment:
        fhd |= 0x20
        v = len(data)
        if v <= 255:
            fcs_flag, fcs = 0, struct.pack("<B", v)
        elif 256 <= v <= 65535 + 256:
            fcs_flag, fcs = 1, struct.pack("<H", v - 256)
        elif v < 1 << 32:
            fcs_flag, fcs = 2, struct.pack("<I", v)
        else:
            fcs_flag, fcs = 3, struct.pack("<Q", v)
        header += fcs  # single-segment frames always declare the size
        fhd |= fcs_flag << 6
    else:
        exp = max(0, (block_size - 1).bit_length() - 10)
        wd = exp << 3
        header.append(wd)
        if content_size:
            v = len(data)
            if 256 <= v <= 65535 + 256:
                fcs_flag, fcs = 1, struct.pack("<H", v - 256)
            elif v < 1 << 32:  # incl. v < 256: no 1-byte field without
                fcs_flag, fcs = 2, struct.pack("<I", v)  # single-segment
            else:
                fcs_flag, fcs = 3, struct.pack("<Q", v)
            header += fcs
            fhd |= fcs_flag << 6
    out = bytearray(struct.pack("<I", _FRAME_MAGIC))
    out.append(fhd)
    out += header
    chunks = [data[i : i + block_size]
              for i in range(0, len(data), block_size)] or [b""]
    for i, chunk in enumerate(chunks):
        last = 1 if i == len(chunks) - 1 else 0
        if rle and len(chunk) >= 2 and chunk.count(chunk[0]) == len(chunk):
            out += int.to_bytes(last | (1 << 1) | (len(chunk) << 3), 3,
                                "little")
            out.append(chunk[0])
        else:
            out += int.to_bytes(last | (0 << 1) | (len(chunk) << 3), 3,
                                "little")
            out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


JSONL_SCHEMA = "doc_id bigint, line_no int, line string"


def jsonl_zst_batches(batches):
    """Batch-iterator core of read_jsonl_zst (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            content = decode_zstd(bytes(payload))
            if content is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt or out-of-envelope "
                    "zstd shard"
                )
            if not content.endswith(b"\n"):
                raise ValueError(
                    f"doc {doc_id}: shard not newline-terminated"
                )
            try:
                text = content.decode("utf-8")
            except UnicodeDecodeError:
                raise ValueError(
                    f"doc {doc_id}: shard is not UTF-8"
                ) from None
            lines = text[:-1].split("\n")
            if any(not ln for ln in lines):
                raise ValueError(f"doc {doc_id}: empty jsonl line")
            rows.extend(
                (doc_id, i, ln) for i, ln in enumerate(lines)
            )
        pdf_out = pd.DataFrame(
            rows, columns=["doc_id", "line_no", "line"]
        )
        pdf_out["line_no"] = pdf_out["line_no"].astype("int32")
        yield pdf_out


def read_jsonl_zst(df):
    """``.jsonl.zst`` shard reader (r18 — the wire format modern LLM
    corpora actually ship in): one compressed shard row → one row per
    LINE with its 0-based line number; the decoded content must be
    UTF-8 and newline-TERMINATED (every line ends in \n, no empty
    lines — a half-written shard is corruption, not a short read).
    Record parsing stays JVM-side: callers apply from_json /
    get_json_object to the line column, so Catalyst owns the JSON
    path and this operator owns only decompression + framing.
    Malformed shards raise. Arrow-batched mapInPandas; compressed
    bytes never leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        jsonl_zst_batches, schema=JSONL_SCHEMA
    )
