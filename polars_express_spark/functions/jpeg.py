"""Baseline JPEG (SOF0) codec in pure Python + numpy (r12).

This closes the last image-format gate in the §2.10 multimodal ladder
(VERDICT r11 next-step #6 offered "commit to baseline SOF0 Huffman+IDCT
in pure Python" — this is that commitment). Everything here is from the
public ITU-T T.81 spec: canonical Huffman code construction (Annex C),
the zigzag scan (Figure 5), byte stuffing and restart markers (§B.1.1.5,
§E.1.4), DCT-based coding (§A.3) via the orthonormal DCT-II basis
matrix, and the JFIF YCbCr conversion. The reference engine exposes no
image codec at all (reference src/main.rs:106-121 serves tabular
endpoints only), so as with PNG/BMP/GIF this tier exists to make the
Spark-side multimodal plumbing exercise REAL decoded pixels.

Decoder (`parse_jpeg`): baseline sequential 8-bit, gray or 3-component
YCbCr, per-component sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0 —
chroma upsampled by replication), multi-table DQT/DHT segments, DRI +
restart markers. Returns (w, h, ch, ndarray) or None — progressive
(SOF2), arithmetic, 12-bit, hierarchical, and any malformed stream
return None, never invented pixels. All allocations are bounded by the
SOF-declared dimensions (the deflate-bomb posture).

Encoder (`encode_jpeg`): 4:4:4 or 4:2:0, fixed-length canonical Huffman
tables (DC symbols at 4 bits, the 162 baseline AC symbols at 8 bits —
tiny constants, valid prefix codes since neither fills the all-ones
codeword), default ALL-ONES quant tables. With ones quant, a raster
that is constant within each 8x8 block round-trips BIT-EXACTLY: the
only nonzero coefficient is DC = 8*(v-128), an exact integer, so
quantize/dequantize is the identity and the IDCT reconstructs v to
within float epsilon — far inside the 0.5 rounding radius. That exact
tier is what q_multimodal_jpeg puts under the driver hash; general
images round-trip to within the coefficient-rounding bound (tested).

JPEG is inherently lossy for general content: the codec is exact only
where the math is (DC-only blocks), and the tests distinguish the two
regimes explicitly. Entropy coding runs in interpreted Python inside
Arrow-batched operators — like parse_png's filter loop, a production
deployment swaps this module for a C codec without touching the Spark
plumbing around it.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan: _ZZ[i] = raster index (8*r + c) of the i-th zigzag
# element (T.81 Figure 5), generated rather than transcribed
def _zigzag() -> list[int]:
    out = []
    for d in range(15):
        rs = range(max(0, d - 7), min(d, 7) + 1)
        for r in (rs if d % 2 else reversed(list(rs))):
            out.append(8 * r + (d - r))
    return out


_ZZ = np.array(_zigzag(), dtype=np.int64)


def _dct_mat() -> np.ndarray:
    """Orthonormal DCT-II basis: coeff = M @ block @ M.T, block = M.T @
    coeff @ M. Orthonormality is what makes the constant-block DC
    exactly 8*(v-128)."""
    k = np.arange(8, dtype=np.float64)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(0.25)
    m[0] *= np.sqrt(0.5)
    return m


_M = _dct_mat()

_KR, _KG, _KB = 0.299, 0.587, 0.114  # JFIF / BT.601 luma primaries

# fixed-length canonical Huffman tables for the ENCODER: 12 DC size
# categories at 4 bits (codes 0..11; 15 = all-ones never assigned) and
# the 162 baseline AC run/size symbols at 8 bits (codes 0..161).
# Canonical assignment over these counts yields code == list index, so
# the decoder's generic DHT reader reproduces them exactly.
_DC_SYMS = list(range(12))
_AC_SYMS = sorted([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_DC_CODE = {s: (i, 4) for i, s in enumerate(_DC_SYMS)}
_AC_CODE = {s: (i, 8) for i, s in enumerate(_AC_SYMS)}


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy bytes."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read_bit(self):
        if self.pos >= self.n:
            return None
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read_bits(self, k: int):
        v = 0
        for _ in range(k):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _huffdec(r: _BitReader, lut: dict):
    code = 0
    for length in range(1, 17):
        b = r.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    return None


def _receive_extend(r: _BitReader, s: int):
    if s == 0:
        return 0
    v = r.read_bits(s)
    if v is None:
        return None
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_block(r: _BitReader, dlut: dict, alut: dict):
    """One 8x8 block -> zigzag-ordered coefficient vector (DC holds the
    DIFF, caller applies the predictor), or None."""
    s = _huffdec(r, dlut)
    if s is None or s > 11:
        return None
    diff = _receive_extend(r, s)
    if diff is None:
        return None
    zz = np.zeros(64, dtype=np.int64)
    zz[0] = diff
    k = 1
    while k < 64:
        rs = _huffdec(r, alut)
        if rs is None:
            return None
        if rs == 0x00:  # EOB
            break
        run, size = rs >> 4, rs & 15
        if size == 0:
            if run != 15:  # only ZRL may carry size 0
                return None
            k += 16
            continue
        k += run
        if k > 63:
            return None
        v = _receive_extend(r, size)
        if v is None:
            return None
        zz[k] = v
        k += 1
    return zz


def _entropy_segments(payload: bytes, start: int):
    """De-stuff the scan bytes from `start`, splitting at RSTn markers.
    Returns (segments, end_reached_marker) or None on truncation."""
    segs, cur, i, n = [], bytearray(), start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            return None
        m = payload[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next header marker terminates the scan
            segs.append(bytes(cur))
            return segs
    return None  # ran off the payload without a terminating marker


def parse_jpeg(payload: bytes):
    """Decode a baseline (SOF0/SOF1) JPEG: returns
    (width, height, channels, ndarray[h, w, ch]) with channels 1 (gray)
    or 3 (RGB via JFIF YCbCr), or None for anything this tier does not
    cover or any structural corruption (see module docstring)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    ri = 0
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            return None
        m = payload[pos + 1]
        if m == 0xFF:  # fill byte
            pos += 1
            continue
        if m == 0x01 or 0xD0 <= m <= 0xD8:  # TEM/RSTn/SOI: no segment body
            pos += 2
            continue
        if m == 0xD9:  # EOI before any scan
            return None
        if pos + 4 > n:
            return None
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > n:
            return None
        body = payload[pos + 4 : pos + 2 + seglen]
        if m == 0xDB:  # DQT: one or more tables
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                width = 64 * (pq + 1)
                if pq > 1 or tq > 3 or i + width > len(body):
                    return None
                raw = np.frombuffer(body, ">u2" if pq else "u1", 64, i)
                i += width
                q = np.zeros(64, dtype=np.int64)
                q[_ZZ] = raw  # DQT stores tables in zigzag order
                qt[tq] = q.reshape(8, 8)
        elif m == 0xC4:  # DHT: one or more tables
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = body[i + 1 : i + 17]
                nsym = sum(counts)
                i += 17
                if tc > 1 or th > 3 or i + nsym > len(body):
                    return None
                syms = body[i : i + nsym]
                i += nsym
                lut, code, k = {}, 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        lut[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = lut
            if i != len(body):
                return None
        elif m in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            if len(body) < 6:
                return None
            prec = body[0]
            ih, iw = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if prec != 8 or iw == 0 or ih == 0 or nc not in (1, 3):
                return None
            if len(body) < 6 + 3 * nc:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 15
                if hi not in (1, 2) or vi not in (1, 2):
                    return None
                comps.append((cid, hi, vi, tq))
            sof = (iw, ih, comps)
        elif 0xC2 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return None  # progressive/arithmetic/lossless: not this tier
        elif m == 0xDD:  # DRI
            if len(body) < 2:
                return None
            (ri,) = struct.unpack_from(">H", body)
        elif m == 0xDA:  # SOS: entropy data follows this segment
            if sof is None or len(body) < 1:
                return None
            ns = body[0]
            if ns != len(sof[2]) or len(body) < 1 + 2 * ns + 3:
                return None
            tsel = {}
            for k in range(ns):
                tsel[body[1 + 2 * k]] = (body[2 + 2 * k] >> 4, body[2 + 2 * k] & 15)
            return _decode_scan(payload, pos + 2 + seglen, sof, qt, huff, tsel, ri)
        # APPn / COM / anything else with a length: skip
        pos += 2 + seglen
    return None


def _decode_scan(payload, start, sof, qt, huff, tsel, ri):
    iw, ih, comps = sof
    segs = _entropy_segments(payload, start)
    if segs is None:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (iw + 8 * hmax - 1) // (8 * hmax)
    my = (ih + 8 * vmax - 1) // (8 * vmax)
    planes, luts = {}, {}
    for cid, hi, vi, tq in comps:
        if tq not in qt or cid not in tsel:
            return None
        dsel, asel = tsel[cid]
        dlut, alut = huff.get((0, dsel)), huff.get((1, asel))
        if dlut is None or alut is None:
            return None
        planes[cid] = np.zeros((my * 8 * vi, mx * 8 * hi), dtype=np.float64)
        luts[cid] = (dlut, alut)
    pred = {c[0]: 0 for c in comps}
    seg_i, reader = 0, _BitReader(segs[0])
    for mi in range(mx * my):
        if ri and mi and mi % ri == 0:  # restart: next segment, reset DC
            seg_i += 1
            if seg_i >= len(segs):
                return None
            reader = _BitReader(segs[seg_i])
            pred = {c[0]: 0 for c in comps}
        myi, mxi = divmod(mi, mx)
        for cid, hi, vi, tq in comps:
            dlut, alut = luts[cid]
            for by in range(vi):
                for bx in range(hi):
                    zz = _decode_block(reader, dlut, alut)
                    if zz is None:
                        return None
                    zz[0] += pred[cid]
                    pred[cid] = zz[0]
                    c2 = np.zeros(64, dtype=np.int64)
                    c2[_ZZ] = zz
                    blk = _M.T @ (c2.reshape(8, 8) * qt[tq]) @ _M + 128.0
                    y0 = (myi * vi + by) * 8
                    x0 = (mxi * hi + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
    out = []
    for cid, hi, vi, tq in comps:
        p = planes[cid]
        # crop to the component's own resolution, then replicate up
        cw = (iw * hi + hmax - 1) // hmax
        chh = (ih * vi + vmax - 1) // vmax
        p = p[:chh, :cw]
        if hi != hmax or vi != vmax:
            p = p.repeat(vmax // vi, axis=0).repeat(hmax // hi, axis=1)
        out.append(p[:ih, :iw])
    if len(out) == 1:
        gray = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)
        return iw, ih, 1, gray[:, :, None]
    y, cb, cr = out
    r = y + 2 * (1 - _KR) * (cr - 128.0)
    b = y + 2 * (1 - _KB) * (cb - 128.0)
    g = (y - _KR * r - _KB * b) / _KG  # the exact algebraic inverse
    rgb = np.stack([r, g, b], axis=2)
    return iw, ih, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    __slots__ = ("out", "acc", "cnt")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.cnt = 0

    def write(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | code
        self.cnt += nbits
        while self.cnt >= 8:
            self.cnt -= 8
            self.out.append((self.acc >> self.cnt) & 0xFF)
        self.acc &= (1 << self.cnt) - 1

    def pad(self) -> None:  # pad to a byte boundary with 1-bits (§B.1.1.5)
        if self.cnt:
            self.write((1 << (8 - self.cnt)) - 1, 8 - self.cnt)

    def take(self) -> bytes:
        self.pad()
        data = bytes(self.out)
        self.out = bytearray()
        return data


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc: int, th: int, counts, syms) -> bytes:
    return bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)


def _block_tokens(zz, pred: int) -> list:
    """One quantized zigzag block → (is_ac, symbol, extra_value,
    extra_len) tokens: the DC size category + difference bits, then the
    AC run/size pairs with ZRL and EOB (T.81 §F.1.2). Token streams
    feed both symbol-frequency counting (optimized tables) and bit
    emission, so the two passes cannot disagree."""
    toks = []
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    toks.append((0, s, (diff if diff >= 0 else diff + (1 << s) - 1) & ((1 << s) - 1), s))
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            toks.append((1, 0xF0, 0, 0))  # ZRL
            run -= 16
        s = int(abs(v)).bit_length()
        toks.append(
            (1, (run << 4) | s, (v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1), s)
        )
        run = 0
    if run:
        toks.append((1, 0x00, 0, 0))  # EOB
    return toks


def _optimized_code(freqs: dict[int, int]):
    """Frequency-optimal canonical Huffman for one table, with T.81's
    reserved-codeword construction: a pseudo-symbol of weight 1 joins
    the build, is guaranteed maximal depth (it loses every heap tie, so
    it sits in the first merge — Huffman merges are non-increasing in
    final depth), takes the all-ones codeword as the LAST canonical
    code, and is then dropped — so no real symbol ever codes as all 1s
    (§K.2's flow chart does the same). Returns (counts16, syms,
    {sym: (code, length)}), or None if any code would exceed 16 bits
    (caller falls back to the fixed-length tables)."""
    import heapq

    pseudo = -1
    depth = {sym: 0 for sym in freqs}
    depth[pseudo] = 0
    heap = [(f, i + 1, (sym,)) for i, (sym, f) in enumerate(sorted(freqs.items()))]
    heap.append((1, 0, (pseudo,)))  # tiebreak 0: merges first
    heapq.heapify(heap)
    nxt = len(heap) + 1
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, nxt, s1 + s2))
        nxt += 1
    if max(depth.values()) > 16:
        return None
    # canonical order: by (length, symbol), pseudo strictly last
    order = sorted(freqs, key=lambda s: (depth[s], s))
    order.append(pseudo)
    order.sort(key=lambda s: depth[s])  # stable: pseudo stays last per length
    assert order[-1] == pseudo
    counts = [0] * 16
    codes = {}
    prev_len = depth[order[0]]
    cur = 0
    for i, sym in enumerate(order):
        length = depth[sym]
        if i == 0:
            cur = 0
            prev_len = length
        else:
            cur += 1
            cur <<= length - prev_len
            prev_len = length
        if sym != pseudo:
            codes[sym] = (cur, length)
            counts[length - 1] += 1
    syms = [s for s in order if s != pseudo]
    return counts, syms, codes


def _pad_edge(p: np.ndarray, th: int, tw: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, th - h), (0, tw - w)), mode="edge")


def encode_jpeg(
    arr,
    quant=None,
    subsample: bool = False,
    restart_interval: int = 0,
    huffman: str = "fixed",
) -> bytes:
    """Encode an (h, w) gray or (h, w, 3) RGB uint8 array as a VALID
    baseline JPEG. quant=None uses all-ones tables (the exact-DC tier);
    pass an (8,8) array for real quantization. subsample=True writes
    4:2:0 (box-averaged chroma); restart_interval>0 emits DRI + RSTn
    markers every that many MCUs (exercises the decoder's restart
    path). huffman='optimized' builds frequency-optimal canonical
    tables per stream (the real-encoder '-optimize' mode) — its
    variable 1-16-bit codes exercise the decoder's generic canonical
    construction, which the fixed 4/8-bit tables alone never would;
    falls back to 'fixed' in the (pathological) case a code would
    exceed 16 bits."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg: 1 (gray) or 3 (RGB) channels only")
    q = (
        np.ones((8, 8), dtype=np.int64)
        if quant is None
        else np.asarray(quant, dtype=np.int64).reshape(8, 8)
    )
    if ch == 1:
        comps = [(1, 1, 1, a[:, :, 0].astype(np.float64))]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = _KR * r + _KG * g + _KB * b
        cb = 128.0 + (b - y) / (2 * (1 - _KB))
        cr = 128.0 + (r - y) / (2 * (1 - _KR))
        if subsample:
            he, we = h + (h & 1), w + (w & 1)
            cb2 = _pad_edge(cb, he, we).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr2 = _pad_edge(cr, he, we).reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            comps = [(1, 2, 2, y), (2, 1, 1, cb2), (3, 1, 1, cr2)]
        else:
            comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = (w + 8 * hmax - 1) // (8 * hmax)
    my = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {cid: _pad_edge(p, my * 8 * vi, mx * 8 * hi) for cid, hi, vi, p in comps}

    # tokenize the whole scan first (one restart segment per sublist) —
    # the same token stream drives frequency counting and bit emission
    token_segs: list[list] = [[]]
    pred = {c[0]: 0 for c in comps}
    for mi in range(mx * my):
        if restart_interval and mi and mi % restart_interval == 0:
            token_segs.append([])
            pred = {c[0]: 0 for c in comps}
        myi, mxi = divmod(mi, mx)
        cur = token_segs[-1]
        for cid, hi, vi, _p in comps:
            plane = planes[cid]
            for by in range(vi):
                for bx in range(hi):
                    y0 = (myi * vi + by) * 8
                    x0 = (mxi * hi + bx) * 8
                    zz = (
                        np.rint(
                            _M @ (plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0) @ _M.T / q
                        )
                        .astype(np.int64)
                        .reshape(64)[_ZZ]
                    )
                    cur.extend(_block_tokens(zz, pred[cid]))
                    pred[cid] = int(zz[0])

    dc_code, ac_code = _DC_CODE, _AC_CODE
    dc_tbl = (3 * [0] + [12] + 12 * [0], _DC_SYMS)  # 12 codes, all length 4
    ac_tbl = (7 * [0] + [162] + 8 * [0], _AC_SYMS)  # 162 codes, all length 8
    if huffman == "optimized":
        dc_f: dict[int, int] = {}
        ac_f: dict[int, int] = {}
        for seg in token_segs:
            for is_ac, sym, _ev, _el in seg:
                tgt = ac_f if is_ac else dc_f
                tgt[sym] = tgt.get(sym, 0) + 1
        opt_dc, opt_ac = _optimized_code(dc_f), _optimized_code(ac_f)
        if opt_dc is not None and opt_ac is not None:
            dc_tbl, dc_code = (opt_dc[0], opt_dc[1]), opt_dc[2]
            ac_tbl, ac_code = (opt_ac[0], opt_ac[1]), opt_ac[2]
    elif huffman != "fixed":
        raise ValueError("encode_jpeg: huffman must be 'fixed' or 'optimized'")

    zzq = q.reshape(64)[_ZZ].astype(np.uint8)  # DQT carries zigzag order
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + zzq.tobytes())
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hi, vi, _p in comps:
        sof += bytes([cid, (hi << 4) | vi, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, _dht_body(0, 0, *dc_tbl))
    out += _seg(0xC4, _dht_body(1, 0, *ac_tbl))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    out += _seg(0xDA, sos + bytes([0, 63, 0]))

    bw = _BitWriter()
    rst = 0
    for si, seg in enumerate(token_segs):
        if si:
            out += bw.take().replace(b"\xff", b"\xff\x00")
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        for is_ac, sym, ev, el in seg:
            code, nb = (ac_code if is_ac else dc_code)[sym]
            bw.write(code, nb)
            if el:
                bw.write(ev, el)
    out += bw.take().replace(b"\xff", b"\xff\x00")
    out += b"\xff\xd9"
    return bytes(out)
