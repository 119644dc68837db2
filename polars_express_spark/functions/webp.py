"""WebP lossless (VP8L) codec subset in pure Python + numpy (r14).

The third ENTROPY-CODED image tier after PNG (DEFLATE) and JPEG
(Huffman+DCT), from the public WebP Lossless Bitstream Specification
(RFC 9649): VP8L's prefix-code machinery is deflate-adjacent but
2-D — canonical prefix codes whose code lengths are themselves
prefix-coded (RLE symbols 16/17/18), a 2-D LZ77 whose short distances
map through a neighbor table, and an optional color cache keyed by a
multiplicative hash. Everything implemented here is round-trip- and
hand-golden-tested; the parts of the format whose exact constants
cannot be independently verified in this environment are explicitly
OUT OF ENVELOPE and return None rather than risk wrong pixels:

Decoder (`parse_webp`) envelope:
- RIFF/WEBP container with a VP8L chunk, bare or inside a VP8X
  extended container (still images; `parse_webp_frames` composites
  ANIMATED VP8X files per the container spec's ANIM/ANMF model —
  2-pixel-unit frame offsets, no-blend vs straight-alpha blending,
  dispose-to-background). Lossy VP8 image data returns None — a
  different codec;
- prefix codes in both spellings: "simple" (1-2 symbols) and
  length-coded (code-length code, RLE 16/17/18, optional max-symbol
  shortcut), including the spec's empty-code and single-symbol
  0-bit special cases;
- literals, color-cache hits, and LZ77 backrefs at any length and
  distance (both plain codes > 120 and the 120 neighbor-mapped
  codes — see _DIST_MAP below for its provenance);
- meta-prefix (multiple code groups selected by an entropy-coded
  meta image);
- ALL FOUR transforms (r14 second pass — the full VP8L transform
  set): SUBTRACT_GREEN; COLOR_INDEXING incl. sub-byte pixel bundling
  at palette sizes <= 16; PREDICTOR (all 14 modes with the spec's
  edge rules — top row is L, left column is T, (0,0) is opaque
  black, and the TR neighbor of a rightmost-column pixel wraps to
  the leftmost pixel of the current row, which flat scan-order
  addressing gives for free; Select's tie goes to TOP, and
  ClampAddSubtractHalf divides toward zero like C); and COLOR
  (cross-channel 3.5-fixed-point int8 deltas, arithmetic shift,
  red_to_blue applied to the RECONSTRUCTED red). Each transform
  records the image width current at its read point so its inverse
  runs in the matching domain when chained with color indexing.
  Verified by in-test spec-text FORWARD transformers (independent
  per-channel re-derivations, not calls into this module) driving
  hand-assembled streams through all 14 predictor modes and signed
  color factors, plus scalar hand goldens for the tie-break and
  truncation rules. This makes the decode envelope full VP8L; what
  still returns None is lossy VP8 image data (a different codec)
  plus corrupt streams.

Encoder (`encode_webp`): always-valid literal streams — per-channel
canonical prefix codes (depth-capped with a Kraft completion pass)
serialized through the code-length code, "simple" codes where a
channel is near-constant, optional distance-1 run backrefs (exercising
the LZ77 decode path), optional SUBTRACT_GREEN and single-mode
PREDICTOR transforms, no cache. Lossless in every combination, so
decode∘encode = id is exact. `encode_webp_anim` muxes the animated
container (VP8X + ANIM + per-frame ANMF wrapping VP8L chunks).

Reference: the reference engine exposes no image codec at all
(reference src/main.rs:106-121 serves tabular endpoints only); this
tier exists so Spark-side multimodal plumbing exercises real decoded
pixels across a third entropy-coder family.
"""

from __future__ import annotations

import struct

import numpy as np


class _LsbReader:
    """LSB-first bit reader (VP8L convention — opposite of FLAC's)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bits(self, n: int):
        while self.nbits < n:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        val = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return val


class _LsbWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, val: int, n: int):
        self.acc |= (val & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _Prefix:
    """Canonical prefix code: decode one symbol by walking bits
    (decoder reads code MSB-first: code = code<<1 | next stream bit).
    ``special`` marks the 0-bit codes (empty / single-symbol)."""

    __slots__ = ("table", "special", "maxlen")

    def __init__(self, lengths):
        used = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not used:
            self.special = 0  # empty code: always symbol 0, 0 bits
            self.table = None
            self.maxlen = 0
            return
        if len(used) == 1:
            self.special = used[0][1]  # single symbol, 0 bits
            self.table = None
            self.maxlen = 0
            return
        # completeness (Kraft == 1) — an over- or under-subscribed
        # code is corruption
        if sum(1 << (15 - l) for l, _ in used) != 1 << 15:
            raise ValueError("incomplete prefix code")
        self.special = None
        code = 0
        prev_len = 0
        table = {}
        for l, s in sorted(used):
            code <<= l - prev_len
            table[(l, code)] = s
            code += 1
            prev_len = l
        self.table = table
        self.maxlen = max(l for l, _ in used)

    def read(self, r: _LsbReader):
        if self.special is not None:
            return self.special
        code = 0
        for l in range(1, self.maxlen + 1):
            b = r.bits(1)
            if b is None:
                return None
            code = (code << 1) | b
            if (l, code) in self.table:
                return self.table[(l, code)]
        return None  # no codeword matched: corrupt


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


def _read_prefix_code(r: _LsbReader, alphabet: int):
    """One prefix code: 'simple' (1-2 symbols) or length-coded."""
    simple = r.bits(1)
    if simple is None:
        return None
    if simple:
        n_sym = r.bits(1)
        if n_sym is None:
            return None
        first_8bit = r.bits(1)
        if first_8bit is None:
            return None
        s0 = r.bits(8 if first_8bit else 1)
        if s0 is None or s0 >= alphabet:
            return None
        lengths = [0] * alphabet
        if n_sym:
            s1 = r.bits(8)
            if s1 is None or s1 >= alphabet or s1 == s0:
                return None
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        try:
            return _Prefix(lengths)
        except ValueError:
            return None
    n_cl = r.bits(4)
    if n_cl is None:
        return None
    n_cl += 4
    cl_lengths = [0] * 19
    for i in range(n_cl):
        v = r.bits(3)
        if v is None:
            return None
        cl_lengths[_CL_ORDER[i]] = v
    try:
        cl_code = _Prefix(cl_lengths)
    except ValueError:
        return None
    use_max = r.bits(1)
    if use_max is None:
        return None
    if use_max:
        nb = r.bits(3)
        if nb is None:
            return None
        length_nbits = 2 + 2 * nb
        ms = r.bits(length_nbits)
        if ms is None:
            return None
        max_symbol = 2 + ms
        if max_symbol > alphabet:
            return None
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8  # spec: initial previous length for code 16
    i = 0
    budget = max_symbol
    while i < alphabet and budget > 0:
        sym = cl_code.read(r)
        if sym is None:
            return None
        budget -= 1
        if sym < 16:
            lengths[i] = sym
            if sym:
                prev = sym
            i += 1
        elif sym == 16:
            rep = r.bits(2)
            if rep is None:
                return None
            rep += 3
            if i + rep > alphabet:
                return None
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif sym == 17:
            rep = r.bits(3)
            if rep is None:
                return None
            rep += 3
            if i + rep > alphabet:
                return None
            i += rep
        else:  # 18
            rep = r.bits(7)
            if rep is None:
                return None
            rep += 11
            if i + rep > alphabet:
                return None
            i += rep
    try:
        return _Prefix(lengths)
    except ValueError:
        return None


def _dist_map():
    """The 120-entry short-distance neighbor map. The spec orders the
    codes over the (dx, dy) window dy in 0..7 / dx in -7..8 (dy > 0,
    or dy == 0 and dx > 0) by increasing Euclidean distance, larger
    dy first within a tie, positive dx before negative at the same
    |dx| — this generation rule reproduces the spec's printed table
    for every entry that could be cross-checked by eye; no reference
    decoder exists in this environment for a byte-level cross-check,
    which is one reason the predictor transform (where errors would
    be silent) stays gated while this map (exercised by round-trip
    backrefs) does not."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -1 if p[0] > 0 else 1, abs(p[0])))
    return cands[:120]


_DIST_MAP = _dist_map()


def _prefix_decode_value(r: _LsbReader, code: int):
    """LZ77 length/distance prefix coding: code 0-3 → value code+1;
    else (extra = (code-2)>>1) more bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    e = r.bits(extra)
    if e is None:
        return None
    return offset + e + 1


def _prefix_encode_value(value: int):
    """Inverse of _prefix_decode_value: value → (code, extra_bits, n_extra)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, v - offset, extra


def _cache_hash(argb: int, bits: int) -> int:
    return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - bits)


def _decode_entropy_image(r: _LsbReader, w: int, h: int, level0: bool):
    """One spatially-coded image → ndarray[h*w] of uint32 ARGB, plus
    the transform list when level0. Returns None on corruption or on
    an out-of-envelope transform."""
    transforms = []
    if level0:
        seen = set()
        while True:
            t = r.bits(1)
            if t is None:
                return None
            if not t:
                break
            ttype = r.bits(2)
            if ttype is None or ttype in seen:
                return None
            seen.add(ttype)
            if ttype == 2:  # SUBTRACT_GREEN: no payload
                transforms.append(("subtract_green",))
            elif ttype == 3:  # COLOR_INDEXING
                n = r.bits(8)
                if n is None:
                    return None
                n += 1
                sub = _decode_entropy_image(r, n, 1, False)
                if sub is None:
                    return None
                pal = sub[0].astype(np.uint32)
                # palette entries are delta-coded per channel mod 256
                out = np.zeros_like(pal)
                prev = 0
                for i in range(n):
                    cur = 0
                    for shift in (24, 16, 8, 0):
                        a = (pal[i] >> shift) & 0xFF
                        b = (prev >> shift) & 0xFF
                        cur |= ((a + b) & 0xFF) << shift
                    out[i] = cur
                    prev = int(cur)
                if n <= 2:
                    wbits = 3
                elif n <= 4:
                    wbits = 2
                elif n <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("color_indexing", out, wbits, w))
                if wbits:
                    w = (w + (1 << wbits) - 1) >> wbits
            else:
                # PREDICTOR (0) / COLOR (1): a per-block mode/element
                # sub-image at 1<<(3 bits + 2) granularity, read with
                # the width CURRENT at this point in the transform
                # chain (a color-indexing transform read earlier
                # shrinks it) — record that width so the inverse runs
                # in the matching domain.
                sb = r.bits(3)
                if sb is None:
                    return None
                size_bits = sb + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub = _decode_entropy_image(r, bw, bh, False)
                if sub is None:
                    return None
                if ttype == 0:
                    modes = ((sub >> 8) & 0xFF).astype(np.int64)
                    if modes.max() > 13:
                        return None  # spec: predictor modes are 0..13
                    transforms.append(("predictor", modes, size_bits, w))
                else:
                    transforms.append(
                        ("color", sub.astype(np.uint32), size_bits, w)
                    )
    cache_bits = 0
    has_cache = r.bits(1)
    if has_cache is None:
        return None
    if has_cache:
        cache_bits = r.bits(4)
        if cache_bits is None or not 1 <= cache_bits <= 11:
            return None
    n_groups = 1
    meta = None
    meta_bits = 0
    if level0:
        has_meta = r.bits(1)
        if has_meta is None:
            return None
        if has_meta:
            mb = r.bits(3)
            if mb is None:
                return None
            meta_bits = mb + 2
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            sub = _decode_entropy_image(r, mw, mh, False)
            if sub is None:
                return None
            # meta id = (red << 8) | green of the sub-image pixel
            meta = (
                ((sub >> 16) & 0xFF) << 8 | ((sub >> 8) & 0xFF)
            ).astype(np.int64)
            n_groups = int(meta.max()) + 1
    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(n_groups):
        codes = []
        for alphabet in (green_alpha, 256, 256, 256, 40):
            c = _read_prefix_code(r, alphabet)
            if c is None:
                return None
            codes.append(c)
        groups.append(codes)
    n_px = w * h
    if n_px > (1 << 26):
        return None
    out = np.zeros(n_px, dtype=np.uint32)
    cache = [0] * (1 << cache_bits) if cache_bits else None
    px = 0
    while px < n_px:
        if meta is not None:
            x, y = px % w, px // w
            g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
        else:
            g = groups[0]
        s = g[0].read(r)
        if s is None:
            return None
        if s < 256:
            red = g[1].read(r)
            blue = g[2].read(r)
            alpha = g[3].read(r)
            if None in (red, blue, alpha):
                return None
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[px] = argb
            if cache is not None:
                cache[_cache_hash(argb, cache_bits)] = argb
            px += 1
        elif s < 280:
            length = _prefix_decode_value(r, s - 256)
            if length is None:
                return None
            dcode_sym = g[4].read(r)
            if dcode_sym is None:
                return None
            dcode = _prefix_decode_value(r, dcode_sym)
            if dcode is None:
                return None
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > px or px + length > n_px:
                return None  # backref before start / past end
            for _ in range(length):
                argb = int(out[px - dist])
                out[px] = argb
                if cache is not None:
                    cache[_cache_hash(argb, cache_bits)] = argb
                px += 1
        else:
            if cache is None:
                return None
            idx = s - 280
            argb = cache[idx]
            out[px] = argb
            px += 1
    if level0:
        return out, w, transforms
    return out.reshape(h, w)


def _avg2(a: int, b: int) -> int:
    """Per-channel Average2 on packed ARGB (spec: (a + b) / 2 per
    channel, floor): mask out the low bit of each channel before the
    shift so no channel borrows from its neighbor, then add back the
    carry bits both operands share."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_subtract_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_subtract_half(avg: int, tl: int) -> int:
    # spec: Clamp(a + (a - b) / 2) with C int division — truncation
    # TOWARD ZERO, which differs from Python's floor for negatives
    out = 0
    for shift in (24, 16, 8, 0):
        a = (avg >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= max(0, min(255, v)) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    # spec Select(): per-channel estimate p_c = L_c + T_c - TL_c, then
    # Manhattan distance of L and T to the estimate; left wins only
    # STRICTLY (pL < pT), so ties go to TOP. (Equivalent form: the
    # per-channel |p-L| collapses to |T-TL| and |p-T| to |L-TL|, which
    # is how the distances are usually written.)
    p_l = 0
    p_t = 0
    for shift in (24, 16, 8, 0):
        lc = (l >> shift) & 0xFF
        tc = (t >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        pc = lc + tc - tlc
        p_l += abs(pc - lc)
        p_t += abs(pc - tc)
    return l if p_l < p_t else t


def _predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_subtract_full(l, t, tl)
    return _clamp_add_subtract_half(_avg2(l, t), tl)  # mode 13


def _inverse_predictor(res, w: int, h: int, modes, size_bits: int):
    """Inverse predictor transform: reconstructed = (residual +
    prediction) mod 256 per channel, scan order, predictions from
    already-reconstructed neighbors. Spec edge rules: (0,0) is
    mode 0 (0xff000000); the rest of the top row is L; the leftmost
    column is T; and the TR neighbor of a rightmost-column pixel is
    the LEFTMOST pixel of the CURRENT row — which in flat scan-order
    addressing is exactly rec[p - w + 1], so no special case."""
    rec = np.zeros_like(res)
    for y in range(h):
        row_mode = modes[y >> size_bits]
        for x in range(w):
            p = y * w + x
            if y == 0:
                pred = 0xFF000000 if x == 0 else int(rec[p - 1])
            elif x == 0:
                pred = int(rec[p - w])
            else:
                pred = _predict(
                    int(row_mode[x >> size_bits]),
                    int(rec[p - 1]), int(rec[p - w]),
                    int(rec[p - w - 1]), int(rec[p - w + 1]),
                )
            v = int(res[p])
            rec[p] = (
                (((v >> 24 & 0xFF) + (pred >> 24 & 0xFF)) & 0xFF) << 24
                | (((v >> 16 & 0xFF) + (pred >> 16 & 0xFF)) & 0xFF) << 16
                | (((v >> 8 & 0xFF) + (pred >> 8 & 0xFF)) & 0xFF) << 8
                | ((v & 0xFF) + (pred & 0xFF)) & 0xFF
            )
    return rec


def _i8(v: int) -> int:
    """Reinterpret a byte as a two's-complement int8."""
    return v - 256 if v >= 128 else v


def _inverse_color(flat, w: int, h: int, ctes, size_bits: int):
    """Inverse color (cross-channel decorrelation) transform. Each
    block's ColorTransformElement rides the sub-image pixel as
    green_to_red = BLUE, green_to_blue = GREEN, red_to_blue = RED;
    deltas are (int8 factor * int8 channel) >> 5 — a signed
    3.5-fixed-point product with an ARITHMETIC shift (Python's >> on
    negative ints matches) — and red_to_blue uses the RECONSTRUCTED
    red, re-narrowed to int8."""
    out = np.zeros_like(flat)
    for y in range(h):
        row_cte = ctes[y >> size_bits]
        for x in range(w):
            p = y * w + x
            v = int(flat[p])
            cte = int(row_cte[x >> size_bits])
            g2r = _i8(cte & 0xFF)
            g2b = _i8((cte >> 8) & 0xFF)
            r2b = _i8((cte >> 16) & 0xFF)
            g = _i8((v >> 8) & 0xFF)
            tmp_red = ((v >> 16) & 0xFF) + ((g2r * g) >> 5)
            tmp_blue = (v & 0xFF) + ((g2b * g) >> 5)
            tmp_blue += (r2b * _i8(tmp_red & 0xFF)) >> 5
            out[p] = (
                (v & 0xFF00FF00)
                | (tmp_red & 0xFF) << 16
                | (tmp_blue & 0xFF)
            )
    return out


def _riff_chunks(payload: bytes, pos: int):
    """Walk RIFF sub-chunks from ``pos``: yields (fourcc, chunk
    payload). Stops (without raising) at the first malformed header
    or a chunk running past the buffer."""
    n = len(payload)
    while pos + 8 <= n:
        four = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > n:
            return
        yield four, payload[pos + 8 : body_end]
        pos = body_end + (size & 1)  # RIFF chunks pad to even offsets


def parse_webp(payload: bytes):
    """Decode a lossless WebP payload within the documented envelope:
    returns (width, height, 4, ndarray[h, w, 4] RGBA) or None (module
    docstring lists the envelope and the None cases). Accepts both the
    simple container (a bare VP8L chunk) and a VP8X extended container
    whose still image is a VP8L chunk with matching canvas dims;
    animated VP8X files go through parse_webp_frames instead, and
    lossy VP8 image data returns None."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        return None
    if payload[12:16] == b"VP8X":
        (xsize,) = struct.unpack_from("<I", payload, 16)
        if xsize < 10 or 20 + xsize > len(payload):
            return None
        flags = payload[20]
        if flags & 0x02:
            return None  # animated: frames, not a still — see _frames
        cw = int.from_bytes(payload[24:27], "little") + 1
        chh = int.from_bytes(payload[27:30], "little") + 1
        for four, body in _riff_chunks(payload, 20 + xsize + (xsize & 1)):
            if four == b"VP8L":
                got = _decode_vp8l_stream(body)
                if got is None:
                    return None
                w, h, arr = got
                if (w, h) != (cw, chh):
                    return None  # canvas/stream dim mismatch: corrupt
                return w, h, 4, arr
            if four == b"VP8 ":
                return None  # lossy still: different codec
        return None
    if payload[12:16] != b"VP8L":
        return None  # bare lossy VP8: different codec
    (csize,) = struct.unpack_from("<I", payload, 16)
    if 20 + csize > len(payload):
        return None
    got = _decode_vp8l_stream(payload[20 : 20 + csize])
    if got is None:
        return None
    w, h, arr = got
    return w, h, 4, arr


def _decode_vp8l_stream(data: bytes):
    """Decode one bare VP8L stream (the payload of a 'VP8L' chunk):
    (w, h, ndarray[h, w, 4] RGBA) or None."""
    if not data or data[0] != 0x2F:
        return None
    r = _LsbReader(data[1:])
    wm1 = r.bits(14)
    hm1 = r.bits(14)
    alpha_hint = r.bits(1)
    version = r.bits(3)
    if None in (wm1, hm1, alpha_hint, version) or version != 0:
        return None
    w, h = wm1 + 1, hm1 + 1
    if w * h > (1 << 26):
        return None
    res = _decode_entropy_image(r, w, h, True)
    if res is None:
        return None
    out, coded_w, transforms = res
    # apply inverse transforms in reverse reading order; each runs in
    # the domain whose width was current when IT was read (cw tracks
    # the running width — only color indexing changes it)
    cw = coded_w
    for t in reversed(transforms):
        if t[0] == "subtract_green":
            g = (out >> 8) & 0xFF
            red = (((out >> 16) & 0xFF) + g) & 0xFF
            blue = ((out & 0xFF) + g) & 0xFF
            out = (out & 0xFF00FF00) | (red << 16) | blue
        elif t[0] == "predictor":
            _, modes, size_bits, w_t = t
            if cw != w_t:
                return None  # transform chain widths inconsistent
            out = _inverse_predictor(out, w_t, h, modes, size_bits)
        elif t[0] == "color":
            _, ctes, size_bits, w_t = t
            if cw != w_t:
                return None
            out = _inverse_color(out, w_t, h, ctes, size_bits)
        else:  # color_indexing
            _, pal, wbits, w_t = t
            if wbits:
                packed = out.reshape(h, cw)
                per = 1 << wbits
                ibits = 8 >> wbits
                idx = np.zeros((h, cw * per), dtype=np.int64)
                green = (packed >> 8) & 0xFF
                for k in range(per):
                    idx[:, k::per] = (green >> (k * ibits)) & ((1 << ibits) - 1)
                idx = idx[:, :w_t].reshape(-1)
            else:
                idx = ((out >> 8) & 0xFF).astype(np.int64)
            if idx.max() >= len(pal):
                return None  # index beyond the palette
            out = pal[idx]
            cw = w_t
    if cw != w:
        return None  # a bundled image never unbundled back to w
    arr = np.empty((h, w, 4), dtype="u1")
    flat = out.reshape(h, w)
    arr[:, :, 0] = (flat >> 16) & 0xFF
    arr[:, :, 1] = (flat >> 8) & 0xFF
    arr[:, :, 2] = flat & 0xFF
    arr[:, :, 3] = (flat >> 24) & 0xFF
    return w, h, arr


def _canonical_lengths(freqs, max_len: int):
    """Huffman code lengths from symbol frequencies, depth-capped at
    ``max_len`` with a Kraft completion fix-up (the classic adjust:
    overlong leaves are raised, then the budget re-spent bottom-up)."""
    syms = [s for s, f in enumerate(freqs) if f > 0]
    if len(syms) <= 1:
        return None  # callers use a simple code instead
    import heapq

    heap = [(freqs[s], s, ("leaf", s)) for s in syms]
    heapq.heapify(heap)
    tick = len(freqs)
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, tick, ("node", n1, n2)))
        tick += 1
    lengths = [0] * len(freqs)

    def walk(node, depth):
        if node[0] == "leaf":
            lengths[node[1]] = max(1, depth)
        else:
            walk(node[1], depth + 1)
            walk(node[2], depth + 1)

    walk(heap[0][2], 0)
    if max(lengths) > max_len:
        # depth cap exceeded (needs Fibonacci-grade frequency skew —
        # thousands of pixels — so compression quality is irrelevant
        # here): fall back to the balanced complete code over the m
        # used symbols — (2^L - m) symbols at L-1 bits, the rest at L,
        # whose Kraft sum is exactly 1 by construction
        m = len(syms)
        L = (m - 1).bit_length()
        lengths = [0] * len(freqs)
        n_short = (1 << L) - m
        for idx, s in enumerate(sorted(syms)):
            lengths[s] = L - 1 if idx < n_short else L
    return lengths


def _canonical_codes(lengths):
    codes = {}
    code = 0
    prev = 0
    for l, s in sorted((l, s) for s, l in enumerate(lengths) if l > 0):
        code <<= l - prev
        codes[s] = (code, l)
        code += 1
        prev = l
    return codes


def _write_symbol(wtr: _LsbWriter, codes, sym):
    code, l = codes[sym]
    for i in range(l - 1, -1, -1):  # codeword MSB first
        wtr.bits((code >> i) & 1, 1)


def _write_prefix_code(wtr: _LsbWriter, lengths):
    """Serialize one prefix code: simple form for <=2 used symbols,
    else the code-length-coded form (RLE 16/17/18, no max-symbol)."""
    used = [s for s, l in enumerate(lengths) if l > 0]
    if len(used) <= 2 and all(s < 256 for s in used) and used:
        wtr.bits(1, 1)  # simple
        wtr.bits(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            wtr.bits(0, 1)  # 1-bit first symbol
            wtr.bits(used[0], 1)
        else:
            wtr.bits(1, 1)
            wtr.bits(used[0], 8)
        if len(used) == 2:
            wtr.bits(used[1], 8)
        return
    # code-length sequence with zero-run RLE; the reader fills the
    # WHOLE alphabet (no max-symbol shortcut written), so trailing
    # zeros are run-length coded through the end too
    seq = []
    i, n = 0, len(lengths)
    last_nonzero = n - 1
    while i <= last_nonzero:
        l = lengths[i]
        if l == 0:
            j = i
            while j <= last_nonzero and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                seq.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                seq.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                seq.append((0, None, 0))
            i = j
        else:
            seq.append((l, None, 0))
            i += 1
    cl_freq = [0] * 19
    for sym, _, _ in seq:
        cl_freq[sym] += 1
    cl_lengths = _canonical_lengths(cl_freq, 7)
    if cl_lengths is None:
        # single distinct cl symbol: make the code trivially complete
        # by giving the (unused) symbol 0 or 1 a codeword too
        only = next(s for s, f in enumerate(cl_freq) if f > 0)
        other = 0 if only != 0 else 1
        cl_lengths = [0] * 19
        cl_lengths[only] = 1
        cl_lengths[other] = 1
    wtr.bits(0, 1)  # not simple
    n_cl = max(i for i, s in enumerate(_CL_ORDER) if cl_lengths[s] > 0) + 1
    n_cl = max(n_cl, 4)
    wtr.bits(n_cl - 4, 4)
    for i in range(n_cl):
        wtr.bits(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    wtr.bits(0, 1)  # no max-symbol shortcut
    for sym, extra, nbits in seq:
        _write_symbol(wtr, cl_codes, sym)
        if nbits:
            wtr.bits(extra, nbits)


def _write_simple_code(wtr, syms) -> None:
    """Write a 'simple' prefix code (1 or 2 symbols, 8-bit spelling)."""
    wtr.bits(1, 1)  # simple-code flag
    wtr.bits(len(syms) - 1, 1)
    wtr.bits(1, 1)  # first symbol stored in 8 bits
    wtr.bits(syms[0], 8)
    if len(syms) == 2:
        wtr.bits(syms[1], 8)


def encode_webp(
    arr,
    use_backrefs: bool = False,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
) -> bytes:
    """Encode an (h, w, 3|4) uint8 raster as lossless WebP (VP8L):
    literal stream with per-channel canonical prefix codes, optional
    distance-1 run backrefs (plain distance code 121) when
    ``use_backrefs`` — exercising the decoder's LZ77 path —
    optionally the SUBTRACT_GREEN transform (red/blue stored as
    mod-256 deltas against green, the cheapest real decorrelation),
    and optionally a single-mode PREDICTOR transform (one whole-image
    block; residuals = pixel - _predict(...) mod 256 per channel, the
    exact inverse of _inverse_predictor, with the same spec edge
    rules); no cache, no meta image. Lossless in every combination.
    When both transforms are requested the predictor is written FIRST
    (read order [predictor, subtract_green] → the decoder undoes
    subtract-green first), so subtract-green is applied to the
    residual stream here."""
    arr = np.asarray(arr, dtype="u1")
    h, w, ch = arr.shape
    if ch == 3:
        rgba = np.dstack([arr, np.full((h, w), 255, "u1")])
    elif ch == 4:
        rgba = arr
    else:
        raise ValueError("WebP carries 3 or 4 channels")
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError("predictor modes are 0..13")
        packed = (
            rgba[:, :, 3].astype(np.uint32) << 24
            | rgba[:, :, 0].astype(np.uint32) << 16
            | rgba[:, :, 1].astype(np.uint32) << 8
            | rgba[:, :, 2].astype(np.uint32)
        ).reshape(-1)
        res = np.zeros_like(packed)
        for y in range(h):
            for x in range(w):
                p = y * w + x
                if y == 0:
                    pred = 0xFF000000 if x == 0 else int(packed[p - 1])
                elif x == 0:
                    pred = int(packed[p - w])
                else:
                    pred = _predict(
                        predictor_mode,
                        int(packed[p - 1]), int(packed[p - w]),
                        int(packed[p - w - 1]), int(packed[p - w + 1]),
                    )
                v = int(packed[p])
                res[p] = (
                    (((v >> 24 & 0xFF) - (pred >> 24 & 0xFF)) & 0xFF) << 24
                    | (((v >> 16 & 0xFF) - (pred >> 16 & 0xFF)) & 0xFF) << 16
                    | (((v >> 8 & 0xFF) - (pred >> 8 & 0xFF)) & 0xFF) << 8
                    | ((v & 0xFF) - (pred & 0xFF)) & 0xFF
                )
        res = res.reshape(h, w)
        rgba = np.dstack([
            ((res >> 16) & 0xFF).astype("u1"),
            ((res >> 8) & 0xFF).astype("u1"),
            (res & 0xFF).astype("u1"),
            ((res >> 24) & 0xFF).astype("u1"),
        ])
    if subtract_green:
        g = rgba[:, :, 1]
        rgba = np.dstack([
            rgba[:, :, 0] - g, g, rgba[:, :, 2] - g, rgba[:, :, 3]
        ])  # uint8 arithmetic wraps mod 256, matching the spec
    flat = rgba.reshape(-1, 4)
    n = flat.shape[0]
    # tokenize: literals + optional runs of the previous pixel
    tokens = []  # ("lit", idx) | ("run", length)
    i = 0
    while i < n:
        if (
            use_backrefs
            and i > 0
            and np.array_equal(flat[i], flat[i - 1])
        ):
            j = i
            while j < n and np.array_equal(flat[j], flat[i - 1]):
                j += 1
            tokens.append(("run", j - i))
            i = j
        else:
            tokens.append(("lit", i))
            i += 1
    green_freq = [0] * 280
    chan_freq = [[0] * 256 for _ in range(3)]  # red, blue, alpha
    dist_freq = [0] * 40
    for kind, v in tokens:
        if kind == "lit":
            r_, g_, b_, a_ = (int(x) for x in flat[v])
            green_freq[g_] += 1
            chan_freq[0][r_] += 1
            chan_freq[1][b_] += 1
            chan_freq[2][a_] += 1
        else:
            code, _, _ = _prefix_encode_value(v)
            green_freq[256 + code] += 1
            dcode, _, _ = _prefix_encode_value(121)  # plain distance 1
            dist_freq[dcode] += 1

    def lengths_for(freqs, alphabet):
        ls = _canonical_lengths(freqs, 15)
        if ls is None:
            ls = [0] * alphabet
            used = [s for s, f in enumerate(freqs) if f > 0]
            if not used:
                used = [0]
            ls[used[0]] = 1  # simple form handles 1-symbol codes
        return ls

    green_l = lengths_for(green_freq, 280)
    chan_l = [lengths_for(f, 256) for f in chan_freq]
    dist_l = lengths_for(dist_freq, 40)

    wtr = _LsbWriter()
    wtr.bits(w - 1, 14)
    wtr.bits(h - 1, 14)
    wtr.bits(1 if ch == 4 else 0, 1)  # alpha hint
    wtr.bits(0, 3)  # version
    if predictor_mode is not None:
        wtr.bits(1, 1)  # transform present
        wtr.bits(0, 2)  # PREDICTOR
        wtr.bits(7, 3)  # size_bits = 9 -> 512px blocks, all same mode
        # mode sub-image: every pixel is 0-bit single-symbol codes,
        # so ANY block count costs nothing beyond the code headers
        wtr.bits(0, 1)  # sub-image: no color cache
        for syms in ([predictor_mode], [0], [0], [255], [0]):
            _write_simple_code(wtr, syms)
    if subtract_green:
        wtr.bits(1, 1)  # transform present
        wtr.bits(2, 2)  # SUBTRACT_GREEN (no payload)
    wtr.bits(0, 1)  # no more transforms
    wtr.bits(0, 1)  # no color cache
    wtr.bits(0, 1)  # no meta prefix image
    for ls in (green_l, chan_l[0], chan_l[1], chan_l[2], dist_l):
        _write_prefix_code(wtr, ls)
    green_c = _canonical_codes(green_l)
    chan_c = [_canonical_codes(l) for l in chan_l]
    dist_c = _canonical_codes(dist_l)

    def emit(codes, sym):
        if len(codes) == 1:
            return  # single-symbol code: 0 bits
        _write_symbol(wtr, codes, sym)

    for kind, v in tokens:
        if kind == "lit":
            r_, g_, b_, a_ = (int(x) for x in flat[v])
            emit(green_c, g_)
            emit(chan_c[0], r_)
            emit(chan_c[1], b_)
            emit(chan_c[2], a_)
        else:
            code, extra, nbits = _prefix_encode_value(v)
            emit(green_c, 256 + code)
            if nbits:
                wtr.bits(extra, nbits)
            dcode, dextra, dnbits = _prefix_encode_value(121)
            emit(dist_c, dcode)
            if dnbits:
                wtr.bits(dextra, dnbits)
    body = b"\x2f" + wtr.finish()
    vp8l = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        vp8l += b"\x00"  # RIFF chunks pad to even size
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def parse_webp_frames(payload: bytes):
    """Composite an ANIMATED WebP (VP8X + ANIM/ANMF, RFC 9649 §2.5.2)
    whose frames are VP8L chunks: returns (canvas_w, canvas_h,
    [ndarray[ch, cw, 4] RGBA canvas snapshot per frame]) or None.

    Spec model implemented: the canvas starts filled with the ANIM
    chunk's background color (stored [B, G, R, A]); each ANMF places
    its frame at (2*Frame X, 2*Frame Y) — offsets are stored in units
    of TWO pixels — either overwriting the rect (blending bit B set =
    do not blend) or alpha-compositing over it with the spec's
    straight-alpha formula; after a frame is shown, disposal bit D
    fills ITS rect back to the background color. Mid-range alpha
    blending follows the spec's real-number formula evaluated in
    float64 and rounded half-to-even to uint8 (the spec does not pin
    integer rounding; 0/255 alphas — the exact copy/keep cases — are
    integer-exact either way). Frames carrying lossy VP8 data, frames
    out of canvas bounds, and dimension-mismatched frame streams
    return None — never invented pixels."""
    if len(payload) < 30 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        return None
    if payload[12:16] != b"VP8X":
        return None
    (xsize,) = struct.unpack_from("<I", payload, 16)
    if xsize < 10 or 20 + xsize > len(payload):
        return None
    if not payload[20] & 0x02:
        return None  # animation flag not set: a still, use parse_webp
    cw = int.from_bytes(payload[24:27], "little") + 1
    ch = int.from_bytes(payload[27:30], "little") + 1
    if cw * ch > (1 << 26):
        return None
    bg = None
    canvases = []
    canvas = None
    for four, body in _riff_chunks(payload, 20 + xsize + (xsize & 1)):
        if four == b"ANIM":
            if len(body) < 6:
                return None
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg = np.array([r_, g_, b_, a_], dtype="u1")
            canvas = np.broadcast_to(bg, (ch, cw, 4)).copy()
        elif four == b"ANMF":
            if canvas is None or len(body) < 16:
                return None  # ANMF before ANIM: malformed
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            if fx + fw > cw or fy + fh > ch:
                return None  # frame rect outside the canvas
            frame = None
            for ffour, fbody in _riff_chunks(body, 16):
                if ffour == b"VP8L":
                    got = _decode_vp8l_stream(fbody)
                    if got is None:
                        return None
                    w, h, arr = got
                    if (w, h) != (fw, fh):
                        return None  # header/stream dim mismatch
                    frame = arr
                    break
                if ffour in (b"VP8 ", b"ALPH"):
                    return None  # lossy frame data: different codec
            if frame is None:
                return None
            rect = canvas[fy : fy + fh, fx : fx + fw]
            if no_blend:
                rect[:] = frame
            else:
                sa = frame[:, :, 3:4].astype(np.float64) / 255.0
                da = rect[:, :, 3:4].astype(np.float64) / 255.0
                oa = sa + da * (1.0 - sa)
                rgb = (
                    frame[:, :, :3] * sa
                    + rect[:, :, :3] * da * (1.0 - sa)
                )
                np.divide(rgb, oa, out=rgb, where=oa > 0)
                rect[:, :, :3] = np.rint(
                    np.where(oa > 0, rgb, 0.0)
                ).astype("u1")
                rect[:, :, 3] = np.rint(oa[:, :, 0] * 255.0).astype("u1")
            canvases.append(canvas.copy())
            if dispose_bg:
                rect[:] = bg
    if not canvases:
        return None
    return cw, ch, canvases


def encode_webp_anim(frames, canvas_w: int, canvas_h: int,
                     bg=(255, 255, 255, 255), loop: int = 0) -> bytes:
    """Mux an animated WebP: VP8X (animation flag) + ANIM + one ANMF
    per frame, each frame's pixel data a VP8L chunk from encode_webp.
    ``frames`` is a list of (x, y, arr[h, w, 3|4], no_blend,
    dispose_bg); offsets must be even (the container stores them in
    2-pixel units). ``bg`` is RGBA."""
    parts = []
    for x, y, arr, no_blend, dispose_bg in frames:
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets are stored in 2-pixel units")
        h, w = arr.shape[:2]
        vp8l = encode_webp(arr)[12:]  # the simple container IS one chunk
        hdr = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + (40).to_bytes(3, "little")  # duration ms, display-only
            + bytes([(0x02 if no_blend else 0) | (0x01 if dispose_bg else 0)])
        )
        body = hdr + vp8l
        anmf = b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            anmf += b"\x00"
        parts.append(anmf)
    r_, g_, b_, a_ = bg
    anim_body = bytes([b_, g_, r_, a_]) + struct.pack("<H", loop)
    anim = b"ANIM" + struct.pack("<I", len(anim_body)) + anim_body
    vp8x_body = (
        bytes([0x12, 0, 0, 0])  # animation + alpha flags
        + (canvas_w - 1).to_bytes(3, "little")
        + (canvas_h - 1).to_bytes(3, "little")
    )
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_body)) + vp8x_body
    riff = b"WEBP" + vp8x + anim + b"".join(parts)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
