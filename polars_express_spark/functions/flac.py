"""FLAC codec in pure Python + numpy (r14).

The first LOSSLESS COMPRESSED audio codec in the §2.10 multimodal
ladder (the audio twin of functions/jpeg.py closing the image ladder):
until now the audio tiers covered PCM containers (WAV/Au), the G.711
companders, and IMA ADPCM — formats whose "compression" is a fixed
per-sample map. FLAC is a real entropy-coded codec: linear prediction
(constant / verbatim / the four fixed polynomial predictors / arbitrary
quantized-LPC) with Rice-coded residuals, stereo decorrelation
(left-side / right-side / mid-side), CRC-8-protected frame headers,
CRC-16-protected frames, and an MD5 of the unencoded audio in
STREAMINFO. Everything here is from the public spec (RFC 9639 /
xiph.org format documents). The reference engine exposes no audio
codec at all (reference src/main.rs:106-121 serves tabular endpoints
only); as with JPEG/PNG/GIF this tier exists so the Spark-side
multimodal plumbing exercises REAL decoded samples, and because FLAC
is lossless the round trip is EXACT — decode∘encode = id bit-for-bit,
the strongest oracle the codec family admits.

Decoder (`parse_flac`): fLaC magic, STREAMINFO + skipped metadata
blocks, fixed- and variable-blocking frames, all block-size/sample-
rate/sample-size header codes, UTF-8-coded frame/sample numbers, all
four channel assignments, subframe types CONSTANT / VERBATIM / FIXED
0-4 / LPC 1-32 with wasted bits, both residual coding methods (RICE
4-bit and RICE2 5-bit parameters) at any partition order, and escaped
(raw) partitions. Returns (channels, sample_rate, bits_per_sample,
ndarray[n, ch] int32) or None — on ANY structural violation: bad sync,
CRC-8/CRC-16 mismatch, reserved bits set, a mid-stream blocksize
larger than STREAMINFO's max, sample overrun, truncation, or an MD5 in
STREAMINFO (when nonzero) that disagrees with the decoded audio. The
total-samples field bounds every allocation (the deflate-bomb
posture).

Encoder (`encode_flac`): fixed blocking; per-block subframe strategy
CONSTANT where a channel is constant, else the requested mode —
'verbatim', 'fixed' (best of orders 0-2 by absolute residual sum), or
'lpc' (a fixed quantized predictor: integer prediction is exact in
both directions, so losslessness is preserved by construction); stereo
modes 'independent', 'left_side', 'right_side', 'mid_side'. Rice
parameter chosen so quotients stay ≤1 bit (size-suboptimal, exactness-
identical); partition order 0. STREAMINFO carries the true MD5, so the
decoder's end-to-end hash check is armed on every payload this module
writes. Entropy coding runs in interpreted Python inside Arrow-batched
operators — like parse_png's filter loop, a production deployment
swaps this module for libFLAC without touching the Spark plumbing
around it.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly 0x07, init 0 (frame header CRC — RFC 9639 §9.2)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 (whole-frame CRC — RFC 9639 §9.3)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


class _BitReader:
    """MSB-first bit reader over bytes, with byte-position tracking so
    frame CRC-16 can hash the exact byte span."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int):
        while self.nbits < n:
            if self.pos >= len(self.data):
                return None
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def read_signed(self, n: int):
        v = self.read(n)
        if v is None:
            return None
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self):
        """Count of 0 bits before the terminating 1 bit."""
        q = 0
        while True:
            b = self.read(1)
            if b is None:
                return None
            if b:
                return q
            q += 1
            if q > 1 << 24:
                return None  # corrupt stream, don't spin forever

    def align(self) -> bool:
        """Drop pad bits to the next byte boundary; they must be 0."""
        if self.nbits % 8:
            pad = self.read(self.nbits % 8)
            if pad is None or pad != 0:
                return False
        return True


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int):
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        self.write(0, q) if q else None
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _utf8_encode_number(val: int) -> bytes:
    """FLAC's UTF-8-style coding of frame/sample numbers (the UTF-8
    bit pattern extended past U+10FFFF to carry up to 36 bits)."""
    if val < 0x80:
        return bytes((val,))
    # n-byte form carries 6(n-1) + (7-n) bits: 11/16/21/26/31/36
    for n, cap in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31), (7, 36)):
        if val < (1 << cap):
            break
    else:
        raise ValueError("frame number exceeds 36 bits")
    cont = []
    for _ in range(n - 1):
        cont.append(0x80 | (val & 0x3F))
        val >>= 6
    lead = ((0xFF00 >> n) & 0xFF) | val
    return bytes((lead,)) + bytes(reversed(cont))


def _utf8_decode_number(r: _BitReader):
    b0 = r.read(8)
    if b0 is None:
        return None
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        return None
    val = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = r.read(8)
        if b is None or (b & 0xC0) != 0x80:
            return None
        val = (val << 6) | (b & 0x3F)
    return val


_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                     6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                     11: 96000}


def _read_residual(r: _BitReader, blocksize: int, pred_order: int):
    """Residual section: coding method, partition order, Rice-coded
    (or escaped-raw) partitions. Returns list of ints or None."""
    method = r.read(2)
    if method is None or method > 1:
        return None
    plen = 4 + method  # RICE 4-bit params, RICE2 5-bit
    escape = (1 << plen) - 1
    porder = r.read(4)
    if porder is None:
        return None
    nparts = 1 << porder
    if blocksize % nparts:
        return None  # partitions must divide the block exactly
    out = []
    for p in range(nparts):
        n = (blocksize >> porder) - (pred_order if p == 0 else 0)
        if n < 0:
            return None
        param = r.read(plen)
        if param is None:
            return None
        if param == escape:
            raw_bits = r.read(5)
            if raw_bits is None:
                return None
            for _ in range(n):
                v = r.read_signed(raw_bits) if raw_bits else 0
                if v is None:
                    return None
                out.append(v)
            continue
        for _ in range(n):
            q = r.read_unary()
            if q is None:
                return None
            rem = r.read(param) if param else 0
            if rem is None:
                return None
            z = (q << param) | rem
            out.append(-(z >> 1) - 1 if z & 1 else z >> 1)
    return out


def _read_subframe(r: _BitReader, blocksize: int, bps: int):
    """One subframe → list of ints (length blocksize) or None."""
    pad = r.read(1)
    if pad is None or pad != 0:
        return None
    stype = r.read(6)
    if stype is None:
        return None
    wflag = r.read(1)
    if wflag is None:
        return None
    wasted = 0
    if wflag:
        u = r.read_unary()
        if u is None:
            return None
        wasted = u + 1
        bps -= wasted
    if bps <= 0:
        return None
    if stype == 0:  # CONSTANT
        v = r.read_signed(bps)
        if v is None:
            return None
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = []
        for _ in range(blocksize):
            v = r.read_signed(bps)
            if v is None:
                return None
            samples.append(v)
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        if order > blocksize:
            return None
        samples = []
        for _ in range(order):
            v = r.read_signed(bps)
            if v is None:
                return None
            samples.append(v)
        res = _read_residual(r, blocksize, order)
        if res is None:
            return None
        coefs = _FIXED_COEFS[order]
        for e in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        if order > blocksize:
            return None
        samples = []
        for _ in range(order):
            v = r.read_signed(bps)
            if v is None:
                return None
            samples.append(v)
        prec = r.read(4)
        if prec is None or prec == 15:
            return None
        prec += 1
        shift = r.read_signed(5)
        if shift is None or shift < 0:  # spec: negative shift reserved
            return None
        coefs = []
        for _ in range(order):
            c = r.read_signed(prec)
            if c is None:
                return None
            coefs.append(c)
        res = _read_residual(r, blocksize, order)
        if res is None:
            return None
        for e in res:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        return None  # reserved subframe type
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def parse_flac(payload: bytes):
    """Decode a FLAC stream. Returns (channels, sample_rate,
    bits_per_sample, ndarray[n_samples, channels] int32) or None —
    never invented samples (see module docstring for the strictness
    envelope)."""
    if len(payload) < 4 + 4 + 34 or payload[:4] != b"fLaC":
        return None
    pos = 4
    streaminfo = None
    last = False
    while not last:
        if pos + 4 > len(payload):
            return None
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        if btype == 127 or pos + 4 + blen > len(payload):
            return None
        if btype == 0:
            if blen != 34 or streaminfo is not None:
                return None
            streaminfo = payload[pos + 4 : pos + 38]
        pos += 4 + blen
    if streaminfo is None:  # STREAMINFO is mandatory and first
        return None
    min_bs, max_bs = struct.unpack_from(">HH", streaminfo, 0)
    packed = int.from_bytes(streaminfo[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps_si = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5 = streaminfo[18:34]
    if sample_rate == 0 or min_bs < 16 or max_bs < min_bs:
        return None
    if total > (1 << 32):  # bomb guard far above any test payload
        return None
    chans = [[] for _ in range(channels)]
    # frames until end of stream
    while pos < len(payload):
        frame_start = pos
        r = _BitReader(payload, pos)
        sync = r.read(14)
        if sync != 0x3FFE:
            return None
        if r.read(1) != 0:
            return None
        blocking = r.read(1)
        bs_code = r.read(4)
        sr_code = r.read(4)
        ca = r.read(4)
        ss_code = r.read(3)
        if None in (blocking, bs_code, sr_code, ca, ss_code) or r.read(1) != 0:
            return None
        if bs_code == 0 or sr_code == 15 or ca > 10:
            return None
        if _utf8_decode_number(r) is None:
            return None
        if bs_code == 6:
            v = r.read(8)
            if v is None:
                return None
            blocksize = v + 1
        elif bs_code == 7:
            v = r.read(16)
            if v is None:
                return None
            blocksize = v + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            if r.read(8) is None:
                return None
        elif sr_code in (13, 14):
            if r.read(16) is None:
                return None
        if ss_code == 0:
            bps = bps_si
        elif ss_code == 3:
            return None
        else:
            bps = _SAMPLE_SIZE_CODE[ss_code]
        crc8 = r.read(8)
        if crc8 is None or _crc8(payload[frame_start : r.pos - 1]) != crc8:
            return None
        if blocksize > max_bs:
            return None
        n_ch = (ca + 1) if ca < 8 else 2
        if n_ch != channels:
            return None
        subs = []
        for c in range(n_ch):
            side = (
                (ca == 8 and c == 1) or (ca == 9 and c == 0)
                or (ca == 10 and c == 1)
            )
            s = _read_subframe(r, blocksize, bps + (1 if side else 0))
            if s is None:
                return None
            subs.append(s)
        if not r.align():
            return None
        crc16 = r.read(16)
        if crc16 is None or _crc16(payload[frame_start : r.pos - 2]) != crc16:
            return None
        pos = r.pos
        # undo stereo decorrelation (libFLAC reconstruction arithmetic)
        if ca == 8:  # left/side: right = left - side
            left, side = subs
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ca == 9:  # right/side: left = right + side
            side, right = subs
            subs = [[rt + s for rt, s in zip(right, side)], right]
        elif ca == 10:  # mid/side
            mid, side = subs
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            subs = [left, right]
        for c in range(channels):
            chans[c].extend(subs[c])
        if total and len(chans[0]) > total:
            return None  # more samples than STREAMINFO declared
    if total and len(chans[0]) != total:
        return None
    arr = np.array(chans, dtype=np.int64).T.reshape(-1, channels)
    lim = 1 << (bps_si - 1)
    if arr.size and (arr.max() >= lim or arr.min() < -lim):
        return None  # sample outside the declared bit depth
    if md5 != b"\x00" * 16 and bps_si % 8 == 0:
        # the MD5 is over the unencoded audio as little-endian packed
        # bytes; for depths that are not a whole number of bytes the
        # packing is sub-byte and ambiguous across writers, so the
        # check is only enforced at byte-aligned depths
        width = bps_si // 8
        inter = arr.astype("<i8")
        raw = b"".join(
            int(v).to_bytes(width, "little", signed=True) for v in inter.ravel()
        )
        if hashlib.md5(raw).digest() != md5:
            return None  # decoded audio disagrees with STREAMINFO MD5
    return channels, sample_rate, bps_si, arr.astype(np.int32)


def _write_residual(w: _BitWriter, res: list, pred_order: int):
    """Single-partition Rice residual with quotients bounded ≤ 1."""
    zmax = max((((e << 1) ^ (e >> 63)) if e >= 0 else ((-e << 1) - 1))
               for e in res) if res else 0
    param = max(0, zmax.bit_length() - 1)
    if param <= 14:
        w.write(0, 2)  # RICE 4-bit
        w.write(0, 4)  # partition order 0
        w.write(param, 4)
    else:
        w.write(1, 2)  # RICE2 5-bit
        w.write(0, 4)
        w.write(min(param, 30), 5)
        param = min(param, 30)
    for e in res:
        z = (e << 1) if e >= 0 else ((-e << 1) - 1)
        w.write_unary(z >> param)
        if param:
            w.write(z & ((1 << param) - 1), param)


_LPC_SHIFT = 5
_LPC_COEFS = [48, -16]  # pred = (48*s[i-1] - 16*s[i-2]) >> 5 = 1.5a - 0.5b


def _write_subframe(w: _BitWriter, samples: list, bps: int, mode: str):
    if samples and all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(samples[0], bps)
        return
    if mode == "verbatim" or len(samples) < 3:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in samples:
            w.write(s, bps)
        return
    if mode == "lpc":
        order = 2
        w.write(0, 1)
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s, bps)
        w.write(15 - 1, 4)  # precision 15 (code 14)
        w.write(_LPC_SHIFT, 5)
        for c in _LPC_COEFS:
            w.write(c, 15)
        res = [
            samples[i]
            - (sum(c * samples[i - 1 - j] for j, c in enumerate(_LPC_COEFS))
               >> _LPC_SHIFT)
            for i in range(order, len(samples))
        ]
        _write_residual(w, res, order)
        return
    # fixed: best of orders 0-2 by absolute residual sum
    best = None
    for order in (0, 1, 2):
        coefs = _FIXED_COEFS[order]
        res = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        cost = sum(abs(e) for e in res)
        if best is None or cost < best[2]:
            best = (order, res, cost)
    order, res, _ = best
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)
    for s in samples[:order]:
        w.write(s, bps)
    _write_residual(w, res, order)


def encode_flac(
    samples,
    sample_rate: int = 8000,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    mode: str = "fixed",
    stereo_mode: str = "independent",
) -> bytes:
    """Encode (n, channels) int samples losslessly (module docstring
    has the strategy envelope). STREAMINFO carries the true audio MD5,
    arming parse_flac's end-to-end hash check on every payload."""
    si_block, frame_list = encode_flac_parts(
        samples, sample_rate, bits_per_sample, block_size, mode, stereo_mode
    )
    return b"fLaC" + si_block + b"".join(frame_list)


def encode_flac_parts(
    samples,
    sample_rate: int = 8000,
    bits_per_sample: int = 16,
    block_size: int = 4096,
    mode: str = "fixed",
    stereo_mode: str = "independent",
):
    """encode_flac split at the container seams: returns
    (streaminfo_block, [frame, ...]) where streaminfo_block is the
    complete 38-byte metadata block (header byte with the last-flag
    set + 3-byte length + STREAMINFO) and each frame is one complete
    FLAC frame incl. its CRC-16. This is exactly the granularity the
    FLAC-to-Ogg mapping needs (r15 — packet 0 carries 'fLaC' +
    STREAMINFO, then ONE FRAME PER PACKET), and joining the parts
    behind b'fLaC' is the native stream encode_flac returns."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    if block_size < 16:
        raise ValueError("FLAC block size must be >= 16")
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    lim = 1 << (bits_per_sample - 1)
    if n and (arr.max() >= lim or arr.min() < -lim):
        raise ValueError("sample out of range for declared bit depth")
    width = (bits_per_sample + 7) // 8
    md5 = hashlib.md5(
        b"".join(int(v).to_bytes(width, "little", signed=True) for v in arr.ravel())
    ).digest()
    frame_list: list[bytes] = []
    for fno, start in enumerate(range(0, n, block_size)):
        blk = arr[start : start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking
        w.write(7, 4)  # blocksize as 16-bit value-1 at header end
        w.write(0, 4)  # sample rate from STREAMINFO
        if stereo_mode == "left_side":
            ca = 8
        elif stereo_mode == "right_side":
            ca = 9
        elif stereo_mode == "mid_side":
            ca = 10
        else:
            ca = channels - 1
        w.write(ca, 4)
        w.write(0, 3)  # sample size from STREAMINFO
        w.write(0, 1)
        for b in _utf8_encode_number(fno):
            w.write(b, 8)
        w.write(bs - 1, 16)
        hdr = w.out if w.nbits == 0 else None
        assert hdr is not None  # header fields above are byte-aligned
        w.write(_crc8(bytes(hdr)), 8)
        cols = [blk[:, c].tolist() for c in range(channels)]
        if ca == 8:  # left + side
            subs = [
                (cols[0], bits_per_sample),
                ([l - r for l, r in zip(cols[0], cols[1])], bits_per_sample + 1),
            ]
        elif ca == 9:  # side + right
            subs = [
                ([l - r for l, r in zip(cols[0], cols[1])], bits_per_sample + 1),
                (cols[1], bits_per_sample),
            ]
        elif ca == 10:  # mid + side
            subs = [
                ([(l + r) >> 1 for l, r in zip(cols[0], cols[1])], bits_per_sample),
                ([l - r for l, r in zip(cols[0], cols[1])], bits_per_sample + 1),
            ]
        else:
            subs = [(c, bits_per_sample) for c in cols]
        for s, bps in subs:
            _write_subframe(w, s, bps, mode)
        w.align()
        body = w.bytes()
        frame_list.append(body + struct.pack(">H", _crc16(body)))
    # STREAMINFO: min/max blocksize = the one block size used (the
    # last block may be shorter; spec keeps min at the stream's
    # nominal, so clamp min to the smallest actual block ≥16)
    last_bs = n - (n - 1) // block_size * block_size if n else block_size
    min_bs = max(16, min(block_size, last_bs)) if n else block_size
    packed = (sample_rate << 44) | ((channels - 1) << 41) | (
        (bits_per_sample - 1) << 36
    ) | n
    si = (
        struct.pack(">HH", min_bs, block_size)
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + packed.to_bytes(8, "big")
        + md5
    )
    si_block = bytes((0x80,)) + len(si).to_bytes(3, "big") + si
    return si_block, frame_list
