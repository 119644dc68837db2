"""Matroska / EBML container demux (SURVEY.md §2.10 Tier G, r15).

The webm-family container: EBML (RFC 8794) vint-coded elements wrapping
Segment → Info / Tracks / Cluster / SimpleBlock. This module is the
container tier only — pure struct math, no codec:

- parse_mkv: full walk — EBML header (DocType matroska/webm), track
  metadata (type, codec id, video dims, audio channels/rate/bit depth),
  and every SimpleBlock's frames reassembled through ALL FOUR lacing
  modes (none, Xiph — the Ogg 255-lacing idea reused, fixed, and EBML
  lacing with signed-vint deltas).
- Integrity: EBML's OPTIONAL CRC-32 element (id 0xBF, first child of a
  master, little-endian IEEE CRC-32 over the REST of that master's
  content — i.e. zlib.crc32) is VERIFIED whenever present, and
  encode_mkv always emits it in Info, Tracks, and every Cluster — so
  streams written here get PNG/FLAC/Ogg-grade corruption detection,
  while the parser stays honest about foreign streams that omit it
  (Matroska, like VP8L/QOI/TGA, mandates no payload checksum).
- encode_mkv: the independent writer twin for round-trip tests/queries.

Codec payloads ride the established policy: V_MJPEG frames decode to
real pixels (each frame IS a baseline JPEG — functions/jpeg.py),
A_PCM/INT/LIT and A_PCM/INT/BIG decode to real samples via the WAV
re-wrap in decode_audio_samples; inter-frame video codecs (V_VP8/V_VP9/
V_AVC) and compressed audio (A_OPUS/A_VORBIS) stay gated at the decode
sites, exactly like MP3-in-WAV — the swap-in point is the frame lists
this module returns.

Reference parity anchor: the reference's media surface is the Polars
binary-column passthrough (reference src/main.rs:106-121); this tier,
like all of §2.10, is the training-pipeline extension SURVEY mandates.
"""

from __future__ import annotations

import struct
import zlib

# Element ids (RFC 8794 + the public Matroska spec), stored as the raw
# bytes they occupy in the stream (the id's length is self-describing).
_ID_EBML = b"\x1a\x45\xdf\xa3"
_ID_DOCTYPE = b"\x42\x82"
_ID_SEGMENT = b"\x18\x53\x80\x67"
_ID_INFO = b"\x15\x49\xa9\x66"
_ID_TIMESTAMP_SCALE = b"\x2a\xd7\xb1"
_ID_TRACKS = b"\x16\x54\xae\x6b"
_ID_TRACK_ENTRY = b"\xae"
_ID_TRACK_NUMBER = b"\xd7"
_ID_TRACK_TYPE = b"\x83"
_ID_CODEC_ID = b"\x86"
_ID_CODEC_PRIVATE = b"\x63\xa2"
_ID_VIDEO = b"\xe0"
_ID_PIXEL_WIDTH = b"\xb0"
_ID_PIXEL_HEIGHT = b"\xba"
_ID_AUDIO = b"\xe1"
_ID_SAMPLING_FREQ = b"\xb5"
_ID_CHANNELS = b"\x9f"
_ID_BIT_DEPTH = b"\x62\x64"
_ID_CLUSTER = b"\x1f\x43\xb6\x75"
_ID_CLUSTER_TS = b"\xe7"
_ID_SIMPLE_BLOCK = b"\xa3"
_ID_CRC32 = b"\xbf"


def _vint_len(first: int) -> int | None:
    """Length in bytes of the vint starting with byte ``first`` (the
    count of leading zero bits + 1); None for the reserved all-zero
    first byte (length > 8)."""
    if first == 0:
        return None
    return 9 - first.bit_length()


def _read_vint(b: bytes, pos: int, allow_all_ones: bool = False):
    """Read a size/value vint: returns (value, end_pos) with the length
    marker stripped, or None on truncation / reserved length. The
    all-value-bits-set form is rejected ONLY for element data sizes
    (where RFC 8794 reserves it as "unknown size" — legal EBML, out of
    envelope here: encode_mkv never emits it and bounded walks need
    real sizes); SimpleBlock track numbers and EBML lace sizes reserve
    NO such value, so a foreign muxer writing track 127 minimally as
    0xFF (or a 127/16383-byte lace) is valid — those callers pass
    ``allow_all_ones=True`` (r16, per ADVICE)."""
    if pos >= len(b):
        return None
    ln = _vint_len(b[pos])
    if ln is None or pos + ln > len(b):
        return None
    val = int.from_bytes(b[pos : pos + ln], "big") - (1 << (7 * ln))
    if not allow_all_ones and val == (1 << (7 * ln)) - 1:
        return None  # unknown size
    return val, pos + ln


def _read_id(b: bytes, pos: int):
    """Read an element id: returns (id_bytes, end_pos) or None. Ids keep
    their marker bit and are at most 4 bytes."""
    if pos >= len(b):
        return None
    ln = _vint_len(b[pos])
    if ln is None or ln > 4 or pos + ln > len(b):
        return None
    return b[pos : pos + ln], pos + ln


def _children(b: bytes, start: int, end: int):
    """Walk the child elements of a master's body [start, end): returns
    a list of (id_bytes, body_start, body_end) or None on any malformed
    element (truncated id/size, child overrunning the master)."""
    out = []
    pos = start
    while pos < end:
        rid = _read_id(b, pos)
        if rid is None:
            return None
        eid, pos = rid
        rsz = _read_vint(b, pos)
        if rsz is None:
            return None
        sz, pos = rsz
        if pos + sz > end:
            return None
        out.append((eid, pos, pos + sz))
        pos += sz
    return out


def _crc_checked_children(b: bytes, start: int, end: int):
    """_children plus EBML CRC-32 verification: if the first child is
    the CRC-32 element (4-byte little-endian IEEE CRC-32 over the rest
    of the master's content — RFC 8794 §11.3.1), verify it and drop it
    from the returned list; a mismatch returns None. Masters without a
    CRC element pass through (the spec makes it optional)."""
    kids = _children(b, start, end)
    if kids is None:
        return None
    if kids and kids[0][0] == _ID_CRC32:
        _, cs, ce = kids[0]
        if ce - cs != 4:
            return None
        (stored,) = struct.unpack("<I", b[cs:ce])
        if zlib.crc32(b[ce:end]) & 0xFFFFFFFF != stored:
            return None
        return kids[1:]
    return kids


def _uint(b: bytes) -> int:
    return int.from_bytes(b, "big")


def _read_float(b: bytes):
    if len(b) == 4:
        return struct.unpack(">f", b)[0]
    if len(b) == 8:
        return struct.unpack(">d", b)[0]
    return None


def _decode_block(body: bytes):
    """Decode a SimpleBlock body: returns (track_no, rel_timestamp,
    [frame bytes...]) or None. Handles all four lacing modes; every
    size is bounds-checked against the block body so a lying lace
    table is malformed, not a crash."""
    # track numbers have no reserved all-ones form: 0xFF IS track 127
    r = _read_vint(body, 0, allow_all_ones=True)
    if r is None:
        return None
    track_no, pos = r
    if pos + 3 > len(body):
        return None
    (rel,) = struct.unpack_from(">h", body, pos)
    flags = body[pos + 2]
    pos += 3
    lacing = (flags >> 1) & 0x3
    data = body[pos:]
    if lacing == 0:
        return track_no, rel, [data]
    if not data:
        return None
    cnt = data[0] + 1
    q = 1
    sizes: list[int] = []
    if lacing == 2:  # fixed-size lacing: equal frames, no size table
        if (len(data) - 1) % cnt:
            return None
        sizes = [(len(data) - 1) // cnt] * (cnt - 1)
    elif lacing == 1:  # Xiph lacing: 255-runs + terminator per frame
        for _ in range(cnt - 1):
            s = 0
            while True:
                if q >= len(data):
                    return None
                s += data[q]
                stop = data[q] < 255
                q += 1
                if stop:
                    break
            sizes.append(s)
    elif cnt >= 2:  # EBML lacing: first size a vint, then signed-vint
        # deltas (a single-frame laced block carries NO size table);
        # lace sizes reserve no all-ones value — 0xFF is a 127-byte lace
        r = _read_vint(data, q, allow_all_ones=True)
        if r is None:
            return None
        s, q = r
        sizes.append(s)
        for _ in range(cnt - 2):
            start_q = q
            r = _read_vint(data, q, allow_all_ones=True)
            if r is None:
                return None
            raw, q = r
            ln = q - start_q
            s += raw - ((1 << (7 * ln - 1)) - 1)
            if s < 0:
                return None
            sizes.append(s)
    frames = []
    for s in sizes:
        if q + s > len(data):
            return None
        frames.append(data[q : q + s])
        q += s
    frames.append(data[q:])  # last frame = remainder
    return track_no, rel, frames


def parse_mkv(payload: bytes):
    """REAL Matroska/EBML demux: returns (doctype, timestamp_scale,
    tracks, blocks) or None, where tracks maps track number →
    {"type", "codec", "width", "height", "channels", "rate",
    "bit_depth"} (absent fields None) and blocks is
    [(track_no, abs_timestamp, [frame, ...]), ...] in stream order with
    all lacing modes reassembled. Strictness envelope: the EBML header
    must declare DocType matroska or webm; sizes must be known (the
    spec's unknown-size streaming form is out of envelope); every
    element is bounds-checked; unknown element ids are SKIPPED by size
    (standard EBML forward-compat), and any master carrying the
    optional CRC-32 element is verified (mismatch → None). Allocation
    is input-bounded: frames are slices of the payload."""
    kids = _children(payload, 0, len(payload))
    if kids is None or len(kids) < 2 or kids[0][0] != _ID_EBML:
        return None
    doctype = None
    hdr = _crc_checked_children(payload, kids[0][1], kids[0][2])
    if hdr is None:
        return None
    for eid, s, e in hdr:
        if eid == _ID_DOCTYPE:
            try:
                doctype = payload[s:e].decode("ascii")
            except UnicodeDecodeError:
                return None
    if doctype not in ("matroska", "webm"):
        return None
    seg = next(((s, e) for eid, s, e in kids if eid == _ID_SEGMENT), None)
    if seg is None:
        return None
    seg_kids = _children(payload, seg[0], seg[1])
    if seg_kids is None:
        return None
    ts_scale = 1_000_000
    tracks: dict[int, dict] = {}
    blocks: list[tuple[int, int, list[bytes]]] = []
    for eid, s, e in seg_kids:
        if eid == _ID_INFO:
            info = _crc_checked_children(payload, s, e)
            if info is None:
                return None
            for iid, is_, ie in info:
                if iid == _ID_TIMESTAMP_SCALE:
                    ts_scale = _uint(payload[is_:ie])
        elif eid == _ID_TRACKS:
            entries = _crc_checked_children(payload, s, e)
            if entries is None:
                return None
            for tid, ts_, te in entries:
                if tid != _ID_TRACK_ENTRY:
                    continue
                ek = _crc_checked_children(payload, ts_, te)
                if ek is None:
                    return None
                t = {"type": None, "codec": None, "width": None,
                     "height": None, "channels": None, "rate": None,
                     "bit_depth": None, "private": None}
                num = None
                for fid, fs, fe in ek:
                    body = payload[fs:fe]
                    if fid == _ID_TRACK_NUMBER:
                        num = _uint(body)
                    elif fid == _ID_TRACK_TYPE:
                        t["type"] = _uint(body)
                    elif fid == _ID_CODEC_PRIVATE:
                        # opaque codec-setup bytes (r17 — A_FLAC carries
                        # the fLaC header + STREAMINFO here per the
                        # public Matroska codec mappings)
                        t["private"] = body
                    elif fid == _ID_CODEC_ID:
                        try:
                            t["codec"] = body.decode("ascii")
                        except UnicodeDecodeError:
                            return None
                    elif fid == _ID_VIDEO:
                        vk = _crc_checked_children(payload, fs, fe)
                        if vk is None:
                            return None
                        for vid, vs, ve in vk:
                            if vid == _ID_PIXEL_WIDTH:
                                t["width"] = _uint(payload[vs:ve])
                            elif vid == _ID_PIXEL_HEIGHT:
                                t["height"] = _uint(payload[vs:ve])
                    elif fid == _ID_AUDIO:
                        ak = _crc_checked_children(payload, fs, fe)
                        if ak is None:
                            return None
                        for aid, as_, ae in ak:
                            abody = payload[as_:ae]
                            if aid == _ID_SAMPLING_FREQ:
                                f = _read_float(abody)
                                if f is None or not f > 0 or f != int(f):
                                    return None
                                t["rate"] = int(f)
                            elif aid == _ID_CHANNELS:
                                t["channels"] = _uint(abody)
                            elif aid == _ID_BIT_DEPTH:
                                t["bit_depth"] = _uint(abody)
                if num is None or num in tracks:
                    return None
                tracks[num] = t
        elif eid == _ID_CLUSTER:
            ck = _crc_checked_children(payload, s, e)
            if ck is None:
                return None
            cts = 0
            for cid, cs, ce in ck:
                if cid == _ID_CLUSTER_TS:
                    cts = _uint(payload[cs:ce])
                elif cid == _ID_SIMPLE_BLOCK:
                    blk = _decode_block(payload[cs:ce])
                    if blk is None:
                        return None
                    tn, rel, frames = blk
                    if tn not in tracks:
                        return None
                    blocks.append((tn, cts + rel, frames))
    if not tracks:
        return None
    return doctype, ts_scale, tracks, blocks


def parse_mkv_frames(payload: bytes):
    """First VIDEO track of a Matroska stream: (codec_id, width,
    height, [frame bytes...]) in stream order, or None. The frame list
    is exactly what a codec consumes — MJPEG frames are standalone
    baseline JPEGs (sample_frames decodes them for real); inter-frame
    codecs stay gated at the decode site."""
    parsed = parse_mkv(payload)
    if parsed is None:
        return None
    _, _, tracks, blocks = parsed
    vnum = next(
        (n for n in sorted(tracks) if tracks[n]["type"] == 1), None
    )
    if vnum is None:
        return None
    t = tracks[vnum]
    if t["width"] is None or t["height"] is None:
        return None
    if t["width"] * t["height"] > (1 << 26):
        return None  # bomb guard for downstream allocation
    frames = [f for tn, _ts, fs in blocks for f in fs if tn == vnum]
    return t["codec"], t["width"], t["height"], frames


def parse_mkv_audio(payload: bytes):
    """First AUDIO track: (codec_id, channels, rate, bit_depth,
    codec_private_or_None, data bytes concatenated in stream order) or
    None — the exact shape decode_audio_samples re-wraps as a WAV for
    the PCM codec ids; for A_FLAC (r17) the private bytes carry the
    fLaC header + STREAMINFO and ``private + data`` IS the native FLAC
    stream (each Matroska frame is one complete FLAC frame per the
    public codec mapping)."""
    parsed = parse_mkv(payload)
    if parsed is None:
        return None
    _, _, tracks, blocks = parsed
    anum = next(
        (n for n in sorted(tracks) if tracks[n]["type"] == 2), None
    )
    if anum is None:
        return None
    t = tracks[anum]
    if t["channels"] is None or t["rate"] is None or t["bit_depth"] is None:
        return None
    data = b"".join(
        f for tn, _ts, fs in blocks for f in fs if tn == anum
    )
    return (t["codec"], t["channels"], t["rate"], t["bit_depth"],
            t["private"], data)


def _w_vint(n: int) -> bytes:
    """Minimal-length EBML size vint (all-ones per length is reserved
    for unknown size, hence the strict <)."""
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise ValueError("size too large for an 8-byte vint")


def _w_elem(eid: bytes, body: bytes) -> bytes:
    return eid + _w_vint(len(body)) + body


def _w_uint(n: int) -> bytes:
    if n < 0:
        raise ValueError("EBML uint must be non-negative")
    return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")


def _w_crc_master(eid: bytes, body: bytes) -> bytes:
    """Master element with the optional EBML CRC-32 element armed as
    its first child (RFC 8794 §11.3.1: 4-byte little-endian IEEE
    CRC-32 over the remainder of the master's content)."""
    crc = _w_elem(_ID_CRC32, struct.pack("<I", zlib.crc32(body) & 0xFFFFFFFF))
    return _w_elem(eid, crc + body)


def _encode_block(track_no: int, rel: int, frames, lacing: str) -> bytes:
    """SimpleBlock body for ``frames`` under the named lacing mode
    ('none' requires a single frame; 'fixed' requires equal sizes)."""
    flag_bits = {"none": 0, "xiph": 1, "fixed": 2, "ebml": 3}[lacing]
    head = _w_vint(track_no) + struct.pack(">h", rel) + bytes([0x80 | (flag_bits << 1)])
    if lacing == "none":
        if len(frames) != 1:
            raise ValueError("unlaced SimpleBlock takes exactly one frame")
        return head + frames[0]
    if len(frames) < 1 or len(frames) > 256:
        raise ValueError("laced SimpleBlock takes 1..256 frames")
    lace = bytes([len(frames) - 1])
    if lacing == "fixed":
        if len({len(f) for f in frames}) != 1:
            raise ValueError("fixed lacing requires equal frame sizes")
    elif lacing == "xiph":
        for f in frames[:-1]:
            n = len(f)
            lace += b"\xff" * (n // 255) + bytes([n % 255])
    elif len(frames) >= 2:  # ebml (single-frame: no size table)
        lace += _w_vint(len(frames[0]))
        prev = len(frames[0])
        for f in frames[1:-1]:
            delta = len(f) - prev
            prev = len(f)
            # minimal signed vint: value stored = delta + (2^(7l-1) - 1)
            for ln in range(1, 9):
                bias = (1 << (7 * ln - 1)) - 1
                if 0 <= delta + bias < (1 << (7 * ln)) - 1:
                    lace += ((1 << (7 * ln)) | (delta + bias)).to_bytes(ln, "big")
                    break
            else:
                raise ValueError("lace delta out of range")
    return head + lace + b"".join(frames)


def encode_mkv(
    video_frames=None,
    width: int = 0,
    height: int = 0,
    video_codec: str = "V_MJPEG",
    audio_data: bytes | None = None,
    channels: int = 1,
    rate: int = 8000,
    bit_depth: int = 16,
    audio_codec: str = "A_PCM/INT/LIT",
    lacing: str = "none",
    audio_frame_bytes: int = 0,
    doctype: str = "matroska",
    audio_frames=None,
    audio_codec_private: bytes | None = None,
) -> bytes:
    """Independent Matroska writer for the round-trip tests/queries:
    EBML header (DocType ``doctype``), Segment with Info (timestamp
    scale 1 ms), Tracks, and one Cluster. Video frames go as one
    SimpleBlock each when ``lacing='none'``, else ONE laced SimpleBlock
    carrying all of them; audio data is split into
    ``audio_frame_bytes``-sized frames (0 → a single frame) muxed the
    same way on its own track — or passed PRE-FRAMED via
    ``audio_frames`` (r17: codecs with their own framing, e.g. one
    complete FLAC frame per Matroska frame for A_FLAC, whose
    fLaC+STREAMINFO header rides ``audio_codec_private``). Info,
    Tracks, and the Cluster all carry the optional EBML CRC-32
    element, so corruption in any of them is detected by parse_mkv."""
    if audio_frames is not None:
        if audio_data is not None:
            raise ValueError("pass audio_data or audio_frames, not both")
        audio_data = b""  # arms the audio-track branches below
    ebml_hdr = _w_elem(_ID_EBML, _w_elem(_ID_DOCTYPE, doctype.encode()))
    entries = b""
    track_no = 1
    video_no = audio_no = None
    if video_frames is not None:
        video_no = track_no
        entries += _w_elem(_ID_TRACK_ENTRY, (
            _w_elem(_ID_TRACK_NUMBER, _w_uint(video_no))
            + _w_elem(_ID_TRACK_TYPE, _w_uint(1))
            + _w_elem(_ID_CODEC_ID, video_codec.encode())
            + _w_elem(_ID_VIDEO,
                      _w_elem(_ID_PIXEL_WIDTH, _w_uint(width))
                      + _w_elem(_ID_PIXEL_HEIGHT, _w_uint(height)))
        ))
        track_no += 1
    if audio_data is not None:
        audio_no = track_no
        entries += _w_elem(_ID_TRACK_ENTRY, (
            _w_elem(_ID_TRACK_NUMBER, _w_uint(audio_no))
            + _w_elem(_ID_TRACK_TYPE, _w_uint(2))
            + _w_elem(_ID_CODEC_ID, audio_codec.encode())
            + (_w_elem(_ID_CODEC_PRIVATE, audio_codec_private)
               if audio_codec_private is not None else b"")
            + _w_elem(_ID_AUDIO,
                      _w_elem(_ID_SAMPLING_FREQ, struct.pack(">d", float(rate)))
                      + _w_elem(_ID_CHANNELS, _w_uint(channels))
                      + _w_elem(_ID_BIT_DEPTH, _w_uint(bit_depth)))
        ))
    if not entries:
        raise ValueError("encode_mkv needs a video or audio track")
    cluster_body = _w_elem(_ID_CLUSTER_TS, _w_uint(0))
    if video_frames is not None:
        if lacing == "none":
            for i, f in enumerate(video_frames):
                cluster_body += _w_elem(
                    _ID_SIMPLE_BLOCK, _encode_block(video_no, i, [f], "none")
                )
        else:
            cluster_body += _w_elem(
                _ID_SIMPLE_BLOCK,
                _encode_block(video_no, 0, list(video_frames), lacing),
            )
    if audio_data is not None:
        if audio_frames is not None:
            aframes = [bytes(f) for f in audio_frames] or [b""]
        else:
            n = audio_frame_bytes or len(audio_data)
            aframes = [audio_data[i : i + n]
                       for i in range(0, len(audio_data), n)] or [b""]
        if lacing == "none":
            for i, f in enumerate(aframes):
                cluster_body += _w_elem(
                    _ID_SIMPLE_BLOCK, _encode_block(audio_no, i, [f], "none")
                )
        else:
            tail = None
            if lacing == "fixed" and len(aframes) > 1 and len(
                aframes[-1]
            ) != len(aframes[0]):
                tail = aframes.pop()  # short last chunk: own unlaced block
            cluster_body += _w_elem(
                _ID_SIMPLE_BLOCK, _encode_block(audio_no, 0, aframes, lacing)
            )
            if tail is not None:
                cluster_body += _w_elem(
                    _ID_SIMPLE_BLOCK, _encode_block(audio_no, 1, [tail], "none")
                )
    segment = (
        _w_crc_master(_ID_INFO, _w_elem(_ID_TIMESTAMP_SCALE, _w_uint(1_000_000)))
        + _w_crc_master(_ID_TRACKS, entries)
        + _w_crc_master(_ID_CLUSTER, cluster_body)
    )
    return ebml_hdr + _w_elem(_ID_SEGMENT, segment)
