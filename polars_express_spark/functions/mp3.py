"""MP3 (MPEG-1 Layer III) frame-header walk + ID3 envelope (r15).

The most mainstream audio format in any real corpus. Full sample
decode needs the MDCT/Huffman codec and stays policy-gated (the same
ruling as MP3-in-WAV since r12) — but the METADATA layer is fixed-
layout struct math, exactly like the JPEG SOF walk that predated the
JPEG pixel decoder: frame sync, version/layer bits, the public
bitrate/sample-rate index tables, and the padding-aware frame-size
arithmetic give sample rate, channel mode, frame count, CBR/VBR-ness,
and exact duration without touching a single subband. ID3v2 prefix
tags are decoded for real since late r15 — v2.3/v2.4 frame walks with
plain vs syncsafe sizes, Latin-1/UTF-8/UTF-16 text frames
(parse_id3v2) — and the fixed 128-byte ID3v1 trailer is recognized and
measured.

Strictness envelope: MPEG-1 Layer III only (the "MP3" in MP3); the
free-format bitrate index 0 and the bad index 15 reject; protection
bit 0 (header-CRC variant) is out of envelope rather than skipped
unverified — this module never walks past bytes it does not
understand, so trailing garbage after the last frame is corruption,
not slack. Like VP8L/QOI/TGA, bare MP3 frames carry NO payload
checksum (with protection=1), so bit flips inside frame payloads are
structurally undetectable — the walk only guarantees no-crash and
correct framing (SURVEY §2.10 integrity asymmetry).

Reference parity anchor: the reference has no audio surface
(src/main.rs handles CSV rows only); this is §2.10 training-pipeline
territory.
"""

from __future__ import annotations

import struct

# MPEG-1 Layer III bitrate table, index 1..14 (kbps); 0 = free-format
# (out of envelope), 15 = invalid.
_BITRATES = [None, 32, 40, 48, 56, 64, 80, 96, 112,
             128, 160, 192, 224, 256, 320, None]
_SAMPLE_RATES = [44100, 48000, 32000, None]  # MPEG-1 index 0..3
_CHANNEL_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]
_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _id3v2_size(payload: bytes):
    """Byte length of a leading ID3v2 tag (0 if absent, None if a tag
    starts but is malformed/truncated): 10-byte header with a syncsafe
    28-bit size, +10 for the footer when flag bit 4 is set."""
    if payload[:3] != b"ID3":
        return 0
    if len(payload) < 10:
        return None
    flags = payload[5]
    if any(b & 0x80 for b in payload[6:10]):
        return None  # syncsafe bytes must have the high bit clear
    size = 0
    for b in payload[6:10]:
        size = (size << 7) | b
    total = 10 + size + (10 if flags & 0x10 else 0)
    if total > len(payload):
        return None
    return total


def parse_mp3(payload: bytes):
    """REAL MP3 metadata walk: returns (sample_rate, channel_mode,
    n_frames, min_kbps, max_kbps, duration_ms, id3v2_bytes, has_id3v1)
    or None. Strides frame to frame by the size formula
    floor(144000·kbps / rate) + padding, so one wrong table entry or a
    lying padding bit desynchronizes the walk and the next sync check
    fails — the hash of n_frames + duration pins the whole table. The
    audio payload itself is never interpreted (codec-gated policy)."""
    id3v2 = _id3v2_size(payload)
    if id3v2 is None:
        return None
    pos = id3v2
    end = len(payload)
    has_id3v1 = end - pos >= 128 + 4 and payload[end - 128 : end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    n_frames = 0
    rate = mode = None
    min_k = max_k = None
    while pos < end:
        if pos + 4 > end:
            return None
        h = struct.unpack_from(">I", payload, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            return None  # lost sync
        if (h >> 19) & 0x3 != 0x3 or (h >> 17) & 0x3 != 0x1:
            return None  # not MPEG-1 Layer III
        if not (h >> 16) & 0x1:
            return None  # protection=0 (header CRC variant): out of envelope
        kbps = _BITRATES[(h >> 12) & 0xF]
        sr = _SAMPLE_RATES[(h >> 10) & 0x3]
        if kbps is None or sr is None or (h & 0x3) == 0x2:
            return None  # free/bad bitrate, reserved rate or emphasis
        if rate is None:
            rate = sr
            mode = _CHANNEL_MODES[(h >> 6) & 0x3]
        elif sr != rate:
            return None  # mid-stream sample-rate switch: malformed
        padding = (h >> 9) & 0x1
        size = 144_000 * kbps // sr + padding
        if pos + size > end:
            return None  # truncated final frame
        n_frames += 1
        min_k = kbps if min_k is None else min(min_k, kbps)
        max_k = kbps if max_k is None else max(max_k, kbps)
        pos += size
    if n_frames == 0:
        return None
    duration_ms = n_frames * _SAMPLES_PER_FRAME * 1000.0 / rate
    return rate, mode, n_frames, min_k, max_k, duration_ms, id3v2, has_id3v1


def encode_mp3_frames(
    kbps_list,
    sample_rate: int = 44100,
    channel_mode: str = "stereo",
    paddings=None,
    payload_byte=None,
    id3v2_payload: bytes | None = None,
    id3v1: bool = False,
    id3v2_tag: bytes | None = None,
) -> bytes:
    """Independent MP3 writer for the round-trip tests/queries: one
    MPEG-1 Layer III frame per bitrate in ``kbps_list`` (protection=1,
    per-frame padding bits from ``paddings``), payload bytes from
    ``payload_byte(frame_no, i)`` (default zeros — the payload is
    never interpreted), an optional ID3v2 prefix wrapping
    ``id3v2_payload`` verbatim, and an optional blank ID3v1 trailer."""
    sr_idx = _SAMPLE_RATES.index(sample_rate)
    mode_idx = _CHANNEL_MODES.index(channel_mode)
    out = bytearray()
    if id3v2_tag is not None:
        # a complete tag (encode_id3v2) prepended verbatim
        out += id3v2_tag
    if id3v2_payload is not None:
        n = len(id3v2_payload)
        if n >= 1 << 28:
            raise ValueError("ID3v2 payload too large for a syncsafe size")
        ss = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + ss + id3v2_payload
    for fno, kbps in enumerate(kbps_list):
        br_idx = _BITRATES.index(kbps)
        pad = int(paddings[fno]) if paddings is not None else 0
        h = (
            (0x7FF << 21) | (0x3 << 19) | (0x1 << 17) | (0x1 << 16)
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9)
            | (mode_idx << 6)
        )
        out += struct.pack(">I", h)
        size = 144_000 * kbps // sample_rate + pad
        body = bytearray(size - 4)
        if payload_byte is not None:
            for i in range(len(body)):
                body[i] = payload_byte(fno, i) & 0xFF
        out += body
    if id3v1:
        out += b"TAG" + b"\x00" * 125
    return bytes(out)


MP3_META_SCHEMA = (
    "doc_id bigint, sample_rate int, channel_mode string, "
    "n_frames bigint, min_kbps int, max_kbps int, duration_ms double, "
    "byte_len bigint, id3v2_bytes int, has_id3v1 boolean, title string"
)


def mp3_meta_batches(batches):
    """Batch-iterator core of decode_mp3_meta (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            parsed = parse_mp3(raw)
            if parsed is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt or out-of-envelope MP3 "
                    "frame chain"
                )
            rate, mode, n, mn, mx, dur, id3v2, id3v1 = parsed
            tag = parse_id3v2(raw)
            if tag is None:
                raise ValueError(
                    f"doc {doc_id}: structurally corrupt ID3v2 tag"
                )
            rows.append(
                (doc_id, rate, mode, n, mn, mx, dur, len(raw),
                 id3v2, id3v1, tag[1].get("TIT2", ""))
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "sample_rate", "channel_mode",
                     "n_frames", "min_kbps", "max_kbps",
                     "duration_ms", "byte_len", "id3v2_bytes",
                     "has_id3v1", "title"],
        ).astype({"sample_rate": "int32", "min_kbps": "int32",
                  "max_kbps": "int32", "id3v2_bytes": "int32"})


def decode_mp3_meta(df):
    """MP3 metadata operator (the audio twin of the JPEG SOF walk):
    per doc, walk the frame chain and ship sample rate, channel mode,
    frame count, CBR/VBR bitrate bounds, exact duration, and the ID3
    envelope measurements. Malformed chains raise. Arrow-batched
    mapInPandas; payloads never leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        mp3_meta_batches, schema=MP3_META_SCHEMA
    )


def _syncsafe(n: int) -> bytes:
    if n >= 1 << 28:
        raise ValueError("too large for a syncsafe int")
    return bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F])


def encode_id3v2(frames: dict, version: int = 4,
                 unsync: bool = False) -> bytes:
    """Independent ID3v2 writer: ``frames`` maps frame ids (TIT2, TPE1,
    …; 3-char TT2/TP1 forms for v2.2) to text. v2.4 writes syncsafe
    frame sizes and UTF-8 (encoding 3); v2.3 writes plain big-endian
    sizes and Latin-1 (encoding 0) or UTF-16-with-BOM (encoding 1)
    when the text needs it; v2.2 (r16) writes 3-byte ids + 3-byte
    plain sizes with the same Latin-1/UCS-2 choice — the layouts a
    real tag population spans. ``unsync`` (r17) applies the
    unsynchronisation scheme of the version: v2.2/v2.3 escape the
    whole tag body (every 0xFF gains a 0x00, the header size counts
    escaped bytes); v2.4 escapes PER FRAME with format flag 0x02 and
    escaped syncsafe frame sizes. The header flag 0x80 is set either
    way — both forms parse_id3v2 now decodes."""
    body = b""
    for fid, text in frames.items():
        if version == 2:
            if len(fid) != 3:
                raise ValueError("v2.2 frame ids are 3 characters")
            try:
                data = b"\x00" + text.encode("latin-1")
            except UnicodeEncodeError:
                data = b"\x01\xff\xfe" + text.encode("utf-16-le")
            if len(data) >= 1 << 24:
                raise ValueError("v2.2 frame too large")
            body += fid.encode("ascii") + len(data).to_bytes(3, "big") + data
            continue
        if len(fid) != 4:
            raise ValueError("frame ids are 4 characters")
        if version == 4:
            data = b"\x03" + text.encode("utf-8")
            fmt = 0
            if unsync:
                # v2.4 unsynchronisation is PER-FRAME: escape the frame
                # data, set format flag 0x02, store the ESCAPED size
                # (syncsafe sizes count stored bytes per spec §6.2)
                data = data.replace(b"\xff", b"\xff\x00")
                fmt = 0x02
            size = _syncsafe(len(data))
            body += fid.encode("ascii") + size + bytes([0, fmt]) + data
            continue
        elif version == 3:
            try:
                data = b"\x00" + text.encode("latin-1")
            except UnicodeEncodeError:
                data = b"\x01\xff\xfe" + text.encode("utf-16-le")
            size = struct.pack(">I", len(data))
        else:
            raise ValueError("version must be 2, 3 or 4")
        body += fid.encode("ascii") + size + b"\x00\x00" + data
    flags = 0
    if unsync:
        if version != 4:  # v2.2/v2.3: the WHOLE tag body escapes
            body = body.replace(b"\xff", b"\xff\x00")
        flags = 0x80  # set in v2.4 too: "all frames are unsynchronised"
    return b"ID3" + bytes([version, 0, flags]) + _syncsafe(len(body)) + body


def _parse_id3v22_frames(payload: bytes, total: int):
    """ID3v2.2 frame walk (r16 — the last mainstream ID3 variant):
    3-byte frame ids + 3-byte big-endian sizes (the pre-v2.3 layout,
    ids like TT2/TP1), text encodings 0 (Latin-1) and 1 (UCS-2 with
    BOM — the only two v2.2 defines). Returns (total, {frame_id: text})
    or None; ids are returned as their native 3-char forms (no aliasing
    to v2.3 names — honest envelope)."""
    pos = 10
    frames: dict[str, str] = {}
    while pos + 6 <= total:
        if payload[pos] == 0:
            break  # zero padding
        fid_b = payload[pos : pos + 3]
        if not all(0x30 <= c <= 0x5A for c in fid_b):
            return None
        fid = fid_b.decode("ascii")
        size = int.from_bytes(payload[pos + 3 : pos + 6], "big")
        body = pos + 6
        if body + size > total:
            return None  # frame overruns the tag
        if fid.startswith("T") and size >= 1:
            enc = payload[body]
            raw = payload[body + 1 : body + size]
            try:
                if enc == 0:
                    text = raw.decode("latin-1")
                elif enc == 1:
                    text = raw.decode("utf-16")  # BOM-led UCS-2
                else:
                    return None  # v2.2 defines no other encodings
            except UnicodeDecodeError:
                return None
            frames[fid] = text.rstrip("\x00")
        pos = body + size
    return total, frames


def parse_id3v2(payload: bytes):
    """REAL ID3v2 TEXT-FRAME decode (r15 — upgrading the envelope from
    'measured' to decoded): returns (total_tag_bytes, {frame_id: text})
    or None on a structurally corrupt tag. Handles v2.2 (3-byte ids +
    3-byte plain sizes, r16), v2.3 (plain 32-bit frame sizes) and v2.4
    (syncsafe), text encodings 0 (Latin-1), 1 (UTF-16 with BOM),
    2 (UTF-16BE), 3 (UTF-8); non-text frames are skipped by size
    (standard forward-compat), zero padding ends the walk, and any
    frame overrunning the tag is corruption. Unsynchronisation DECODES
    since r17 in both schemes: v2.2/v2.3 (header flag 0x80) un-escape
    the WHOLE tag body 0xFF 0x00 → 0xFF before the ordinary walk;
    v2.4 applies the same un-escape PER FRAME on format flag 0x02
    (with the optional 0x01 data-length indicator skipped), the
    stored syncsafe sizes counting escaped bytes per spec. Frame
    compression/encryption/grouping flags change the layout and
    reject rather than misread. A payload without a tag returns
    (0, {})."""
    if payload[:3] != b"ID3":
        return 0, {}
    total = _id3v2_size(payload)
    if total is None:
        return None
    version = payload[3]
    if version not in (2, 3, 4):
        return None
    unsync = bool(payload[5] & 0x80)
    ftr = 10 if payload[5] & 0x10 else 0
    if unsync and version != 4:
        # r17 (the r16 verdict's missing #5): v2.2/v2.3
        # unsynchronisation applies to the WHOLE tag body — every
        # 0xFF 0x00 pair un-escapes to 0xFF, and the header size
        # counts the ESCAPED bytes — so un-escape once and run the
        # ordinary walk on the rebuilt buffer (frame sizes in these
        # versions refer to the un-escaped data)
        data = payload[10 : total - ftr].replace(b"\xff\x00", b"\xff")
        buf = payload[:10] + data
        end = 10 + len(data)
    else:
        # v2.4's scheme is PER-FRAME (format flag 0x02, handled in the
        # frame walk below) — the tag-level flag is advisory there and
        # the stored syncsafe frame sizes already count escaped bytes
        buf = payload
        end = 10 + (total - 10 - ftr)
    if version == 2:
        # ID3v2.2 (r16): 3-byte frame ids + 3-byte big-endian sizes,
        # no frame flags, no extended header, no footer. The spec
        # defines only header bits 7 (unsync, decoded above) and 6
        # (compression, "the tag should be ignored" — out of
        # envelope); any other set bit is malformed.
        if payload[5] & 0x7F:
            return None
        r = _parse_id3v22_frames(buf, end)
        if r is None:
            return None
        return total, r[1]  # report the REAL stored tag size
    if payload[5] & 0x40:  # extended header: skip by its own size
        if version == 4:
            if any(b & 0x80 for b in buf[10:14]):
                return None
            ehs = 0
            for b in buf[10:14]:
                ehs = (ehs << 7) | b
        else:
            (ehs,) = struct.unpack_from(">I", buf, 10)
            ehs += 4
        pos = 10 + ehs
    else:
        pos = 10
    frames: dict[str, str] = {}
    while pos + 10 <= end:
        if buf[pos] == 0:
            break  # zero padding
        fid_b = buf[pos : pos + 4]
        if not all(0x30 <= c <= 0x5A for c in fid_b):
            return None
        fid = fid_b.decode("ascii")
        if version == 4:
            if any(b & 0x80 for b in buf[pos + 4 : pos + 8]):
                return None
            size = 0
            for b in buf[pos + 4 : pos + 8]:
                size = (size << 7) | b
        else:
            (size,) = struct.unpack_from(">I", buf, pos + 4)
        body = pos + 10
        if body + size > end:
            return None  # frame overruns the tag
        if fid.startswith("T") and size >= 1:
            fmt = buf[pos + 9]  # the frame FORMAT flags byte
            fdata = buf[body : body + size]
            if version == 4:
                if fmt & ~0x03:
                    # compression/encryption/grouping change the frame
                    # layout — out of envelope, never misread
                    return None
                if fmt & 0x01:  # data length indicator: 4 syncsafe bytes
                    if size < 5 or any(b & 0x80 for b in fdata[:4]):
                        return None
                    fdata = fdata[4:]
                if fmt & 0x02:  # per-frame unsynchronisation (r17)
                    fdata = fdata.replace(b"\xff\x00", b"\xff")
            else:
                if fmt & 0xE0:
                    return None  # v2.3 compression/encryption/grouping
            if not fdata:
                return None
            enc = fdata[0]
            raw = fdata[1:]
            try:
                if enc == 0:
                    text = raw.decode("latin-1")
                elif enc == 1:
                    text = raw.decode("utf-16")  # BOM-led
                elif enc == 2:
                    text = raw.decode("utf-16-be")
                elif enc == 3:
                    text = raw.decode("utf-8")
                else:
                    return None
            except UnicodeDecodeError:
                return None
            frames[fid] = text.rstrip("\x00")
        pos = body + size
    return total, frames
