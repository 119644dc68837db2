"""EXIF metadata extraction from JPEG APP1 (SURVEY.md §2.10, r16).

The standard image-corpus preprocessing step the ladder lacked:
orientation correction and camera-metadata extraction both read the
EXIF block — an APP1 marker segment tagged ``Exif\\0\\0`` whose body is
a little TIFF file (the public EXIF spec reuses the TIFF 6.0 IFD
grammar): a 2-byte byte-order mark (II/MM), the 42 magic, an offset to
IFD0, and IFD entries of (tag u16, type u16, count u32, value-or-
offset u32) with values larger than 4 bytes placed in the data area.
IFD0's 0x8769 pointer leads to the Exif sub-IFD.

Envelope: both byte orders; types BYTE/ASCII/SHORT/LONG/RATIONAL;
the tag set a pipeline actually consumes — Make (0x010F), Model
(0x0110), Orientation (0x0112, 1..8 valid), DateTime (0x0132), and in
the Exif IFD ISOSpeedRatings (0x8827), PixelXDimension (0xA002),
PixelYDimension (0xA003), FNumber (0x829D, rational) — with unknown
tags SKIPPED by the entry grammar (the format's own forward-compat;
entries are fixed 12 bytes, so skipping is structural, not guessed).
Malformed structure returns None: a truncated marker walk, an IFD
entry whose data area runs out of the blob, an invalid type, a
non-NUL-terminated ASCII value, or an orientation outside 1..8. A
JPEG without an APP1/Exif segment returns the empty dict (absence is
data, not corruption).

encode_exif_app1 is the independent writer twin; splice_exif_app1
inserts the segment right after SOI so existing encode_jpeg streams
gain EXIF without touching the entropy-coded body (APP segments
before SOF are legal JPEG).

Reference parity anchor: the reference has no image-metadata surface
(src/main.rs handles CSV rows only); §2.10 training-pipeline
territory, composing functions/jpeg.py's marker walk with the TIFF
IFD grammar of functions/multimodal.py's parse_tiff.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_IFD0_TAGS = {0x010F: "make", 0x0110: "model", 0x0112: "orientation",
              0x0132: "datetime"}
_EXIF_TAGS = {0x8827: "iso", 0xA002: "exif_w", 0xA003: "exif_h",
              0x829D: "fnumber"}
_EXIF_IFD_POINTER = 0x8769


def _read_ifd(blob: bytes, off: int, bo: str, tags: dict):
    """One IFD at ``off``: returns (fields dict, exif_ifd_offset|None)
    or None on malformed structure. Unknown tags skip (12-byte fixed
    entries); known tags decode by type with bounds checks."""
    if off + 2 > len(blob):
        return None
    (count,) = struct.unpack_from(bo + "H", blob, off)
    if off + 2 + 12 * count + 4 > len(blob):
        return None
    fields: dict = {}
    sub = None
    for i in range(count):
        at = off + 2 + 12 * i
        tag, typ, n = struct.unpack_from(bo + "HHI", blob, at)
        if tag == _EXIF_IFD_POINTER:
            if typ != 4 or n != 1:
                return None
            (sub,) = struct.unpack_from(bo + "I", blob, at + 8)
            continue
        if tag not in tags:
            continue  # forward-compat: unknown tags skip structurally
        if typ not in _TYPE_SIZES or n < 1:
            # count=0 would make every decode below read past an empty
            # value slice; the TIFF grammar has no zero-count entries
            return None
        size = _TYPE_SIZES[typ] * n
        if size <= 4:
            data = blob[at + 8 : at + 8 + size]
        else:
            (doff,) = struct.unpack_from(bo + "I", blob, at + 8)
            if doff + size > len(blob):
                return None
            data = blob[doff : doff + size]
        name = tags[tag]
        if typ == 2:  # ASCII: NUL-terminated by spec
            if not data or data[-1] != 0:
                return None
            try:
                fields[name] = data[:-1].decode("ascii")
            except UnicodeDecodeError:
                return None
        elif typ == 3:
            fields[name] = struct.unpack_from(bo + "H", data, 0)[0]
        elif typ == 4:
            fields[name] = struct.unpack_from(bo + "I", data, 0)[0]
        elif typ == 5:
            num, den = struct.unpack_from(bo + "II", data, 0)
            if den == 0:
                return None
            fields[name] = (num, den)
        else:  # BYTE
            fields[name] = data[0]
    return fields, sub


def parse_tiff_exif_blob(blob: bytes):
    """The TIFF-structured EXIF payload walk shared by the JPEG APP1
    and PNG eXIf containers (the eXIf chunk carries this blob bare per
    the PNG 1.5 extension): returns {field: value, 'byte_order':
    'II'|'MM'} or None."""
    if len(blob) < 8:
        return None
    if blob[:4] == b"II\x2a\x00":
        bo = "<"
        order = "II"
    elif blob[:4] == b"MM\x00\x2a":
        bo = ">"
        order = "MM"
    else:
        return None
    (ifd0_off,) = struct.unpack_from(bo + "I", blob, 4)
    r = _read_ifd(blob, ifd0_off, bo, _IFD0_TAGS)
    if r is None:
        return None
    fields, sub = r
    ori = fields.get("orientation")
    if ori is not None and not (isinstance(ori, int) and 1 <= ori <= 8):
        # wrong declared type (e.g. ASCII) or out-of-range value: the
        # EXIF spec pins orientation to SHORT 1..8 — malformed, not ours
        return None
    if sub is not None:
        r = _read_ifd(blob, sub, bo, _EXIF_TAGS)
        if r is None:
            return None
        sub_fields, _ = r
        fields.update(sub_fields)
    fields["byte_order"] = order
    return fields


def parse_exif(payload: bytes):
    """REAL EXIF decode from a JPEG stream: returns {field: value,
    'byte_order': 'II'|'MM'} (empty dict when no Exif APP1 exists) or
    None on malformed structure. The JPEG marker walk stops at SOS —
    EXIF lives before the entropy-coded data by spec."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    app1 = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(payload):
            return None
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            app1 = payload[pos + 10 : pos + 2 + seglen]
            break
        if marker == 0xDA:  # SOS: no EXIF past this point by spec
            break
        pos += 2 + seglen
    if app1 is None:
        return {}
    return parse_tiff_exif_blob(app1)


def parse_png_exif(payload: bytes):
    """EXIF from a PNG's eXIf chunk (the PNG 1.5 extension: the chunk
    data IS the bare TIFF blob — no 'Exif\\0\\0' prefix): returns the
    same dict as parse_exif, the empty dict when no eXIf chunk exists,
    or None on a malformed chunk walk / blob / chunk CRC (PNG chunks
    are CRC-32'd, so unlike JPEG APP1 a corrupted eXIf is DETECTED).
    Only the chunk LAYER is walked here — raster decoding stays with
    parse_png."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        end = pos + 8 + ln
        if ln > len(payload) - pos - 12:
            return None
        if ctype == b"eXIf":
            (crc,) = struct.unpack_from(">I", payload, end)
            if zlib.crc32(payload[pos + 4 : end]) & 0xFFFFFFFF != crc:
                return None
            return parse_tiff_exif_blob(payload[pos + 8 : end])
        if ctype == b"IEND":
            return {}
        pos = end + 4
    return None


def splice_png_exif(png: bytes, tiff_blob: bytes) -> bytes:
    """Insert an eXIf chunk right after IHDR (the extension requires
    it before IDAT) with the correct chunk CRC."""
    import zlib

    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG stream")
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    at = 8 + 8 + ihdr_len + 4  # end of the IHDR chunk
    chunk = (
        struct.pack(">I", len(tiff_blob)) + b"eXIf" + tiff_blob
        + struct.pack(
            ">I", zlib.crc32(b"eXIf" + tiff_blob) & 0xFFFFFFFF
        )
    )
    return png[:at] + chunk + png[at:]


def exif_tiff_blob(**kwargs) -> bytes:
    """The bare TIFF blob of encode_exif_app1 (for the PNG eXIf and
    WebP EXIF containers, which carry it without the APP1 wrapper)."""
    app1 = encode_exif_app1(**kwargs)
    return app1[10:]  # strip FFE1 + length + 'Exif\0\0'


def parse_webp_exif(payload: bytes):
    """EXIF from a WebP container's EXIF chunk (RFC 9649 §2.5: VP8X
    extended files may carry the bare TIFF blob in a RIFF 'EXIF'
    chunk after the image data): returns the same dict as parse_exif,
    the empty dict when no EXIF chunk exists, or None on a malformed
    RIFF walk / blob. RIFF chunks are unchecksummed (like JPEG APP1 —
    structural damage rejects, value damage may decode differently;
    the PNG eXIf container is the checksummed sibling)."""
    if (len(payload) < 12 or payload[:4] != b"RIFF"
            or payload[8:12] != b"WEBP"):
        return None
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_len > len(payload):
        return None
    if len(payload) > 8 + riff_len + (riff_len & 1):
        # trailing garbage past the RIFF-declared length (one pad byte
        # tolerated for odd lengths, per RIFF word alignment) — reject,
        # matching the module family's strict-trailing posture
        return None
    pos = 12
    end = 8 + riff_len
    while pos + 8 <= end:
        ctype = payload[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + ln > end:
            return None
        if ctype == b"EXIF":
            return parse_tiff_exif_blob(payload[pos + 8 : pos + 8 + ln])
        pos += 8 + ln + (ln & 1)  # RIFF word alignment
    return {}


def splice_webp_exif(webp: bytes, tiff_blob: bytes) -> bytes:
    """Append an EXIF chunk to a WebP container (the spec places it
    after the image data), fixing up the RIFF size and padding to the
    container's word alignment. NOTE: a spec-strict reader also wants
    the VP8X EXIF flag set; parse_webp_exif keys on the chunk itself,
    and simple (non-VP8X) files with an EXIF chunk are parsed
    leniently the way real readers do."""
    if webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    chunk = b"EXIF" + struct.pack("<I", len(tiff_blob)) + tiff_blob
    if len(tiff_blob) & 1:
        chunk += b"\x00"
    out = bytearray(webp + chunk)
    out[4:8] = struct.pack("<I", len(out) - 8)
    return bytes(out)


def encode_exif_app1(
    make: str = "",
    model: str = "",
    orientation: int = 1,
    datetime: str = "",
    iso: int | None = None,
    exif_w: int | None = None,
    exif_h: int | None = None,
    fnumber: tuple[int, int] | None = None,
    big_endian: bool = False,
) -> bytes:
    """Independent EXIF APP1 writer: builds the TIFF blob (IFD0 with
    Make/Model/Orientation/DateTime and the 0x8769 pointer, the Exif
    sub-IFD with ISO/PixelXDimension/PixelYDimension/FNumber) and
    wraps it in the 0xFFE1 marker segment."""
    bo = ">" if big_endian else "<"

    def entries_for(values, data_base):
        out = b""
        extra = b""
        for tag, typ, vals in values:
            n = len(vals) if typ in (2,) else len(vals)
            if typ == 2:
                raw = vals + b"\x00"
                n = len(raw)
            elif typ == 3:
                raw = b"".join(struct.pack(bo + "H", v) for v in vals)
            elif typ == 4:
                raw = b"".join(struct.pack(bo + "I", v) for v in vals)
            else:  # RATIONAL
                raw = b"".join(struct.pack(bo + "II", *v) for v in vals)
            if len(raw) <= 4:
                val = raw + b"\x00" * (4 - len(raw))
            else:
                val = struct.pack(bo + "I", data_base + len(extra))
                extra += raw
            out += struct.pack(bo + "HHI", tag, typ, n) + val
        return out, extra

    exif_vals = []
    if iso is not None:
        exif_vals.append((0x8827, 3, [iso]))
    if exif_w is not None:
        exif_vals.append((0xA002, 4, [exif_w]))
    if exif_h is not None:
        exif_vals.append((0xA003, 4, [exif_h]))
    if fnumber is not None:
        exif_vals.append((0x829D, 5, [fnumber]))

    ifd0_vals = [
        (0x010F, 2, make.encode("ascii")),
        (0x0110, 2, model.encode("ascii")),
        (0x0112, 3, [orientation]),
        (0x0132, 2, datetime.encode("ascii")),
    ]
    # layout: header(8) | IFD0 | IFD0 extra | ExifIFD | Exif extra
    n0 = len(ifd0_vals) + (1 if exif_vals else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    # first pass to size IFD0's extra area
    _, extra0 = entries_for(ifd0_vals, 0)
    exif_off = ifd0_off + ifd0_size + len(extra0)
    ents0, extra0 = entries_for(ifd0_vals, ifd0_off + ifd0_size)
    if exif_vals:
        ents0 += struct.pack(bo + "HHI", _EXIF_IFD_POINTER, 4, 1)
        ents0 += struct.pack(bo + "I", exif_off)
    ifd0 = struct.pack(bo + "H", n0) + ents0 + struct.pack(bo + "I", 0)
    blob = (
        (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
        + struct.pack(bo + "I", ifd0_off) + ifd0 + extra0
    )
    if exif_vals:
        n1 = len(exif_vals)
        ifd1_size = 2 + 12 * n1 + 4
        ents1, extra1 = entries_for(exif_vals, exif_off + ifd1_size)
        blob += (
            struct.pack(bo + "H", n1) + ents1 + struct.pack(bo + "I", 0)
            + extra1
        )
    body = b"Exif\x00\x00" + blob
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def splice_exif_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI — legal JPEG (APPn
    segments precede SOF) and the entropy-coded body is untouched."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    return jpeg[:2] + app1 + jpeg[2:]


EXIF_SCHEMA = (
    "doc_id bigint, byte_order string, make string, model string, "
    "orientation int, iso int, exif_w bigint, exif_h bigint, "
    "fnum double, width int, height int, mean_px double"
)


def exif_meta_batches(batches):
    """Batch-iterator core of read_exif_meta (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import pandas as pd
    from polars_express_spark.functions.jpeg import parse_jpeg

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload)
            meta = parse_exif(raw)
            if not meta:
                raise ValueError(
                    f"doc {doc_id}: missing or malformed EXIF"
                )
            decoded = parse_jpeg(raw)
            if decoded is None:
                raise ValueError(f"doc {doc_id}: corrupt JPEG body")
            w, h, _ch, arr = decoded
            num, den = meta.get("fnumber", (0, 1))
            rows.append(
                (doc_id, meta["byte_order"], meta.get("make", ""),
                 meta.get("model", ""), meta.get("orientation", 0),
                 meta.get("iso", 0), meta.get("exif_w", 0),
                 meta.get("exif_h", 0), num / den, w, h,
                 float(arr.mean()))
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "byte_order", "make", "model",
                     "orientation", "iso", "exif_w", "exif_h",
                     "fnum", "width", "height", "mean_px"],
        ).astype({"orientation": "int32", "iso": "int32",
                  "width": "int32", "height": "int32"})


def read_exif_meta(df):
    """EXIF extraction operator: per doc, decode the APP1 metadata AND
    the JPEG raster (through functions/jpeg.py) — the realistic
    pipeline shape where orientation correction needs both. Docs
    without EXIF or with malformed structure raise (the corpus here
    always embeds it). Arrow-batched mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        exif_meta_batches, schema=EXIF_SCHEMA
    )
