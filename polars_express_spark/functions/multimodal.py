"""Multimodal columns (SURVEY.md §2.10 Tier G).

Design: media is an opaque `binary` payload column plus a typed metadata
struct — the standard Spark shape for image/audio/video at scale (the
payload never round-trips through Python except inside Arrow-batched
mapInPandas operators; partitioning/shuffles move only the bytes they
must).

The decode step (real JPEG/audio decoding) needs native libraries that
are NOT in this environment: probed in round 5 — PIL/Pillow, av, cv2,
imageio, soundfile, librosa are ALL absent (`import` fails for each).
`decode_media(..., real_decode=True)` first parses PNG/BMP/GIF headers
and JPEG SOF frame headers with pure `struct` (parse_image_header —
REAL metadata decode, no codec needed; JPEG dimensions live in the
fixed-layout SOFn segment, not the entropy-coded scans), then probes
for Pillow for anything else: if a future environment provides it,
payloads decode through `PIL.Image` inside the same Arrow-batched
operator; in this sandbox non-header-parsable payloads raise
NotImplementedError where the pixel codec would be invoked. The
default deterministic fake derives metadata purely from the payload
bytes. r9 adds the uncompressed tier: Netpbm P5/P6 rasters decode to
REAL pixels codec-free (parse_netpbm / decode_pixel_stats, and the
real_resize / real_extract paths below), so the full
decode→transform→featurize ladder runs end-to-end on actual pixels for
formats whose encoding IS the raster. r11 adds the ENTROPY-CODED tier
for PNG: its compression is DEFLATE, which the stdlib's zlib decodes —
parse_png inflates the IDAT stream, reconstructs all five scanline
filters (None/Sub/Up/Average/Paeth, PNG spec §9), applies PLTE for
paletted images, and returns the same (w, h, ch, ndarray) contract as
parse_netpbm, CRC-checked per chunk; gray/RGB/gray+alpha/RGBA at 8-
and 16-bit and 8-bit palette are covered, Adam7 interlace and sub-byte
depths still raise. The remaining codec gates are JPEG's arithmetic/
Huffman scans and compressed audio/video — formats whose entropy
coders have no stdlib implementation. Everything around the stub —
schema, Arrow batch iteration, column plumbing — is real and
oracle-tested (q_multimodal_meta replays the fake's arithmetic in
DuckDB SQL over the same bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "doc_id bigint, byte_len int, width int, height int, channels int"

# PNG color type → sample channels (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# JPEG start-of-frame markers (ITU T.81 §B.2.2): every SOFn carries the
# sample dimensions; C4/C8/CC look like SOFs but are DHT/JPG/DAC
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_jpeg_dims(payload: bytes):
    """Walk the JPEG marker-segment list to the first SOFn and read
    (width, height, components) — header metadata needs NO entropy
    decoding, so this is a pure struct walk like the RIFF/WAV parser
    (the SOF layout is fixed: precision u8, height u16be, width u16be,
    component count u8). Returns None on truncated/corrupt streams."""
    import struct

    pos = 2  # past SOI
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            return None  # not at a marker: corrupt stream
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI carry no length
            pos += 2
            continue
        if pos + 4 > len(payload):
            return None
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        if marker in _JPEG_SOF:
            if pos + 10 > len(payload) or seg_len < 8:
                return None
            h, w = struct.unpack_from(">HH", payload, pos + 5)
            return w, h, payload[pos + 9]
        if marker == 0xDA:  # SOS: entropy data follows; SOF never appeared
            return None
        pos += 2 + seg_len
    return None


def parse_image_header(payload: bytes):
    """Codec-less image metadata: (width, height, channels) parsed from
    container header bytes with pure `struct` — no image library needed,
    so REAL metadata decode of PNG / BMP / GIF (VERDICT r5 next-step #4)
    and JPEG (r7: dimensions live in the fixed-layout SOFn segment, not
    the entropy-coded scans) works even in codec-less environments.
    Returns None for anything else — JPEG PIXEL decode still needs a
    codec, so the caller falls back to Pillow for that."""
    import struct

    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        return _parse_jpeg_dims(payload)

    if len(payload) >= 26 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        # 8B signature, 4B IHDR length, 4B "IHDR", then width/height
        # as big-endian u32 and color type at offset 25
        w, h = struct.unpack_from(">II", payload, 16)
        return w, h, _PNG_CHANNELS.get(payload[25], 3)
    if len(payload) >= 30 and payload[:2] == b"BM":
        # DIB header size at 14 distinguishes the ancient 12-byte
        # BITMAPCOREHEADER (u16 dims at 18/20, bpp at 24) from
        # BITMAPINFOHEADER and its extensions (signed i32 dims at 18/22
        # — height may be negative = top-down — bpp at 28)
        hsize = struct.unpack_from("<I", payload, 14)[0]
        if hsize < 40:
            w, h = struct.unpack_from("<HH", payload, 18)
            bits = struct.unpack_from("<H", payload, 24)[0]
        else:
            w, h = struct.unpack_from("<ii", payload, 18)
            bits = struct.unpack_from("<H", payload, 28)[0]
        return w, abs(h), max(1, bits // 8)
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", payload, 6)
        return w, h, 3
    if payload[:2] in (b"P5", b"P6"):  # Netpbm: full pixels decodable too
        parsed = parse_netpbm(payload)
        if parsed is not None:
            w, h, ch, _ = parsed
            return w, h, ch
    return None


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary payload column (here: UTF-8 bytes of the text —
    stands in for image/audio bytes with identical plumbing)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_media(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas media decode: binary payload → typed metadata.

    Arrow-batched: each partition streams pandas batches through the
    decoder; no per-row Python dispatch. The fake is pure arithmetic on
    byte_len so it is deterministic and SQL-replayable.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                metas = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    parsed = parse_image_header(bytes(payload))
                    if parsed is not None:  # PNG/BMP/GIF: pure struct
                        w, h, ch = parsed
                        metas.append((doc_id, len(payload), w, h, ch))
                        continue
                    try:  # richer formats (JPEG …) need a real codec
                        import io

                        from PIL import Image  # probed: absent in this sandbox
                    except ImportError as e:
                        raise NotImplementedError(
                            "payload is not PNG/BMP/GIF (header-parsable) and "
                            "richer decode requires image codecs (Pillow) not "
                            f"present in this environment ({e})"
                        ) from e
                    img = Image.open(io.BytesIO(payload))
                    metas.append(
                        (doc_id, len(payload), img.width, img.height, len(img.getbands()))
                    )
                yield pd.DataFrame(
                    metas, columns=["doc_id", "byte_len", "width", "height", "channels"]
                ).astype(
                    {"byte_len": "int32", "width": "int32", "height": "int32", "channels": "int32"}
                )
                continue
            byte_len = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len.astype("int32"),
                    "width": (byte_len % 640).astype("int32"),
                    "height": (byte_len * 7 % 480 + 1).astype("int32"),
                    "channels": pd.Series([3] * len(pdf)).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(decode, schema=MEDIA_META_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, features array<float>"


def extract_features(df: DataFrame, dim: int = 16, real_extract: bool = False) -> DataFrame:
    """mapInPandas feature extraction: binary payload → fixed-dim
    `array<float>` embedding column (feeds the §2.10 similarity ops).

    Real extraction: for codec-free Netpbm payloads, dim tile-means of
    the actual grayscale raster (r9); other formats raise until an
    encoder exists. The deterministic fake below is stubbed like decode; the
    deterministic fake is a byte-histogram folded to `dim` buckets and
    L1-normalized — computed with numpy over whole Arrow batches, so the
    plumbing (batch shape, array column output, schema) is exactly what
    a real encoder would use.
    """
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_extract:
                # REAL pixel features for the codec-free families —
                # Netpbm (r9) and PNG (r11, stdlib zlib): dim tile-means
                # of the grayscale raster, L1-normalized — an actual (if
                # simple) visual descriptor from actual pixels. JPEG
                # scans still need a codec.
                feats = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    raw = bytes(payload)
                    parsed = parse_netpbm(raw) or parse_png(raw)
                    if parsed is None:
                        raise NotImplementedError(
                            f"doc {doc_id}: real feature extraction is "
                            "implemented codec-free for Netpbm P5/P6 and "
                            "PNG; other formats need a media codec not "
                            "present here"
                        )
                    _, _, _, arr = parsed
                    gray = arr.astype("float64").mean(axis=2).ravel()
                    chunks = np.array_split(gray, dim)
                    v = np.array(
                        [c.mean() if len(c) else 0.0 for c in chunks],
                        dtype="float32",
                    )
                    s = v.sum()
                    feats.append(v / s if s else v)
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})
                continue
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append(hist / total if total else hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(extract, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, payload binary, width int, height int"


def resize_media(
    df: DataFrame, width: int = 64, height: int = 48, real_resize: bool = False
) -> DataFrame:
    """mapInPandas resize: payload → payload' at the target dimensions.

    The real pixel resample works codec-free for Netpbm (nearest
    neighbor, re-encoded as valid Netpbm; r9) and raises for compressed
    formats; the fake keeps the byte budget
    honest (output payload is width·height bytes, sampled evenly from the
    input — a real nearest-neighbor downsample over a 1-channel buffer),
    so downstream operators see realistic shrunken binaries.
    """
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if real_resize:
                # REAL nearest-neighbor resample for Netpbm (r9) and
                # PNG (r11): decode the raster, index-select
                # rows/columns, re-encode a VALID payload in the SOURCE
                # family (round-trips through its own parser) — sample
                # width (8/16-bit) and channel count preserved. A
                # paletted PNG decodes to its looked-up RGB raster, so
                # its resize re-encodes as truecolor (same pixels,
                # PLTE indirection not reconstructed).
                out = []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    raw = bytes(payload)
                    parsed = parse_netpbm(raw)
                    is_png = False
                    if parsed is None:
                        parsed = parse_png(raw)
                        is_png = True
                    if parsed is None:
                        raise NotImplementedError(
                            f"doc {doc_id}: real resize is implemented "
                            "codec-free for Netpbm P5/P6 and PNG; other "
                            "compressed formats need an image codec not "
                            "present here"
                        )
                    w, h, ch, arr = parsed
                    yi = np.linspace(0, h - 1, height).round().astype(np.int64)
                    xi = np.linspace(0, w - 1, width).round().astype(np.int64)
                    res = arr[yi][:, xi]
                    if is_png:
                        out.append(encode_png(res))
                        continue
                    # preserve the SOURCE maxval (r10, ADVICE: forcing
                    # 255/65535 from the byte width silently rescales
                    # the brightness scale of e.g. a maxval=1000 P5)
                    maxval = _netpbm_header(raw)[2]
                    hdr = (
                        f"P{'6' if ch == 3 else '5'}\n{width} {height}\n{maxval}\n"
                    ).encode("ascii")
                    out.append(hdr + res.tobytes())
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "payload": out,
                        "width": pd.Series([width] * len(pdf)).astype("int32"),
                        "height": pd.Series([height] * len(pdf)).astype("int32"),
                    }
                )
                continue
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                if len(arr) == 0:
                    out.append(b"\x00" * target)
                    continue
                idx = np.linspace(0, len(arr) - 1, target).astype(np.int64)
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": pd.Series([width] * len(pdf)).astype("int32"),
                    "height": pd.Series([height] * len(pdf)).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_no int, frame binary"


def sample_frames(df: DataFrame, n_frames: int = 4, real_decode: bool = False) -> DataFrame:
    """mapInPandas frame sampling: one 'video' payload row → n_frames
    frame rows (the generator/UDTF shape: output cardinality ≠ input).

    Real container demuxing is stubbed; the fake slices the payload into
    n_frames even chunks, which preserves the real operator's row
    explosion, ordering column, and binary output schema.
    """
    import numpy as np

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                # REAL container demux for RIFF/AVI (r9): the frame
                # boundaries come from the actual chunk list, sampled
                # evenly across the stream; frames stay encoded (codec
                # work), but which bytes ARE frame k is real. Non-AVI
                # containers raise — mp4/mkv demux or pixel decode
                # needs ffmpeg, absent here.
                doc_ids, frame_nos, frames = [], [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    b = bytes(payload)
                    idxs = parse_avi_frames(b)
                    if idxs is None:
                        raise NotImplementedError(
                            f"doc {doc_id}: real frame sampling is implemented "
                            "codec-free for RIFF/AVI containers; other "
                            "containers need ffmpeg (absent here)"
                        )
                    if not idxs:
                        continue  # container with no video frames
                    take = np.unique(
                        np.linspace(0, len(idxs) - 1, min(n_frames, len(idxs)))
                        .round()
                        .astype(np.int64)
                    )
                    for fno, i in enumerate(take):
                        off, sz = idxs[i]
                        doc_ids.append(doc_id)
                        frame_nos.append(fno)
                        frames.append(b[off : off + sz])
                yield pd.DataFrame(
                    {
                        "doc_id": doc_ids,
                        "frame_no": pd.Series(frame_nos, dtype="int32"),
                        "frame": frames,
                    }
                )
                continue
            doc_ids, frame_nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                chunks = np.array_split(arr, n_frames)
                for i, ch in enumerate(chunks):
                    doc_ids.append(doc_id)
                    frame_nos.append(i)
                    frames.append(ch.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "frame": frames,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(sample, schema=FRAMES_SCHEMA)


def parse_audio_header(payload: bytes):
    """Codec-less WAV metadata: (channels, sample_rate, bits_per_sample,
    n_samples) from the RIFF container with pure `struct` — the audio
    twin of parse_image_header. Walks the chunk list (word-aligned, so
    extra chunks like LIST/fact are skipped correctly) rather than
    assuming the canonical 44-byte layout. Returns None for anything
    that is not a parsable RIFF/WAVE."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    ch = sr = bits = data_size = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and csize >= 16 and body + 16 <= len(payload):
            ch, sr = struct.unpack_from("<HI", payload, body + 2)
            bits = struct.unpack_from("<H", payload, body + 14)[0]
        elif cid == b"data":
            data_size = csize
        pos = body + csize + (csize & 1)  # chunks are 2-byte aligned
    if not ch or not bits or data_size is None:
        return None
    return ch, sr, bits, data_size // (ch * max(1, bits // 8))


AUDIO_META_SCHEMA = (
    "doc_id bigint, byte_len bigint, channels int, sample_rate int,"
    " bits int, n_samples bigint"
)


def decode_audio(df: DataFrame) -> DataFrame:
    """mapInPandas audio decode: WAV payload column → typed metadata via
    parse_audio_header. Same Arrow-batched shape as decode_media; raises
    on unparsable payloads (an audio pipeline wants loud failure, not
    silent nulls, when a container is corrupt)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = parse_audio_header(bytes(payload))
                if parsed is None:
                    raise ValueError(f"doc {doc_id}: payload is not RIFF/WAVE")
                ch, sr, bits, n = parsed
                metas.append((doc_id, len(payload), ch, sr, bits, n))
            yield pd.DataFrame(
                metas,
                columns=[
                    "doc_id", "byte_len", "channels", "sample_rate", "bits", "n_samples",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(decode, schema=AUDIO_META_SCHEMA)


# ---------------------------------------------------------------------------
# Netpbm (PGM P5 / PPM P6): the uncompressed raster family — REAL pixel
# decode with pure struct + numpy, no codec library (r9). r11 extends
# the real tier to PNG (parse_png below — DEFLATE is stdlib zlib), so
# the decode ladder is now: full pixels for uncompressed rasters AND
# PNG, header metadata for BMP/GIF/JPEG (above), Pillow-gated
# NotImplementedError only for formats whose entropy coders have no
# stdlib implementation (JPEG scans, compressed audio/video).
# ---------------------------------------------------------------------------

PIXEL_STATS_SCHEMA = (
    "doc_id bigint, width int, height int, channels int,"
    " mean_val double, min_val int, max_val int"
)


def _netpbm_header(payload: bytes):
    """Parse a P5/P6 header: (width, height, maxval, channels,
    raster_pos) or None. Handles comments (#...) and arbitrary
    whitespace BETWEEN tokens; per the spec the raster starts after
    EXACTLY ONE whitespace byte following maxval — a '#' or EOF there
    is rejected (r10, ADVICE: advancing blindly would shift the raster
    read and silently decode wrong pixels, violating the
    'corrupt streams raise, never invent' contract)."""
    if payload[:2] not in (b"P5", b"P6"):
        return None
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
            continue
        if c == b"#":
            nl = payload.find(b"\n", pos)
            if nl == -1:
                return None
            pos = nl + 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1] not in b" \t\r\n#":
            pos += 1
        tokens.append(payload[start:pos])
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        return None
    # the single raster delimiter — tuple membership, not substring:
    # payload[pos:pos+1] is b"" at EOF and b"" is "in" any bytes
    if payload[pos : pos + 1] not in (b" ", b"\t", b"\r", b"\n"):
        return None
    pos += 1
    channels = 3 if payload[:2] == b"P6" else 1
    return w, h, maxval, channels, pos


def parse_netpbm(payload: bytes):
    """Decode a binary Netpbm raster (P5 grayscale / P6 RGB): returns
    (width, height, channels, ndarray[h, w, ch]) or None if the payload
    is not Netpbm or is truncated/corrupt. Handles header comments
    (#...), arbitrary whitespace, and 16-bit (maxval > 255, big-endian
    per the spec) samples. Pure bytes + numpy — works in codec-less
    environments because the format IS the raw raster."""
    import numpy as np

    hdr = _netpbm_header(payload)
    if hdr is None:
        return None
    w, h, maxval, channels, pos = hdr
    bytes_per = 1 if maxval < 256 else 2
    need = w * h * channels * bytes_per
    raw = payload[pos : pos + need]
    if len(raw) < need:
        return None
    arr = np.frombuffer(raw, dtype=">u2" if bytes_per == 2 else "u1")
    return w, h, channels, arr.reshape(h, w, channels)


def parse_png(payload: bytes):
    """REAL PNG pixel decode with the standard library only (r11):
    returns (width, height, channels, ndarray[h, w, ch]) or None.

    PNG's entropy coder is DEFLATE, which ``zlib`` implements — so
    unlike JPEG, full pixel decode needs no external codec: walk the
    chunk stream (CRC-checking each chunk — a corrupt stream returns
    None, never invented pixels), inflate the concatenated IDAT data,
    reconstruct the per-scanline filters (None/Sub/Up/Average/Paeth —
    filters operate on BYTES regardless of sample depth, PNG spec §9),
    and reshape. Covers color types 0/2/4/6 at bit depth 8 and 16
    (16-bit samples big-endian, matching parse_netpbm's convention)
    and type 3 (palette) at depth 8 via PLTE lookup (output is the
    looked-up RGB raster, channels=3). Returns None for Adam7
    interlace and sub-byte depths (valid PNGs this tier does not
    cover), for tRNS transparency and unrecognized CRITICAL chunks
    (honoring either would change pixels — "None, never invented
    pixels"; ancillary chunks like tEXt/gAMA are skipped per spec),
    and for any structural corruption: bad CRC, truncated chunk,
    inflate error, or a raster length that disagrees with the header.
    IDAT inflation is CAPPED at the header-declared raster size, so a
    crafted deflate bomb is rejected without the allocation it tried
    to provoke.

    Per-byte filter reconstruction runs in Python inside the
    Arrow-batched operator — correct and dependency-free; a production
    deployment swaps this one function for a C codec without touching
    the Spark plumbing around it."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(payload)
    ihdr, plte, idat = None, None, []
    saw_iend = False
    while pos + 12 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        if pos + 12 + length > n:
            return None  # truncated chunk
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        pos += 12 + length
        if ctype == b"IHDR":
            if length != 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            saw_iend = True
            break
        elif ctype == b"tRNS":
            # transparency (palette alpha / color-keyed): this tier has
            # no alpha channel to express it in, and decoding to opaque
            # RGB would silently drop it — pixels differing from a
            # reference decoder violates "None, never invented pixels"
            # (r12, ADVICE)
            return None
        elif not ctype[0] & 0x20:
            # unrecognized CRITICAL chunk (uppercase first letter, PNG
            # spec §5.4): the spec forbids rendering without honoring
            # it, so skipping would invent pixels — reject like Adam7
            return None
    # a stream that never reaches IEND is truncated even if every
    # present chunk CRC-checks — strict, per "corrupt streams raise"
    if ihdr is None or not idat or not saw_iend:
        return None
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace != 0:
        return None  # Adam7 / nonstandard methods: not this tier
    if ctype_i not in _PNG_CHANNELS or w <= 0 or h <= 0:
        return None
    ch = _PNG_CHANNELS[ctype_i]
    if ctype_i == 3:
        if depth != 8 or plte is None or len(plte) % 3:
            return None
        bps = 1
    elif depth in (8, 16):
        bps = depth // 8
    else:
        return None  # sub-byte depths: not this tier
    bpp = ch * bps
    stride = w * bpp
    # cap inflation at the header-declared raster size (r12, ADVICE):
    # a kilobyte-scale crafted IDAT (deflate bomb) must not allocate
    # gigabytes executor-side before the length check rejects it —
    # decompressobj stops at max_length, then one 1-byte probe detects
    # any surplus output without producing it
    need = h * (1 + stride)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), need)
        surplus = d.decompress(d.unconsumed_tail, 1)
    except zlib.error:
        return None
    if len(raw) != need or surplus:
        return None
    out = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        o = y * stride
        if f == 0:  # None
            out[o : o + stride] = line
        elif f == 2:  # Up — vectorized (no horizontal dependency)
            if y == 0:
                out[o : o + stride] = line
            else:
                cur = np.frombuffer(line, dtype="u1")
                up = np.frombuffer(out[o - stride : o], dtype="u1")
                out[o : o + stride] = (cur + up).astype("u1").tobytes()
        elif f == 1:  # Sub
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (line[x] + a) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                b = out[o - stride + x] if y > 0 else 0
                out[o + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                b = out[o - stride + x] if y > 0 else 0
                c = out[o - stride + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + x] = (line[x] + pr) & 0xFF
        else:
            return None  # undefined filter type
    if ctype_i == 3:
        idx = np.frombuffer(bytes(out), dtype="u1").reshape(h, w)
        pal = np.frombuffer(plte, dtype="u1").reshape(-1, 3)
        if int(idx.max()) >= pal.shape[0]:
            return None  # index past the palette — corrupt
        return w, h, 3, pal[idx]
    arr = np.frombuffer(bytes(out), dtype=">u2" if bps == 2 else "u1")
    return w, h, ch, arr.reshape(h, w, ch)


def encode_png(arr) -> bytes:
    """Encode an (h, w) or (h, w, ch) sample array as a minimal VALID
    PNG — filter-0 scanlines, one zlib-compressed IDAT, CRC-complete —
    the write half of the r11 real-PNG tier (round-trips through
    parse_png bit-exactly). Channel count picks the color type (1 →
    gray, 2 → gray+alpha, 3 → RGB, 4 → RGBA); dtype picks the depth
    (uint8 → 8-bit, anything wider → 16-bit big-endian, the
    parse_netpbm convention). Filter 0 trades a few percent of
    compression for a pure-numpy encode path — the consumers here
    (resize re-encode, fixture construction) care about validity and
    exact round-trip, not ratio."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if a.dtype == np.uint8:
        depth, dt = 8, "u1"
    else:
        depth, dt = 16, ">u2"
    raster = np.ascontiguousarray(a, dtype=dt).tobytes()
    stride = w * ch * (depth // 8)
    body = b"".join(
        b"\x00" + raster[y * stride : (y + 1) * stride] for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)

    def chunk(t: bytes, d: bytes) -> bytes:
        return (
            struct.pack(">I", len(d))
            + t
            + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )


def decode_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL pixel-level decode + reduce for Netpbm AND PNG payloads
    (r11 — PNG's DEFLATE entropy coding decodes with stdlib zlib; see
    parse_png): per doc, dimensions plus exact mean/min/max sample
    values computed from the decoded raster (numpy over the Arrow
    batch — the shape every image-quality filter at 100 TB takes:
    decode executor-side, ship only scalar features). Payloads that
    are neither raise — JPEG scans and compressed audio/video need a
    codec library (absent here); use decode_media for header-only
    metadata on those."""
    import numpy as np  # noqa: F401  (decode dependency, imported eagerly)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                parsed = parse_netpbm(raw) or parse_png(raw)
                if parsed is None:
                    raise NotImplementedError(
                        f"doc {doc_id}: pixel decode is implemented codec-free "
                        "for Netpbm P5/P6 and PNG (zlib inflate + filter "
                        "reconstruction); other compressed formats need an "
                        "image codec (Pillow — absent in this environment)"
                    )
                w, h, ch, arr = parsed
                rows.append(
                    (doc_id, w, h, ch, float(arr.mean()), int(arr.min()), int(arr.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "mean_val", "min_val", "max_val",
                ],
            ).astype(
                {"width": "int32", "height": "int32", "channels": "int32",
                 "min_val": "int32", "max_val": "int32"}
            )

    return df.select("doc_id", "payload").mapInPandas(stats, schema=PIXEL_STATS_SCHEMA)


def parse_avi_frames(payload: bytes):
    """Codec-less AVI DEMUX: offsets/sizes of the video frame chunks
    ('##dc'/'##db' inside LIST movi) from the RIFF container with pure
    `struct` — the video twin of parse_audio_header's chunk walk.
    Demuxing is container arithmetic, not codec work: the returned
    frames are still encoded, but WHICH bytes are frame k is real.
    Returns a list of (offset, size) in stream order, or None if the
    payload is not a parsable RIFF/AVI."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int, in_movi: bool) -> bool:
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            csize = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if body + csize > len(payload):
                return False  # truncated chunk: corrupt container
            if cid == b"LIST" and csize >= 4:
                ltype = payload[body : body + 4]
                if not walk(body + 4, body + csize, in_movi or ltype == b"movi"):
                    return False
            elif in_movi and cid[:2].isdigit() and cid[2:4] in (b"dc", b"db"):
                frames.append((body, csize))
            pos = body + csize + (csize & 1)  # chunks are 2-byte aligned
        return True

    riff_end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    if not walk(12, riff_end, False):
        return None
    return frames
