"""ZIP archive reader/writer (SURVEY.md §2.10 ingestion tier, r15).

The other corpus-in-an-archive grammar next to WARC: datasets ship as
zips of text/JSON members constantly. Pure struct + stdlib zlib:

- parse_zip walks the archive the way the format intends — find the
  End Of Central Directory record (reverse scan for its signature with
  a consistent comment length), then the central directory, then each
  member's local header. STORED and DEFLATE members extract; each
  member's CRC-32 AND declared uncompressed size are verified (zip is
  a CHECKSUMMED format — a bit flip in member data is detected, the
  PNG/FLAC/Ogg side of the §2.10 integrity asymmetry), and inflation
  is capped (the PNG bomb-guard precedent; a zip bomb rejects, never
  allocates).
- Zip64 (r16): the EOCD64 locator/record and per-entry 0x0001 extras
  resolve the 0xFFFFFFFF sentinels, so >4 GiB-form archives parse
  (declared member sizes above the 64 MiB inflate cap still reject —
  the bomb-guard policy is orthogonal to the structure envelope);
  encode_zip(zip64=True) writes the forced form for the round trip
  and stdlib zipfile cross-reads it.
- Out of envelope (None, never a guess): encryption (general-purpose
  flag bit 0), streamed data descriptors (bit 3), multi-disk archives
  (plain or zip64), compression methods other than 0/8,
  local-vs-central metadata disagreement, or member data overlapping
  the central directory.
- encode_zip is the independent writer twin.
- read_zip_entries explodes one archive row into one row per member
  with exact byte stats (the WARC operator shape).

Reference parity anchor: extends the reference's CSV-only ingest
(reference src/main.rs:41-52) the same way the WARC tier does.
"""

from __future__ import annotations

import struct
import zlib

_EOCD_SIG = 0x06054B50
_EOCD64_SIG = 0x06064B50
_EOCD64_LOC_SIG = 0x07064B50
_CDH_SIG = 0x02014B50
_LFH_SIG = 0x04034B50
_MAX_INFLATE = 1 << 26  # total uncompressed cap across all members


def _zip64_values(extra: bytes, count: int):
    """Pull ``count`` 8-byte values from the 0x0001 (Zip64 extended
    information) extra field; returns the list or None when the field
    is absent or shorter than the sentinels demand."""
    pos = 0
    while pos + 4 <= len(extra):
        hid, hlen = struct.unpack_from("<HH", extra, pos)
        pos += 4
        if pos + hlen > len(extra):
            return None
        if hid == 0x0001:
            if hlen < 8 * count:
                return None
            return list(struct.unpack_from(f"<{count}Q", extra, pos))
        pos += hlen
    return None


def parse_zip(payload: bytes):
    """REAL zip parse: returns [(name, method, comp_size, data bytes),
    ...] in central-directory order, or None. Every member's CRC-32
    and uncompressed size are verified after extraction."""
    n = len(payload)
    if n < 22:
        return None
    # EOCD: reverse-scan the last 64 KiB + 22 for the signature whose
    # comment length reaches exactly the end of the payload
    lo = max(0, n - 22 - 0xFFFF)
    eocd = None
    for i in range(n - 22, lo - 1, -1):
        if struct.unpack_from("<I", payload, i)[0] == _EOCD_SIG:
            clen = struct.unpack_from("<H", payload, i + 20)[0]
            if i + 22 + clen == n:
                eocd = i
                break
    if eocd is None:
        return None
    disk, cd_disk, n_here, n_total, cd_size, cd_off = struct.unpack_from(
        "<HHHHII", payload, eocd + 4
    )
    if disk or cd_disk or n_here != n_total:
        return None  # multi-disk archives: out of envelope
    cd_end_bound = eocd
    if (cd_off == 0xFFFFFFFF or cd_size == 0xFFFFFFFF
            or n_total == 0xFFFF):
        # Zip64 (r16 — real corpora ship >4 GiB archives, and writers
        # may force the form even below the limits): the EOCD64
        # locator sits immediately before the EOCD, pointing at the
        # EOCD64 record whose 8-byte counts/offsets replace the
        # sentinels.
        loc = eocd - 20
        if loc < 0 or struct.unpack_from("<I", payload, loc)[0] != _EOCD64_LOC_SIG:
            return None
        ldisk, eocd64_off, ndisks = struct.unpack_from(
            "<IQI", payload, loc + 4
        )
        if ldisk or ndisks != 1:
            return None  # multi-disk zip64: out of envelope
        if eocd64_off + 56 > loc:
            return None
        if struct.unpack_from("<I", payload, eocd64_off)[0] != _EOCD64_SIG:
            return None
        (r64_size, _vm, _vn, d64, cdd64, n_here64, n_total64, cd_size64,
         cd_off64) = struct.unpack_from("<QHHIIQQQQ", payload,
                                        eocd64_off + 4)
        if r64_size < 44 or d64 or cdd64 or n_here64 != n_total64:
            return None
        n_total, cd_size, cd_off = n_total64, cd_size64, cd_off64
        cd_end_bound = eocd64_off
    if cd_off + cd_size > cd_end_bound:
        return None
    out = []
    pos = cd_off
    total_inflated = 0
    for _ in range(n_total):
        if pos + 46 > cd_off + cd_size:
            return None
        if struct.unpack_from("<I", payload, pos)[0] != _CDH_SIG:
            return None
        (flags, method, _t, _d, crc, csize, usize, nlen, elen, klen,
         _dn, _ia, _ea, lfh_off) = struct.unpack_from(
            "<HHHHIIIHHHHHII", payload, pos + 8
        )
        if flags & 0x1 or flags & 0x8:
            return None  # encrypted / data-descriptor stream
        if method not in (0, 8):
            return None
        if crc == 0xFFFFFFFF:
            return None  # the CRC has no zip64 form
        name_b = payload[pos + 46 : pos + 46 + nlen]
        if len(name_b) != nlen:
            return None
        try:
            name = name_b.decode("utf-8")
        except UnicodeDecodeError:
            return None
        # zip64 sentinel resolution (r16): the 0x0001 extra carries
        # 8-byte replacements for exactly the sentinel fields, in the
        # spec's fixed order usize, csize, lfh_off
        n64 = sum(v == 0xFFFFFFFF for v in (usize, csize, lfh_off))
        if n64:
            extra = payload[pos + 46 + nlen : pos + 46 + nlen + elen]
            if len(extra) != elen:
                return None
            vals = _zip64_values(extra, n64)
            if vals is None:
                return None
            it = iter(vals)
            if usize == 0xFFFFFFFF:
                usize = next(it)
            if csize == 0xFFFFFFFF:
                csize = next(it)
            if lfh_off == 0xFFFFFFFF:
                lfh_off = next(it)
        pos += 46 + nlen + elen + klen
        # local header: re-read the lengths (they can differ from the
        # central ones); metadata itself must agree
        if lfh_off + 30 > cd_off:
            return None
        if struct.unpack_from("<I", payload, lfh_off)[0] != _LFH_SIG:
            return None
        (lflags, lmethod, _lt, _ld, lcrc, lcsize, lusize, lnlen,
         lelen) = struct.unpack_from("<HHHHIIIHH", payload, lfh_off + 6)
        if (lflags, lmethod) != (flags, method):
            return None
        if 0xFFFFFFFF in (lcsize, lusize):
            # the spec requires BOTH local sizes in the zip64 extra
            # when either is a sentinel
            if (lcsize, lusize) != (0xFFFFFFFF, 0xFFFFFFFF):
                return None
            l_extra = payload[
                lfh_off + 30 + lnlen : lfh_off + 30 + lnlen + lelen
            ]
            if len(l_extra) != lelen:
                return None
            lvals = _zip64_values(l_extra, 2)
            if lvals is None:
                return None
            lusize, lcsize = lvals  # spec order: uncompressed first
        if (lcrc, lcsize, lusize) != (crc, csize, usize):
            return None
        data_off = lfh_off + 30 + lnlen + lelen
        if data_off + csize > cd_off:
            return None  # member data may not overlap the directory
        raw = payload[data_off : data_off + csize]
        if usize > _MAX_INFLATE - total_inflated:
            return None  # bomb guard BEFORE inflating
        if method == 0:
            if csize != usize:
                return None
            data = raw
        else:
            d = zlib.decompressobj(-15)
            try:
                data = d.decompress(raw, usize + 1)
            except zlib.error:
                return None
            # unused_data: the deflate stream must consume EXACTLY
            # comp_size bytes — trailing slack inside csize is
            # corruption, same as trailing garbage anywhere else (r16)
            if (len(data) != usize or not d.eof or d.unconsumed_tail
                    or d.unused_data):
                return None
        total_inflated += usize
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            return None  # the format's own integrity check
        out.append((name, method, csize, data))
    return out


def encode_zip(entries, method: int = 8, zip64: bool = False) -> bytes:
    """Independent zip writer: ``entries`` is [(name, data bytes),
    ...]; method 0 (stored) or 8 (deflate). Writes local headers,
    member data, the central directory, and the EOCD. With
    ``zip64=True`` (r16) the archive is written in the FORCED zip64
    form — every size/offset field carries the 0xFFFFFFFF sentinel
    resolved by a 0x0001 extra, plus the EOCD64 record and locator —
    which the spec allows regardless of actual sizes and which is the
    only way to exercise the >4 GiB structures without 4 GiB of
    data (stdlib zipfile reads the result, the cross-check)."""
    if method not in (0, 8):
        raise ValueError("method must be 0 (stored) or 8 (deflate)")
    body = bytearray()
    central = bytearray()
    for name, data in entries:
        data = bytes(data)
        name_b = name.encode("utf-8")
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == 8:
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = co.compress(data) + co.flush()
        else:
            comp = data
        lfh_off = len(body)
        if zip64:
            l_extra = struct.pack("<HHQQ", 0x0001, 16, len(data), len(comp))
            body += (
                struct.pack("<I", _LFH_SIG) + b"\x2d\x00"
                + struct.pack("<HHHHIII", 0, method, 0, 0x21, crc,
                              0xFFFFFFFF, 0xFFFFFFFF)
                + struct.pack("<HH", len(name_b), len(l_extra))
                + name_b + l_extra + comp
            )
            c_extra = struct.pack(
                "<HHQQQ", 0x0001, 24, len(data), len(comp), lfh_off
            )
            central += (
                struct.pack("<I", _CDH_SIG) + b"\x2d\x03\x2d\x00"
                + struct.pack("<HHHHIII", 0, method, 0, 0x21, crc,
                              0xFFFFFFFF, 0xFFFFFFFF)
                + struct.pack("<HHHHHII", len(name_b), len(c_extra), 0,
                              0, 0, 0, 0xFFFFFFFF)
                + name_b + c_extra
            )
            continue
        common = struct.pack(
            "<HHHHIII", 0, method, 0, 0x21, crc, len(comp), len(data)
        )
        body += (
            struct.pack("<I", _LFH_SIG) + b"\x14\x00" + common
            + struct.pack("<HH", len(name_b), 0) + name_b + comp
        )
        central += (
            struct.pack("<I", _CDH_SIG) + b"\x14\x03\x14\x00" + common
            + struct.pack("<HHHHHII", len(name_b), 0, 0, 0, 0, 0, lfh_off)
            + name_b
        )
    if zip64:
        cd_off = len(body)
        eocd64 = struct.pack(
            "<IQHHIIQQQQ", _EOCD64_SIG, 44, 0x032D, 0x002D, 0, 0,
            len(entries), len(entries), len(central), cd_off,
        )
        loc = struct.pack(
            "<IIQI", _EOCD64_LOC_SIG, 0, cd_off + len(central), 1
        )
        eocd = struct.pack(
            "<IHHHHIIH", _EOCD_SIG, 0, 0, 0xFFFF, 0xFFFF, 0xFFFFFFFF,
            0xFFFFFFFF, 0,
        )
        return bytes(body + central) + eocd64 + loc + eocd
    eocd = struct.pack(
        "<IHHHHIIH", _EOCD_SIG, 0, 0, len(entries), len(entries),
        len(central), len(body), 0,
    )
    return bytes(body + central + eocd)


ZIP_ENTRIES_SCHEMA = (
    "doc_id bigint, entry_no int, name string, method int, "
    "comp_size bigint, size bigint, mean_b double, min_b int, max_b int"
)


def zip_entry_batches(batches):
    """Batch-iterator core of read_zip_entries (module-level so query
    synth stages can compose with it inside one mapInPandas pass)."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                entries = parse_zip(bytes(payload))
                if entries is None:
                    raise ValueError(
                        f"doc {doc_id}: corrupt or out-of-envelope zip"
                    )
                for eno, (name, method, csize, data) in enumerate(entries):
                    arr = np.frombuffer(data, dtype=np.uint8)
                    rows.append(
                        (doc_id, eno, name, method, csize, len(data),
                         float(arr.mean()) if arr.size else 0.0,
                         int(arr.min()) if arr.size else 0,
                         int(arr.max()) if arr.size else 0)
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "entry_no", "name", "method",
                         "comp_size", "size", "mean_b", "min_b", "max_b"],
            ).astype({"entry_no": "int32", "method": "int32",
                      "min_b": "int32", "max_b": "int32"})

def read_zip_entries(df):
    """Zip extraction operator (the WARC operator shape): one archive
    row → one row per member, with the member's name, compression
    method, sizes, and exact byte stats over the EXTRACTED data (CRC-
    verified by parse_zip). Malformed archives raise — a silent skip
    is a silent corpus hole. Arrow-batched mapInPandas."""
    return df.select("doc_id", "payload").mapInPandas(
        zip_entry_batches, schema=ZIP_ENTRIES_SCHEMA
    )
