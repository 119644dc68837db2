"""WARC (Web ARChive, ISO 28500) reader/writer (SURVEY.md §2.10, r15).

The training-data ingestion format: Common Crawl ships its corpus as
WARC files — a sequence of records (`WARC/1.0` version line, RFC
822-style headers, a Content-Length-delimited block, a blank-line
separator), conventionally with each record its own GZIP MEMBER so
readers can split archives without decompressing everything. Both the
plain and the member-gzipped forms parse here; inflation rides stdlib
zlib with a hard output cap (the PNG bomb-guard precedent).

parse_warc returns the record list (headers + content bytes);
parse_http_response splits the response records' HTTP payload
(status line, headers, body) the way a crawl-extraction pipeline needs;
encode_warc is the independent writer twin (warcinfo convention
included) for the round-trip tests and the driver query.

Scale posture: records are parsed executor-side inside Arrow batches
(read_warc_records below explodes one archive row into record rows —
the sample_frames generator shape); only scalar stats and bounded text
fields move. At 100 TB the archive bytes stay in
the data plane; the member-gzip convention is exactly what makes a
1000-executor split of a crawl dump possible, which is why the parser
enforces it strictly rather than guessing.

Reference parity anchor: the reference's ingestion surface is CSV-only
(reference src/main.rs:41-52) plus the dead HTML link scraper
(src/scraper.rs:11-28); WARC is the §2.10 training-pipeline extension
of that ingest path.
"""

from __future__ import annotations

import zlib

_MAX_INFLATE = 1 << 26  # 64 MiB output cap across all members (bomb guard)


def _gunzip_members(payload: bytes):
    """Inflate a multi-member gzip stream: returns the concatenated
    output and the list of per-member output lengths, or None on any
    corruption (bad magic mid-stream, truncated member, CRC mismatch —
    zlib verifies each member's CRC-32 trailer) or on blowing the
    output cap."""
    out = bytearray()
    lens = []
    rest = payload
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(rest, _MAX_INFLATE + 1 - len(out))
        except zlib.error:
            return None
        if len(out) + len(chunk) > _MAX_INFLATE:
            return None
        if not d.eof:
            return None  # truncated member or cap hit mid-member
        out += chunk
        lens.append(len(chunk))
        rest = d.unused_data
    return bytes(out), lens


def parse_warc(payload: bytes):
    """REAL WARC parse: returns a list of records
    [{"version", "headers" (dict, names lower-cased), "content"
    (bytes)}, ...] or None. Accepts the plain form and the
    member-gzipped form (payload starting with the gzip magic);
    grammar per ISO 28500: a `WARC/1.0` or `WARC/1.1` version line,
    CRLF header lines `Name: value` up to an empty line, exactly
    Content-Length bytes of block, then the mandatory CRLF CRLF record
    separator. None on a bad version line, a header line without a
    colon, a missing/non-numeric Content-Length, a block or separator
    overrunning the payload, or trailing garbage — truncation is
    corruption, never a short read."""
    if payload[:2] == b"\x1f\x8b":
        g = _gunzip_members(payload)
        if g is None:
            return None
        payload = g[0]
    records = []
    pos = 0
    while pos < len(payload):
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            return None
        version = payload[pos:eol]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            return None
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = payload.find(b"\r\n", pos)
            if eol < 0:
                return None
            line = payload[pos:eol]
            pos = eol + 2
            if not line:
                break
            c = line.find(b":")
            if c <= 0:
                return None
            try:
                name = line[:c].decode("ascii").strip().lower()
                value = line[c + 1 :].decode("utf-8").strip()
            except UnicodeDecodeError:
                return None
            headers[name] = value
        if "content-length" not in headers or not headers[
            "content-length"
        ].isdigit():
            return None
        clen = int(headers["content-length"])
        if pos + clen + 4 > len(payload):
            return None
        content = payload[pos : pos + clen]
        if payload[pos + clen : pos + clen + 4] != b"\r\n\r\n":
            return None
        pos += clen + 4
        records.append(
            {"version": version.decode("ascii"), "headers": headers,
             "content": content}
        )
    if not records:
        return None
    return records


_HEX_DIGITS = frozenset(b"0123456789abcdefABCDEF")


def _dechunk(b: bytes):
    """Undo Transfer-Encoding: chunked (RFC 9112 §7.1): hex size line
    (chunk extensions after ';' skipped), CRLF, exactly that many data
    bytes, CRLF; the zero-size chunk then optional trailer fields up
    to the final blank line, which must end the buffer EXACTLY (the
    WARC record's Content-Length already delimits the payload, so
    leftover bytes are corruption). None on any malformed framing."""
    out = bytearray()
    pos = 0
    while True:
        eol = b.find(b"\r\n", pos)
        if eol < 0:
            return None
        sz = b[pos:eol].split(b";", 1)[0].strip()
        if not sz or any(c not in _HEX_DIGITS for c in sz):
            return None
        n = int(sz, 16)
        pos = eol + 2
        if n == 0:
            while True:  # optional trailer fields, then the blank line
                eol = b.find(b"\r\n", pos)
                if eol < 0:
                    return None
                line = b[pos:eol]
                pos = eol + 2
                if not line:
                    break
                if line.find(b":") <= 0:
                    return None
            if pos != len(b):
                return None  # strict: chunked framing consumes exactly
            return bytes(out)
        if pos + n + 2 > len(b) or len(out) + n > _MAX_INFLATE:
            return None
        out += b[pos : pos + n]
        if b[pos + n : pos + n + 2] != b"\r\n":
            return None
        pos += n + 2


def _inflate_body(body: bytes, encoding: str):
    """Undo Content-Encoding through the capped bomb guard: gzip /
    x-gzip (one gzip member, CRC-32 trailer verified by zlib) or
    deflate (the RFC 9110 zlib wrapper). None on corruption, a cap
    blow, trailing bytes, or an out-of-envelope coding (br, zstd,
    compress — a crawl pipeline must not silently treat compressed
    bytes as text)."""
    if encoding in ("gzip", "x-gzip"):
        wbits = 31
    elif encoding == "deflate":
        wbits = 15
    else:
        return None
    d = zlib.decompressobj(wbits=wbits)
    try:
        data = d.decompress(body, _MAX_INFLATE + 1)
    except zlib.error:
        return None
    if (len(data) > _MAX_INFLATE or not d.eof or d.unconsumed_tail
            or d.unused_data):
        return None
    return data


def parse_http_response(content: bytes):
    """Split a WARC response record's HTTP payload: returns
    (status_code, headers dict lower-cased, body bytes) or None on a
    malformed status line / headers. The body is everything after the
    blank line; (r18) Transfer-Encoding: chunked is undone first
    (framing must consume the record exactly — real Common Crawl
    response records are routinely chunked), then Content-Encoding:
    gzip/x-gzip/deflate is inflated through the capped bomb guard
    (identity/absent passes through; other codings are out of
    envelope → None). Without chunking, Content-Length, when present
    and sane, trims trailing padding."""
    sep = content.find(b"\r\n\r\n")
    if sep < 0:
        return None
    head = content[:sep].split(b"\r\n")
    parts = head[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None
    try:
        status = int(parts[1])
    except ValueError:
        return None
    headers: dict[str, str] = {}
    for line in head[1:]:
        c = line.find(b":")
        if c <= 0:
            return None
        try:
            headers[line[:c].decode("ascii").strip().lower()] = (
                line[c + 1 :].decode("utf-8").strip()
            )
        except UnicodeDecodeError:
            return None
    body = content[sep + 4 :]
    te = headers.get("transfer-encoding", "").strip().lower()
    if te:
        if te != "chunked":
            return None  # other transfer codings are out of envelope
        body = _dechunk(body)
        if body is None:
            return None
    else:
        cl = headers.get("content-length")
        if cl is not None and cl.isdigit() and int(cl) <= len(body):
            body = body[: int(cl)]
    ce = headers.get("content-encoding", "").strip().lower()
    if ce and ce != "identity":
        body = _inflate_body(body, ce)
        if body is None:
            return None
    return status, headers, body


def _warc_record(rtype: str, content: bytes, extra: dict | None = None) -> bytes:
    hdrs = {
        "WARC-Type": rtype,
        "WARC-Record-ID": f"<urn:uuid:{rtype}-{len(content)}>",
        "WARC-Date": "2026-01-01T00:00:00Z",
        "Content-Length": str(len(content)),
    }
    if extra:
        hdrs.update(extra)
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in hdrs.items()
    )
    return head + b"\r\n" + content + b"\r\n\r\n"


def _chunk_body(body: bytes, chunk_size: int) -> bytes:
    """Frame a body as Transfer-Encoding: chunked (hex sizes, the
    zero-size terminator, no trailers)."""
    out = bytearray()
    for at in range(0, len(body), chunk_size):
        piece = body[at : at + chunk_size]
        out += f"{len(piece):x}\r\n".encode() + piece + b"\r\n"
    out += b"0\r\n\r\n"
    return bytes(out)


def encode_warc(responses, gzip_members: bool = False,
                chunk_size: int = 64) -> bytes:
    """Independent WARC writer for the round-trip tests/queries: a
    warcinfo record (the crawl convention) followed by one response
    record per (uri, http_status, body[, mode]) tuple, each response
    wrapping a real HTTP payload. ``mode`` (r18) is 'identity'
    (default — Content-Length body), 'chunked' (Transfer-Encoding
    framing in ``chunk_size`` pieces), 'gzip' (Content-Encoding with
    a Content-Length), or 'chunked+gzip' (gzip applied first, then
    chunk framing — the RFC layering). ``gzip_members=True``
    compresses EACH RECORD as its own gzip member (the Common Crawl
    splittability convention)."""
    info = _warc_record(
        "warcinfo", b"software: polars-express-spark\r\n",
        {"Content-Type": "application/warc-fields"},
    )
    recs = [info]
    for resp in responses:
        uri, status, body = resp[0], resp[1], bytes(resp[2])
        mode = resp[3] if len(resp) > 3 else "identity"
        if mode not in ("identity", "chunked", "gzip", "chunked+gzip"):
            raise ValueError(f"unknown body mode {mode!r}")
        reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
            status, "Status"
        )
        hdrs = ["Content-Type: text/plain"]
        wire = body
        if "gzip" in mode:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            wire = co.compress(wire) + co.flush()
            hdrs.append("Content-Encoding: gzip")
        if "chunked" in mode:
            wire = _chunk_body(wire, chunk_size)
            hdrs.append("Transfer-Encoding: chunked")
        else:
            hdrs.append(f"Content-Length: {len(wire)}")
        http = (
            f"HTTP/1.1 {status} {reason}\r\n"
            + "\r\n".join(hdrs) + "\r\n\r\n"
        ).encode() + wire
        recs.append(
            _warc_record(
                "response", http,
                {"WARC-Target-URI": uri,
                 "Content-Type": "application/http;msgtype=response"},
            )
        )
    if gzip_members:
        out = b""
        for r in recs:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(r) + co.flush()
        return out
    return b"".join(recs)


WARC_RECORDS_SCHEMA = (
    "doc_id bigint, rec_no int, warc_type string, uri string, "
    "http_status int, body_mode string, body_len bigint, mean_b double, "
    "min_b int, max_b int"
)


def warc_record_batches(batches):
    """Batch-iterator core of read_warc_records (module-level so query
    synth stages can compose with it inside ONE mapInPandas pass —
    one Python-runner handshake, no JVM round trip of the payload)."""
    from collections.abc import Iterator
    import numpy as np
    import pandas as pd

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            recs = parse_warc(bytes(payload))
            if recs is None:
                raise ValueError(
                    f"doc {doc_id}: corrupt or out-of-envelope WARC"
                )
            rec_no = 0
            for rec in recs:
                if rec["headers"].get("warc-type") != "response":
                    continue
                h = parse_http_response(rec["content"])
                if h is None:
                    raise ValueError(
                        f"doc {doc_id}: response record {rec_no} has a "
                        "malformed HTTP payload"
                    )
                status, hh, body = h
                # the wire body framing/coding, pinned under the
                # hash (r18): 'identity' / 'chunked' / 'gzip' /
                # 'chunked+gzip' — the writer's mode spelling
                parts = []
                if hh.get("transfer-encoding"):
                    parts.append("chunked")
                ce = hh.get("content-encoding", "").strip().lower()
                if ce and ce != "identity":
                    parts.append(ce)
                mode = "+".join(parts) if parts else "identity"
                arr = np.frombuffer(body, dtype=np.uint8)
                rows.append(
                    (doc_id, rec_no,
                     rec["headers"]["warc-type"],
                     rec["headers"].get("warc-target-uri", ""),
                     status, mode, len(body),
                     float(arr.mean()) if arr.size else 0.0,
                     int(arr.min()) if arr.size else 0,
                     int(arr.max()) if arr.size else 0)
                )
                rec_no += 1
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "rec_no", "warc_type", "uri",
                     "http_status", "body_mode", "body_len",
                     "mean_b", "min_b", "max_b"],
        ).astype({"rec_no": "int32", "http_status": "int32",
                  "min_b": "int32", "max_b": "int32"})


def read_warc_records(df):
    """WARC extraction operator: one archive row → one row per RESPONSE
    record (the sample_frames generator shape — output cardinality ≠
    input). Per record: the WARC headers give type and target URI, the
    HTTP payload splits into status + DECODED body (r18: chunked
    framing undone, gzip/deflate inflated — body_mode pins the wire
    coding under the hash), and exact byte stats over
    the body ship as scalars. warcinfo/request/metadata records are
    counted past, not emitted (the crawl-extraction convention: the
    response chain is the corpus). Malformed archives or HTTP payloads
    raise — at 100 TB a silent skip is a silent corpus hole.

    Arrow-batched mapInPandas; archive bytes never leave the executor."""
    return df.select("doc_id", "payload").mapInPandas(
        warc_record_batches, schema=WARC_RECORDS_SCHEMA
    )
