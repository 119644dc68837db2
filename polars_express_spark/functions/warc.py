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


def parse_http_response(content: bytes):
    """Split a WARC response record's HTTP payload: returns
    (status_code, headers dict lower-cased, body bytes) or None on a
    malformed status line / headers. The body is everything after the
    blank line (Content-Length, when present and sane, trims trailing
    padding)."""
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
    cl = headers.get("content-length")
    if cl is not None and cl.isdigit() and int(cl) <= len(body):
        body = body[: int(cl)]
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


def encode_warc(responses, gzip_members: bool = False) -> bytes:
    """Independent WARC writer for the round-trip tests/queries: a
    warcinfo record (the crawl convention) followed by one response
    record per (uri, http_status, body) triple, each response wrapping
    a real HTTP payload with Content-Type/Content-Length headers.
    ``gzip_members=True`` compresses EACH RECORD as its own gzip member
    (the Common Crawl splittability convention)."""
    info = _warc_record(
        "warcinfo", b"software: polars-express-spark\r\n",
        {"Content-Type": "application/warc-fields"},
    )
    recs = [info]
    for uri, status, body in responses:
        reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
            status, "Status"
        )
        http = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + bytes(body)
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
    "http_status int, body_len bigint, mean_b double, min_b int, max_b int"
)


def read_warc_records(df):
    """WARC extraction operator: one archive row → one row per RESPONSE
    record (the sample_frames generator shape — output cardinality ≠
    input). Per record: the WARC headers give type and target URI, the
    HTTP payload splits into status + body, and exact byte stats over
    the body ship as scalars. warcinfo/request/metadata records are
    counted past, not emitted (the crawl-extraction convention: the
    response chain is the corpus). Malformed archives or HTTP payloads
    raise — at 100 TB a silent skip is a silent corpus hole.

    Arrow-batched mapInPandas; archive bytes never leave the executor."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                    status, _hh, body = h
                    arr = np.frombuffer(body, dtype=np.uint8)
                    rows.append(
                        (doc_id, rec_no,
                         rec["headers"]["warc-type"],
                         rec["headers"].get("warc-target-uri", ""),
                         status, len(body),
                         float(arr.mean()) if arr.size else 0.0,
                         int(arr.min()) if arr.size else 0,
                         int(arr.max()) if arr.size else 0)
                    )
                    rec_no += 1
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "rec_no", "warc_type", "uri",
                         "http_status", "body_len", "mean_b", "min_b",
                         "max_b"],
            ).astype({"rec_no": "int32", "http_status": "int32",
                      "min_b": "int32", "max_b": "int32"})

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=WARC_RECORDS_SCHEMA
    )
