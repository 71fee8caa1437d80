"""WARC (ISO 28500) ingestion — the format web crawls actually ship.

A WARC file is a sequence of records: a ``WARC/1.0`` version line,
CRLF header lines, a blank line, ``Content-Length`` bytes of block,
and a trailing ``\\r\\n\\r\\n``. For *response* records the block is an
HTTP response (status line + headers + body). This module parses the
real grammar with stdlib only — whole-file gzip transparently
(``.warc.gz`` written as one member or as the common
member-per-record stream both decompress with a single ``zlib``
multi-member loop).

Ray plumbing: ``ray.data.read_binary_files`` gives one (path, bytes)
row per file — file-level parallelism, the natural unit since records
inside a file are sequential by format. ``warc_records_ds`` turns it
into (url, warc_ts, record_id, status, html) rows via a flat
per-file parse inside ``map_batches``; downstream is the ordinary
pages pipeline (HtmlExtractor etc.). At 100 TB the unit of work stays
the WARC file (crawls ship millions of ~1 GB files), so the reader
needs no intra-file split.
"""

from __future__ import annotations

import gzip
import io
import zlib

import numpy as np
import pandas as pd
import ray.data as rd

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL gzip members (warc.gz is usually one member per
    record, concatenated)."""
    out = []
    off = 0
    while off < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data[off:]))
        tail = d.unused_data
        if not tail:
            break
        off = len(data) - len(tail)
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """bytes of one WARC file -> list of response-record dicts
    (url, warc_ts, record_id, status, html)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    recs = []
    off = 0
    n = len(data)
    while off < n:
        # skip inter-record padding
        while off < n and data[off:off + 1] in (b"\r", b"\n"):
            off += 1
        if off >= n:
            break
        if not data[off:off + 5] == b"WARC/":
            raise ValueError(f"bad WARC version line at offset {off}")
        hdr_end = data.index(_CRLF + _CRLF, off)
        headers = {}
        for line in data[off:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        block = data[hdr_end + 4:hdr_end + 4 + clen]
        off = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        # HTTP response: status line + headers + CRLFCRLF + body
        status = 0
        body = block
        if block[:5] == b"HTTP/":
            he = block.find(_CRLF + _CRLF)
            status_line = block[:block.find(_CRLF)].decode(
                "utf-8", "replace").split()
            status = int(status_line[1]) if len(status_line) > 1 else 0
            body = block[he + 4:] if he >= 0 else b""
        recs.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "status": status,
            "html": body})  # BYTES — the html_text stage's contract
    return recs


def warc_records_ds(paths):
    """Dataset of (url, warc_ts, record_id, status, html) response
    rows from WARC file(s) — one parse task per file. ``html`` is the
    raw body BYTES (the HtmlExtractor contract)."""
    files = rd.read_binary_files(paths)

    def parse(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for data in b["bytes"]:
            rows.extend(parse_warc(bytes(data)))
        if not rows:
            return pd.DataFrame({
                "url": pd.Series(dtype=object),
                "warc_ts": pd.Series(dtype=object),
                "record_id": pd.Series(dtype=object),
                "status": pd.Series(dtype=np.int64),
                "html": pd.Series(dtype=object)})
        out = pd.DataFrame(rows)
        out["status"] = out["status"].astype(np.int64)
        return out

    return files.map_batches(parse, batch_format="pandas",
                             batch_size=1)


def write_warc(records: list[dict], path: str,
               compress: bool = False) -> None:
    """Test/export helper: (url, warc_ts, record_id, status, html)
    dicts -> a spec-conformant WARC (optionally gzip, one member per
    record — the CommonCrawl layout)."""
    members = []
    for r in records:
        body = (r["html"] if isinstance(r["html"], bytes)
                else r["html"].encode())
        http = (f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
                f"Content-Type: text/html\r\n\r\n").encode() + body
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Target-URI: {r['url']}\r\n"
               f"WARC-Date: {r.get('warc_ts', '')}\r\n"
               f"WARC-Record-ID: {r.get('record_id', '')}\r\n"
               f"Content-Length: {len(http)}\r\n\r\n").encode()
        rec = hdr + http + _CRLF + _CRLF
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(rec)
            members.append(buf.getvalue())
        else:
            members.append(rec)
    with open(path, "wb") as f:
        f.write(b"".join(members))
