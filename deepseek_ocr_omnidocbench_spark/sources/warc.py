"""WARC source: Common Crawl's native archive format -> the engine's
pages table (url, warc_ts, html, ...), from scratch (ISO 28500 framing;
no warcio in this container).

A WARC file is a concatenation of records; each is::

    WARC/1.0\r\n
    <warc headers>\r\n
    \r\n
    <Content-Length bytes of payload>\r\n\r\n

Common Crawl ships every record as its OWN gzip member (the spec's
record-at-time compression), so a .warc.gz is a stream of concatenated
gzip members — ``_gunzip_members`` walks them with raw zlib; plain
.warc bytes pass through untouched.

``response`` records carry an HTTP/1.1 response (status line + headers
+ body): ``_split_http_response`` strips the envelope and reports
status/content-type so callers can gate on them (the reference pipeline
only feeds 200/text-ish payloads to extraction).

Scale shape: files arrive via ``spark.read.format("binaryFile")`` (or
an Iceberg binary column); record splitting + HTTP parsing run in ONE
mapInPandas pass — per-file work, no shuffle; the output feeds
plans/extract_pipeline.py unchanged.  WARC segments are ~1 GB by
convention, so one file per task is the right granularity at 10^12
docs (Common Crawl itself is ~90k segments/crawl).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_CRLF = b"\r\n"


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (WARC
    record-at-time compression); plain bytes pass through."""
    if not blob.startswith(b"\x1f\x8b"):
        return blob
    out = []
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("latin-1").strip().lower()] = \
                v.decode("latin-1").strip()
    return headers


def parse_warc_records(blob: bytes) -> list[dict]:
    """Split raw WARC bytes into records -> [{type, url, date, headers,
    payload}].  Tolerant: a malformed tail stops parsing and CORRUPT
    gzip yields whatever prefix decompressed (one poisoned segment must
    not kill a task)."""
    try:
        data = _gunzip_members(bytes(blob))
    except zlib.error:
        return []
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if not data[pos:pos + 5] == b"WARC/":
            break
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) < length:
            break  # truncated record
        records.append({
            "type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "headers": headers,
            "payload": payload,
            # byte extent within the DECOMPRESSED stream: what a CDX
            # index stores so a reader can seek straight to the record
            "offset": pos,
            "length": body_start + length - pos,
        })
        pos = body_start + length
    return records


def _split_http_response(payload: bytes) -> tuple[Optional[int],
                                                  Optional[str], bytes]:
    """(status, content_type, body) from an HTTP response envelope;
    non-HTTP payloads come back as (None, None, payload)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        return None, None, payload
    head = payload[:sep]
    status_line = head.split(_CRLF, 1)[0].decode("latin-1", "replace")
    parts = status_line.split()
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = _parse_headers(head).get("content-type")
    return status, ctype, payload[sep + 4:]


def _parse_ts(iso: Optional[str]) -> Optional[datetime]:
    if not iso:
        return None
    try:
        return datetime.strptime(iso, "%Y-%m-%dT%H:%M:%SZ") \
            .replace(tzinfo=timezone.utc)
    except ValueError:
        return None


PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
])


def warc_to_pages(warc_files: DataFrame,
                  data_col: str = "content") -> DataFrame:
    """WARC blobs -> pages rows (url, warc_ts, html, http_status,
    content_type): keeps only ``response`` records, strips the HTTP
    envelope.  One mapInPandas pass, no shuffle."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[data_col]:
                if blob is None:
                    continue
                for rec in parse_warc_records(blob):
                    if rec["type"] != "response":
                        continue
                    status, ctype, body = _split_http_response(rec["payload"])
                    rows.append((rec["url"], _parse_ts(rec["date"]),
                                 body, status, ctype))
            yield pd.DataFrame(rows, columns=[
                "url", "warc_ts", "html", "http_status", "content_type"])

    return warc_files.mapInPandas(_gen, PAGES_SCHEMA)


def read_warc(spark, path: str) -> DataFrame:
    """Read .warc/.warc.gz files under ``path`` into pages rows via the
    binaryFile source (one file per task — the WARC segment IS the work
    unit, matching Common Crawl's ~1 GB segment convention)."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc*").load(path)
             .select("content"))
    return warc_to_pages(files)


def cdx_index(warc_files: DataFrame,
              data_col: str = "content") -> DataFrame:
    """WARC blobs -> CDX-style index rows (url, ts14, digest, offset,
    length, status): per response record its 14-digit timestamp, the
    md5 payload digest, and the byte extent within the decompressed
    segment — the artifact web archives ship next to every WARC so
    readers can seek to one record without scanning the segment
    (join ``surt_key(url)`` on top for the sort key and write sorted
    by it: one sortWithinPartitions, no extra shuffle).

    One mapInPandas pass, no shuffle; a corrupt segment indexes its
    readable prefix (the parse tolerance contract)."""
    import hashlib

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[data_col]:
                if blob is None:
                    continue
                for rec in parse_warc_records(blob):
                    if rec["type"] != "response":
                        continue
                    status, _, _ = _split_http_response(rec["payload"])
                    ts = _parse_ts(rec["date"])
                    rows.append((
                        rec["url"],
                        ts.strftime("%Y%m%d%H%M%S") if ts else None,
                        hashlib.md5(rec["payload"]).hexdigest(),
                        rec["offset"], rec["length"], status))
            yield pd.DataFrame(rows, columns=[
                "url", "ts14", "digest", "offset", "length",
                "http_status"])

    schema = ("url string, ts14 string, digest string, offset long, "
              "length long, http_status int")
    return warc_files.mapInPandas(_gen, schema)
