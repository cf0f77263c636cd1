"""WARC segment source: Common-Crawl's native wire format → pages rows.

Real crawl corpora arrive as WARC files (ISO 28500): concatenated records,
each a `WARC/1.0` header block + HTTP response + payload, separated by
`\\r\\n\\r\\n`. This source turns a DataFrame of raw segment bytes — e.g.
`spark.read.format("binaryFile").load("s3://…/segments/*.warc")` — into the
engine's pages schema (url, warc_ts, html), all parsing Arrow-batched on
executors (one segment = one row in, N documents out: the same 1→N explode
shape as doc→pages).

Only `response` records with an HTTP 200 status line are emitted; request /
metadata / warcinfo records and non-200 responses are skipped, matching how
extraction corpora are distilled from crawl segments. Parsing is pure
bytes-level (no external warc lib in this container — none is needed: the
framing is line-oriented and self-describing via Content-Length).

`synthesize_warc_segment` builds deterministic segments for tests — the
reference's own self-synthesized-fixture pattern (SURVEY §5).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

CRLF = b"\r\n"
RECORD_SEP = b"\r\n\r\n"

PAGES_FROM_WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(CRLF)[1:]:  # first line is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower()] = v.strip()
    return headers


def parse_warc_records(
    data: bytes,
) -> list[tuple[str, datetime | None, bytes]]:
    """Parse one WARC segment into [(url, warc_ts, payload_bytes)].

    Walks records via Content-Length (robust against payloads containing
    blank lines); tolerates trailing garbage by stopping at the first
    malformed record boundary.
    """
    out: list[tuple[str, datetime | None, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data[pos:].startswith(b"WARC/"):
            break
        header_end = data.find(RECORD_SEP, pos)
        if header_end < 0:
            break
        headers = _parse_headers(data[pos:header_end])
        try:
            content_length = int(headers.get(b"content-length", b""))
        except ValueError:
            break
        body_start = header_end + len(RECORD_SEP)
        body = data[body_start : body_start + content_length]
        pos = body_start + content_length
        # records are separated by two CRLFs
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if headers.get(b"warc-type") != b"response":
            continue
        # body = HTTP response: status line + headers + CRLFCRLF + payload
        http_end = body.find(RECORD_SEP)
        if http_end < 0:
            continue
        status_line = body[: body.find(CRLF)]
        if b" 200 " not in status_line + b" ":
            continue
        payload = body[http_end + len(RECORD_SEP) :]
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = None
        raw_ts = headers.get(b"warc-date")
        if raw_ts:
            try:
                ts = datetime.strptime(
                    raw_ts.decode("ascii"), "%Y-%m-%dT%H:%M:%SZ"
                ).replace(tzinfo=timezone.utc)
            except ValueError:
                ts = None
        if url:
            out.append((url, ts, payload))
    return out


def pages_from_warc(segments: DataFrame, content_col: str = "content") -> DataFrame:
    """DataFrame of raw WARC segment bytes → pages(url, warc_ts, html).

    Input shape matches `spark.read.format("binaryFile")` (a `content`
    binary column); one Arrow pass per batch of segments, 1→N explode.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for data in pdf[content_col]:
                for url, ts, payload in parse_warc_records(bytes(data)):
                    rows.append({"url": url, "warc_ts": ts, "html": payload})
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html"])

    return segments.select(content_col).mapInPandas(
        _batches, schema=PAGES_FROM_WARC_SCHEMA
    )


def synthesize_warc_segment(
    docs: list[tuple[str, datetime, bytes]],
    include_request_records: bool = True,
) -> bytes:
    """Deterministic WARC segment from (url, ts, payload) triples — the test
    fixture generator (a response record per doc, optionally interleaved
    with request records that a correct parser must skip)."""
    parts = []
    for url, ts, payload in docs:
        ts_s = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        if include_request_records:
            req_body = b"GET / HTTP/1.1\r\nHost: x\r\n\r\n"
            parts.append(
                b"WARC/1.0\r\n"
                b"WARC-Type: request\r\n"
                + f"WARC-Target-URI: {url}\r\n".encode()
                + f"WARC-Date: {ts_s}\r\n".encode()
                + f"Content-Length: {len(req_body)}".encode()
                + RECORD_SEP
                + req_body
                + RECORD_SEP
            )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(payload)}\r\n".encode()
            + CRLF
            + payload
        )
        parts.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts_s}\r\n".encode()
            + f"Content-Length: {len(http)}".encode()
            + RECORD_SEP
            + http
            + RECORD_SEP
        )
    return b"".join(parts)
