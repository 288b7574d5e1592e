"""WARC source: read web-archive files into the pages-table schema.

The reference crawler journals fetches as WARC (ISO 28500) via jwarc
(``WarcRecorder.java``), and its converter/sideload tooling reads that
format back.  This is a from-scratch reader/writer for the subset the
pipeline needs — ``response`` records with an HTTP payload — built on the
public WARC/1.0 framing (header block terminated by CRLFCRLF,
``Content-Length``-delimited body, two CRLFs between records; ``.warc.gz``
files are concatenated per-record gzip members, which Python's zlib
consumes natively).

``read_warc_pages`` is the Ray-native entry: ``read_binary_files`` over
the WARC paths (one task per file — archives are independently parseable,
so the read scales with file count), a ``map_batches`` parse producing the
standard pages schema (url, warc_ts, html, status, location), ready for
``convert_pages`` or ``WebStore.prepare``.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from pathlib import Path
from typing import Iterator, Optional

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:  # first line is the version/status line
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {headers, body} per WARC record.  ``data`` may be plain or
    gzip (including concatenated per-record members)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        head = data[pos:head_end]
        if not head.startswith(b"WARC/"):
            break
        headers = _parse_headers(head)
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        yield {"headers": headers, "body": body}
        pos = body_start + length


def _split_http_payload(payload: bytes) -> tuple[int, dict[str, str], bytes]:
    """HTTP response payload -> (status, headers, body)."""
    head_end = payload.find(_CRLF2)
    if head_end < 0:
        return 200, {}, payload
    head = payload[:head_end]
    status_line = head.split(b"\r\n", 1)[0]
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = 200
    return status, _parse_headers(head), payload[head_end + 4 :]


def _warc_ts_ms(date_str: Optional[str]) -> int:
    if not date_str:
        return 0
    try:
        dt = datetime.strptime(date_str, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
        return int(dt.timestamp() * 1000)
    except ValueError:
        return 0


def warc_bytes_to_page_rows(data: bytes) -> dict[str, list]:
    """One WARC file's response records -> pages-schema columns."""
    cols: dict[str, list] = {
        "url": [], "warc_ts": [], "html": [], "status": [], "location": [],
        "x_adblock_key": [],
    }
    for rec in iter_warc_records(data):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        status, http_headers, body = _split_http_payload(rec["body"])
        cols["url"].append(url)
        cols["warc_ts"].append(_warc_ts_ms(h.get("warc-date")))
        cols["html"].append(body)
        cols["status"].append(status)
        cols["location"].append(http_headers.get("location"))
        # Acceptable Ads response-header variant (AcceptableAds.java:20-24,
        # gated at DocumentProcessor.java:89 before content-type dispatch)
        cols["x_adblock_key"].append("x-adblock-key" in http_headers)
    return cols


def read_warc_pages(paths: str | list[str]):
    """WARC file(s) -> Ray Dataset in the pages-table schema.

    One parse task per archive (``read_binary_files`` keeps whole files
    together); at corpus scale throughput comes from file-count
    parallelism, the natural unit for WARC dumps."""
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        out: dict[str, list] = {
            "url": [], "warc_ts": [], "html": [], "status": [], "location": [],
            "x_adblock_key": [],
        }
        for data in batch["bytes"]:
            cols = warc_bytes_to_page_rows(data)
            for k in out:
                out[k].extend(cols[k])
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "warc_ts": pa.array(out["warc_ts"], pa.timestamp("ms")),
                "html": pa.array(out["html"], pa.binary()),
                "status": pa.array(out["status"], pa.int16()),
                "location": pa.array(out["location"], pa.string()),
                "x_adblock_key": pa.array(out["x_adblock_key"], pa.bool_()),
            }
        )

    return rd.read_binary_files(paths).map_batches(parse, batch_format="numpy")


# ---------------------------------------------------------------------------
# writer (tests + fetch-journal export)
# ---------------------------------------------------------------------------


def write_warc(
    path: str | Path,
    records: list[dict],
    compress: Optional[bool] = None,
) -> None:
    """Write response records ({url, ts_ms, status, body, headers?}) as a
    WARC/1.0 file; ``.gz`` paths get per-record gzip members (the standard
    layout, independently seekable per record)."""
    path = Path(path)
    if compress is None:
        compress = path.suffix == ".gz"
    chunks: list[bytes] = []
    for r in records:
        dt = datetime.fromtimestamp(r.get("ts_ms", 0) / 1000, tz=timezone.utc)
        http_head = f"HTTP/1.1 {r.get('status', 200)} X\r\n"
        for k, v in (r.get("headers") or {}).items():
            http_head += f"{k}: {v}\r\n"
        payload = http_head.encode("latin-1") + b"\r\n" + (r.get("body") or b"")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {dt.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            "\r\n"
        ).encode("latin-1")
        record = head + payload + b"\r\n\r\n"
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb") as gz:
                gz.write(record)
            chunks.append(buf.getvalue())
        else:
            chunks.append(record)
    path.write_bytes(b"".join(chunks))
