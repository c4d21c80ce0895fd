"""WARC source: read Common-Crawl-style ``.warc.gz`` archives into the
canonical pages shape ``(url, warc_ts, warc_day, html, text, lang)``.

The reference is an HTTP service fed one document per request
(``ocr/main.py``); a batch engine is fed the crawl's native delivery
format instead — WARC/1.0 archives, one gzip member per record (the
Common Crawl convention). This module is the source-format bridge:
``read_warc(spark, path)`` returns a DataFrame that composes directly
with ``operators.extract.extract``.

Scale shape (the honest one for WARC):

- ``binaryFile`` + one Arrow-batched parse task per archive. WARC.gz
  is NOT splittable (gzip members carry no sync markers a generic
  splitter can find), so per-file tasks ARE the industry layout —
  crawls ship ~1 GB archives by the tens of thousands, and file count,
  not intra-file splitting, is the parallelism axis. A 100-TB crawl is
  ~100k archives = ~100k tasks: plenty for 1000 executors.
- the whole archive is held in memory during the parse (binaryFile
  semantics). At the standard ~1 GB archive size that is well inside
  executor memory; re-shard pathological archives offline.
- records stream OUT in bounded Arrow batches (``_BATCH_ROWS``), so a
  million-record archive never materializes as one python list of
  payloads.

Parsing rules (WARC/1.0, ISO 28500):

- only ``WARC-Type: response`` records yield rows; warcinfo / request /
  metadata records are skipped (counted, not errored).
- the record payload is an HTTP response; headers are split at the
  first CRLFCRLF and the remaining bytes are the page body (``html``
  column — the kernel sniffs, it never trusts labels). Chunked
  transfer-encoding is NOT decoded (Common Crawl stores payloads
  de-chunked; a raw-proxy archive would need a decode pass first —
  documented limitation).
- a malformed tail (truncated final record) stops the parse of that
  archive at the last whole record: partial crawl data is normal,
  poison isolation is the kernel's job for bodies, the source's job
  for framing.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BATCH_ROWS = 512
_CRLF2 = b"\r\n\r\n"

#: output schema — the canonical pages shape + per-archive lineage
WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, warc_day string, html binary, "
    "text string, lang string, warc_path string"
)


def _parse_warc_stream(buf: bytes) -> Iterator[dict]:
    """Yield response-record dicts from a decompressed WARC stream.
    Tolerant of the standard record separator (two CRLFs) and of a
    truncated tail (stops at the last whole record)."""
    pos, n = 0, len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = buf.find(_CRLF2, pos)
        if head_end < 0:
            return  # truncated header block
        head = buf[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return  # lost framing — stop rather than resync heuristically
        hdrs = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            length = int(hdrs.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            return  # truncated payload
        if hdrs.get("warc-type") == "response":
            yield {
                "uri": hdrs.get("warc-target-uri", ""),
                "date": hdrs.get("warc-date", ""),
                "payload": buf[body_start:body_end],
            }
        pos = body_end


def _http_body(payload: bytes) -> bytes:
    """Strip the stored HTTP response head; bytes after the first
    CRLFCRLF are the page body. A payload without an HTTP status line
    is taken as a bare body (WET-style)."""
    if payload.startswith(b"HTTP/"):
        i = payload.find(_CRLF2)
        return payload[i + len(_CRLF2):] if i >= 0 else b""
    return payload


#: timestamp for records whose WARC-Date does not parse. warc_ts is
#: CONTRACTUALLY non-null (schema.PAGES_SCHEMA/EXTRACTED_SCHEMA — the
#: partitioning column derives from it), and a NULL warc_day would
#: fall out of the checkpointed run's `isin(pending)` day filter
#: (NULL IN (...) is NULL) and be silently lost — so undated records
#: land on the epoch sentinel and commit/resume under the real
#: partition warc_day='1970-01-01' like any other day.
UNDATED_TS = datetime(1970, 1, 1)
UNDATED_DAY = "1970-01-01"


def _warc_ts(date: str):
    """WARC-Date (ISO-8601 Zulu) -> naive UTC datetime (session TZ is
    pinned UTC); unparseable dates -> the epoch sentinel (the row
    survives under warc_day=UNDATED_DAY, pruning just can't use it)."""
    try:
        dt = datetime.fromisoformat(date.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            # offset-less WARC-Date (tolerated by fromisoformat): treat
            # as UTC — astimezone on a NAIVE datetime would convert
            # from the executor's OS timezone, shifting warc_day (and
            # the partition the record lands in) per machine.
            dt = dt.replace(tzinfo=timezone.utc)
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return UNDATED_TS


def _parse_archives(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for path, content in zip(pdf["path"], pdf["content"]):
            # gzip.GzipFile reads straight through concatenated members
            # (the per-record-member CC layout and single-member both).
            # Chunked read + EOFError/zlib salvage: a partially-uploaded
            # archive truncated INSIDE a gzip member (the common
            # compression-layer truncation) keeps every fully
            # decompressed byte instead of failing the task — the WARC
            # parser below then stops at the last whole record.
            raw = _gunzip_salvage(bytes(content))
            if raw is None:
                continue  # not gzip at all: skip whole file
            rows: list[dict] = []
            for rec in _parse_warc_stream(raw):
                ts = _warc_ts(rec["date"])
                rows.append(
                    {
                        "url": rec["uri"],
                        "warc_ts": ts,
                        "warc_day": ts.date().isoformat(),
                        "html": _http_body(rec["payload"]),
                        "text": None,
                        "lang": None,
                        "warc_path": path,
                    }
                )
                if len(rows) >= _BATCH_ROWS:
                    yield pd.DataFrame(rows)
                    rows = []
            if rows:
                yield pd.DataFrame(rows)


def _gunzip_salvage(content: bytes):
    """Decompress concatenated gzip members one decompressobj at a
    time, feeding bounded chunks so a member truncated or corrupt
    MIDWAY still yields its inflated prefix (a gzip.GzipFile.read()
    would raise EOFError and surrender the WHOLE buffered read; a
    single whole-buffer decompress raises before returning anything).
    Bytes decoded between a corruption point and zlib's error
    detection can be garbage — inherent to deflate — but WARC
    Content-Length framing confines them to single records and the
    parser stops at the first unframeable header. Returns None only
    when the payload is not gzip at all."""
    import zlib

    parts: list[bytes] = []
    pos, n = 0, len(content)
    chunk = 1 << 16  # salvage granularity: prefix kept per 64 KiB fed
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # gzip-wrapped deflate
        # feed in bounded chunks so a member corrupt MIDWAY still
        # yields its clean prefix (one whole-buffer decompress call
        # raises before returning anything inflated so far)
        p, corrupt = pos, False
        while p < n and not d.eof:
            try:
                parts.append(d.decompress(content[p:p + chunk]))
            except zlib.error:
                corrupt = True
                break  # corrupt member/junk tail: prefix already kept
            p += chunk
        if corrupt or not d.eof:
            break  # truncated member: its clean prefix is kept
        consumed = (min(p, n) - pos) - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    if not any(parts):
        return None
    return b"".join(parts)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan ``*.warc.gz`` archives under ``path`` into the canonical
    pages shape. One parse task per archive (see module docstring);
    the result composes directly with ``extract.extract``."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc.gz")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_archives, WARC_PAGES_SCHEMA)


# ----------------------------------------------------------- writer
# test-fixture side: build spec-valid archives so the reader is tested
# against real WARC framing, not a private mirror of the parser.

def _warc_record(url: str, ts: datetime, body: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
        f"WARC-Record-ID: <urn:uuid:{abs(hash(url)) % 10**12}>\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def write_warc(
    path: str,
    records: list[tuple[str, datetime, bytes]],
    per_record_gzip: bool = True,
) -> None:
    """Write a ``.warc.gz`` archive: (url, ts, body) records, each its
    own gzip member by default (the CC layout); single-member otherwise
    (both MUST read back identically — pinned by test)."""
    leading = _warc_record_info()
    if per_record_gzip:
        out = gzip.compress(leading)
        for url, ts, body in records:
            out += gzip.compress(_warc_record(url, ts, body))
        with open(path, "wb") as f:
            f.write(out)
    else:
        with gzip.open(path, "wb") as f:
            f.write(leading)
            for url, ts, body in records:
                f.write(_warc_record(url, ts, body))


def _warc_record_info() -> bytes:
    body = b"software: tesseract_ocr_service_spark test writer\r\n"
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        "WARC-Date: 2026-01-01T00:00:00Z\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"
