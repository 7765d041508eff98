"""WARC (ISO 28500) container source/sink for Common-Crawl-style pages.

The north-star input is "an Iceberg table of Common-Crawl-style web pages"
(BASELINE.json input_hint) — and Common Crawl itself ships those pages as
WARC files: per-record gzip members concatenated into ~1 GB ``.warc.gz``
objects, each record a ``WARC/1.0`` header block plus an HTTP response
payload. This module closes the loop from raw crawl bytes to the engine's
page table: the analog of the reference's raw-container reader
(``MarcPermissiveStreamReader`` call site, ``core/src/org/solrmarc/marc/
MarcHandler.java:425-431``) for the web-page payload, with the same
permissive-resync discipline as ``sources/marc.py:split_records``.

Spark shape
-----------
Read: ``spark.read.format("binaryFile")`` (or any (path, content) table)
-> ``mapInPandas`` record splitter -> one row per WARC record. A WARC file
is the unit of parallelism — exactly how Common Crawl is processed in
practice (a crawl is ~72k independent ~1 GB files; per-record gzip members
make the *bytes* concatenable but not block-splittable, so one file = one
task and the 64k-file fan-out is the scale axis). Parsing is Arrow-batched;
no driver-side I/O.

Write: ``pages_to_warc_records`` serializes each page to a standalone
per-record gzip member (combinable by plain concatenation — the Common
Crawl convention, same contract as ``encode_record_split`` for MARC), and
``write_warc_files`` sinks one ``part-*.warc.gz`` per partition from the
executors via ``foreachPartition``.

Round-trip invariant: write(read(x)) preserves the html payload
byte-identically per url, so the north rule's byte-identical-extraction
check holds through the WARC path (tests/test_warc.py).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator, List, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_WARC_MAGIC = b"WARC/"
_GZIP_MAGIC = b"\x1f\x8b"

#: schema of one parsed WARC record (page-level columns pre-extracted from
#: the HTTP payload for response records; ``parse_error`` non-null when the
#: record was recovered by resync or its payload was malformed)
WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("parse_error", T.StringType(), True),
    ]
)


# ---------------------------------------------------------------------------
# record codec (pure functions; used inside Arrow batches)
# ---------------------------------------------------------------------------

def _warc_date(ts: Optional[datetime]) -> str:
    ts = ts or datetime(1970, 1, 1, tzinfo=timezone.utc)
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def encode_warc_record(warc_type: str, headers: dict, block: bytes) -> bytes:
    """One WARC/1.0 record: version line, named fields, Content-Length,
    blank line, block, two CRLFs (ISO 28500 §4)."""
    out = [b"WARC/1.0", _CRLF]
    fields = {"WARC-Type": warc_type, **headers,
              "Content-Length": str(len(block))}
    for k, v in fields.items():
        out += [k.encode("ascii"), b": ", str(v).encode("utf-8"), _CRLF]
    out += [_CRLF, block, _CRLF, _CRLF]
    return b"".join(out)


def page_to_warc_response(url: str, warc_ts: Optional[datetime],
                          html: bytes,
                          content_type: str = "text/html; charset=UTF-8",
                          status: int = 200) -> bytes:
    """Wrap one page as a WARC ``response`` record whose block is a full
    HTTP/1.1 response (the Common Crawl capture shape)."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + bytes(html)
    rid = hashlib.md5(url.encode("utf-8", "surrogatepass")).hexdigest()
    return encode_warc_record(
        "response",
        {
            "WARC-Record-ID": f"<urn:uuid:{rid}>",
            "WARC-Date": _warc_date(warc_ts),
            "WARC-Target-URI": url,
            "Content-Type": "application/http; msgtype=response",
        },
        http,
    )


def warcinfo_record(filename: str, software: str = "marc-solr-profiling-spark") -> bytes:
    body = (f"software: {software}\r\nformat: WARC File Format 1.0\r\n"
            ).encode("ascii")
    return encode_warc_record(
        "warcinfo",
        {
            "WARC-Record-ID": f"<urn:uuid:{hashlib.md5(filename.encode()).hexdigest()}>",
            "WARC-Date": _warc_date(None),
            "WARC-Filename": filename,
            "Content-Type": "application/warc-fields",
        },
        body,
    )


def gzip_member(record: bytes) -> bytes:
    """One deterministic gzip member per record (mtime pinned to 0) — the
    Common Crawl ``.warc.gz`` layout; members concatenate into a valid
    multi-member gzip stream."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; tolerate trailing
    junk after the last member (zlib leaves it in unused_data)."""
    out = []
    pos = 0
    while pos < len(data) and data[pos:pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data[pos:]))
        rest = d.unused_data
        if not rest:
            break
        pos = len(data) - len(rest)
    return b"".join(out)


def parse_warc(stream: bytes) -> List[Tuple[dict, bytes, Optional[str]]]:
    """Split one WARC byte stream into ``(headers, block, error)`` tuples.

    Permissive, like ``split_records`` for MARC: a record whose headers or
    Content-Length are malformed is emitted with an ``error`` note and the
    scanner resyncs at the next ``WARC/`` magic, so one corrupt capture
    never poisons the rest of a 1 GB file.
    """
    if stream[:2] == _GZIP_MAGIC:
        stream = _gunzip_members(stream)
    recs: List[Tuple[dict, bytes, Optional[str]]] = []
    pos = stream.find(_WARC_MAGIC)
    n = len(stream)
    while 0 <= pos < n:
        err = None
        hdr_end = stream.find(_CRLF + _CRLF, pos)
        nxt = stream.find(_WARC_MAGIC, pos + 5)
        if hdr_end < 0 or (0 <= nxt < hdr_end):
            recs.append(({}, b"", "truncated header"))
            pos = nxt
            continue
        headers: dict = {}
        for line in stream[pos:hdr_end].split(_CRLF)[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("utf-8", "replace")] = (
                    v.strip().decode("utf-8", "replace"))
        try:
            clen = int(headers.get("Content-Length", ""))
        except ValueError:
            clen, err = -1, "bad Content-Length"
        body_start = hdr_end + 4
        if clen < 0 or body_start + clen > n:
            # resync: whatever sits before the next magic is the block
            end = nxt if nxt >= 0 else n
            block = stream[body_start:end].rstrip(b"\r\n")
            err = err or "truncated block"
            recs.append((headers, block, err))
            pos = nxt
            continue
        recs.append((headers, stream[body_start:body_start + clen], None))
        pos = stream.find(_WARC_MAGIC, body_start + clen)
    return recs


def split_http_response(block: bytes) -> Tuple[Optional[int], Optional[str], bytes]:
    """``(status, content_type, body)`` from an HTTP response block. The
    split is at the FIRST blank line only — a body containing CRLFCRLF is
    untouched."""
    sep = block.find(_CRLF + _CRLF)
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(_CRLF)
    try:
        status: Optional[int] = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in lines[1:]:
        k, sep2, v = line.partition(b":")
        if sep2 and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
    return status, ctype, body


def _parse_warc_date(s: Optional[str]):
    if not s:
        return None
    try:
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc)
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# Spark read path
# ---------------------------------------------------------------------------

def read_warc(binary_df: DataFrame, path_col: str = "path",
              content_col: str = "content") -> DataFrame:
    """(path, content) rows -> one :data:`WARC_SCHEMA` row per WARC record.

    Arrow-batched splitter; each input row (= one WARC file, the Common
    Crawl unit of work) parses independently, so parallelism equals file
    count and resync damage is file-local.
    """
    import pandas as pd

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for headers, block, err in parse_warc(bytes(content)):
                    wtype = headers.get("WARC-Type")
                    status = ctype = body = None
                    if wtype == "response" and err is None:
                        status, ctype, body = split_http_response(block)
                    rows.append((
                        path, wtype, headers.get("WARC-Record-ID"),
                        headers.get("WARC-Target-URI"),
                        _parse_warc_date(headers.get("WARC-Date")),
                        status, ctype, body, err,
                    ))
            yield pd.DataFrame(rows, columns=[f.name for f in WARC_SCHEMA])

    return binary_df.select(path_col, content_col).mapInPandas(
        parse, schema=WARC_SCHEMA)


def warc_pages(records: DataFrame) -> DataFrame:
    """Project parsed WARC records to the engine's page-table shape
    ``(url, warc_ts, html)``: clean HTTP-200 text/html responses only —
    the filter every Common-Crawl text pipeline applies first."""
    return (
        records.filter(
            (F.col("warc_type") == "response")
            & F.col("parse_error").isNull()
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        ).select("url", "warc_ts", "html")
    )


# ---------------------------------------------------------------------------
# Spark write path
# ---------------------------------------------------------------------------

def pages_to_warc_records(pages: DataFrame, url_col: str = "url",
                          ts_col: str = "warc_ts",
                          html_col: str = "html") -> DataFrame:
    """Serialize each page to a standalone per-record gzip member
    ``(url, warc_gz: binary)``. Members concatenate into a valid
    ``.warc.gz`` — the same combinable-chunks contract as the MARC
    split-stream writer (``sources/marc.py:encode_record_split``), which is
    what lets any grouping of rows into files be correct."""
    import pandas as pd

    def render(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ts = pd.to_datetime(pdf[ts_col], utc=True, errors="coerce")
            out = [
                gzip_member(page_to_warc_response(
                    u, None if pd.isna(t) else t.to_pydatetime(), bytes(h)))
                for u, t, h in zip(pdf[url_col], ts, pdf[html_col])
            ]
            yield pd.DataFrame({"url": pdf[url_col], "warc_gz": out})

    return pages.select(url_col, ts_col, html_col).mapInPandas(
        render, schema="url string, warc_gz binary")


def write_warc_files(pages: DataFrame, out_dir: str,
                     with_warcinfo: bool = True) -> None:
    """Sink: one ``part-NNNNN.warc.gz`` per partition, written from the
    executors (``foreachPartition``), each led by a ``warcinfo`` record like
    real crawl files. No driver materialization; file count = partition
    count, the knob that sets downstream read parallelism."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    gz = pages_to_warc_records(pages)

    def sink(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.warc.gz"
        tmp = os.path.join(out_dir, "." + fname + ".tmp")
        wrote = False
        with open(tmp, "wb") as f:
            for row in rows:
                if not wrote and with_warcinfo:
                    f.write(gzip_member(warcinfo_record(fname)))
                wrote = True
                f.write(row.warc_gz)
        if wrote:
            os.replace(tmp, os.path.join(out_dir, fname))  # atomic publish
        else:
            os.remove(tmp)

    gz.foreachPartition(sink)
