"""WARC ingestion — raw Common-Crawl dumps → the engine's pages table.

The engine's native input is an Iceberg/parquet table of pages
``(url, warc_ts, html, text, lang)``; Common Crawl publishes WARC files
(ISO 28500: concatenated records, each a header block + payload,
response records carrying an HTTP message whose body is the html).
This source closes that gap: ``pages_from_warc`` turns a directory of
WARC files into the pages DataFrame the crawl/curation operators consume.

Scale shape: ``spark.read.format("binaryFile")`` gives one row per WARC
file (whole-file content — WARC records are not line-splittable, and CC
ships ~1 GB gzipped members); the record splitter runs per file inside
``mapInPandas``, so one task holds one file's bytes. For larger archives
repartition by file before the split so a task never holds two. Per-file
gzip (including multi-member gzip, which is how CC concatenates records)
is detected by magic and decompressed streaming.

The record parser is a pure-Python kernel (``parse_warc_records``) —
unit-testable without Spark, and the only Python in the path runs once
per crawled page, the same budget class as the html extraction kernel.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

WARC_PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip (Common Crawl concatenates one member per
        # record) — gzip.GzipFile reads through all members. Read
        # incrementally so a corrupt member yields the good prefix (the
        # same C7 contract as the record scan) instead of raising.
        out = bytearray()
        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
                while True:
                    chunk = gz.read(1 << 20)
                    if not chunk:
                        break
                    out += chunk
        except Exception:
            # truncated/corrupt member: keep the decoded prefix — but a
            # WHOLLY undecodable archive must fail loud (an empty return
            # would silently contribute zero records with no diagnostic)
            if not out:
                raise ValueError("wholly corrupt gzip archive") from None
        return bytes(out)
    return data


def _parse_warc_date(v: str) -> datetime | None:
    try:
        return datetime.strptime(v.strip(), "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        return None


def parse_warc_records(data: bytes) -> list[dict]:
    """Split one WARC file into records. Returns dicts with keys
    url/warc_ts/html/http_status/warc_type. Malformed trailing bytes end
    the scan (C7: a truncated file yields its good prefix), and the same
    holds for gzip input truncated AFTER the first member — but a gzip
    archive whose FIRST member is undecodable raises ``ValueError``
    (zero salvageable records must fail loud, not return []). The Spark
    splitter (:func:`read_warc_files`) converts that raise into a
    queryable ``warc_type='error'`` row, never a task failure. For
    response records the HTTP body is returned as html."""
    data = _maybe_gunzip(data)
    out: list[dict] = []
    i, n = 0, len(data)
    while i < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, i):
            i += 2
        if i >= n:
            break
        if not data.startswith(b"WARC/", i):
            break  # desynced: stop at the last well-formed record
        hdr_end = data.find(_CRLF + _CRLF, i)
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in data[i:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload_at = hdr_end + 4
        payload = data[payload_at : payload_at + length]
        if len(payload) < length:
            break  # truncated record
        i = payload_at + length
        wtype = headers.get("warc-type", "")
        rec: dict = {
            "url": headers.get("warc-target-uri"),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "html": None,
            "http_status": None,
            "warc_type": wtype,
        }
        if wtype == "response":
            # payload = HTTP message: status line, headers, CRLFCRLF, body
            http_end = payload.find(_CRLF + _CRLF)
            if http_end != -1:
                status_line = payload[: payload.find(_CRLF)]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                rec["html"] = payload[http_end + 4 :]
        out.append(rec)
    return out


def read_warc_files(files: DataFrame) -> DataFrame:
    """All WARC records in a ``(path string, content binary)`` DataFrame
    as schema :data:`WARC_PAGES` — the executor-side splitter shared by
    the binaryFile path (:func:`read_warc`) and in-memory fixtures
    (cluster-valid: the bytes travel as DataFrame rows, never through a
    driver-local filesystem path executors can't see)."""

    def _split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_PAGES.fields]
        for pdf in it:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    recs = parse_warc_records(bytes(content))
                except Exception:
                    # per-file isolation, but NOT silent: an undecodable
                    # archive becomes a queryable error row (filter
                    # warc_type = 'error' to audit ingest losses) rather
                    # than vanishing with zero diagnostic
                    recs = [{
                        "url": None, "warc_ts": None, "html": None,
                        "http_status": None, "warc_type": "error",
                    }]
                for r in recs:
                    rows.append({**r, "source_file": fpath})
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(_split, schema=WARC_PAGES)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All WARC records under ``path`` as a DataFrame (schema
    :data:`WARC_PAGES`). One binaryFile row per WARC file; the splitter
    runs per file in mapInPandas."""
    return read_warc_files(spark.read.format("binaryFile").load(path))


def pages_from_warc_records(recs: DataFrame) -> DataFrame:
    """:data:`WARC_PAGES` records → the engine's pages table shape
    ``(url, warc_ts, html, text, lang)``: keep HTTP-200 response records,
    extract text with the pinned kernel; ``lang`` rides as null for the
    lang_id operator to fill downstream."""
    from ..functions.extract import extract_text_udf

    ok = (
        recs.filter((F.col("warc_type") == "response") & (F.col("http_status") == 200))
        .filter(F.col("url").isNotNull() & F.col("warc_ts").isNotNull())
    )
    # scale-adaptive spread before the per-record extract kernel: record
    # parallelism is otherwise pinned to the FILE count (one archive =
    # one splitter task), which serializes extraction when few archives
    # carry many records (guide §2.5 input skew). On a many-file
    # production ingest the scan already reaches the session parallelism
    # and this is a no-op.
    # (batch only: a streaming source has no static partition count, and
    # availableNow micro-batches are already file-bounded)
    if not recs.isStreaming:
        target = recs.sparkSession.sparkContext.defaultParallelism
        if ok.rdd.getNumPartitions() < target:
            ok = ok.repartition(target)
    return ok.select(
        "url", "warc_ts", "html",
        extract_text_udf(F.col("html")).alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """Common-Crawl WARC directory → the engine's pages table."""
    return pages_from_warc_records(read_warc(spark, path))


def pages_from_warc_files(files: DataFrame) -> DataFrame:
    """``(path, content)`` DataFrame of WARC bytes → the pages table."""
    return pages_from_warc_records(read_warc_files(files))


# --- synthetic WARC writer (tests / fixtures) -------------------------------

def build_warc(records: list[dict], per_record_gzip: bool = False) -> bytes:
    """Serialize records (url, warc_ts, html[, status]) as a WARC file —
    the fixture twin of :func:`parse_warc_records`."""
    chunks: list[bytes] = []
    for r in records:
        body = r.get("html", b"") or b""
        status = r.get("status", 200)
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts'].strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = hdr + http + _CRLF + _CRLF
        chunks.append(gzip.compress(rec) if per_record_gzip else rec)
    return b"".join(chunks)
