"""Shared scaffolding for text-blob ingest sources (sitemap, feeds).

Both sources have the same executor shape: one Arrow batch of
(path, content) blobs per task via ``mapInPandas``, each blob gunzipped
if magic says so, decoded utf-8-lossy, handed to a per-format parse
function that returns entry dicts, with any decode/parse failure
degraded to a single error row (C7). Keeping the scaffold in one place
means a gzip/encoding edge case (the round-5 truncated-gzip EOFError,
say) is fixed once, not once per source.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: what a bad blob can raise on the gunzip+decode path: gzip leaks
#: EOFError for truncated members and zlib.error for corrupt deflate
#: payloads (BadGzipFile is an OSError); parse functions raise
#: ValueError
DECODE_ERRORS = (ValueError, OSError, EOFError, zlib.error)


def decode_text_blob(blob) -> str:
    """bytes (optionally gzipped) → str, utf-8 with replacement."""
    if blob is None:
        raise ValueError("null blob")
    b = bytes(blob)
    if b[:2] == b"\x1f\x8b":
        b = gzip.decompress(b)
    return b.decode("utf-8", errors="replace")


def explode_blob_entries(
    files: DataFrame,
    parse_fn: "Callable[[str], list[dict]]",
    schema: T.StructType,
    path_field: str,
    kind_field: str,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Explode a batch of text blobs into entry rows (mapInPandas; no
    shuffle). ``parse_fn(text)`` returns partial row dicts; a blob that
    fails decode or parse yields one row with ``kind_field='error'``
    and ``error=<exception name>`` instead of failing the task."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in schema.fields]
        for pdf in it:
            rows = []
            for path, blob in zip(pdf[path_col], pdf[content_col]):
                base = {c: None for c in cols}
                base[path_field] = path
                try:
                    entries = parse_fn(decode_text_blob(blob))
                except DECODE_ERRORS as e:
                    rows.append({**base, kind_field: "error",
                                 "error": type(e).__name__})
                    continue
                for e in entries:
                    rows.append({**base, **e})
            yield pd.DataFrame(rows, columns=cols)

    return files.select(
        F.col(path_col).alias(path_col),
        F.col(content_col).alias(content_col),
    ).mapInPandas(_batches, schema=schema)
