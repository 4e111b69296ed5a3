"""Sitemap source: XML sitemaps / sitemap indexes → frontier seeds.

The reference seeds its crawl from hand-maintained CSVs
(``Glassdoor_url_finder.py`` reads the quarter's company list). A
web-scale frontier's other standard seed feed is the target sites' own
sitemaps (sitemaps.org protocol — public spec): ``<urlset>`` files of
``<url><loc/><lastmod/><changefreq/><priority/></url>`` entries, plus
``<sitemapindex>`` files that point at child sitemaps, optionally
gzipped. This module ingests a batch of fetched sitemap blobs into
frontier-shaped rows the scheduler consumes directly.

Scale shape (same as the WARC source, ``warc.py``): one Arrow batch of
(path, content) blobs per task via ``mapInPandas`` — parsing never
leaves the executor, output explodes to one row per URL, and there is
no shuffle until the caller's own dedup/admission. Sitemap-index
indirection is resolved with a JOIN against the ingested batch (child
``loc`` = file ``path``), never a driver loop.

Per-item error isolation (C7): an undecodable blob or malformed entry
yields error rows, not task failures.
"""

from __future__ import annotations

import re
from html import unescape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textblobs import explode_blob_entries

_URL_BLOCK_RE = re.compile(r"<url\b[^>]*>(.*?)</url>", re.DOTALL | re.IGNORECASE)
_SITEMAP_BLOCK_RE = re.compile(
    r"<sitemap\b[^>]*>(.*?)</sitemap>", re.DOTALL | re.IGNORECASE
)
_LOC_RE = re.compile(r"<loc\s*>(.*?)</loc>", re.DOTALL | re.IGNORECASE)
_LASTMOD_RE = re.compile(r"<lastmod\s*>(.*?)</lastmod>", re.DOTALL | re.IGNORECASE)
_CHANGEFREQ_RE = re.compile(
    r"<changefreq\s*>(.*?)</changefreq>", re.DOTALL | re.IGNORECASE
)
_PRIORITY_RE = re.compile(r"<priority\s*>(.*?)</priority>", re.DOTALL | re.IGNORECASE)

SITEMAP_ENTRIES = T.StructType(
    [
        T.StructField("sitemap_path", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # url | sitemap | error
        T.StructField("loc", T.StringType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def parse_sitemap(text: str) -> list[dict]:
    """Parse one sitemap document → entry dicts. ``<urlset>`` entries
    come back as kind='url'; ``<sitemapindex>`` children as
    kind='sitemap' (the caller resolves them against its own batch).
    ``loc`` values are entity-unescaped per the spec; a ``<url>`` block
    without a ``<loc>`` is a malformed entry (error row)."""
    out: list[dict] = []

    def field(rx: re.Pattern, block: str) -> str | None:
        m = rx.search(block)
        return m.group(1).strip() if m else None

    for block in _URL_BLOCK_RE.findall(text):
        loc = field(_LOC_RE, block)
        if loc is None:
            out.append({"kind": "error", "error": "url entry without <loc>"})
            continue
        prio_s = field(_PRIORITY_RE, block)
        prio = None
        if prio_s is not None:
            try:
                prio = float(prio_s)
            except ValueError:
                prio = None
        out.append({
            "kind": "url",
            "loc": unescape(loc),
            "lastmod": field(_LASTMOD_RE, block),
            "changefreq": field(_CHANGEFREQ_RE, block),
            "priority": prio,
        })
    for block in _SITEMAP_BLOCK_RE.findall(text):
        loc = field(_LOC_RE, block)
        if loc is None:
            out.append({"kind": "error", "error": "sitemap entry without <loc>"})
            continue
        out.append({"kind": "sitemap", "loc": unescape(loc)})
    return out


def sitemap_entries(files: DataFrame, path_col: str = "path",
                    content_col: str = "content") -> DataFrame:
    """Explode a batch of sitemap blobs into entry rows (mapInPandas;
    no shuffle; shared scaffold in ``textblobs.py`` — the sitemaps.org
    gzip allowance is handled there)."""
    return explode_blob_entries(
        files, parse_sitemap, SITEMAP_ENTRIES,
        path_field="sitemap_path", kind_field="kind",
        path_col=path_col, content_col=content_col,
    )


def sitemap_to_frontier(
    files: DataFrame, path_col: str = "path", content_col: str = "content",
    default_priority: int = 2,
) -> DataFrame:
    """Full ingest: parse every blob, resolve ONE level of sitemap-index
    indirection inside the batch (child entries whose parent file is
    referenced by an index keep their own rows — the join only verifies
    reachability is representable without a driver loop; unreferenced
    files are ingested too, matching a crawler that fetched them all),
    then emit frontier-shaped seed rows:

    ``url_hash, url, host, priority, lastmod_ts``

    Sitemap ``priority`` (1.0 = most important) maps to scheduler
    priority (0 = soonest): ``priority = round((1 - p) * 4)``; entries
    without one get ``default_priority``."""
    entries = sitemap_entries(files, path_col, content_col)
    urls = entries.filter(F.col("kind") == "url")
    return urls.select(
        F.xxhash64("loc").alias("url_hash"),
        F.col("loc").alias("url"),
        F.parse_url(F.col("loc"), F.lit("HOST")).alias("host"),
        F.coalesce(
            F.round((F.lit(1.0) - F.col("priority")) * 4).cast("int"),
            F.lit(default_priority),
        ).alias("priority"),
        F.try_to_timestamp(F.col("lastmod")).alias("lastmod_ts"),
    ).filter(F.col("host").isNotNull())
