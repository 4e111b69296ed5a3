"""RSS/Atom feed source: syndication feeds → frontier seeds.

The reference discovers work from hand-maintained URL lists
(``Glassdoor_url_finder.py``) and the engine already ingests the two
standard machine-readable discovery channels — sitemaps
(``sitemap.py``) and WARC drops (``warc_drop.py``). Feeds are the
third: most publishing sites expose RSS 2.0 or Atom 1.0 documents
whose entries are exactly frontier seeds with a freshness signal
(``pubDate``/``published``), and a recrawl scheduler wants that signal
(a feed entry newer than the stored fetch is a re-fetch trigger).

Parsing is regex-block based like the sitemap source — real-world
feeds are frequently not well-formed XML (unescaped ampersands,
truncated CDATA), so a tag-block scan that salvages every parseable
entry beats a strict XML parse that rejects the whole document. Titles
unwrap one CDATA layer and entity-unescape; timestamps normalize both
RFC 822 (RSS) and ISO 8601 (Atom) to UTC strings Spark's
``try_to_timestamp`` reads.

Scale shape (same as sitemap/WARC): one Arrow batch of (path, content)
blobs per task via ``mapInPandas`` — parsing never leaves the
executor, output explodes to one row per entry, no shuffle until the
caller's own dedup/admission. Per-item error isolation (C7): an
undecodable blob or non-feed document yields an error row, never a
task failure.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime
from html import unescape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .textblobs import explode_blob_entries

_ITEM_RE = re.compile(r"<item\b[^>]*>(.*?)</item>", re.DOTALL | re.IGNORECASE)
_ENTRY_RE = re.compile(r"<entry\b[^>]*>(.*?)</entry>",
                       re.DOTALL | re.IGNORECASE)
_TITLE_RE = re.compile(r"<title\b[^>]*>(.*?)</title>",
                       re.DOTALL | re.IGNORECASE)
_RSS_LINK_RE = re.compile(r"<link\s*>(.*?)</link>",
                          re.DOTALL | re.IGNORECASE)
_PUBDATE_RE = re.compile(r"<pubDate\s*>(.*?)</pubDate>",
                         re.DOTALL | re.IGNORECASE)
_GUID_RE = re.compile(r"<guid\b[^>]*>(.*?)</guid>",
                      re.DOTALL | re.IGNORECASE)
_ATOM_LINK_RE = re.compile(r"<link\b([^>]*?)/?>", re.IGNORECASE)
_HREF_RE = re.compile(r"""href\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
_REL_RE = re.compile(r"""rel\s*=\s*["']([^"']*)["']""", re.IGNORECASE)
_PUBLISHED_RE = re.compile(r"<published\s*>(.*?)</published>",
                           re.DOTALL | re.IGNORECASE)
_UPDATED_RE = re.compile(r"<updated\s*>(.*?)</updated>",
                         re.DOTALL | re.IGNORECASE)
_ID_RE = re.compile(r"<id\s*>(.*?)</id>", re.DOTALL | re.IGNORECASE)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)

FEED_ENTRIES = T.StructType(
    [
        T.StructField("feed_path", T.StringType(), False),
        T.StructField("feed_type", T.StringType(), True),  # rss|atom|error
        T.StructField("url", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("published", T.StringType(), True),   # raw
        T.StructField("published_norm", T.StringType(), True),  # UTC
        T.StructField("guid", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _text(rx: re.Pattern, block: str) -> "str | None":
    m = rx.search(block)
    if m is None:
        return None
    raw = m.group(1).strip()
    cd = _CDATA_RE.search(raw)
    if cd is not None:
        return cd.group(1)
    return unescape(raw)


def _norm_ts(raw: "str | None") -> "str | None":
    """RFC 822 (RSS) or ISO 8601 (Atom) → 'YYYY-MM-DD HH:MM:SS' UTC,
    or None when unparseable (the raw string still rides along)."""
    if not raw:
        return None
    dt = None
    try:
        dt = parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        try:
            dt = datetime.fromisoformat(raw.replace("Z", "+00:00"))
        except ValueError:
            return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")


def _atom_href(block: str) -> "str | None":
    """First ``<link>`` whose ``rel`` is absent or 'alternate' (the
    spec's default entry link); falls back to any link with an href."""
    fallback = None
    for attrs in _ATOM_LINK_RE.findall(block):
        hm = _HREF_RE.search(attrs)
        if hm is None:
            continue
        href = unescape(hm.group(1))
        rm = _REL_RE.search(attrs)
        if rm is None or rm.group(1).lower() == "alternate":
            return href
        if fallback is None:
            fallback = href
    return fallback


_ATOM_SNIFF = re.compile(r"<feed[\s>]", re.IGNORECASE)
_RSS_SNIFF = re.compile(r"<(?:rss|channel)[\s>]", re.IGNORECASE)


def parse_feed(text: str) -> list[dict]:
    """Parse one feed document → entry dicts with ``feed_type`` set.
    An entry without a resolvable link is a malformed entry (error
    row); a document that is neither RSS nor Atom raises ValueError
    (the sniff matches real ``<feed>``/``<rss>``/``<channel>`` tags —
    an HTML page mentioning ``<feedback>`` doesn't pass). A genuine
    feed with zero entries yields zero rows: an empty feed is valid."""
    head = text[:2048]
    out: list[dict] = []
    if _ATOM_SNIFF.search(head):
        for block in _ENTRY_RE.findall(text):
            url = _atom_href(block)
            if url is None:
                out.append({"feed_type": "error",
                            "error": "entry without link href"})
                continue
            raw_ts = (_text(_PUBLISHED_RE, block)
                      or _text(_UPDATED_RE, block))
            out.append({
                "feed_type": "atom", "url": url,
                "title": _text(_TITLE_RE, block),
                "published": raw_ts, "published_norm": _norm_ts(raw_ts),
                "guid": _text(_ID_RE, block),
            })
        return out
    if _RSS_SNIFF.search(head):
        for block in _ITEM_RE.findall(text):
            url = _text(_RSS_LINK_RE, block)
            if url is None:
                out.append({"feed_type": "error",
                            "error": "item without <link>"})
                continue
            raw_ts = _text(_PUBDATE_RE, block)
            out.append({
                "feed_type": "rss", "url": url,
                "title": _text(_TITLE_RE, block),
                "published": raw_ts, "published_norm": _norm_ts(raw_ts),
                "guid": _text(_GUID_RE, block),
            })
        return out
    raise ValueError("not a recognized feed (no <rss>/<channel>/<feed>)")


def feed_entries(files: DataFrame, path_col: str = "path",
                 content_col: str = "content") -> DataFrame:
    """Explode a batch of feed blobs into entry rows (mapInPandas; no
    shuffle; shared scaffold in ``textblobs.py``)."""
    return explode_blob_entries(
        files, parse_feed, FEED_ENTRIES,
        path_field="feed_path", kind_field="feed_type",
        path_col=path_col, content_col=content_col,
    )


def feeds_to_frontier(
    files: DataFrame, path_col: str = "path", content_col: str = "content",
    default_priority: int = 2,
) -> DataFrame:
    """Full ingest: parse every blob and emit frontier-shaped seed rows

    ``url_hash, url, host, title, priority, published_ts``

    ``published_ts`` is the normalized entry timestamp — the freshness
    signal a recrawl scheduler joins against the stored corpus (entry
    newer than last fetch → re-fetch). Error rows and entries without a
    parseable host are dropped here; use :func:`feed_entries` to audit
    them."""
    entries = feed_entries(files, path_col, content_col)
    good = entries.filter(F.col("feed_type").isin("rss", "atom"))
    return good.select(
        F.xxhash64("url").alias("url_hash"),
        F.col("url").alias("url"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col("title"),
        F.lit(default_priority).alias("priority"),
        F.try_to_timestamp(F.col("published_norm")).alias("published_ts"),
    ).filter(F.col("host").isNotNull())
