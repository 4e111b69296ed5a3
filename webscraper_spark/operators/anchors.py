"""Inlink anchor-text aggregation: the classic link-graph text signal.

Anchor text — what OTHER pages call a URL — is a ranking and labeling
signal every web-scale corpus wants next to the page text itself
(anchors describe the target better than the target's own boilerplate,
and they exist for pages the crawler has not fetched yet). The
reference consumes links positionally (``Glassdoor_url_finder.py``
collects hrefs); a dataflow engine aggregates the (src, dst, anchor)
edges into a per-target profile.

Two pieces:

- :func:`extract_anchors` — (href, anchor_text) pairs from raw HTML.
  A standalone scan separate from the byte-parity-certified parse
  kernel (``fastparse.py``): it reuses the same strict tag grammar, and
  anchor text is the tag-stripped, entity-unescaped, whitespace-
  collapsed content between an ``<a href>`` start tag and the nearest
  ``</a>`` OR the next ``<a`` (HTML forbids nested anchors; browsers
  auto-close, and so does this).
- :func:`anchor_stats` — per-target aggregation: inlink count,
  distinct-source count, and the top-k anchors by frequency.

Scale shape: extraction is an Arrow-batched projection inside the scan
task; the aggregation is (dst, anchor) partial-agg → per-dst top-k via
WindowGroupLimit (``topk_per_group``) → one ordered collect per dst.
Nothing touches the full corpus twice; anchors for unfetched targets
fall out for free (dst needs no corpus row).
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.fastparse import _ATTR_RE, _STARTTAG_RE
from .topk import topk_per_group

_A_OPEN_RE = re.compile(r"<[aA](?=[\s>/])")
_A_CLOSE_RE = re.compile(r"</\s*[aA]\s*>")
_TAG_STRIP_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_anchors(html: "str | None") -> "list[tuple[str, str]]":
    """(href, anchor_text) for every ``<a>`` carrying an href.
    Malformed tags are skipped, never raised (C7 lives at the operator
    layer; a page with zero well-formed anchors yields zero pairs)."""
    if not html:
        return []
    out: list[tuple[str, str]] = []
    for m in _A_OPEN_RE.finditer(html):
        sm = _STARTTAG_RE.match(html, m.start())
        if sm is None or sm.group(1).lower() != "a":
            continue
        href = None
        blob = sm.group(2) or ""
        pos = 0
        while pos < len(blob):
            am = _ATTR_RE.match(blob, pos)
            if am is None:
                break
            pos = am.end()
            k, v = am.group(1, 2)
            if k.lower() == "href" and v is not None:
                if v[0] in "\"'":
                    v = v[1:-1]
                href = unescape(v)
                break
        if href is None or sm.group(3):  # no href, or self-closed <a/>
            continue
        body_start = sm.end()
        close = _A_CLOSE_RE.search(html, body_start)
        nxt = _A_OPEN_RE.search(html, body_start)
        end = len(html)
        if close is not None:
            end = close.start()
        if nxt is not None and nxt.start() < end:
            end = nxt.start()  # browser-style auto-close on nested <a>
        text = _TAG_STRIP_RE.sub(" ", html[body_start:end])
        text = _WS_RE.sub(" ", unescape(text)).strip()
        out.append((href, text))
    return out


_ANCHOR_PAIRS = T.ArrayType(T.StructType([
    T.StructField("href", T.StringType()),
    T.StructField("anchor", T.StringType()),
]))


def anchor_pairs_udf():
    @F.pandas_udf(_ANCHOR_PAIRS)
    def _pairs(html: pd.Series) -> pd.Series:
        return html.map(lambda h: extract_anchors(h))

    return _pairs


def anchor_stats(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    k: int = 3,
) -> DataFrame:
    """Per-target anchor profile over a pages table:
    ``dst_url, n_inlinks, n_src_pages, top_anchors`` where
    ``top_anchors`` is the k most frequent anchor texts joined with
    ``|``, ordered by (count desc, text asc) — deterministic and
    string-typed so an oracle can state it."""
    if not 1 <= k <= 99:
        raise ValueError("k must be in 1..99 (rank prefix is 2 digits)")
    pairs = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(anchor_pairs_udf()(F.col(html_col))).alias("p"),
    ).select(
        "src_url",
        F.col("p.href").alias("dst_url"),
        F.col("p.anchor").alias("anchor"),
    )
    per_anchor = pairs.groupBy("dst_url", "anchor").agg(
        F.count("*").alias("n"),
        F.count_distinct("src_url").alias("n_src"),
    )
    top = topk_per_group(
        per_anchor, ["dst_url"],
        [F.col("n").desc(), F.col("anchor").asc()], k,
        rank_col="_r",
    )
    totals = pairs.groupBy("dst_url").agg(
        F.count("*").alias("n_inlinks"),
        F.count_distinct("src_url").alias("n_src_pages"),
    )
    # zero-padded rank prefix: array_sort is lexicographic (valid for
    # k <= 99) and the fixed 3-char prefix strips without caring what
    # characters the anchor text itself contains
    collected = top.groupBy("dst_url").agg(
        F.array_sort(
            F.collect_list(
                F.concat(F.format_string("%02d:", F.col("_r")),
                         F.col("anchor"))
            )
        ).alias("_ranked")
    ).select(
        "dst_url",
        F.transform(
            F.col("_ranked"),
            lambda s: F.substring(s, 4, 2147483647),
        ).alias("top_anchors"),
    )
    return totals.join(collected, "dst_url", "left").select(
        "dst_url", "n_inlinks", "n_src_pages",
        F.concat_ws("|", F.col("top_anchors")).alias("top_anchors"),
    )
