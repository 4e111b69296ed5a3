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
  kernel (``fastparse.py``): it reuses the same strict tag grammar;
  comments and script/style blocks are stripped first (a commented-out
  link is not an inlink), and anchor text is the tag-stripped,
  entity-unescaped, whitespace-collapsed content between an
  ``<a href>`` start tag and the nearest ``</a>`` OR the next ``<a``
  (HTML forbids nested anchors; browsers auto-close, and so does
  this). Known tag-soup approximation: a literal ``</a>`` inside an
  attribute value of a tag INSIDE the anchor body truncates the text
  early — the same robustness class as the kernel's bailouts.
- :func:`anchor_stats` — per-target aggregation: inlink count,
  distinct-source count, and the top-k anchors by frequency. Targets
  are CANONICALIZED against the source page (``canon.py`` — relative
  hrefs resolve, hosts lowercase, non-fetchable schemes drop), so two
  sites' ``/about`` links never merge and one target never splits.

Scale shape: extraction is an Arrow-batched projection inside the scan
task; the (dst, anchor, src) pre-aggregate is persisted so its two
consumers (per-anchor counts and per-target totals) pay for the HTML
extraction ONCE; per-dst top-k rides WindowGroupLimit
(``topk_per_group``) and the final result is checkpoint-materialized
so the persisted intermediate can be freed. Anchors for unfetched
targets fall out for free (dst needs no corpus row).
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
_DEAD_ZONES_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<script\b.*?(?:</script\s*>|$)"
    r"|<style\b.*?(?:</style\s*>|$)",
    re.DOTALL | re.IGNORECASE,
)


def extract_anchors(html: "str | None") -> "list[tuple[str, str]]":
    """(href, anchor_text) for every ``<a>`` carrying an href.
    Malformed tags are skipped, never raised (C7 lives at the operator
    layer; a page with zero well-formed anchors yields zero pairs)."""
    if not html:
        return []
    # comments and script/style payloads are not link context
    html = _DEAD_ZONES_RE.sub(" ", html)
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
        nxt = _A_OPEN_RE.search(html, body_start)
        end = nxt.start() if nxt is not None else len(html)
        # bound the close-search at the next <a (auto-close wins
        # anyway): unclosed anchors then cost O(gap), not O(rest of
        # page) each — a page of 10^5 sloppy anchors stays linear
        close = _A_CLOSE_RE.search(html, body_start, end)
        if close is not None:
            end = close.start()
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


def _anchor_stats_plan(
    pages: DataFrame,
    url_col: str,
    html_col: str,
    k: int,
) -> "tuple[DataFrame, DataFrame]":
    """(lazy result, persisted pre-aggregate) — split out so plan tests
    can inspect the query before :func:`anchor_stats` checkpoints it."""
    if not 1 <= k <= 99:
        raise ValueError("k must be in 1..99 (rank prefix is 2 digits)")
    from ..functions.canon import canonicalize_href_udf

    pairs = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(anchor_pairs_udf()(F.col(html_col))).alias("p"),
    ).select(
        "src_url",
        canonicalize_href_udf(F.col("p.href"), F.col("src_url"))
        .alias("dst_url"),
        F.col("p.anchor").alias("anchor"),
    ).filter(F.col("dst_url").isNotNull())
    # one pre-aggregate feeds BOTH consumers, persisted so the HTML
    # extraction runs once, not once per downstream aggregation
    base = pairs.groupBy("dst_url", "anchor", "src_url").agg(
        F.count("*").alias("n")
    ).persist()
    per_anchor = base.groupBy("dst_url", "anchor").agg(
        F.sum("n").alias("n")
    )
    top = topk_per_group(
        per_anchor, ["dst_url"],
        [F.col("n").desc(), F.col("anchor").asc()], k,
        rank_col="_r",
    )
    totals = base.groupBy("dst_url").agg(
        F.sum("n").alias("n_inlinks"),
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
    out = totals.join(collected, "dst_url", "left").select(
        "dst_url",
        F.col("n_inlinks").cast("long").alias("n_inlinks"),
        "n_src_pages",
        # display-oriented profile string: a '|' INSIDE an anchor text
        # is not escaped (callers needing lossless lists should take
        # the per-anchor rows upstream)
        F.concat_ws("|", F.col("top_anchors")).alias("top_anchors"),
    )
    return out, base


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
    string-typed so an oracle can state it. The result materializes
    (localCheckpoint) so the persisted pre-aggregate can be freed."""
    out, base = _anchor_stats_plan(pages, url_col, html_col, k)
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out
