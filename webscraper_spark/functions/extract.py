"""HTML extraction kernels — the engine's Arrow-vectorized UDF surface.

Re-expresses the reference's largest code mass (SURVEY §2.9):
- text extraction / ``text_content()`` (``Glassdoor_Scraper_New.py:181,188``)
- outlink collection with admission patterns (``Glassdoor_url_finder.py:76-118``,
  ``crunchbase-main_cap.js:196-205``)
- field extraction with fallback ladders: rating → class xpath → any-span
  decimal → first-decimal-in-text; review count; Engaged flag
  (``Glassdoor_Scraper_New.py:216-293``)

The sandbox has no lxml, so the kernel is built on stdlib
``html.parser.HTMLParser``. Byte-parity contract: ``pages.text`` in the
synthetic corpus is *defined* as the output of :func:`extract_text`, and
BOTH the Spark pandas UDF and the single-process reference simulator call
the same function objects below — drift between engine and oracle is
structurally impossible (SURVEY §7.4 risk register).

Per-item error isolation (reference C7: try/except-per-company,
``Glassdoor_url_finder.py:292-336``): malformed HTML yields a null struct,
never a task failure.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import EXTRACTED

_SKIP_TAGS = {"script", "style", "noscript", "template"}
_RATING_RE = re.compile(r"^\d+\.\d+$")
_REVIEWS_RE = re.compile(r"\((\d[\d,]*)\s+total\s+reviews?\)", re.IGNORECASE)
_REVIEWS_FALLBACK_RE = re.compile(r"(\d[\d,]*)\s+reviews?", re.IGNORECASE)
_DECIMAL_RE = re.compile(r"\b(\d\.\d)\b")


class _PageParser(HTMLParser):
    """One-pass collector: text chunks, title, hrefs, rating candidates."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip_depth = 0
        self._in_title = False
        self._span_stack: list[list[str]] = []
        self._rating_class_stack: list[list[str]] = []
        self.span_texts: list[str] = []
        self.rating_class_texts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "title":
            self._in_title = True
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
        if tag == "span":
            self._span_stack.append([])
        cls = next((v for k, v in attrs if k == "class" and v), "")
        if "rating" in cls.lower():
            self._rating_class_stack.append([])

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "title":
            self._in_title = False
        if tag == "span" and self._span_stack:
            self.span_texts.append("".join(self._span_stack.pop()))
        # class-stack is popped on any endtag while non-empty and the tag
        # closes at/after its opener; HTMLParser gives no tree, so we use
        # the conservative rule: close the innermost rating span on any
        # endtag. Good enough for flat extraction targets.
        if self._rating_class_stack:
            self.rating_class_texts.append("".join(self._rating_class_stack.pop()))

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_chunks.append(data)
        self.chunks.append(data)
        for buf in self._span_stack:
            buf.append(data)
        for buf in self._rating_class_stack:
            buf.append(data)


def _normalize_ws(s: str) -> str:
    return " ".join(s.split())


def _decode(html: bytes | str | None) -> str | None:
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return html


def parse_page(html: bytes | str | None) -> _PageParser | None:
    s = _decode(html)
    if s is None:
        return None
    p = _PageParser()
    try:
        p.feed(s)
        p.close()
    except Exception:
        return None
    return p


def extract_text(html: bytes | str | None) -> str | None:
    """Whitespace-normalized visible text — THE byte-parity kernel.

    Semantics: concatenate all text nodes outside script/style/noscript/
    template, then collapse every whitespace run to a single space and
    strip. (Stands in for lxml ``text_content()``; pinned to one
    implementation per SURVEY §7.4.)
    """
    p = parse_page(html)
    if p is None:
        return None
    return _normalize_ws(" ".join(p.chunks))


def extract_outlinks(html: bytes | str | None) -> list[str]:
    """Raw hrefs in document order (H5). Canonicalization/admission
    filtering happens downstream on the exploded column."""
    p = parse_page(html)
    return [] if p is None else p.hrefs


def extract_fields(html: bytes | str | None) -> dict:
    """Full extraction struct with the reference's fallback-ladder
    semantics for rating / review_count / engaged (H2)."""
    p = parse_page(html)
    if p is None:
        return {
            "title": None, "text": None, "outlinks": None,
            "rating": None, "review_count": None, "engaged": None,
        }
    text = _normalize_ws(" ".join(p.chunks))
    title = _normalize_ws(" ".join(p.title_chunks)) or None

    # rating fallback ladder: class*=rating → any <span> decimal → first
    # decimal in page text; clamp [0,5] else null (F7 semantics).
    rating = None
    for cand in p.rating_class_texts:
        c = cand.strip()
        if _RATING_RE.match(c):
            rating = float(c)
            break
    if rating is None:
        for cand in p.span_texts:
            c = cand.strip()
            if _RATING_RE.match(c):
                rating = float(c)
                break
    if rating is None:
        m = _DECIMAL_RE.search(text)
        if m:
            rating = float(m.group(1))
    if rating is not None and not (0.0 <= rating <= 5.0):
        rating = None

    review_count = None
    m = _REVIEWS_RE.search(text) or _REVIEWS_FALLBACK_RE.search(text)
    if m:
        review_count = int(m.group(1).replace(",", ""))

    engaged = "Engaged Employer" in text

    return {
        "title": title,
        "text": text,
        "outlinks": p.hrefs,
        "rating": rating,
        "review_count": review_count,
        "engaged": engaged,
    }


# --- Spark-side (one Arrow batch at a time; no per-row Python rows) --------

@F.pandas_udf(EXTRACTED)
def extract_udf(html: pd.Series) -> pd.DataFrame:
    rows = [extract_fields(h) for h in html]
    return pd.DataFrame(rows, columns=[f.name for f in EXTRACTED.fields])


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)
