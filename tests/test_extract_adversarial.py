"""Adversarial-HTML parity: engine extract_text vs an independent
second implementation (tests/independent_extract.py) + hand-written spec
anchors. Breaks the round-1 circularity where pages.text was only ever
compared against the function that defines it."""

from __future__ import annotations

import pytest

from webscraper_spark.functions.extract import extract_fields, extract_text
from tests.independent_extract import independent_text

ADVERSARIAL = [
    # nested + unclosed tags
    b"<html><body><p>first<div>second</div><span>third</body></html>",
    # stray close tags, mis-nesting
    b"<div>a</em>b</div></p>c",
    # entities: named, numeric, hex, bare ampersand
    b"<p>fish &amp; chips &#65; &#x42; AT&T 1 &lt; 2</p>",
    # comments, with tags and fake closers inside
    b"pre<!-- <p>hidden</p> \xe2\x80\x94 still -- comment -->post",
    # declaration-ish / CDATA-ish constructs drop silently
    b"a<!DOCTYPE html>b<![CDATA[ not text ]]>c",
    # script containing a string with its own close tag: rawtext ends at
    # the FIRST literal close (spec anchor)
    b'x<script>var s = "</script>"; lost();</script>y',
    # style with braces and a nested fake comment
    b"x<style>p::before{content:'<b>nope</b>'}</style>y",
    # noscript / template subtrees skipped, nested
    b"a<noscript><p>no js <template><b>inner</b></template></p></noscript>b",
    # "<" that is plain text, plus a real tag right after
    b"<p>3 < 5 and 2<3 but <b>bold</b></p>",
    # attributes with ">" inside quoted values are NOT tag ends for the
    # stdlib parser... keep to unambiguous: unquoted simple attrs
    b'<a href=/x class=red>link</a> tail',
    # uppercase / mixed-case raw-text close tags
    b"q<SCRIPT>ignore()</ScRiPt>r",
    # self-closing void elements between text
    b"a<br/>b<img src=x>c<hr >d",
    # deeply nested spans with markup inside a rating element
    b'<div class="rating"><b>4</b>.<i>5</i></div> rest',
    # CRLF + tabs + runs of whitespace
    b"  a \r\n\t b\n\n<c></c>   d  ",
    # unicode text + entity for non-ascii
    "<p>café &eacute;clair 中文</p>".encode("utf-8"),
    # unclosed script at EOF swallows the rest (both must agree)
    b"keep<script>var x = 1;",
    # empty document and no-body fragments
    b"",
    b"just text, no tags at all",
]


@pytest.mark.parametrize("doc", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_engine_matches_independent_extractor(doc):
    assert extract_text(doc) == independent_text(doc)


# Hand-written expected outputs: true spec anchors, independent of BOTH
# implementations.
SPEC = [
    (b"<html><body><p>first<div>second</div><span>third</body></html>",
     "first second third"),
    (b"<p>fish &amp; chips &#65; &#x42; AT&T 1 &lt; 2</p>",
     "fish & chips A B AT&T 1 < 2"),
    (b'x<script>var s = "</script>"; lost();</script>y',
     # rawtext ends at the FIRST literal close: '"; lost();' is text soup
     # outside any skip element, and the trailing </script> is a stray
     # close tag (markup → separator) dropped by both implementations
     'x "; lost(); y'),
    (b"a<noscript><p>no js <template><b>inner</b></template></p></noscript>b",
     "a b"),
    (b"<p>3 < 5 and 2<3 but <b>bold</b></p>", "3 < 5 and 2<3 but bold"),
    (b"pre<!-- <p>hidden</p> \xe2\x80\x94 still -- comment -->post", "pre post"),
    (b"keep<script>var x = 1;", "keep"),
    (b"", ""),
]


@pytest.mark.parametrize("doc,want", SPEC, ids=range(len(SPEC)))
def test_spec_anchors(doc, want):
    assert extract_text(doc) == want
    assert independent_text(doc) == want


def test_fields_survive_adversarial_corpus():
    """extract_fields never raises and returns the full struct on every
    adversarial doc (C7 isolation)."""
    for doc in ADVERSARIAL:
        f = extract_fields(doc)
        assert set(f) == {"title", "text", "outlinks", "rating",
                          "review_count", "engaged"}


# --- property-based parity fuzz -------------------------------------------

from hypothesis import given, settings, strategies as st

_TAGS = ["p", "div", "span", "b", "a", "li", "table", "td"]
_SKIPS = ["script", "style", "noscript", "template"]
_VOIDS = ["br", "img", "hr"]

_text_chunk = st.text(
    alphabet="abc XY12.,&;<>!-…é中 \t\n'\"=/", min_size=0, max_size=12
)
_entity = st.sampled_from(["&amp;", "&lt;", "&gt;", "&#65;", "&#x42;", "&eacute;"])


def _open(tag):
    return st.sampled_from(["", ' class="rating"', " href=/x", ' id="a"']).map(
        lambda attrs: f"<{tag}{attrs}>"
    )


_piece = st.one_of(
    _text_chunk,
    _entity,
    st.sampled_from(_TAGS).flatmap(_open),
    st.sampled_from(_TAGS + _SKIPS).map(lambda t: f"</{t}>"),
    st.sampled_from(_VOIDS).map(lambda t: f"<{t}/>"),
    st.sampled_from(_VOIDS).map(lambda t: f"<{t}>"),
    st.sampled_from(_SKIPS).flatmap(
        lambda t: _text_chunk.map(lambda body: f"<{t}>{body}</{t}>")
    ),
    _text_chunk.map(lambda c: f"<!--{c}-->"),
    st.just("<!DOCTYPE html>"),
    _text_chunk.map(lambda c: f"<![CDATA[{c}]]>"),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_piece, min_size=0, max_size=25))
def test_fuzz_parity_engine_vs_independent(pieces):
    """Random compositions of text/entities/tags/comments/skip-subtrees:
    the engine extractor and the independently written one must agree on
    every input (the two implementations share no code).

    Boundary (per independent_extract's module docstring): random text
    pieces can fabricate tag-attribute QUOTE SOUP (e.g. "<X='" + "</p>"
    → html.parser swallows the lot as a start tag named "x='<"), where
    the stdlib's tolerant-regex recovery is parser-defined rather than
    spec. Those inputs are excluded here via the strict-grammar
    detector; engine ≡ stdlib on them is still covered by the fastparse
    kernel-parity fuzz (same corpus, no exclusion)."""
    from hypothesis import assume

    from webscraper_spark.functions.fastparse import FastParseBailout, fast_parse

    doc = "".join(pieces)
    try:
        fast_parse(doc)
    except FastParseBailout as e:
        assume("start tag" not in str(e) and "attr junk" not in str(e))
    except Exception:
        pass
    assert extract_text(doc.encode()) == independent_text(doc.encode())
