"""Fast-kernel parity: the fused scanning parser (functions/fastparse.py)
must be indistinguishable from the stdlib html.parser twin across the
FULL extraction surface — text, title, outlinks, rating ladders,
benefits ladders — on the adversarial corpus, on hypothesis fuzz, and on
inputs that trigger its bailout-to-stdlib path."""
from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import webscraper_spark.functions.extract as ex
from webscraper_spark.functions.extract import (
    extract_benefits,
    extract_fields,
    extract_text,
    parse_page,
)
from webscraper_spark.functions.fastparse import FastParseBailout, fast_parse

from tests.test_extract_adversarial import ADVERSARIAL, _piece


def _both(doc):
    old = ex._KERNEL
    try:
        ex._KERNEL = "fast"
        fast = (extract_fields(doc), extract_benefits(doc))
        ex._KERNEL = "stdlib"
        std = (extract_fields(doc), extract_benefits(doc))
    finally:
        ex._KERNEL = old
    return fast, std


@pytest.mark.parametrize("doc", ADVERSARIAL, ids=range(len(ADVERSARIAL)))
def test_adversarial_kernel_parity(doc):
    fast, std = _both(doc)
    assert fast == std


@settings(max_examples=300, deadline=None)
@given(st.lists(_piece, min_size=0, max_size=25))
def test_fuzz_kernel_parity(pieces):
    doc = "".join(pieces).encode()
    old = ex._KERNEL
    try:
        ex._KERNEL = "fast"
        fast = extract_text(doc)
        ex._KERNEL = "stdlib"
        std = extract_text(doc)
    finally:
        ex._KERNEL = old
    assert fast == std


BENEFITS_PAGE = (
    '<html><head><title>Acme Benefits</title></head><body>'
    '<span class="HeroRatingWrapper_benefitsRatingNumber__x1">4.2</span>'
    '<div class="HeroRatingWrapper_benefitsTotalWrapper__y2"><p>(318 Reviews)</p></div>'
    '<div class="benefit-category-card_benefitCategoryCard__a">'
    '<span class="benefit-category-card_title__b">Health Insurance</span>'
    '<span class="benefit-category-card_ratingNumber__c">4.5</span>'
    '<span class="benefit-category-card_primaryText__d">120 Ratings</span></div>'
    '<div class="benefit-category-card_benefitCategoryCard__e">'
    '<span class="benefit-category-card_title__f">401K Plan</span>'
    '<span class="benefit-category-card_ratingNumber__g">3.9</span>'
    '<span class="benefit-category-card_primaryText__h">77 Ratings</span></div>'
    '</body></html>'
)


def test_benefits_kernel_parity_and_values():
    fast, std = _both(BENEFITS_PAGE)
    assert fast == std
    assert fast[1]["benefits_rating"] == "4.2"
    assert fast[1]["benefits_review_count"] == 318
    assert fast[1]["health_rating"] == "4.5"
    assert fast[1]["health_review_count"] == 120
    assert fast[1]["retirement_rating"] == "3.9"


# -- bailout behavior ---------------------------------------------------------

BAILOUT_DOCS = [
    "a<![CDATA[ raw ]]>b",                    # marked section
    "<p class=\"a\"class=\"b\">fused attrs</p>",  # no space between attrs
    "<a href=it's>weird unquoted</a>",        # quote inside unquoted value
    "<p", "<p foo",                           # unterminated start tag
    "x<!-- never closed",                     # unterminated comment
    "<p a==b>double equals</p>",              # tolerant-only attr syntax
    "</p attr>junk end tag</p>",              # non-strict end tag
]


@pytest.mark.parametrize("doc", BAILOUT_DOCS, ids=range(len(BAILOUT_DOCS)))
def test_bailout_inputs_fall_back_to_stdlib(doc):
    with pytest.raises(FastParseBailout):
        fast_parse(doc)
    # the combined path (fast → bail → stdlib) equals the pure twin
    fast, std = _both(doc)
    assert fast == std


def test_common_grammar_never_bails():
    # derived-corpus page shape: the fast path must handle it natively
    doc = ('<html><head><title>Doc 7</title></head><body><h1>Doc 7</h1>'
           '<p>some words here</p><a href="https://h1.example/d/22">l</a>'
           '<a href="https://h5.example/d/51">l</a></body></html>')
    p = fast_parse(doc)  # must not raise
    assert "".join(p.title_chunks) == "Doc 7"
    assert p.hrefs == ["https://h1.example/d/22", "https://h5.example/d/51"]
    f = extract_fields(doc)
    assert f["text"] == "Doc 7 Doc 7 some words here l l"  # title + h1


def test_kernel_switch_roundtrip():
    ex.set_parse_kernel("stdlib")
    assert ex._KERNEL == "stdlib"
    ex.set_parse_kernel("fast")
    assert ex._KERNEL == "fast"
    with pytest.raises(ValueError):
        ex.set_parse_kernel("nope")


def test_fast_page_exposes_parser_surface():
    p = parse_page("<title>Only Title")
    assert not p._in_title
    assert "".join(p.title_chunks).strip() == "Only Title"
    assert p.span_texts == [] and p.rating_class_texts == []


# -- tag-soup false-accept hunt ----------------------------------------------
#
# The kernel's safety story is: EITHER parse exactly like the stdlib
# twin OR bail out. The dangerous failure mode is a FALSE ACCEPT — the
# strict regex matching some construct but tokenizing it differently
# than html.parser's tolerant recovery. This generator aims straight at
# that surface: random compositions of '<', '/', '!', '?', '=', quotes,
# letters, digits, '>' and whitespace (pure tag soup, far outside the
# structured corpus), asserting full extract_fields parity of the
# COMBINED fast+fallback path vs the pure stdlib twin on every input.

_soup_piece = st.one_of(
    st.sampled_from([
        "<", ">", "/", "!", "?", "=", "'", '"', " ", "\n", "-",
        "a", "B", "p", "x1", "div", "span", "script", "</", "/>", "<!",
        "<!--", "-->", "&amp;", "&", ";", "class", "href", "title",
    ]),
    st.text(alphabet="ab<>/='\" \tXz2.", min_size=0, max_size=6),
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_soup_piece, min_size=0, max_size=30))
def test_tag_soup_no_false_accepts(pieces):
    doc = "".join(pieces)
    old = ex._KERNEL
    try:
        ex._KERNEL = "fast"
        fast = (extract_fields(doc), extract_benefits(doc))
        ex._KERNEL = "stdlib"
        std = (extract_fields(doc), extract_benefits(doc))
    finally:
        ex._KERNEL = old
    assert fast == std
