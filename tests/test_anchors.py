"""Anchor extraction + aggregation: grammar edges, auto-close
semantics, and the deterministic top-k profile."""

from __future__ import annotations

import pandas as pd
import pytest

from webscraper_spark.operators.anchors import anchor_stats, extract_anchors


def test_basic_pairs_and_escapes():
    html = ('<p>x</p><a href="https://a.example/1">Hello <b>big</b>'
            ' &amp; bold</a><a href=\'https://a.example/2\'>two</a>')
    assert extract_anchors(html) == [
        ("https://a.example/1", "Hello big & bold"),
        ("https://a.example/2", "two"),
    ]


def test_nested_anchor_auto_closes():
    # HTML forbids nested <a>; the first anchor's text stops at the
    # second's start tag, like a browser's auto-close
    html = '<a href="/x">first <a href="/y">second</a>'
    assert extract_anchors(html) == [("/x", "first"), ("/y", "second")]


def test_edge_cases_skipped_not_raised():
    assert extract_anchors(None) == []
    assert extract_anchors("") == []
    assert extract_anchors("<a>no href</a>") == []
    assert extract_anchors("<a href='/x'/>self-closed") == []
    assert extract_anchors("<a href=/x junk<>") == []  # malformed tag
    # unterminated anchor runs to EOF
    assert extract_anchors('<a href="/x">tail text') == [("/x", "tail text")]
    # entity-escaped href unescapes
    assert extract_anchors('<a href="/p?a=1&amp;b=2">t</a>') == [
        ("/p?a=1&b=2", "t")]


def test_anchor_stats_profile(spark):
    rows = [
        ("https://s1.example/",
         '<a href="https://t.example/x">alpha</a>'
         '<a href="https://t.example/x">alpha</a>'
         '<a href="https://t.example/y">beta</a>'),
        ("https://s2.example/", '<a href="https://t.example/x">gamma</a>'),
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    out = {r["dst_url"]: r for r in anchor_stats(pages, k=1).collect()}
    tx = out["https://t.example/x"]
    assert tx["n_inlinks"] == 3
    assert tx["n_src_pages"] == 2
    assert tx["top_anchors"] == "alpha"  # 2×alpha beats 1×gamma
    assert out["https://t.example/y"]["top_anchors"] == "beta"


def test_anchor_stats_canonicalizes_targets(spark):
    """Relative hrefs resolve against their OWN page: two sites'
    '/about' links are different targets; host case and trailing
    slashes collapse to one."""
    rows = [
        ("https://s1.example/", '<a href="/about">a</a>'),
        ("https://s2.example/", '<a href="/about">b</a>'),
        ("https://s3.example/",
         '<a href="HTTPS://T.EXAMPLE/p/">c</a>'
         '<a href="https://t.example/p">d</a>'
         '<a href="javascript:void(0)">not a link</a>'),
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    out = {r["dst_url"]: r for r in anchor_stats(pages).collect()}
    assert out["https://s1.example/about"]["n_inlinks"] == 1
    assert out["https://s2.example/about"]["n_inlinks"] == 1
    assert out["https://t.example/p"]["n_inlinks"] == 2  # variants merge
    assert len(out) == 3  # the javascript: href dropped


def test_comments_and_scripts_are_not_link_context():
    assert extract_anchors(
        '<!-- <a href="/promo">seasonal</a> --><a href="/real">yes</a>'
        '<script>var s = \'<a href="/js">x</a>\';</script>'
    ) == [("/real", "yes")]


def test_top_k_order_and_prefix_stripping(spark):
    # anchors containing ':' and '|' must survive the rank plumbing
    # (the '|' remains ambiguous in the display string, by contract)
    rows = [("https://s.example/",
             '<a href="/t">x:y</a><a href="/t">x:y</a>'
             '<a href="/t">a|b</a><a href="/t">c</a>')]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    [r] = anchor_stats(pages, k=3).collect()
    assert r["top_anchors"] == "x:y|a|b|c"  # count desc, then text asc
    with pytest.raises(ValueError, match="1..99"):
        anchor_stats(pages, k=100)


def test_plan_shape(spark):
    from webscraper_spark.operators.anchors import _anchor_stats_plan

    rows = [("https://s.example/", '<a href="/t">x</a>')]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    lazy, base = _anchor_stats_plan(pages, "url", "html", 3)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    base.unpersist()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # top-k is rank-pushed