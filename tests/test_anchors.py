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
        ("https://s1/", '<a href="/t1">alpha</a><a href="/t1">alpha</a>'
                        '<a href="/t2">beta</a>'),
        ("https://s2/", '<a href="/t1">gamma</a>'),
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    out = {r["dst_url"]: r for r in anchor_stats(pages, k=1).collect()}
    t1 = out["/t1"]
    assert t1["n_inlinks"] == 3
    assert t1["n_src_pages"] == 2
    assert t1["top_anchors"] == "alpha"  # 2×alpha beats 1×gamma
    assert out["/t2"]["top_anchors"] == "beta"


def test_top_k_order_and_prefix_stripping(spark):
    # anchors containing ':' and '|' must survive the rank plumbing
    rows = [("https://s/", '<a href="/t">x:y</a><a href="/t">x:y</a>'
                           '<a href="/t">a</a><a href="/t">b</a>')]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    [r] = anchor_stats(pages, k=3).collect()
    assert r["top_anchors"] == "x:y|a|b"  # count desc, then text asc
    with pytest.raises(ValueError, match="1..99"):
        anchor_stats(pages, k=100)


def test_plan_shape(spark):
    rows = [("https://s/", '<a href="/t">x</a>')]
    pages = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "html"]),
        "url string, html string",
    )
    plan = anchor_stats(pages)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan  # top-k is rank-pushed