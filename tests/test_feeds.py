"""RSS/Atom feed source: block parse, timestamp normalization, the C7
error contract, and the Spark frontier-mapping path."""

from __future__ import annotations

import gzip

import pytest

from webscraper_spark.sources.feeds import (
    _norm_ts,
    feed_entries,
    feeds_to_frontier,
    parse_feed,
)

RSS = """<?xml version="1.0"?><rss version="2.0"><channel>
<title>Site feed</title><link>https://a.example/</link>
<item><title>First &amp; foremost</title>
<link>https://a.example/post/1</link>
<pubDate>Tue, 01 Jul 2025 12:00:00 +0200</pubDate>
<guid>tag:a,1</guid></item>
<item><title><![CDATA[CDATA & <raw> title]]></title>
<link>https://a.example/post/2</link></item>
<item><title>no link item</title></item>
</channel></rss>"""

ATOM = """<?xml version="1.0"?><feed xmlns="http://www.w3.org/2005/Atom">
<title>Atom feed</title>
<entry><title>Entry one</title>
<link rel="self" href="https://b.example/entry/1.atom"/>
<link rel="alternate" href="https://b.example/entry/1"/>
<published>2025-07-02T00:00:00Z</published>
<id>tag:b,1</id></entry>
<entry><title>Entry two</title>
<link href="https://b.example/entry/2"/>
<updated>2025-07-03T05:06:07+01:00</updated></entry>
<entry><title>linkless</title></entry>
</feed>"""


def test_rss_items():
    entries = parse_feed(RSS)
    assert [e["feed_type"] for e in entries] == ["rss", "rss", "error"]
    e1, e2, err = entries
    assert e1["url"] == "https://a.example/post/1"
    assert e1["title"] == "First & foremost"
    assert e1["published_norm"] == "2025-07-01 10:00:00"  # +0200 → UTC
    assert e1["guid"] == "tag:a,1"
    assert e2["title"] == "CDATA & <raw> title"
    assert e2["published"] is None and e2["published_norm"] is None
    assert err["error"] == "item without <link>"


def test_atom_entries():
    entries = parse_feed(ATOM)
    assert [e["feed_type"] for e in entries] == ["atom", "atom", "error"]
    e1, e2, err = entries
    # rel="self" must not win over rel="alternate"
    assert e1["url"] == "https://b.example/entry/1"
    assert e1["published_norm"] == "2025-07-02 00:00:00"
    assert e1["guid"] == "tag:b,1"
    # no rel attribute = the default entry link; <updated> is the
    # fallback timestamp
    assert e2["url"] == "https://b.example/entry/2"
    assert e2["published_norm"] == "2025-07-03 04:06:07"
    assert err["error"] == "entry without link href"


def test_norm_ts_contract():
    assert _norm_ts("01 Jul 2025 00:00:00 +0000") == "2025-07-01 00:00:00"
    assert _norm_ts("2025-07-01T00:00:00Z") == "2025-07-01 00:00:00"
    assert _norm_ts("2025-07-01T02:00:00+02:00") == "2025-07-01 00:00:00"
    assert _norm_ts("not a date") is None
    assert _norm_ts(None) is None
    assert _norm_ts("") is None
    # naive timestamps are taken as UTC
    assert _norm_ts("2025-07-01T09:00:00") == "2025-07-01 09:00:00"


def test_not_a_feed_raises():
    with pytest.raises(ValueError, match="not a recognized feed"):
        parse_feed("<html><body>page</body></html>")
    # the sniff matches real tags, not substrings: a page mentioning
    # <feedback> or a channel-list div must be the error row, not a
    # silently empty Atom/RSS parse
    with pytest.raises(ValueError, match="not a recognized feed"):
        parse_feed("<html><feedback>leave a note</feedback></html>")
    with pytest.raises(ValueError, match="not a recognized feed"):
        parse_feed("<html><channels>tv listing</channels></html>")
    # a genuine feed with zero entries is valid: zero rows, no error
    assert parse_feed('<feed xmlns="http://www.w3.org/2005/Atom"></feed>') == []
    assert parse_feed('<rss version="2.0"><channel></channel></rss>') == []


def test_feed_entries_and_frontier(spark):
    import pandas as pd

    files = spark.createDataFrame(
        pd.DataFrame(
            [
                ("https://hub/rss.xml", RSS.encode()),
                ("https://hub/atom.xml.gz", gzip.compress(ATOM.encode())),
                ("https://hub/none.html", b"<html>nope</html>"),
                ("https://hub/corrupt.gz", b"\x1f\x8b\x00broken"),
            ],
            columns=["path", "content"],
        ),
        "path string, content binary",
    )
    entries = feed_entries(files).collect()
    by_type: dict = {}
    for r in entries:
        by_type.setdefault(r["feed_type"], []).append(r)
    assert len(by_type["rss"]) == 2 and len(by_type["atom"]) == 2
    # two malformed entries + one non-feed file + one bad gzip
    assert len(by_type["error"]) == 4
    frontier = feeds_to_frontier(files).collect()  # session tz is UTC
    assert sorted(r["url"] for r in frontier) == [
        "https://a.example/post/1", "https://a.example/post/2",
        "https://b.example/entry/1", "https://b.example/entry/2",
    ]
    by_url = {r["url"]: r for r in frontier}
    assert by_url["https://a.example/post/1"]["host"] == "a.example"
    assert str(by_url["https://b.example/entry/2"]["published_ts"]) == (
        "2025-07-03 04:06:07"
    )
    assert by_url["https://a.example/post/2"]["published_ts"] is None
