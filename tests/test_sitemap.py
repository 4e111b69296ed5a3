"""Sitemap source: parser units, gzip, index indirection, error
isolation, and the frontier-seed pipeline end to end into the
scheduler."""
from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from webscraper_spark.sources.sitemap import (
    parse_sitemap,
    sitemap_entries,
    sitemap_to_frontier,
)

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>https://a.example/p/1?x=1&amp;y=2</loc>"
    "<lastmod>2025-07-03</lastmod><changefreq>daily</changefreq>"
    "<priority>0.8</priority></url>"
    "<url><loc> https://a.example/p/2 </loc></url>"
    "<url><lastmod>2025-07-04</lastmod></url>"  # malformed: no loc
    "</urlset>"
)

INDEX = (
    '<?xml version="1.0"?><sitemapindex>'
    "<sitemap><loc>https://hub.example/s1.xml</loc></sitemap>"
    "<sitemap><loc>https://hub.example/s2.xml.gz</loc></sitemap>"
    "</sitemapindex>"
)


def test_parse_urlset():
    entries = parse_sitemap(URLSET)
    kinds = [e["kind"] for e in entries]
    assert kinds == ["url", "url", "error"]
    assert entries[0]["loc"] == "https://a.example/p/1?x=1&y=2"  # unescaped
    assert entries[0]["lastmod"] == "2025-07-03"
    assert entries[0]["priority"] == 0.8
    assert entries[0]["changefreq"] == "daily"
    assert entries[1]["loc"] == "https://a.example/p/2"  # whitespace trimmed
    assert entries[1]["priority"] is None


def test_parse_index():
    entries = parse_sitemap(INDEX)
    assert [e["kind"] for e in entries] == ["sitemap", "sitemap"]
    assert entries[1]["loc"] == "https://hub.example/s2.xml.gz"


def test_entries_gzip_and_error_isolation(spark):
    files = [
        ("https://hub.example/s1.xml", URLSET.encode()),
        ("https://hub.example/s2.xml.gz", gzip.compress(URLSET.encode())),
        ("https://hub.example/broken.gz", b"\x1f\x8bnot really gzip"),
        # truncated gzip raises EOFError, not BadGzipFile — must still
        # be an error row, never a task failure
        ("https://hub.example/cut.gz",
         gzip.compress(URLSET.encode())[:20]),
        ("https://hub.example/idx.xml", INDEX.encode()),
    ]
    fdf = spark.createDataFrame(files, "path string, content binary")
    out = sitemap_entries(fdf)
    by_path = {p: [r for r in out.collect() if r["sitemap_path"] == p]
               for p, _ in files}
    # plain and gzipped parse identically
    assert (
        sorted((r["kind"], r["loc"]) for r in by_path["https://hub.example/s1.xml"])
        == sorted((r["kind"], r["loc"]) for r in by_path["https://hub.example/s2.xml.gz"])
    )
    [err] = by_path["https://hub.example/broken.gz"]
    assert err["kind"] == "error" and err["error"] == "BadGzipFile"
    [cut] = by_path["https://hub.example/cut.gz"]
    assert cut["kind"] == "error" and cut["error"] == "EOFError"
    assert {r["kind"] for r in by_path["https://hub.example/idx.xml"]} == {"sitemap"}


def test_frontier_mapping(spark):
    fdf = spark.createDataFrame(
        [("s.xml", URLSET.encode())], "path string, content binary"
    )
    rows = {r["url"]: r for r in sitemap_to_frontier(fdf).collect()}
    r1 = rows["https://a.example/p/1?x=1&y=2"]
    assert r1["host"] == "a.example"
    assert r1["priority"] == 1  # round((1-0.8)*4)
    assert str(r1["lastmod_ts"]).startswith("2025-07-03")
    r2 = rows["https://a.example/p/2"]
    assert r2["priority"] == 2  # default when sitemap omits <priority>
    assert r2["lastmod_ts"] is None
    assert r1["url_hash"] is not None


def test_sitemap_seeds_schedule_end_to_end(spark):
    """Sitemap seeds flow straight into the politeness scheduler: the
    frontier shape matches and per-host ordering respects priority."""
    from datetime import datetime

    from webscraper_spark.operators.schedule import schedule_round

    entries = "".join(
        f"<url><loc>https://h0.example/p/{i}</loc>"
        f"<priority>{(9 - i) / 10:.1f}</priority></url>"
        for i in range(6)
    )
    fdf = spark.createDataFrame(
        [("s.xml", f"<urlset>{entries}</urlset>".encode())],
        "path string, content binary",
    )
    frontier = sitemap_to_frontier(fdf).select(
        "url_hash", "url", "host", "priority",
        F.lit(0).alias("discovered_round"),
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("timestamp").alias("next_fetch_ts"),
    )
    hosts = spark.createDataFrame(
        [("h0.example", None, 1000)],
        "host string, robots_txt string, crawl_delay_ms long",
    ).withColumn("next_allowed_ts", F.lit(datetime(2025, 8, 1)))
    sched = schedule_round(
        frontier, hosts, per_host_budget=3, round_start_ts=datetime(2025, 8, 1)
    ).orderBy("host_seq").collect()
    assert len(sched) == 3
    # highest sitemap priority (0.9 → scheduler 0) first
    assert sched[0]["url"] == "https://h0.example/p/0"
