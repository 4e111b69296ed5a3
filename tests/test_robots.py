"""robots.txt parser: urllib.robotparser (first-match-in-order) semantics."""

from __future__ import annotations

import urllib.robotparser

from webscraper_spark.functions.robots import parse_robots, robots_allows

BODY = """
User-agent: *
Allow: /private/ok/
Disallow: /private/
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""


def test_parse():
    r = parse_robots(BODY)
    assert r["rules"] == ["+/private/ok/", "-/private/"]
    assert r["crawl_delay_ms"] == 2500


def test_allows_first_match():
    r = parse_robots(BODY)
    assert robots_allows(r, "/p/1")
    assert not robots_allows(r, "/private/x")
    assert robots_allows(r, "/private/ok/x")  # Allow listed first wins


def test_matches_stdlib_semantics():
    for body in (
        BODY,
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n",
        "User-agent: *\nDisallow:\n",
        "User-agent: evilbot\nDisallow: /\n",
    ):
        rp = urllib.robotparser.RobotFileParser()
        rp.parse(body.splitlines())
        r = parse_robots(body)
        for path in ["/", "/p/1", "/private/", "/private/a", "/private/ok/", "/private/ok/b"]:
            assert robots_allows(r, path) == rp.can_fetch("*", f"https://h.example{path}"), (
                body,
                path,
            )


def test_empty_and_missing():
    assert robots_allows(parse_robots(None), "/anything")
    assert robots_allows(parse_robots(""), "/anything")


def test_robots_sitemap_directives(spark):
    from pyspark.sql import functions as F

    from webscraper_spark.functions.robots import (
        robots_sitemaps,
        robots_sitemaps_udf,
    )

    body = (
        "User-agent: googlebot\nDisallow: /private/\n"
        "Sitemap: https://a.example/sitemap.xml\n"
        "User-agent: *\nDisallow: /tmp/\n"
        "sitemap: https://a.example/sitemap2.xml.gz  # comment\n"
        "Sitemap:\n"  # empty value ignored
    )
    # group-independent: BOTH directives extracted even though one sits
    # in a non-* group
    assert robots_sitemaps(body) == [
        "https://a.example/sitemap.xml",
        "https://a.example/sitemap2.xml.gz",
    ]
    assert robots_sitemaps(None) == []
    hosts = spark.createDataFrame(
        [("a.example", body), ("b.example", None)],
        "host string, robots_txt string",
    )
    out = {r["host"]: r["maps"] for r in hosts.select(
        "host", robots_sitemaps_udf(F.col("robots_txt")).alias("maps")
    ).collect()}
    assert len(out["a.example"]) == 2
    assert out["b.example"] == []


def test_robots_sitemaps_feed_sitemap_source(spark):
    """robots Sitemap: discovery → sitemap ingestion → frontier seeds,
    end to end (the fetch of the sitemap blobs is simulated by a join
    against a blob table, as the crawl round does for pages)."""
    from pyspark.sql import functions as F

    from webscraper_spark.functions.robots import robots_sitemaps_udf
    from webscraper_spark.sources.sitemap import sitemap_to_frontier

    hosts = spark.createDataFrame(
        [("a.example", "Sitemap: https://a.example/s.xml")],
        "host string, robots_txt string",
    )
    blobs = spark.createDataFrame(
        [("https://a.example/s.xml",
          b"<urlset><url><loc>https://a.example/p/1</loc></url></urlset>")],
        "path string, content binary",
    )
    wanted = hosts.select(
        F.explode(robots_sitemaps_udf(F.col("robots_txt"))).alias("path")
    )
    fetched = wanted.join(blobs, on="path")
    seeds = sitemap_to_frontier(fetched).collect()
    assert [r["url"] for r in seeds] == ["https://a.example/p/1"]
