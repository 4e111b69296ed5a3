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
