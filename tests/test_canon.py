"""URL canonicalization: fixed cases + idempotence property (SURVEY §5.2.4)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from webscraper_spark.functions.canon import canonicalize_url, host_of, with_canonical
from webscraper_spark.functions.hashing import xxh64_str

CASES = [
    ("https://HOST001.example/p/5#frag", "https://host001.example/p/5"),
    ("https://host001.example:443/p/5", "https://host001.example/p/5"),
    ("http://h.example:80/a/", "http://h.example/a"),
    ("http://h.example:8080/a", "http://h.example:8080/a"),
    ("https://h.example", "https://h.example/"),
    ("https://h.example/p?z=2&id=1", "https://h.example/p?id=1&z=2"),
    ("https://h.example/p?z=2&id=1#x", "https://h.example/p?id=1&z=2"),
    ("  https://h.example/p  ", "https://h.example/p"),
    ("javascript:void(0)", None),
    ("mailto:a@b.example", None),
    ("ftp://h.example/x", None),
    ("#anchor", None),
    ("", None),
    (None, None),
]


def test_fixed_cases():
    for raw, want in CASES:
        assert canonicalize_url(raw) == want, raw


def test_relative_resolution():
    assert canonicalize_url("/p/3", base="https://h.example/p/1") == "https://h.example/p/3"
    assert canonicalize_url("sub/x", base="https://h.example/a/b") == "https://h.example/a/sub/x"
    assert canonicalize_url("//other.example/q", base="https://h.example/a") == "https://other.example/q"


_url_st = st.builds(
    lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}/{path}{q}{frag}",
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    st.from_regex(r"[A-Za-z0-9]{1,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"[a-z0-9/]{0,20}", fullmatch=True),
    st.sampled_from(["", "?b=2&a=1", "?id=9", "?z=&id=1"]),
    st.sampled_from(["", "#f", "#frag-2"]),
)


@given(_url_st)
@settings(max_examples=300, deadline=None)
def test_idempotent(u):
    c = canonicalize_url(u)
    if c is not None:
        assert canonicalize_url(c) == c
        assert host_of(c) == c.split("://")[1].split("/")[0].split(":")[0]


def test_with_canonical_spark(spark, sdfs):
    out = with_canonical(sdfs["pages"]).select("url", "host", "url_hash").collect()
    assert len(out) > 0
    for r in out[:200]:
        assert canonicalize_url(r["url"]) == r["url"]  # already canonical
        assert host_of(r["url"]) == r["host"]
        assert xxh64_str(r["url"]) == r["url_hash"]
