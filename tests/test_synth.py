"""Synthetic corpus invariants: determinism, closure, skew, noise."""

from __future__ import annotations

import numpy as np

from webscraper_spark.functions.canon import canonicalize_url, host_of
from webscraper_spark.functions.extract import extract_outlinks
from webscraper_spark.synth import gen_corpus


def test_deterministic():
    a = gen_corpus(n_urls=300, n_hosts=8, seed=42)
    b = gen_corpus(n_urls=300, n_hosts=8, seed=42)
    for name in ("pages", "seeds", "hosts"):
        assert a[name].equals(b[name]), name


def test_outlink_closure(corpus):
    pages = corpus["pages"]
    known = {canonicalize_url(u) for u in pages["url"]}
    sample = pages.head(100)
    for _, r in sample.iterrows():
        for href in extract_outlinks(r["html"]):
            c = canonicalize_url(href, base=canonicalize_url(r["url"]))
            if c is not None:  # admission-filter fodder returns None
                assert c in known


def test_host_skew(corpus):
    hosts = corpus["pages"]["url"].map(lambda u: host_of(canonicalize_url(u)))
    counts = hosts.value_counts()
    # Zipf: hottest host should dominate the median host by a wide margin
    assert counts.iloc[0] > 5 * np.median(counts.values)


def test_noise_and_dups(corpus):
    pages = corpus["pages"]
    canon = pages["url"].map(canonicalize_url)
    assert (pages["url"] != canon).mean() > 0.03  # noisy surface forms exist
    assert canon.duplicated().sum() > 0  # newest-wins duplicate urls exist


def test_seeds_reference_known_urls(corpus):
    known = {canonicalize_url(u) for u in corpus["pages"]["url"]}
    seeds = corpus["seeds"]
    hits = seeds["url"].map(lambda u: canonicalize_url(u) in known)
    assert hits.sum() == len(seeds) - 1  # exactly one unknown miss-path seed
