"""WARC source: raw Common-Crawl-style archives → pages table."""

from __future__ import annotations

import gzip
from datetime import datetime

from pyspark.sql import functions as F

from webscraper_spark.functions.extract import extract_text
from webscraper_spark.sources.warc import (
    build_warc,
    pages_from_warc,
    parse_warc_records,
    read_warc,
)


def _records(n=6):
    return [
        {
            "url": f"https://h{i % 3}.example/w/{i}",
            "warc_ts": datetime(2025, 7, 25, 0, 0, i),
            "html": f"<html><head><title>W{i}</title></head><body><p>doc {i}</p></body></html>".encode(),
            "status": 200 if i % 5 != 4 else 404,
        }
        for i in range(n)
    ]


def test_parse_roundtrip_plain_and_gzip():
    recs = _records()
    for gz in (False, True):
        data = build_warc(recs, per_record_gzip=gz)
        got = parse_warc_records(data)
        assert len(got) == len(recs)
        for want, r in zip(recs, got):
            assert r["url"] == want["url"]
            assert r["warc_ts"] == want["warc_ts"]
            assert r["html"] == want["html"]
            assert r["http_status"] == want["status"]
            assert r["warc_type"] == "response"


def test_parse_truncated_file_yields_good_prefix():
    data = build_warc(_records(4))
    cut = data[: len(data) - 30]  # truncate inside the last record
    got = parse_warc_records(cut)
    assert len(got) == 3
    assert parse_warc_records(b"garbage not warc") == []


def test_parse_every_truncation_point_never_raises():
    """C7 property sweep: ANY prefix of a valid archive parses without
    an exception, and its records are a prefix of the full parse."""
    data = build_warc(_records(4))
    full = parse_warc_records(data)
    for cut in range(0, len(data), 7):
        got = parse_warc_records(data[:cut])
        assert len(got) <= len(full)
        for want, r in zip(full, got):
            assert r["url"] == want["url"]


def test_parse_single_byte_corruptions_never_raise():
    import random

    for gz in (False, True):
        data = build_warc(_records(3), per_record_gzip=gz)
        rng = random.Random(11)
        for _ in range(200):
            pos = rng.randrange(len(data))
            bad = bytearray(data)
            bad[pos] = rng.randrange(256)
            try:
                out = parse_warc_records(bytes(bad))
                assert isinstance(out, list)
            except ValueError:
                # the ONLY permitted raise: a wholly undecodable gzip
                # archive fails loud instead of silently contributing
                # zero records
                assert gz


def test_undecodable_archive_becomes_error_row(spark, tmp_path):
    # a wholly corrupt .warc.gz must surface as a queryable error row,
    # not vanish
    good = build_warc(_records(2))
    (tmp_path / "good.warc").write_bytes(good)
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b\xff corrupt beyond repair")
    recs = read_warc(spark, str(tmp_path)).collect()
    by_type = {}
    for r in recs:
        by_type.setdefault(r["warc_type"], []).append(r)
    assert len(by_type["response"]) == 2
    errs = by_type["error"]
    assert len(errs) == 1 and errs[0]["source_file"].endswith("bad.warc.gz")


def test_pages_from_warc_spark(spark, tmp_path):
    recs = _records(9)
    (tmp_path / "a.warc").write_bytes(build_warc(recs[:5]))
    (tmp_path / "b.warc.gz").write_bytes(build_warc(recs[5:], per_record_gzip=True))
    # non-200s are filtered; everything else lands with extracted text
    pages = pages_from_warc(spark, str(tmp_path))
    rows = {r.url: r for r in pages.collect()}
    want = [r for r in recs if r["status"] == 200]
    assert set(rows) == {r["url"] for r in want}
    for r in want:
        got = rows[r["url"]]
        assert bytes(got.html) == r["html"]
        assert got.warc_ts == r["warc_ts"]
        assert got.text == extract_text(r["html"])  # pinned kernel
        assert got.lang is None

    # raw reader keeps non-200 records too (i%5==4 → the single 404)
    raw = read_warc(spark, str(tmp_path))
    assert raw.count() == 9
    assert raw.filter(F.col("http_status") == 404).count() == 1


def test_warc_pages_feed_the_crawl_round(spark, tmp_path):
    """End-to-end: WARC → pages table → prepare_pages → one crawl round."""
    from webscraper_spark.plans.round import prepare_pages, run_crawl
    from webscraper_spark.sources.tables import TableStore

    recs = _records(6)
    (tmp_path / "c.warc").write_bytes(build_warc(recs))
    pages = pages_from_warc(spark, str(tmp_path))
    seeds = pages.select(
        "url", F.lit(0).alias("priority")
    )
    hosts = spark.createDataFrame(
        [(f"h{j}.example", None, 1000, None) for j in range(3)],
        "host string, robots_txt string, crawl_delay_ms long, next_allowed_ts timestamp",
    )
    store = TableStore(spark, str(tmp_path / "store"))
    lineages = run_crawl(store, pages, seeds, hosts, n_rounds=1, per_host_budget=10)
    assert lineages[0]["fetched"] == 5  # the 404 record never became a page
