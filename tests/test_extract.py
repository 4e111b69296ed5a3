"""Extraction kernel + UDF: byte-parity, fallback ladders, error isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.functions.extract import (
    extract_fields,
    extract_outlinks,
    extract_text,
    extract_udf,
)


def test_text_byte_parity_full_corpus(corpus):
    pages = corpus["pages"]
    for _, r in pages.iterrows():
        assert extract_text(r["html"]) == r["text"]


def test_udf_matches_kernel(spark, sdfs):
    rows = (
        sdfs["pages"]
        .withColumn("ex", extract_udf("html"))
        .select(F.col("text").alias("want"), F.col("ex.text").alias("got"))
        .collect()
    )
    assert rows and all(r["want"] == r["got"] for r in rows)


def test_rating_fallback_ladder():
    # 1) class*=rating wins
    h = b'<html><body><span class="rating">3.7</span><span>4.9</span>ignore 1.2</body></html>'
    assert extract_fields(h)["rating"] == 3.7
    # 2) plain span decimal
    h = b"<html><body><span>4.9</span> and 1.2 text</body></html>"
    assert extract_fields(h)["rating"] == 4.9
    # 3) first decimal in text
    h = b"<html><body>score 1.2 of 5</body></html>"
    assert extract_fields(h)["rating"] == 1.2
    # clamp: outside [0,5] → null
    h = b'<html><body><span class="rating">9.9</span></body></html>'
    assert extract_fields(h)["rating"] is None


def test_review_count_and_engaged():
    h = b"<html><body>(1,234 total reviews) Engaged Employer</body></html>"
    f = extract_fields(h)
    assert f["review_count"] == 1234
    assert f["engaged"] is True
    h = b"<html><body>88 reviews so far</body></html>"
    assert extract_fields(h)["review_count"] == 88


def test_outlinks_document_order():
    h = b'<html><body><a href="/a">1</a><a href="https://x.example/b">2</a><a>3</a></body></html>'
    assert extract_outlinks(h) == ["/a", "https://x.example/b"]


def test_script_style_excluded():
    h = b"<html><head><style>p{}</style><script>var a;</script></head><body>keep</body></html>"
    assert extract_text(h) == "keep"


def test_error_isolation():
    # None and junk bytes must not raise (C7 per-item isolation)
    assert extract_text(None) is None
    f = extract_fields(b"\xff\xfe<not html <<<")
    assert isinstance(f, dict)


def test_title():
    h = b"<html><head><title> A  Title </title></head><body>x</body></html>"
    assert extract_fields(h)["title"] == "A Title"
