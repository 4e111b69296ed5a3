"""Scalar kernels (F1–F14): Python kernel vs JVM Column twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from webscraper_spark.functions.textfns import (
    clean_rating_col,
    clean_rating_value,
    convalue,
    convalue_col,
    filter_domain_col,
    int_with_commas_col,
    normalize_string,
    parse_count_col,
    site_root_col,
    truncate_text_col,
)

CONVALUE_CASES = [
    ("12k", 12_000), ("1.5m", 1_500_000), ("1,234", 1234), ("42", 42),
    ("n/a", 0), ("", 0), (None, 0), ("3.9K", 3900),
]

RATING_CASES = [
    ("3.7", 3.7), (" 4.2 ★", 4.2), ("N/A", None), ("", None),
    ("9.7", None), ("0", 0.0), ("5.0", 5.0), ("abc", None),
]


def test_convalue_python():
    for raw, want in CONVALUE_CASES:
        assert convalue(raw) == want, raw


def test_clean_rating_python():
    for raw, want in RATING_CASES:
        assert clean_rating_value(raw) == want, raw


def test_normalize_string():
    # behavior of crunchbase_matching.py:18-27 (accent fold, strip, cut at '.')
    assert normalize_string("Café Brühl, Inc.") == "cafebruhlinc"
    assert normalize_string("  Acme   Corp  ") == "acmecorp"
    assert normalize_string("X.Y.Z") == "xyz"[0:1]  # cut at first '.'
    assert normalize_string(None) is None


def test_column_twins_match_python(spark):
    df = spark.createDataFrame(
        [(r if r is not None else None,) for r, _ in CONVALUE_CASES], "v: string"
    )
    got = [r["c"] for r in df.select(convalue_col(F.col("v")).alias("c")).collect()]
    assert got == [w for _, w in CONVALUE_CASES]

    df = spark.createDataFrame([(r,) for r, _ in RATING_CASES], "v: string")
    got = [r["c"] for r in df.select(clean_rating_col(F.col("v")).alias("c")).collect()]
    assert got == [w for _, w in RATING_CASES]


def test_url_helpers(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.com/a/b?q=1",), ("http://sub.site.org/x",)], "url: string"
    )
    rows = df.select(
        filter_domain_col(F.col("url")).alias("d"),
        site_root_col(F.col("url")).alias("r"),
    ).collect()
    assert rows[0]["d"] == "example.com"
    assert rows[0]["r"] == "https://www.example.com"
    assert rows[1]["d"] == "sub.site.org"


def test_count_parsers(spark):
    df = spark.createDataFrame(
        [("(1,234 total reviews)", "9,876", "x" * 120)],
        "t: string, n: string, long_text: string",
    )
    row = df.select(
        parse_count_col(F.col("t"), r"\((\d[\d,]*)\s+total\s+reviews?\)").alias("c"),
        int_with_commas_col(F.col("n")).alias("i"),
        F.length(truncate_text_col(F.col("long_text"), 50)).alias("l"),
    ).collect()[0]
    assert row["c"] == 1234
    assert row["i"] == 9876
    assert row["l"] == 53  # 50 + "..."
