"""Python XXH64 must agree bit-for-bit with Spark's F.xxhash64 (seed 42)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from webscraper_spark.functions.hashing import xxh64, xxh64_long, xxh64_str


def test_known_vectors():
    # XXH64 reference vectors (public spec): seed 0
    assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", seed=0) == 0xD24EC4F1A98C6E5B


def test_spark_string_parity(spark):
    samples = ["", "a", "ab", "abc", "abcd", "abcde", "x" * 31, "x" * 32,
               "x" * 33, "x" * 100, "https://h.example/p?a=1&b=2", "ü样例"]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).withColumn(
        "h", F.xxhash64("s")
    )
    for r in df.collect():
        assert xxh64_str(r["s"]) == r["h"], r["s"]


def test_spark_long_parity(spark):
    vals = [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v: long").withColumn(
        "h", F.xxhash64("v")
    )
    for r in df.collect():
        assert xxh64_long(r["v"]) == r["h"], r["v"]


@given(st.binary(min_size=0, max_size=200), st.integers(0, 2**31))
@settings(max_examples=200, deadline=None)
def test_stable_and_unsigned(data, seed):
    h = xxh64(data, seed)
    assert 0 <= h < 2**64
    assert h == xxh64(bytes(data), seed)
