"""Text-analysis operators on the documents table + hand oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscraper_spark.operators.textstats import (
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id,
    quality_features,
    quality_score_col,
    token_count_col,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text: string"
    )
    got = [r["n"] for r in df.select(token_count_col("text").alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("Hello, world42 !",)], "text: string")
    # pieces: Hello , world 42 !
    got = df.select(bpe_ish_token_count_col("text").alias("n")).collect()[0]["n"]
    assert got == 5


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house that is big"),
            (2, "der hund und die katze ist nicht ein problem"),
            (3, "le chien et la chatte est une belle chose pour nous"),
            (4, "zzz qqq www"),
        ],
        "id: long, text: string",
    )
    got = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_features_and_score(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs far away "
             "into the deep green forest near the old mill today")],
        "id: long, text: string",
    )
    row = quality_features(df).withColumn("q", quality_score_col()).collect()[0]
    assert row["n_tokens"] == 23
    assert row["n_chars"] == len(row["text"])
    assert row["mean_word_len"] == pytest.approx(row["n_chars"] / 23, abs=1e-3)
    assert 0 <= row["stopword_ratio"] <= 1
    assert row["q"] in (0.0, 0.25, 0.5, 0.75, 1.0)


def test_fingerprint_identity_and_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "gamma beta alpha")],
        "id: long, text: string",
    )
    fp = {r["id"]: r["fp"] for r in df.select("id", fingerprint_col("text").alias("fp")).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_full_documents_pipeline(spark, docs):
    out = quality_features(lang_id(docs)).withColumn("q", quality_score_col())
    rows = out.select("doc_id", "lang", "lang_pred", "n_tokens", "q").collect()
    assert len(rows) == docs.count()
    assert all(r["n_tokens"] > 0 for r in rows)
