"""Stratified/quota sampling: determinism, exact counts, quota
semantics, and the WindowGroupLimit plan shape."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from webscraper_spark.operators.sampling import (
    quota_sample,
    stratified_sample,
)


def _docs(spark, n=60):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "lang"]),
        "doc_id long, lang string",
    )


def test_exact_counts_and_determinism(spark):
    docs = _docs(spark)
    a = stratified_sample(docs, ["lang"], 5).collect()
    b = stratified_sample(docs, ["lang"], 5).collect()
    counts: dict = {}
    for r in a:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    assert counts == {"en": 5, "de": 5, "fr": 5}
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    # ranks are 1..n within each stratum
    ranks = sorted(r["sample_rank"] for r in a if r["lang"] == "en")
    assert ranks == [1, 2, 3, 4, 5]


def test_seed_changes_selection(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(docs, ["lang"], 5).collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs, ["lang"], 5, seed="s1").collect()}
    assert a != b  # different seed, different (deterministic) sample


def test_small_stratum_keeps_all_rows(spark):
    docs = _docs(spark, n=4)  # en:2, de:1, fr:1
    out = stratified_sample(docs, ["lang"], 10).collect()
    assert len(out) == 4


def test_quota_sample(spark):
    docs = _docs(spark)
    quotas = spark.createDataFrame(
        pd.DataFrame([("en", 7), ("de", 2)], columns=["lang", "quota"]),
        "lang string, quota int",
    )
    out = quota_sample(docs, ["lang"], quotas).collect()
    counts: dict = {}
    for r in out:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    # fr has no quota row -> keeps nothing
    assert counts == {"en": 7, "de": 2}
    # the quota winners are the stratified-sample prefix (same order)
    strat = {(r["lang"], r["doc_id"])
             for r in stratified_sample(docs, ["lang"], 7).collect()
             if r["lang"] == "en"}
    assert {("en", r["doc_id"]) for r in out if r["lang"] == "en"} <= strat


def test_quota_sample_empty_quotas(spark):
    docs = _docs(spark)
    quotas = docs.select(F.col("lang"), F.lit(1).alias("quota")).limit(0)
    empty = quota_sample(docs, ["lang"], quotas)
    assert empty.count() == 0
    # both paths return the same column order: df columns + sample_rank
    full = quota_sample(docs, ["lang"], docs.select(
        F.col("lang"), F.lit(1).alias("quota")).distinct())
    assert empty.columns == full.columns == ["doc_id", "lang",
                                             "sample_rank"]


def test_quota_sample_rejects_duplicate_strata(spark):
    import pytest

    docs = _docs(spark)
    quotas = spark.createDataFrame(
        pd.DataFrame([("en", 5), ("en", 3)], columns=["lang", "quota"]),
        "lang string, quota int",
    )
    with pytest.raises(ValueError, match="duplicate strata"):
        quota_sample(docs, ["lang"], quotas)


def test_rejects_existing_sample_rank_column(spark):
    import pytest

    docs = _docs(spark)
    once = stratified_sample(docs, ["lang"], 5)
    with pytest.raises(ValueError, match="sample_rank"):
        stratified_sample(once, ["lang"], 2)
    # the documented two-stage path: drop the rank, then re-sample
    again = stratified_sample(once.drop("sample_rank"), ["lang"], 2)
    assert again.count() == 6


def test_plan_uses_window_group_limit(spark):
    docs = _docs(spark)
    plan = stratified_sample(
        docs, ["lang"], 5
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # bounded heap, no full sort
    assert "BatchEvalPython" not in plan
