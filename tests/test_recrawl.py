"""Recrawl scheduling: signal-beats-age semantics, max-agg over
multiple signals, the non-candidate saving, and plan shape."""

from __future__ import annotations

import pandas as pd

from webscraper_spark.operators.recrawl import recrawl_candidates

NOW = "2025-08-15 00:00:00"


def _dfs(spark, corpus_rows, signal_rows):
    corpus = spark.createDataFrame(
        pd.DataFrame(corpus_rows, columns=["url", "fetch_ts"]),
        "url string, fetch_ts timestamp",
    )
    signals = spark.createDataFrame(
        pd.DataFrame(signal_rows, columns=["url", "signal_ts"]),
        "url string, signal_ts timestamp",
    )
    return corpus, signals


def test_reasons_and_priorities(spark):
    corpus, signals = _dfs(
        spark,
        [
            # fresh signal: gap 9 days -> priority 0
            ("https://a.example/1", pd.Timestamp("2025-08-01")),
            # fresh signal: gap 1 day -> priority 3
            ("https://a.example/2", pd.Timestamp("2025-08-01")),
            # signal says current (signal == fetch): NOT a candidate
            # even though the copy is 45 days old — the budget saving
            ("https://a.example/3", pd.Timestamp("2025-07-01")),
            # no signal, 45 days old -> stale_age, priority 4
            ("https://a.example/4", pd.Timestamp("2025-07-01")),
            # no signal, 10 days old -> not a candidate
            ("https://a.example/5", pd.Timestamp("2025-08-05")),
        ],
        [
            ("https://a.example/1", pd.Timestamp("2025-08-10")),
            ("https://a.example/2", pd.Timestamp("2025-08-02")),
            ("https://a.example/3", pd.Timestamp("2025-07-01")),
        ],
    )
    out = {r["url"]: r for r in recrawl_candidates(
        corpus, signals, now_ts=NOW).collect()}
    assert set(out) == {"https://a.example/1", "https://a.example/2",
                        "https://a.example/4"}
    r1, r2, r4 = (out["https://a.example/1"], out["https://a.example/2"],
                  out["https://a.example/4"])
    assert r1["reason"] == "fresh_signal" and r1["priority"] == 0
    assert r1["staleness_days"] == 9.0
    assert r2["reason"] == "fresh_signal" and r2["priority"] == 3
    assert r4["reason"] == "stale_age" and r4["priority"] == 4
    assert r4["staleness_days"] == 15.0  # 45 days old, 30-day limit
    assert r4["signal_ts"] is None
    assert r1["host"] == "a.example"


def test_latest_signal_wins(spark):
    """Multiple signal generations per url collapse to max(signal_ts)
    BEFORE the join — an old signal must not hide a new one."""
    corpus, signals = _dfs(
        spark,
        [("https://b.example/x", pd.Timestamp("2025-08-01"))],
        [
            ("https://b.example/x", pd.Timestamp("2025-06-01")),
            ("https://b.example/x", pd.Timestamp("2025-08-05")),
            ("https://b.example/x", pd.Timestamp("2025-07-15")),
        ],
    )
    [row] = recrawl_candidates(corpus, signals, now_ts=NOW).collect()
    assert row["reason"] == "fresh_signal"
    assert str(row["signal_ts"]) == "2025-08-05 00:00:00"
    # exactly one row: the join is against the aggregated view
    assert row["staleness_days"] == 4.0


def test_bad_now_ts_fails_fast(spark):
    """An unparseable instant must raise, not silently suppress the
    stale_age tier."""
    import pytest

    corpus, signals = _dfs(
        spark,
        [("https://e.example/w", pd.Timestamp("2025-07-01"))],
        [],
    )
    with pytest.raises(ValueError, match="now_ts"):
        recrawl_candidates(corpus, signals, now_ts="2025/08/15")


def test_null_signals_ignored(spark):
    corpus, signals = _dfs(
        spark,
        [("https://c.example/y", pd.Timestamp("2025-07-01"))],
        [("https://c.example/y", None)],
    )
    [row] = recrawl_candidates(corpus, signals, now_ts=NOW).collect()
    assert row["reason"] == "stale_age"  # a null signal is no signal


def test_plan_shape(spark):
    """One aggregate + one join; no BatchEvalPython, no cartesian."""
    corpus, signals = _dfs(
        spark,
        [("https://d.example/z", pd.Timestamp("2025-07-01"))],
        [("https://d.example/z", pd.Timestamp("2025-08-01"))],
    )
    plan = recrawl_candidates(
        corpus, signals, now_ts=NOW
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan
