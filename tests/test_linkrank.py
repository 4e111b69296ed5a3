"""Link-graph ranking: PageRank frontier prioritization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscraper_spark.operators.linkrank import pagerank, priorities_from_rank


def test_pagerank_three_node_chain(spark):
    """A -> B -> C with C dangling: rank must sum to ~1, strictly
    increase along the chain, and handle the dangling redistribution."""
    edges = spark.createDataFrame([("A", "B"), ("B", "C")], "src string, dst string")
    r = {row.node: row.rank for row in pagerank(edges, n_iters=20).collect()}
    assert set(r) == {"A", "B", "C"}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    assert r["A"] < r["B"] < r["C"]


def test_pagerank_hub_dominates(spark):
    """Everyone links to H (H dangling): H must hold the top rank, and
    duplicate edges must not double-count (n1's triple edge counts
    once, so all leaves tie)."""
    edges = [(f"n{i}", "H") for i in range(10)]
    edges += [("n1", "H")] * 3  # duplicates
    df = spark.createDataFrame(edges, "src string, dst string")
    r = {row.node: row.rank for row in pagerank(df, n_iters=10).collect()}
    assert max(r, key=r.get) == "H"
    assert r["n1"] == r["n0"] == r["n9"]  # dedup: no double-count
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)


def test_priorities_from_rank_monotonic_no_global_sort(spark):
    edges = [(f"n{i}", "H") for i in range(20)] + [("H", "n0"), ("n0", "n1")]
    df = spark.createDataFrame(edges, "src string, dst string")
    ranks = pagerank(df, n_iters=8)
    pr = priorities_from_rank(ranks, n_buckets=4)
    rows = pr.collect()
    by_rank = sorted(rows, key=lambda r: -r.rank)
    prios = [r.priority for r in by_rank]
    assert prios == sorted(prios)  # higher rank → lower-or-equal priority
    assert prios[0] == 0 and max(prios) <= 3
    # scale guard: no single-partition sort window in the plan
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_rank_priorities_drive_the_scheduler(spark):
    """End-to-end: rank → priority → schedule_round admits the hub first
    under a tight budget."""
    from datetime import datetime

    from webscraper_spark.operators.schedule import schedule_round

    edges = [(f"https://s.example/p{i}", "https://s.example/hub") for i in range(12)]
    df = spark.createDataFrame(edges, "src string, dst string")
    pr = priorities_from_rank(pagerank(df, n_iters=8))
    frontier = pr.select(
        F.xxhash64("node").alias("url_hash"),
        F.col("node").alias("url"),
        F.lit("s.example").alias("host"),
        "priority",
        F.lit(0).alias("discovered_round"),
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("timestamp").alias("next_fetch_ts"),
    )
    hosts = spark.createDataFrame(
        [("s.example", None, 1000, None)],
        "host string, robots_txt string, crawl_delay_ms long, next_allowed_ts timestamp",
    )
    sched = schedule_round(frontier, hosts, per_host_budget=1,
                           round_start_ts=datetime(2025, 8, 1))
    assert [r.url for r in sched.collect()] == ["https://s.example/hub"]
