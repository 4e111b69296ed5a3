"""Redirect resolution: chains, loops, hop caps, the functional-map
contract, and doubling-vs-sequential parity."""

from __future__ import annotations

import pandas as pd
import pytest

from webscraper_spark.operators.redirects import resolve_redirects


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]),
        "src long, dst long",
    )


def test_chain_resolves_with_exact_hops(spark):
    # 5 -> 4 -> 3 -> 2 -> 1 -> 0 (terminal)
    edges = _edges(spark, [(i, i - 1) for i in range(1, 6)])
    out = {r["src"]: r for r in resolve_redirects(edges).collect()}
    for src in range(1, 6):
        assert out[src]["final_dst"] == 0
        assert out[src]["n_hops"] == src
        assert out[src]["terminated"] is True


def test_cycle_reports_position_after_max_hops(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    out = {r["src"]: r for r in
           resolve_redirects(edges, max_hops=64).collect()}
    for src in (1, 2, 3):
        assert out[src]["terminated"] is False
        assert out[src]["n_hops"] == 64
    # sequential parity: 64 steps from 1 on the 3-cycle lands on
    # ((1-1) + 64) % 3 + 1 = 2
    assert out[1]["final_dst"] == 2
    assert out[2]["final_dst"] == 3
    assert out[3]["final_dst"] == 1


def test_chain_longer_than_cap_is_unterminated(spark):
    edges = _edges(spark, [(i, i - 1) for i in range(1, 30)])
    out = {r["src"]: r for r in
           resolve_redirects(edges, max_hops=8).collect()}
    assert out[29]["terminated"] is False
    assert out[29]["n_hops"] == 8
    assert out[29]["final_dst"] == 21  # 8 sequential steps from 29
    assert out[5]["terminated"] is True and out[5]["n_hops"] == 5


def test_max_hops_rounds_up_to_power_of_two(spark):
    # max_hops=10 normalizes to 16: a 12-chain terminates inside it
    edges = _edges(spark, [(i, i - 1) for i in range(1, 13)])
    out = {r["src"]: r for r in
           resolve_redirects(edges, max_hops=10).collect()}
    assert out[12]["terminated"] is True and out[12]["n_hops"] == 12


def test_max_hops_one_is_exact(spark):
    """max_hops=1 means exactly one step — zero doubling rounds."""
    edges = _edges(spark, [(2, 1), (1, 0)])
    out = {r["src"]: r for r in
           resolve_redirects(edges, max_hops=1).collect()}
    assert out[2]["final_dst"] == 1
    assert out[2]["n_hops"] == 1
    assert out[2]["terminated"] is False  # 1 still redirects
    assert out[1]["final_dst"] == 0 and out[1]["terminated"] is True


def test_conflicting_targets_raise(spark):
    edges = _edges(spark, [(1, 2), (1, 3)])
    with pytest.raises(ValueError, match="not functional"):
        resolve_redirects(edges).collect()
    # exact duplicate rows are fine (collapse)
    dup = _edges(spark, [(1, 2), (1, 2)])
    [row] = resolve_redirects(dup).collect()
    assert row["final_dst"] == 2 and row["n_hops"] == 1


def test_plan_has_no_cartesian_or_python(spark):
    edges = _edges(spark, [(1, 2), (2, 3)])
    plan = resolve_redirects(
        edges, max_hops=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
