"""Plan-shape regression guards: the properties the 100 TB design relies
on must be visible in the physical plan, not just asserted in prose.

- no CartesianProduct anywhere in any driver query
- no row-at-a-time Python (BatchEvalPython) — Python only ever enters
  via Arrow (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas)
- the politeness budget compiles to WindowGroupLimit (map-side per-host
  top-k before the shuffle — the skew story of SURVEY §2.6)
- the gated ngram_jaccard plan contains array_intersect and does NOT
  join on an exploded shingle-hash column
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, ".")

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_ALL = {**entry.queries(), **entry.cert_queries()}


@pytest.mark.parametrize("name", sorted(_ALL))
def test_no_cartesian_and_no_rowwise_python(spark, name):
    df = _ALL[name](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} plans row-wise Python"


def test_scheduler_compiles_to_window_group_limit(spark):
    df = entry.queries()["politeness_schedule"](spark, SF)
    assert "WindowGroupLimit" in _plan(df)


def test_gated_ngram_plan_shape(spark):
    df = entry.queries()["ngram_jaccard"](spark, SF)
    plan = _plan(df)
    assert "array_intersect" in plan
    # the exploded shared-shingle self-join would show as a join on a
    # generated 'h' column coming from two Generate(explode) children
    assert plan.count("Generate explode") <= 2  # LSH banding only
