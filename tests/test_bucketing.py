"""Bucketed co-located joins — the 10^10-key seen-table layout.

SCALE.md's capacity plan keeps the seen table bucketed by url_hash so
the per-round membership anti-join is co-partitioned (no build-side
shuffle). The sandbox store emulates Iceberg with plain parquet dirs, so
this test demonstrates the claim with Spark's native bucketing (in-memory
catalog — no metastore files): the bucketed side of the join must show
NO Exchange in the physical plan, while the equivalent unbucketed join
shuffles both sides.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_seen(spark, tmp_path):
    name = "seen_bucketed_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    seen = spark.range(100_000).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        (F.col("id") % 1000).alias("host_id"),
    )
    (seen.write.bucketBy(8, "url_hash").sortBy("url_hash")
         .option("path", str(tmp_path / "seen_bucketed"))
         .saveAsTable(name))
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _exchanges(plan: str) -> int:
    # count shuffle exchanges (ignore broadcast exchanges)
    return len(re.findall(r"\bExchange hashpartitioning", plan))


def test_bucketed_seen_join_has_no_build_side_shuffle(spark, bucketed_seen, tmp_path):
    cand = spark.range(50_000).select(
        F.xxhash64((F.col("id") * 2).cast("string")).alias("url_hash"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
    )
    seen = spark.table(bucketed_seen)
    # force a shuffle join (the broadcast threshold would otherwise hide
    # the bucketing benefit at this toy size)
    joined = cand.hint("shuffle_merge").join(seen, on="url_hash", how="left_anti")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # exactly ONE hash-partitioning exchange: the candidates side; the
    # bucketed seen side reads pre-partitioned
    assert _exchanges(plan) == 1, plan

    # control: same join against the unbucketed copy shuffles BOTH sides
    seen_plain_path = str(tmp_path / "seen_plain")
    seen.write.parquet(seen_plain_path)
    seen_plain = spark.read.parquet(seen_plain_path)
    joined2 = cand.hint("shuffle_merge").join(seen_plain, on="url_hash", how="left_anti")
    plan2 = joined2._jdf.queryExecution().executedPlan().toString()
    assert _exchanges(plan2) == 2, plan2

    # semantics unchanged
    assert joined.count() == joined2.count()
