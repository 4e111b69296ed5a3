"""Forced re-crawl invalidation (seen-set deletions + cuckoo fast path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscraper_spark.operators.dedup import CuckooSeenSet
from webscraper_spark.plans.round import prepare_pages, run_crawl, run_round
from webscraper_spark.sources.tables import TableStore


@pytest.fixture()
def crawled_store(spark, sdfs, tmp_path):
    store = TableStore(spark, str(tmp_path / "store"))
    run_crawl(store, sdfs["pages"], sdfs["seeds"], sdfs["hosts"], n_rounds=2,
              per_host_budget=4)
    return store


def test_recrawl_refetches_and_preserves_membership(spark, sdfs, crawled_store):
    store = crawled_store
    fetched = store.read_delta("fetched", up_to=2).filter(F.col("fetch_status") == "ok")
    targets = fetched.orderBy("url_hash").limit(3).select("url", "url_hash")
    target_hashes = {r.url_hash for r in targets.collect()}
    seen_before = {
        r.url_hash for r in store.read_delta("seen", up_to=2).select("url_hash").collect()
    }

    pages_latest = prepare_pages(sdfs["pages"]).persist()
    lineage = run_round(
        store, pages_latest, 3, per_host_budget=4,
        recrawl=targets.select("url"),
    )
    assert lineage["recrawled"] == 3

    # the targets were fetched again in round 3
    refetched = {
        r.url_hash
        for r in store.read_round("fetched", 3)
        .filter(F.col("fetch_status") == "ok")
        .select("url_hash")
        .collect()
    }
    assert target_hashes <= refetched

    # seen membership after re-add equals membership before the recrawl
    deletes = store.read_delta("seen_deletes", up_to=3)
    seen_rows = store.read_delta("seen", up_to=3)
    dmax = deletes.groupBy("url_hash").agg(F.max("deleted_round").alias("dr"))
    eff = (
        seen_rows.join(dmax, on="url_hash", how="left")
        .filter(F.col("dr").isNull() | (F.col("discovered_round") >= F.col("dr")))
    )
    seen_after = {r.url_hash for r in eff.select("url_hash").distinct().collect()}
    assert target_hashes <= seen_after
    assert seen_before <= seen_after  # nothing lost; discovery may add more

    # and a following round does NOT refetch them again
    run_round(store, pages_latest, 4, per_host_budget=4)
    fetched4 = {
        r.url_hash
        for r in store.read_round("fetched", 4).select("url_hash").collect()
    }
    assert not (target_hashes & fetched4)
    pages_latest.unpersist()


def test_cuckoo_seen_set_matches_exact_semantics(spark):
    seen = spark.createDataFrame(
        [(k, 1) for k in range(1000)] + [(5, 7), (6, 7)],  # 5,6 re-discovered @7
        "url_hash long, discovered_round int",
    )
    deletes = spark.createDataFrame(
        [(5, 4), (6, 9), (7, 3)],  # 5 deleted@4 then re-added@7; 6 deleted@9 (final); 7 deleted@3
        "url_hash long, deleted_round int",
    )
    cs = CuckooSeenSet.build(seen, deletes, n_shards=8)
    probe = cs.might_contain_udf(spark)
    keys = spark.range(1200).select(F.col("id").alias("url_hash"))
    got = {
        r.url_hash: r.hit
        for r in keys.select("url_hash", probe(F.col("url_hash")).alias("hit")).collect()
    }
    assert got[5] is True       # re-discovery after deletion restores
    assert got[6] is False      # deletion newer than last discovery
    assert got[7] is False      # deleted, never re-added
    # no false negatives over the live membership
    live = set(range(1000)) - {6, 7}
    missing = [k for k in live if not got[k]]
    assert not missing
