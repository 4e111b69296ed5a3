"""Delta-table compaction: small-file management for 1000-round crawls."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webscraper_spark.plans.round import prepare_pages, run_crawl, run_round
from webscraper_spark.sources.tables import TableStore


def _parquet_files(root, table):
    out = []
    for dirpath, _, files in os.walk(os.path.join(root, table)):
        out += [f for f in files if f.endswith(".parquet")]
    return out


@pytest.fixture()
def crawled(spark, sdfs, tmp_path):
    store = TableStore(spark, str(tmp_path / "store"))
    run_crawl(store, sdfs["pages"], sdfs["seeds"], sdfs["hosts"], n_rounds=3,
              per_host_budget=4)
    return store


def test_compact_preserves_rows_and_shrinks_files(spark, crawled):
    store = crawled
    before = sorted(tuple(r) for r in store.read_delta("seen").collect())
    files_before = len(_parquet_files(store.root, "seen"))
    k = store.compact("seen", target_partitions=2)
    assert k == 3
    after = sorted(tuple(r) for r in store.read_delta("seen").collect())
    assert before == after
    files_after = len(_parquet_files(store.root, "seen"))
    assert files_after < files_before
    assert files_after <= 2
    # superseded round dirs are gone; time travel below the base refuses
    assert store.read_round("seen", 1) is None
    with pytest.raises(ValueError):
        store.read_delta("seen", up_to=1)


def test_crawl_continues_after_compaction(spark, sdfs, crawled):
    store = crawled
    store.compact("seen")
    store.compact("fetched")
    pages_latest = prepare_pages(sdfs["pages"]).persist()
    lineage = run_round(store, pages_latest, 4, per_host_budget=4)
    pages_latest.unpersist()
    assert lineage["scheduled"] > 0
    # base + the new round both visible
    seen = store.read_delta("seen")
    assert seen.filter(F.col("discovered_round") == 4).count() == lineage["new_urls"]
    assert seen.count() == seen.select("url_hash").distinct().count()


def test_repeated_compaction_folds_new_rounds(spark, sdfs, crawled):
    store = crawled
    assert store.compact("seen") == 3
    n3 = store.read_delta("seen").count()
    pages_latest = prepare_pages(sdfs["pages"]).persist()
    run_round(store, pages_latest, 4, per_host_budget=4)
    pages_latest.unpersist()
    n4 = store.read_delta("seen").count()
    assert store.compact("seen") == 4  # folds base=3 + round=4 into base=4
    assert store.read_delta("seen").count() == n4 >= n3
    assert not os.path.exists(os.path.join(store.root, "seen", "base=3"))
    # idempotent: nothing newer → same base
    assert store.compact("seen") == 4
