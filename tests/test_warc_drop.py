"""Continuous WARC-drop ingestion (sources/warc_drop.py).

The e2e contract from VERDICT r3 #4: drop two WARC batches, run two
rounds incrementally — frontier/seen/fetched must be identical to a
batch run that had the union available from the start (possible because
round 1 only ever fetches seed pages, which land in batch A). Plus the
Structured Streaming twin: the checkpointed binaryFile stream processes
each dropped file exactly once and yields the same pages rows.
"""

from __future__ import annotations

import os

import pytest

from webscraper_spark.plans.round import run_crawl
from webscraper_spark.sources.tables import TableStore
from webscraper_spark.sources.warc import build_warc, pages_from_warc_files
from webscraper_spark.sources.warc_drop import (
    discover_new_warcs,
    ingested_files,
    run_incremental_crawl,
    stream_pages_from_drop,
)
from webscraper_spark.synth import gen_corpus, to_spark

N_ROUNDS = 2
BUDGET = 4


def _write_warc_batch(drop_dir: str, name: str, rows: list[dict]) -> None:
    recs = [
        {"url": r["url"], "warc_ts": r["warc_ts"], "html": r["html"] or b""}
        for r in rows
    ]
    with open(os.path.join(drop_dir, name), "wb") as f:
        f.write(build_warc(recs))


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    corpus = gen_corpus(n_urls=300, n_hosts=8, seed=7)
    pages = corpus["pages"].to_dict("records")
    seed_urls = set(corpus["seeds"]["url"])
    # batch A must contain every seed page (round 1 fetches only seeds);
    # the rest is split so batch B genuinely adds corpus
    in_a = [r for r in pages if r["url"] in seed_urls]
    rest = [r for r in pages if r["url"] not in seed_urls]
    in_a += rest[: len(rest) // 2]
    in_b = rest[len(rest) // 2:]
    assert in_a and in_b
    drop = str(tmp_path_factory.mktemp("warc_drop"))
    return corpus, drop, in_a, in_b


def test_incremental_equals_batch_run(spark, split_corpus, tmp_path_factory):
    corpus, drop, in_a, in_b = split_corpus
    sdfs = to_spark(spark, corpus)

    # --- incremental: drop A, round 1; drop B, round 2 ---
    store_inc = TableStore(spark, str(tmp_path_factory.mktemp("inc")))
    _write_warc_batch(drop, "batch_a.warc", in_a)
    lin1 = run_incremental_crawl(
        store_inc, drop, sdfs["seeds"], sdfs["hosts"],
        n_rounds=1, per_host_budget=BUDGET,
    )
    assert lin1[0]["n_ingested_files"] == 1
    _write_warc_batch(drop, "batch_b.warc", in_b)
    lin2 = run_incremental_crawl(
        store_inc, drop, sdfs["seeds"], sdfs["hosts"],
        n_rounds=N_ROUNDS, per_host_budget=BUDGET,
    )
    assert lin2[0]["n_ingested_files"] == 1
    assert not discover_new_warcs(store_inc, drop)  # all committed
    # the ledger records FULL paths (a re-used basename in another dir
    # must not collide); lineage carries only counts
    assert {os.path.basename(p) for p in ingested_files(store_inc)} == {
        "batch_a.warc", "batch_b.warc",
    }
    assert all(os.path.isabs(p) for p in ingested_files(store_inc))
    for lin in store_inc.read_manifest()["lineage"].values():
        assert "ingested_files" not in lin  # no unbounded list in JSON

    # --- batch twin: both archives available from the start ---
    files = spark.read.format("binaryFile").load(drop)
    pages_all = pages_from_warc_files(files)
    store_batch = TableStore(spark, str(tmp_path_factory.mktemp("batch")))
    run_crawl(
        store_batch, pages_all, sdfs["seeds"], sdfs["hosts"],
        n_rounds=N_ROUNDS, per_host_budget=BUDGET,
    )

    seen_inc = {r["url_hash"] for r in store_inc.read_delta("seen").collect()}
    seen_bat = {r["url_hash"] for r in store_batch.read_delta("seen").collect()}
    assert seen_inc == seen_bat

    def orders(store):
        return sorted(
            (r["round"], r["host"], r["host_seq"], r["url"], r["fetch_status"])
            for r in store.read_delta("fetched").collect()
        )

    assert orders(store_inc) == orders(store_batch)

    fr_inc = sorted(
        (r["url"], r["priority"]) for r in store_inc.read_snapshot("frontier").collect()
    )
    fr_bat = sorted(
        (r["url"], r["priority"]) for r in store_batch.read_snapshot("frontier").collect()
    )
    assert fr_inc == fr_bat


def test_crash_before_commit_reingests_idempotently(spark, split_corpus, tmp_path_factory):
    from webscraper_spark.sources.warc_drop import ingest_new_warcs, ingested_pages

    _, _, in_a, _ = split_corpus
    drop = str(tmp_path_factory.mktemp("drop2"))
    _write_warc_batch(drop, "only.warc", in_a)
    store = TableStore(spark, str(tmp_path_factory.mktemp("crash")))
    # stage without committing (simulated crash after the parquet write)
    staged = ingest_new_warcs(store, drop, round_no=1)
    assert [os.path.basename(p) for p in staged] == ["only.warc"]
    n1 = ingested_pages(store, pending_round=1).count()
    # discovery still sees the file (nothing committed) and re-staging
    # insert-overwrites to the same state
    assert discover_new_warcs(store, drop)
    staged2 = ingest_new_warcs(store, drop, round_no=1)
    assert [os.path.basename(p) for p in staged2] == ["only.warc"]
    assert ingested_pages(store, pending_round=1).count() == n1


def test_stale_staging_removed_when_files_vanish(spark, split_corpus, tmp_path_factory):
    # crash-after-staging + operator deletes the files: re-running the
    # round must NOT commit rows whose source files are absent from the
    # ingested_files ledger (they would double-ingest on reappearance)
    from webscraper_spark.sources.warc_drop import ingest_new_warcs, ingested_pages

    _, _, in_a, _ = split_corpus
    drop = str(tmp_path_factory.mktemp("drop_vanish"))
    _write_warc_batch(drop, "x.warc", in_a)
    store = TableStore(spark, str(tmp_path_factory.mktemp("vanish")))
    staged = ingest_new_warcs(store, drop, round_no=1)
    assert [os.path.basename(p) for p in staged] == ["x.warc"]
    assert ingested_pages(store, pending_round=1).count() > 0
    os.remove(os.path.join(drop, "x.warc"))
    assert ingest_new_warcs(store, drop, round_no=1) == []
    assert ingested_pages(store, pending_round=1) is None


def test_replay_of_committed_round_never_deletes_its_partition(
    spark, split_corpus, tmp_path_factory
):
    # calling ingest_new_warcs with an ALREADY-COMMITTED round_no (replay
    # or buggy caller) must be a no-op — not delete committed pages
    corpus, _, in_a, _ = split_corpus
    sdfs = to_spark(spark, corpus)
    drop = str(tmp_path_factory.mktemp("drop_replay"))
    _write_warc_batch(drop, "x.warc", in_a)
    store = TableStore(spark, str(tmp_path_factory.mktemp("replay")))
    run_incremental_crawl(
        store, drop, sdfs["seeds"], sdfs["hosts"],
        n_rounds=1, per_host_budget=BUDGET,
    )
    n_before = store.read_delta("pages_ingest").count()
    assert n_before > 0
    from webscraper_spark.sources.warc_drop import ingest_new_warcs

    assert ingest_new_warcs(store, drop, round_no=1) == []  # file in ledger
    assert store.read_delta("pages_ingest").count() == n_before


def test_discovery_is_path_spelling_invariant(
    spark, split_corpus, tmp_path_factory, monkeypatch
):
    # the ledger keys on the path, so relative vs absolute --drop-dir
    # spellings across invocations must not re-ingest the same archive
    from webscraper_spark.sources.warc_drop import ingest_new_warcs

    _, _, in_a, _ = split_corpus
    drop_abs = str(tmp_path_factory.mktemp("drop_rel"))
    _write_warc_batch(drop_abs, "x.warc", in_a)
    store = TableStore(spark, str(tmp_path_factory.mktemp("rel_store")))
    parent, name = os.path.split(drop_abs)
    monkeypatch.chdir(parent)
    staged = ingest_new_warcs(store, name, round_no=1)  # RELATIVE spelling
    assert staged and all(os.path.isabs(p) for p in staged)
    store.commit_round(1)
    assert discover_new_warcs(store, drop_abs) == []  # absolute spelling
    assert discover_new_warcs(store, name + "/") == []  # trailing slash


def test_inflight_temp_names_never_discovered(spark, split_corpus, tmp_path_factory):
    _, _, in_a, _ = split_corpus
    drop = str(tmp_path_factory.mktemp("drop_tmp"))
    _write_warc_batch(drop, "real.warc", in_a)
    _write_warc_batch(drop, "_copying.warc", in_a)  # writer prefix
    _write_warc_batch(drop, ".hidden.warc", in_a)
    with open(os.path.join(drop, "mid.warc.tmp"), "wb") as f:
        f.write(b"partial bytes")
    store = TableStore(spark, str(tmp_path_factory.mktemp("tmp")))
    got = [os.path.basename(p) for p in discover_new_warcs(store, drop)]
    assert got == ["real.warc"]


def test_incremental_auto_host_reputation(spark, split_corpus, tmp_path_factory):
    # API parity with run_crawl: the self-correcting reputation loop
    # composes with incremental ingest (round 1 ungated, later rounds
    # gated by stats from the crawl's own fetched text)
    corpus, _, in_a, in_b = split_corpus
    sdfs = to_spark(spark, corpus)
    drop = str(tmp_path_factory.mktemp("drop_rep"))
    _write_warc_batch(drop, "batch_a.warc", in_a)
    _write_warc_batch(drop, "batch_b.warc", in_b)
    store = TableStore(spark, str(tmp_path_factory.mktemp("rep")))
    lins = run_incremental_crawl(
        store, drop, sdfs["seeds"], sdfs["hosts"],
        n_rounds=2, per_host_budget=BUDGET, auto_host_reputation=True,
    )
    assert len(lins) == 2
    assert lins[0]["n_ingested_files"] == 2
    assert store.read_delta("fetched").count() > 0


def test_ledger_read_stays_bounded_across_many_rounds(
    spark, tmp_path_factory
):
    # VERDICT r04 #3: discovery must read a bounded recent window + one
    # compacted base, not an ever-growing set of per-round partitions —
    # and the JSON manifest must stay O(rounds), never O(archives)
    from webscraper_spark.sources.warc_drop import (
        LEDGER_TABLE,
        run_incremental_crawl,
    )
    from webscraper_spark.synth import gen_corpus, to_spark

    corpus = gen_corpus(n_urls=60, n_hosts=4, seed=11)
    sdfs = to_spark(spark, corpus)
    pages = corpus["pages"].to_dict("records")
    seed_urls = set(corpus["seeds"]["url"])
    in_seed = [r for r in pages if r["url"] in seed_urls]
    rest = [r for r in pages if r["url"] not in seed_urls]
    drop = str(tmp_path_factory.mktemp("drop_many"))
    store = TableStore(spark, str(tmp_path_factory.mktemp("many")))

    n_rounds, every = 6, 2
    chunks = [rest[i::n_rounds - 1] for i in range(n_rounds - 1)]
    _write_warc_batch(drop, "round_1.warc", in_seed)
    max_parts = 0
    for r in range(1, n_rounds + 1):
        if r > 1:
            _write_warc_batch(drop, f"round_{r}.warc", chunks[r - 2])
        run_incremental_crawl(
            store, drop, sdfs["seeds"], sdfs["hosts"],
            n_rounds=r, per_host_budget=BUDGET,
            ledger_compact_every=every,
        )
        max_parts = max(max_parts, len(store._committed_parts(LEDGER_TABLE)))
    # bounded: at most `every` uncompacted round partitions + 1 base,
    # no matter how many rounds have ever ingested
    assert max_parts <= every + 1
    assert store.read_manifest().get("compacted", {}).get(LEDGER_TABLE) == 6
    # every dropped archive is in the ledger exactly once (compaction
    # loses nothing, discovery re-ingests nothing)
    led = store.read_delta(LEDGER_TABLE)
    paths = [r["path"] for r in led.collect()]
    assert len(paths) == len(set(paths)) == n_rounds
    # lineage carries counts only — the manifest is O(rounds)
    lins = store.read_manifest()["lineage"]
    assert len(lins) == n_rounds + 1  # + the round-0 init record
    assert all(
        lin["n_ingested_files"] == 1 and "ingested_files" not in lin
        for rnd, lin in lins.items()
        if rnd != "0"
    )


def test_streaming_twin_exactly_once(spark, split_corpus, tmp_path_factory):
    corpus, _, in_a, in_b = split_corpus
    drop = str(tmp_path_factory.mktemp("drop_stream"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))

    sink = str(tmp_path_factory.mktemp("sink"))

    def run_stream():
        # file sink + checkpoint: the recoverable exactly-once pairing
        # (memory sink cannot recover from a checkpoint)
        q = (
            stream_pages_from_drop(spark, drop)
            .select("url", "text")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        df = spark.read.parquet(sink)
        return df.count(), {
            (r["url"], r["text"]) for r in df.collect()
        }

    def batch_parse(fname):
        files = spark.read.format("binaryFile").load(os.path.join(drop, fname))
        return {
            (r["url"], r["text"])
            for r in pages_from_warc_files(files).select("url", "text").collect()
        }

    _write_warc_batch(drop, "batch_a.warc", in_a)
    n_a, got_a = run_stream()
    _write_warc_batch(drop, "batch_b.warc", in_b)
    n_ab, got_ab = run_stream()  # restart, same checkpoint

    want_a = batch_parse("batch_a.warc")
    want_b = batch_parse("batch_b.warc")
    assert got_a == want_a
    assert got_ab == want_a | want_b
    # exactly-once across restarts: the second run appended ONLY batch
    # B's rows — no reprocessing (count would exceed), no gaps (fall
    # short)
    n_b_rows = spark.read.format("binaryFile") \
        .load(os.path.join(drop, "batch_b.warc"))
    n_b = pages_from_warc_files(n_b_rows).count()
    assert n_ab == n_a + n_b
