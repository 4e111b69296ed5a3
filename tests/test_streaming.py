"""Structured Streaming ingest tests (C10/C11 streaming twins)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webscraper_spark.streaming import streaming_host_metrics, streaming_ingest
from webscraper_spark import schemas


@pytest.fixture()
def staged_pages(spark, corpus, tmp_path):
    """Pages corpus staged as a parquet directory usable as a file stream."""
    src = str(tmp_path / "pages_src")
    spark.createDataFrame(corpus["pages"], schema=schemas.PAGES).coalesce(2).write.parquet(src)
    return src


def test_streaming_ingest_matches_batch_admission(spark, corpus, staged_pages, tmp_path):
    seen_path = str(tmp_path / "seen")
    out_path = str(tmp_path / "fetched_stream")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(schemas.PAGES).parquet(staged_pages)
    )
    q = streaming_ingest(stream, seen_path, out_path, ckpt, watermark="1 hour")
    q.awaitTermination(300)

    got = spark.read.parquet(out_path)
    # every canonical url admitted exactly once (stream dedup + anti-join)
    assert got.count() == got.select("url_hash").distinct().count()

    # batch twin: canonicalize + newest-wins over the same corpus
    from webscraper_spark.plans.round import prepare_pages

    batch = prepare_pages(spark.createDataFrame(corpus["pages"], schema=schemas.PAGES))
    assert got.count() == batch.count()
    # identical membership
    a = {r.url_hash for r in got.select("url_hash").collect()}
    b = {r.url_hash for r in batch.select("url_hash").collect()}
    assert a == b


def test_streaming_ingest_resume_is_idempotent(spark, staged_pages, tmp_path):
    seen_path = str(tmp_path / "seen2")
    out_path = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(schemas.PAGES).parquet(staged_pages)
    q = streaming_ingest(stream, seen_path, out_path, ckpt, watermark="1 hour")
    q.awaitTermination(300)
    n1 = spark.read.parquet(out_path).count()
    # restarting over the same source + checkpoint admits nothing new
    stream2 = spark.readStream.schema(schemas.PAGES).parquet(staged_pages)
    q2 = streaming_ingest(stream2, seen_path, out_path, ckpt, watermark="1 hour")
    q2.awaitTermination(300)
    n2 = spark.read.parquet(out_path).count()
    assert n1 == n2


def test_streaming_host_metrics_window_counts(spark, corpus, staged_pages, tmp_path):
    stream = spark.readStream.schema(schemas.PAGES).parquet(staged_pages)
    metrics = streaming_host_metrics(stream, watermark="1 hour", window="1 hour")
    out = str(tmp_path / "metrics_out")
    q = (
        metrics.writeStream.outputMode("append")
        .format("memory").queryName("host_metrics")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    # append mode emits only watermark-closed windows; re-aggregate the
    # batch way and check each emitted window matches
    got = spark.sql("select * from host_metrics")
    from webscraper_spark.functions.canon import with_canonical

    batch = (
        with_canonical(spark.createDataFrame(corpus["pages"], schema=schemas.PAGES))
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("host"))
        .agg(F.count("*").alias("captures"))
        .select(F.col("w.start").alias("window_start"), "host", "captures")
    )
    j = got.select("window_start", "host", F.col("captures").alias("got_captures")).join(
        batch, on=["window_start", "host"], how="inner"
    )
    mismatches = j.filter(F.col("got_captures") != F.col("captures")).count()
    assert mismatches == 0
    assert got.count() > 0


def test_stateful_politeness_clock_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-host clocks persist across micro-batches
    (two availableNow runs over a growing source, shared checkpoint)."""
    from datetime import datetime

    from webscraper_spark.streaming.politeness import CANDIDATE, streaming_politeness

    src = str(tmp_path / "cand_src")
    out = str(tmp_path / "sched_out")
    ckpt = str(tmp_path / "ckpt_pol")
    floor = datetime(2025, 8, 1)

    def rows(lo, hi):
        return [
            ("h1.example", f"https://h1.example/p/{i}", i * 7 + 1, i, 1000, floor)
            for i in range(lo, hi)
        ]

    def run_wave(lo, hi):
        spark.createDataFrame(rows(lo, hi), schema=CANDIDATE).write.mode("append").parquet(src)
        stream = spark.readStream.schema(CANDIDATE).parquet(src)
        q = (
            streaming_politeness(stream)
            .writeStream.outputMode("append")
            .format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run_wave(0, 3)
    run_wave(3, 6)

    got = sorted(
        (r.host_seq, r.scheduled_ts) for r in spark.read.parquet(out).collect()
    )
    # sequence numbers continue 1..6 across batches
    assert [s for s, _ in got] == [1, 2, 3, 4, 5, 6]
    # consecutive scheduled fetches on the host are >= 1000ms apart,
    # INCLUDING across the batch boundary (state carried the clock)
    for (s1, t1), (s2, t2) in zip(got, got[1:]):
        assert (t2 - t1).total_seconds() >= 1.0


def test_stateful_politeness_matches_batch_scheduler(spark, tmp_path):
    """A stream fed one round of candidates reproduces the batch W1
    schedule exactly (same order, same timestamps)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from webscraper_spark.operators.schedule import schedule_round
    from webscraper_spark.streaming.politeness import CANDIDATE, streaming_politeness

    floor = datetime(2025, 8, 1)
    cand = [
        (f"h{i % 3}.example", f"https://h{i % 3}.example/p/{i}", i * 13 + 5, i % 4, 2000, floor)
        for i in range(24)
    ]
    # batch side
    frontier = spark.createDataFrame(
        [(c[2], c[1], c[0], c[3], 0, 0, None) for c in cand],
        "url_hash long, url string, host string, priority int, discovered_round int, retry_count int, next_fetch_ts timestamp",
    )
    hosts = spark.createDataFrame(
        [(f"h{j}.example", None, 2000, floor) for j in range(3)],
        "host string, robots_txt string, crawl_delay_ms long, next_allowed_ts timestamp",
    )
    batch = schedule_round(frontier, hosts, per_host_budget=100, round_start_ts=floor)
    batch_rows = {
        (r.host, r.url): (r.host_seq, r.scheduled_ts) for r in batch.collect()
    }
    # streaming side
    src = str(tmp_path / "cand_src2")
    out = str(tmp_path / "sched_out2")
    ckpt = str(tmp_path / "ckpt_pol2")
    spark.createDataFrame(cand, schema=CANDIDATE).write.parquet(src)
    q = (
        streaming_politeness(spark.readStream.schema(CANDIDATE).parquet(src))
        .writeStream.outputMode("append").format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    stream_rows = {
        (r.host, r.url): (r.host_seq, r.scheduled_ts)
        for r in spark.read.parquet(out).collect()
    }
    assert stream_rows == batch_rows


def test_politeness_parity_when_host_skips_a_round(spark, tmp_path):
    """A host idle for a round has its clock in the PAST at the next
    round's floor. Both schedulers must clamp to the floor (fetches can't
    be scheduled before the round starts) — parity across the gap."""
    from datetime import datetime, timedelta

    from webscraper_spark.operators.schedule import advance_host_clocks, schedule_round
    from webscraper_spark.streaming.politeness import CANDIDATE, streaming_politeness

    floor1 = datetime(2025, 8, 1)
    floor2 = floor1 + timedelta(hours=6)  # host idle in between → clock stale

    def frontier_df(urls, floor):
        return spark.createDataFrame(
            [(hash(u) & 0x7FFFFFFF, u, "h0.example", i, 0, 0, None)
             for i, u in enumerate(urls)],
            "url_hash long, url string, host string, priority int, "
            "discovered_round int, retry_count int, next_fetch_ts timestamp",
        )

    hosts = spark.createDataFrame(
        [("h0.example", None, 1000, None)],
        "host string, robots_txt string, crawl_delay_ms long, next_allowed_ts timestamp",
    )
    urls1 = [f"https://h0.example/a/{i}" for i in range(3)]
    urls2 = [f"https://h0.example/b/{i}" for i in range(3)]

    # batch: round 1 at floor1, advance clocks, round 2 at floor2
    s1 = schedule_round(frontier_df(urls1, floor1), hosts, 10, round_start_ts=floor1)
    hosts2 = advance_host_clocks(hosts, s1, round_start_ts=floor1)
    s2 = schedule_round(frontier_df(urls2, floor2), hosts2, 10, round_start_ts=floor2)
    batch_rows = {
        r.url: (r.host_seq, r.scheduled_ts)
        for s in (s1, s2) for r in s.collect()
    }
    # round-2 fetches start AT floor2, not at the stale clock
    assert min(ts for u, (_, ts) in batch_rows.items() if "/b/" in u) == floor2

    # streaming: same two waves through the stateful scheduler
    src = str(tmp_path / "cand_skip")
    out = str(tmp_path / "sched_skip")
    ckpt = str(tmp_path / "ckpt_skip")

    def wave(urls, floor):
        rows = [("h0.example", u, hash(u) & 0x7FFFFFFF, i, 1000, floor)
                for i, u in enumerate(urls)]
        spark.createDataFrame(rows, schema=CANDIDATE).write.mode("append").parquet(src)
        q = (
            streaming_politeness(spark.readStream.schema(CANDIDATE).parquet(src))
            .writeStream.outputMode("append").format("parquet").option("path", out)
            .option("checkpointLocation", ckpt).trigger(availableNow=True).start()
        )
        q.awaitTermination(300)

    wave(urls1, floor1)
    wave(urls2, floor2)
    stream_rows = {
        r.url: (r.host_seq, r.scheduled_ts) for r in spark.read.parquet(out).collect()
    }
    # host_seq continues across rounds in streaming but restarts per round
    # in batch — compare timestamps (the politeness contract) exactly
    assert {u: ts for u, (_, ts) in stream_rows.items()} == {
        u: ts for u, (_, ts) in batch_rows.items()
    }


def test_admit_batch_redelivery_is_idempotent(spark, tmp_path):
    """Direct micro-batch re-delivery (the partial-failure case the
    availableNow restart test can't reach): re-running the SAME epoch —
    including after only the seen sink committed — must leave both sinks
    exactly as a single delivery would."""
    from webscraper_spark.streaming.rounds import admit_batch

    seen_path = str(tmp_path / "seen_rd")
    out_path = str(tmp_path / "out_rd")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("url_hash"),
            F.concat(F.lit("u"), F.col("id")).alias("url"),
        )

    admit_batch(batch(0, 100), 0, seen_path, out_path)
    admit_batch(batch(50, 150), 1, seen_path, out_path)  # 50 novel
    snap_out = sorted(r.url_hash for r in spark.read.parquet(out_path).collect())
    snap_seen = sorted(r.url_hash for r in spark.read.parquet(seen_path).collect())
    assert len(snap_out) == 150 and len(set(snap_out)) == 150

    # full re-delivery of epoch 1 (e.g. sink committed, checkpoint lost)
    admit_batch(batch(50, 150), 1, seen_path, out_path)
    assert sorted(r.url_hash for r in spark.read.parquet(out_path).collect()) == snap_out
    assert sorted(r.url_hash for r in spark.read.parquet(seen_path).collect()) == snap_seen

    # worst case: epoch 2's SEEN partition committed but out_path did not
    # (the pre-fix failure mode: redelivered rows vanish from out_path)
    (batch(140, 200).withColumn("epoch", F.lit(2))
        .select("url_hash", "epoch")
        .write.mode("append").parquet(seen_path))
    admit_batch(batch(140, 200), 2, seen_path, out_path)
    out_now = sorted(r.url_hash for r in spark.read.parquet(out_path).collect())
    assert len(out_now) == 200 and len(set(out_now)) == 200  # 150..199 present once
    seen_now = spark.read.parquet(seen_path)
    assert seen_now.count() == seen_now.select("url_hash").distinct().count() == 200
