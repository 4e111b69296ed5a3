"""The crawl round job — one Spark job per round (EP2's discover +
fetch+extract stages fused; SURVEY §3, §7.1 step 6).

Dataflow per round K::

    frontier ──schedule (robots + politeness window + budget)──▶ scheduled
    scheduled ⋈ pages (newest-wins)  ──▶ hits / misses
    hits ──extract UDF──▶ fetched rows (text, title, fields)
    hits ──explode(outlinks) ─canon─ dedupe ─bloom+anti-join seen──▶ new
    commit: fetched+=K, seen+=new, frontier=next snapshot,
            hosts=advanced clocks, metrics+=per-shard lineage

Every state change lands in one `TableStore.commit_round` — a crashed
round K is invisible and idempotently re-runnable (C8 resume semantics;
the reference's analog is JSON-checkpoint short-circuiting,
``LinkedIn-Updated-Script.py:188-194``).

Scale shape: the only wide operations are (a) the scheduler's salted
ranking window, (b) the fetch equi-join on (url_hash, url) — at cluster
scale both sides bucketed by url_hash so this is co-partitioned, (c) the
seen anti-join, which the Bloom pre-probe shrinks to the maybe-seen
slice, and (d) one groupBy for metrics. ``pages.html`` is only read
behind the scheduled-join (column pruning keeps it out of every other
scan).
"""

from __future__ import annotations

import time as _time
from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.canon import canonicalize_href_udf, with_canonical
from ..functions.extract import extract_udf
from ..operators.dedup import (
    BloomSeenSet,
    BloomShardStore,
    CuckooSeenSet,
    anti_join_seen,
    bloom_filtered_new,
    choose_bloom_mode,
    dedup_latest,
)
from ..operators.hoststats import throttle_admission
from ..operators.schedule import advance_host_clocks, schedule_round
from ..schemas import FETCHED, FRONTIER, SEEN
from ..sources.tables import TableStore

BASE_ROUND_EPOCH = datetime(2025, 7, 25, 0, 0, 0)
ROUND_INTERVAL = timedelta(hours=1)
RETRY_BACKOFF = timedelta(minutes=30)
N_METRIC_SHARDS = 32


def _parse_mem(s: str) -> int:
    """Parse a Spark memory string ('512m', '4gb', '1t', '512b', bare
    bytes) — accepts both the one- and two-letter suffix forms that
    Spark's JavaUtils.byteStringAsBytes allows."""
    s = s.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s.endswith("b") and len(s) > 1:
        s = s[:-1]  # '4gb' → '4g', '512b' → '512'
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def round_clock(round_no: int) -> datetime:
    """Logical round start time — derived from the round number, never
    wall-clock (determinism invariant, SURVEY §7.4)."""
    return BASE_ROUND_EPOCH + round_no * ROUND_INTERVAL


def prepare_pages(pages: DataFrame) -> DataFrame:
    """Canonicalize the pages table and keep the newest capture per url
    (C10 newest-wins). Done once per corpus, reused across rounds —
    at cluster scale this is the materialized, url_hash-bucketed form of
    the raw WARC-derived table.

    The result is hash-partitioned on ``url_hash`` so every round's fetch
    join is map-side on the pages side: the html payload (by far the
    widest column) never crosses a shuffle again — only the (narrow)
    scheduled frontier shuffles to meet it."""
    canon = with_canonical(pages)
    deduped = dedup_latest(canon, ["url_hash"], "warc_ts")
    return deduped.repartition("url_hash")


def init_crawl(
    store: TableStore, seeds: DataFrame, hosts: DataFrame
) -> None:
    """Round 0: canonicalized seeds become the frontier AND the initial
    seen membership (a seed is by definition discovered)."""
    f = (
        with_canonical(seeds)
        .dropDuplicates(["url_hash"])
        .select(
            "url_hash",
            "url",
            "host",
            F.col("priority").cast("int").alias("priority"),
            F.lit(0).alias("discovered_round"),
            F.lit(0).alias("retry_count"),
            F.lit(None).cast("timestamp").alias("next_fetch_ts"),
        )
    )
    frontier = f
    store.write("frontier", frontier, 0)
    store.write(
        "seen",
        frontier.select("url_hash", "url", "host", "discovered_round"),
        0,
    )
    store.write("hosts", hosts, 0)
    store.commit_round(0, lineage={"seeds": frontier.count()})


def _merge_extra_lineage(lineage: dict, extra_lineage: "dict | None") -> dict:
    """Fold caller-provided facts into the round's lineage record before
    the atomic commit (e.g. the incremental WARC ingest's file count —
    its discovery state is exactly-once only if it flips with the same
    manifest rename). Built-in counts are authoritative: a caller key
    that collides would corrupt the committed round record, so collisions
    raise instead of silently overwriting."""
    if extra_lineage:
        clash = set(extra_lineage) & set(lineage)
        if clash:
            raise ValueError(
                f"extra_lineage keys collide with built-in lineage: {sorted(clash)}"
            )
        lineage.update(extra_lineage)
    return lineage


def run_round(
    store: TableStore,
    pages_latest: DataFrame,
    round_no: int,
    per_host_budget: int = 5,
    max_retries: int = 2,
    use_bloom: bool = True,
    n_salt: int = 1,
    bloom_shards: int = 32,
    recrawl: DataFrame | None = None,
    bloom_mode: str = "auto",
    executor_mem_bytes: int | None = None,
    host_reputation: DataFrame | None = None,
    extra_lineage: dict | None = None,
) -> dict:
    """Execute round ``round_no`` (requires round ``round_no - 1``
    committed). Returns the round's lineage counts.

    ``recrawl``: optional DataFrame with a ``url`` column — forced
    re-crawl invalidations. Those urls are deleted from the effective
    seen-set (recorded in the ``seen_deletes`` delta), re-enqueued at top
    priority, and re-added to ``seen`` as discovered this round. With
    deletions present the fast membership path switches from Bloom to the
    deletion-capable cuckoo filters.

    ``bloom_mode``: "auto" (default) sizes the filter from the seen count
    and flips broadcast→sharded past ¼ of executor memory
    (``executor_mem_bytes`` overrides the ``spark.executor.memory`` conf);
    "broadcast"/"sharded" force a topology (both output-equivalent,
    tested).

    ``host_reputation``: optional :func:`..operators.hoststats.host_stats`
    table — discovered URLs from hosts over the dup-rate / under the
    quality thresholds are dropped at admission, low-English hosts
    demoted (see ``throttle_admission``). Typically computed from the
    previous rounds' ``fetched`` text.
    """
    t_round0 = _time.monotonic()
    prev = round_no - 1
    frontier = store.read_snapshot("frontier", up_to=prev)
    hosts = store.read_snapshot("hosts", up_to=prev)
    seen = store.read_delta("seen", up_to=prev)
    if frontier is None or hosts is None or seen is None:
        raise ValueError(f"round {prev} not committed; cannot run round {round_no}")

    # historical forced-recrawl deletions: a key is un-seen when its last
    # deletion is newer than its last (re-)discovery
    deletes = store.read_delta("seen_deletes", up_to=prev)
    if deletes is not None:
        dmax = deletes.groupBy("url_hash").agg(F.max("deleted_round").alias("__dr"))
        seen_eff = (
            seen.join(dmax, on="url_hash", how="left")
            .filter(F.col("__dr").isNull() | (F.col("discovered_round") >= F.col("__dr")))
            .drop("__dr")
        )
    else:
        seen_eff = seen

    recrawl_rows = None
    if recrawl is not None:
        recrawl_rows = (
            with_canonical(recrawl.select("url"))
            .dropDuplicates(["url_hash"])
            .select(
                "url_hash", "url", "host",
                F.lit(0).alias("priority"),  # recrawls jump the queue
                F.lit(round_no).alias("discovered_round"),
                F.lit(0).alias("retry_count"),
                F.lit(None).cast("timestamp").alias("next_fetch_ts"),
            )
            .persist()
        )
        frontier = frontier.join(
            recrawl_rows.select("url_hash"), on="url_hash", how="left_anti"
        ).unionByName(recrawl_rows)

    start_ts = round_clock(round_no)

    # 1. politeness scheduling (robots + ranking window + budget)
    scheduled = schedule_round(
        frontier, hosts, per_host_budget, round_start_ts=start_ts, n_salt=n_salt
    ).persist()

    # 2. "fetch" = equi-join against the pages table on url_hash ALONE so
    # the join co-partitions with pages_latest's url_hash partitioning
    # (html never re-shuffles; only the narrow scheduled side moves).
    # pages_latest is unique per url_hash (newest-wins dedup), so the join
    # yields at most one match; the post-join url equality demotes 64-bit
    # hash collisions (possible at 10^10 keys) to misses instead of
    # fetching the wrong page.
    page_cols = pages_latest.select(
        F.col("url_hash"), F.col("url").alias("__page_url"),
        F.col("warc_ts"), F.col("html"), F.col("lang"),
    )
    fetched_join = (
        scheduled.join(page_cols, on="url_hash", how="left")
        .withColumn(
            "html",
            F.when(F.col("__page_url") == F.col("url"), F.col("html")),
        )
        .drop("__page_url")
    )

    hits = fetched_join.filter(F.col("html").isNotNull())
    # misses carry no html (left-join nulls) — tiny; persisting avoids
    # re-running the fetch join for the retry/metrics/write consumers
    misses = fetched_join.filter(F.col("html").isNull()).persist()

    # 3. extraction (one Arrow batch at a time)
    extracted = hits.withColumn("ex", extract_udf("html")).select(
        "url_hash", "url", "host", "host_seq", "scheduled_ts", "warc_ts",
        F.col("lang"),
        F.col("ex.title").alias("title"),
        F.col("ex.text").alias("text"),
        F.col("ex.outlinks").alias("outlinks"),
        F.length(F.col("html")).alias("__html_len"),
        F.col("priority"),
    ).persist()

    # 4. outlink discovery → canonicalize → in-round dedupe → seen anti-join
    links = (
        extracted.select(
            F.col("url").alias("src_url"),
            F.col("priority").alias("src_priority"),
            F.explode_outer("outlinks").alias("href"),
        )
        .filter(F.col("href").isNotNull())
        .withColumn("__canon", canonicalize_href_udf(F.col("href"), F.col("src_url")))
        .filter(F.col("__canon").isNotNull())
        .select(F.col("__canon").alias("url"), "src_priority")
    )
    candidates = (
        links.groupBy("url")
        .agg(F.min("src_priority").alias("__pprio"))
        .withColumn("host", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn("url_hash", F.xxhash64(F.col("url")))
    )
    # admission membership = effective seen (post-deletions) plus this
    # round's recrawl keys (they are re-added below, so candidates must
    # not re-admit them)
    seen_admit = seen_eff.select("url_hash")
    if recrawl_rows is not None:
        seen_admit = seen_admit.unionByName(recrawl_rows.select("url_hash"))
    fast = None
    if use_bloom and bloom_mode == "auto":
        # automatic flip point (was a caller decision): size the filter
        # from the seen count and go sharded once a broadcast copy would
        # eat >¼ of executor memory. One cheap single-column count; the
        # 10^10-key design point always lands sharded here.
        mem = executor_mem_bytes
        if mem is None:
            mem = _parse_mem(
                pages_latest.sparkSession.conf.get("spark.executor.memory", "1g")
            )
        bloom_mode = choose_bloom_mode(seen_admit.count(), mem)
    if use_bloom:
        if deletes is not None or recrawl_rows is not None:
            # deletions in play → deletion-capable cuckoo filters; this
            # round's recrawl keys fold into the distributed cogroup
            # build with an always-wins discovery round (they must still
            # read as "seen" for admission — re-added below). No driver
            # collect: a bulk recrawl of millions of URLs builds at the
            # same cost as the seen-set itself, and the build's checked
            # inserts rebuild full shards at doubled capacity instead of
            # silently dropping keys.
            fast = CuckooSeenSet.build(
                seen, deletes, n_shards=bloom_shards, extra=recrawl_rows
            )
        elif bloom_mode == "sharded":
            # 10^10-key path: shards never collected, probe is a
            # shard-cogrouped join (per-shard memory, one narrow shuffle)
            fast = BloomShardStore.build(seen_admit, n_shards=bloom_shards)
        else:
            fast = BloomSeenSet.build(seen_admit, n_shards=bloom_shards)
    admitted = bloom_filtered_new(candidates, seen_admit, fast)
    if host_reputation is not None:
        # host-reputation gate on admission: candidates from duplicate-
        # farm / junk hosts never enter the frontier, low-English hosts
        # are demoted (the CC-scale host filter; unknown hosts pass)
        admitted = throttle_admission(
            admitted.withColumnRenamed("__pprio", "priority"),
            host_reputation,
        ).withColumnRenamed("priority", "__pprio")
    new_urls = admitted.select(
        "url_hash",
        "url",
        "host",
        (F.col("__pprio") + 1).cast("int").alias("priority"),
        F.lit(round_no).alias("discovered_round"),
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("timestamp").alias("next_fetch_ts"),
    ).persist()

    # 5. next frontier: remove completed fetches, back off misses, admit new
    retried = (  # misses beyond max_retries simply fall out of the frontier

        misses.filter(F.col("retry_count") < max_retries)
        .select(
            "url_hash", "url", "host", "priority", "discovered_round",
            (F.col("retry_count") + 1).alias("retry_count"),
            F.lit(start_ts + RETRY_BACKOFF).alias("next_fetch_ts"),
        )
    )
    remaining = frontier.join(
        scheduled.select("url_hash"), on="url_hash", how="left_anti"
    )
    next_frontier = (
        remaining.select(*[f.name for f in FRONTIER.fields])
        .unionByName(retried.select(*[f.name for f in FRONTIER.fields]))
        .unionByName(new_urls.select(*[f.name for f in FRONTIER.fields]))
    )

    # 6. fetched rows (per FETCHED schema)
    fetched_rows = extracted.select(
        "url_hash", "url", "host",
        F.lit(round_no).alias("round"),
        F.col("host_seq").cast("int"),
        "scheduled_ts", "warc_ts", "text", "title", "lang",
        F.size("outlinks").alias("n_outlinks"),
        F.lit("ok").alias("fetch_status"),
    ).unionByName(
        misses.select(
            "url_hash", "url", "host",
            F.lit(round_no).alias("round"),
            F.col("host_seq").cast("int"),
            "scheduled_ts",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("int").alias("n_outlinks"),
            F.lit("miss").alias("fetch_status"),
        )
    )

    # 7. per-shard lineage metrics (C9): shard = pmod(xxhash64(host), N)
    shard = F.pmod(F.xxhash64("host"), F.lit(N_METRIC_SHARDS)).cast("int")
    metrics = (
        fetched_rows.withColumn("shard", shard)
        .groupBy("shard")
        .agg(
            F.count("*").alias("scheduled"),
            F.sum(F.when(F.col("fetch_status") == "ok", 1).otherwise(0)).alias("fetched"),
            F.sum(F.when(F.col("fetch_status") == "miss", 1).otherwise(0)).alias("missed"),
        )
        .withColumn("round", F.lit(round_no))
    )
    new_per_shard = (
        new_urls.withColumn("shard", F.pmod(F.xxhash64("host"), F.lit(N_METRIC_SHARDS)).cast("int"))
        .groupBy("shard")
        .agg(F.count("*").alias("new_urls"))
    )
    html_per_shard = (
        extracted.withColumn("shard", shard)
        .groupBy("shard")
        .agg(F.sum("__html_len").alias("bytes_html"))
    )
    metrics = (
        metrics.join(new_per_shard, on="shard", how="full")
        .join(html_per_shard, on="shard", how="full")
        .select(
            F.coalesce("round", F.lit(round_no)).alias("round"),
            F.coalesce("shard", F.lit(-1)).alias("shard"),
            F.coalesce("scheduled", F.lit(0)).alias("scheduled"),
            F.coalesce("fetched", F.lit(0)).alias("fetched"),
            F.coalesce("missed", F.lit(0)).alias("missed"),
            F.coalesce("new_urls", F.lit(0)).alias("new_urls"),
            F.coalesce("bytes_html", F.lit(0)).alias("bytes_html"),
        )
    )

    # 8. durable writes, then the atomic commit
    metrics = metrics.persist()
    new_hosts = advance_host_clocks(hosts, scheduled, round_start_ts=start_ts)
    store.write("fetched", fetched_rows, round_no)
    seen_add = new_urls.select("url_hash", "url", "host", "discovered_round")
    if recrawl_rows is not None:
        seen_add = seen_add.unionByName(
            recrawl_rows.select("url_hash", "url", "host", "discovered_round")
        )
        store.write(
            "seen_deletes",
            recrawl_rows.select(
                "url_hash", F.lit(round_no).alias("deleted_round")
            ),
            round_no,
        )
    store.write("seen", seen_add, round_no)
    store.write("frontier", next_frontier, round_no)
    store.write("hosts", new_hosts, round_no)
    # Real per-round wall time (C9/A5): measured on the driver AFTER the
    # heavy writes have executed, stamped as a literal into the metrics
    # write. Determinism-safe — it never feeds query output or any table
    # the resume-parity invariant covers; the reference's running-avg/ETA
    # (Glassdoor_url_finder.py:311-327) derives from exactly this value.
    elapsed_sec = round(_time.monotonic() - t_round0, 3)
    store.write(
        "metrics", metrics.withColumn("elapsed_sec", F.lit(elapsed_sec)), round_no
    )

    # lineage = one aggregation over the (persisted) metrics table instead
    # of four separate count() jobs
    agg = metrics.agg(
        F.sum("scheduled").alias("s"), F.sum("fetched").alias("f"),
        F.sum("missed").alias("m"), F.sum("new_urls").alias("n"),
    ).first()
    lineage = {
        "scheduled": int(agg["s"] or 0),
        "fetched": int(agg["f"] or 0),
        "missed": int(agg["m"] or 0),
        "new_urls": int(agg["n"] or 0),
        "elapsed_sec": elapsed_sec,
        "bloom_mode_used": (
            "cuckoo" if isinstance(fast, CuckooSeenSet)
            else "sharded" if isinstance(fast, BloomShardStore)
            else "broadcast" if fast is not None else "none"
        ),
    }
    if recrawl_rows is not None:
        lineage["recrawled"] = recrawl_rows.count()
    _merge_extra_lineage(lineage, extra_lineage)
    store.commit_round(round_no, lineage=lineage)
    scheduled.unpersist()
    extracted.unpersist()
    new_urls.unpersist()
    misses.unpersist()
    metrics.unpersist()
    if isinstance(fast, BloomShardStore):
        fast.unpersist()
    if recrawl_rows is not None:
        recrawl_rows.unpersist()
    return lineage


def run_crawl(
    store: TableStore,
    pages: DataFrame,
    seeds: DataFrame,
    hosts: DataFrame,
    n_rounds: int,
    per_host_budget: int = 5,
    resume: bool = True,
    auto_host_reputation: bool = False,
    **round_kwargs,
) -> list[dict]:
    """Multi-round driver with resume: picks up after the last committed
    round (C8). An interrupted run and a fresh run converge to identical
    tables (tested).

    ``auto_host_reputation``: refresh the host-reputation table from the
    crawl's own fetched text before each round (none before anything is
    fetched, so round 1 runs ungated) and gate admission with it — the
    self-correcting loop: a host that keeps serving duplicates or junk
    stops earning frontier slots. Explicit ``host_reputation=`` in
    round_kwargs wins over the automatic one."""
    from ..operators.hoststats import host_stats_from_store

    pages_latest = prepare_pages(pages).persist()
    last = store.last_committed_round()
    if last is None:
        init_crawl(store, seeds, hosts)
        last = 0
    elif not resume:
        raise ValueError("store already initialized; pass resume=True")
    lineages = []
    for r in range(last + 1, n_rounds + 1):
        kwargs = dict(round_kwargs)
        if auto_host_reputation and "host_reputation" not in kwargs:
            kwargs["host_reputation"] = host_stats_from_store(store, up_to=r - 1)
        lineage = run_round(
            store, pages_latest, r, per_host_budget=per_host_budget, **kwargs
        )
        # running-mean ETA, the reference's progress readout
        # (Glassdoor_url_finder.py:311-327): avg secs/round so far ×
        # rounds remaining
        done = [l["elapsed_sec"] for l in lineages] + [lineage["elapsed_sec"]]
        lineage["eta_sec"] = round(sum(done) / len(done) * (n_rounds - r), 3)
        lineages.append(lineage)
    pages_latest.unpersist()
    return lineages
