"""Continuous WARC ingestion — a drop directory feeds a growing crawl.

The reference orchestrates stages with a *file barrier*: a stage runs
when its input file appears (``Main_Runner.py:19-27``,
``LinkedIn-Updated-Script.py:188-194``). The web-scale analog is a drop
directory that new WARC archives land in continuously (how Common Crawl
segments arrive); each crawl round should ingest exactly the files it
has not seen, so the corpus grows between rounds without ever
re-parsing an old archive.

Two equivalent shapes are provided, and a test proves them equivalent:

- **Batch discovery** (:func:`run_incremental_crawl`): Auto-Loader-style
  new-files-since-manifest. Before each round, list the drop dir minus
  the union of ``ingested_files`` recorded in committed round lineage;
  parse just those files (``binaryFile`` → the shared WARC splitter)
  into a ``pages_ingest`` DELTA partition staged under the round; then
  run the round over the union of all ingested partitions. The file
  list commits atomically WITH the round (``run_round(extra_lineage=)``)
  — a crash before commit re-stages idempotently (insert-overwrite), a
  crash after cannot double-ingest. This is the Iceberg-append shape:
  at cluster scale ``pages_ingest`` is an Iceberg table and the
  manifest is its snapshot metadata.
- **Structured Streaming twin** (:func:`stream_pages_from_drop`):
  ``readStream.format("binaryFile")`` over the same directory with a
  checkpoint; Spark's own file-source log plays the manifest's role.
  Same splitter, same output schema — exactly-once across restarts.

Scale shape: discovery is a directory listing (metadata-only); parsing
is one task per new file with zero exchanges (the ``mapInPandas``
splitter); each round's fetch join then prunes to the round partitions
via the manifest. Nothing rescans old archives.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.round import init_crawl, prepare_pages, run_round
from .tables import TableStore
from .warc import pages_from_warc_files

_WARC_SUFFIXES = (".warc", ".warc.gz")

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def ingested_files(store: TableStore) -> set[str]:
    """File names already ingested by committed rounds (from lineage)."""
    out: set[str] = set()
    for lin in store.read_manifest().get("lineage", {}).values():
        out.update(lin.get("ingested_files", []))
    return out


def discover_new_warcs(
    store: TableStore, drop_dir: str, settle_seconds: float = 0.0
) -> list[str]:
    """Drop-dir listing minus the committed ingest manifest, sorted for
    determinism. Listing is driver-side metadata work — the content
    bytes never touch the driver.

    Producers must land archives by ATOMIC RENAME into the directory
    (the same contract Spark's own file sources assume): hidden files
    and common in-flight conventions (``.tmp``/``.partial``/``.part``
    suffixes, ``_``/``.`` prefixes) are never picked up, so a file still
    being copied under a temp name cannot be half-ingested and then
    permanently skipped. For producers that cannot rename atomically,
    ``settle_seconds > 0`` additionally skips any file modified within
    that window (it is simply discovered on a later round)."""
    done = ingested_files(store)
    out = []
    for f in sorted(os.listdir(drop_dir)):
        if not f.endswith(_WARC_SUFFIXES):
            continue
        if f.startswith((".", "_")):
            continue
        if f in done:
            continue
        path = os.path.join(drop_dir, f)
        if settle_seconds > 0:
            import time

            try:
                if time.time() - os.path.getmtime(path) < settle_seconds:
                    continue  # still settling: picked up next round
            except OSError:
                continue  # vanished between listing and stat
        out.append(path)
    return out


def ingest_new_warcs(
    store: TableStore, drop_dir: str, round_no: int,
    settle_seconds: float = 0.0,
) -> list[str]:
    """Stage every not-yet-ingested WARC file as the round's
    ``pages_ingest`` partition (idempotent insert-overwrite; becomes
    visible only when the round commits). Returns the staged file
    names."""
    import shutil

    new = discover_new_warcs(store, drop_dir, settle_seconds)
    if not new:
        # remove any stale staging from a crashed earlier attempt at
        # this round: rows whose source files are no longer discoverable
        # must not ride into a commit whose ingested_files ledger says
        # nothing was ingested (they would double-ingest if the files
        # reappear later). NEVER touch a COMMITTED partition — a replay
        # with an already-committed round_no must be a no-op, not data
        # loss.
        committed = round_no in store.read_manifest()["committed_rounds"]
        stale = store.part_path("pages_ingest", round_no)
        if not committed and os.path.exists(stale):
            shutil.rmtree(stale)
        return []
    files = store.spark.read.format("binaryFile").load(new)
    store.write("pages_ingest", pages_from_warc_files(files), round_no)
    return [os.path.basename(p) for p in new]


def ingested_pages(store: TableStore, pending_round: int | None = None) -> DataFrame | None:
    """The growing pages table: union of committed ``pages_ingest``
    partitions plus (optionally) the partition staged for the in-flight
    round."""
    parts = []
    committed = store.read_delta("pages_ingest")
    if pending_round is not None:
        staged = store.part_path("pages_ingest", pending_round)
        if os.path.exists(staged):
            parts.append(store.spark.read.parquet(staged))
    if committed is not None:
        parts.append(committed)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_incremental_crawl(
    store: TableStore,
    drop_dir: str,
    seeds: DataFrame,
    hosts: DataFrame,
    n_rounds: int,
    per_host_budget: int = 5,
    resume: bool = True,
    auto_host_reputation: bool = False,
    settle_seconds: float = 0.0,
    **round_kwargs,
) -> list[dict]:
    """Multi-round crawl whose corpus is whatever WARC files have landed
    in ``drop_dir`` by the time each round starts. Same resume and
    ``auto_host_reputation`` contracts as ``run_crawl``; additionally
    each round's lineage records the files it ingested, which IS the
    discovery checkpoint."""
    from ..operators.hoststats import host_stats_from_store

    last = store.last_committed_round()
    if last is None:
        init_crawl(store, seeds, hosts)
        last = 0
    elif not resume:
        raise ValueError("store already initialized; pass resume=True")
    lineages = []
    for r in range(last + 1, n_rounds + 1):
        staged = ingest_new_warcs(store, drop_dir, r, settle_seconds)
        pages = ingested_pages(store, pending_round=r)
        if pages is None:
            raise ValueError(f"no WARC files available for round {r}")
        pages_latest = prepare_pages(pages).persist()
        kwargs = dict(round_kwargs)
        if auto_host_reputation and "host_reputation" not in kwargs:
            kwargs["host_reputation"] = host_stats_from_store(store, up_to=r - 1)
        lineage = run_round(
            store, pages_latest, r, per_host_budget=per_host_budget,
            extra_lineage={"ingested_files": staged},
            **kwargs,
        )
        pages_latest.unpersist()
        lineages.append(lineage)
    return lineages


def stream_pages_from_drop(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Structured Streaming twin of the batch discovery: a streaming
    pages DataFrame over the drop directory. Pair with a checkpointed
    sink for exactly-once file processing across restarts."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        # exact suffix alternation — the same set the batch discovery
        # accepts, so in-flight temp names (x.warc.tmp) are never read
        .option("pathGlobFilter", "*.{warc,warc.gz}")
        .load(drop_dir)
    )
    return pages_from_warc_files(files)
