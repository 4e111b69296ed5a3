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
  new-files-since-ledger. The ledger is itself a DELTA table
  (``ingest_ledger``: one parquet partition per round holding the full
  paths + size/mtime of the files that round staged), committed
  atomically WITH the round by the same manifest rename that commits
  ``pages_ingest`` — a crash before commit re-stages both idempotently
  (insert-overwrite), a crash after cannot double-ingest. Discovery is
  a *Spark anti-join* of the drop-dir listing against the committed
  ledger, so the driver only ever holds the NEW paths (O(new files)),
  never the full ingest history; :func:`run_incremental_crawl`
  auto-compacts the ledger every ``ledger_compact_every`` rounds so the
  listing-side read stays O(recent rounds + 1 base file) no matter how
  many archives have ever been ingested. This is the Iceberg-append
  shape: at cluster scale ``pages_ingest`` is an Iceberg table and the
  ledger is its snapshot/file metadata (Auto-Loader's RocksDB file log).
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

#: the ingest ledger's own delta table: full path + listing-time
#: size/mtime of every archive a committed round staged. The path is the
#: dedup KEY (a producer must land each archive under a FRESH name via
#: atomic rename — an overwrite under an already-ingested path is
#: ignored, exactly like Spark's own file sources / Auto-Loader default);
#: size/mtime are recorded for diagnostics so an ignored overwrite is at
#: least detectable after the fact.
LEDGER_TABLE = "ingest_ledger"
_LEDGER_SCHEMA = "path string, size long, mtime_ms long"


def ingest_ledger(store: TableStore) -> "DataFrame | None":
    """The committed ingest ledger (path, size, mtime_ms) as a DataFrame
    — distributed, never collected; None before the first commit."""
    return store.read_delta(LEDGER_TABLE)


def ingested_files(store: TableStore) -> set[str]:
    """Full paths already ingested by committed rounds, collected to the
    driver. Diagnostics/tests only — discovery itself anti-joins the
    ledger distributed-side precisely so this set never has to
    materialize on the driver at 10^5+ archives."""
    led = ingest_ledger(store)
    if led is None:
        return set()
    return {r["path"] for r in led.select("path").collect()}


def _list_candidates(
    drop_dir: str, settle_seconds: float = 0.0
) -> list[tuple[str, int, int]]:
    """Drop-dir listing → (path, size, mtime_ms) rows, sorted. Metadata
    only — content bytes never touch the driver. On an object store the
    same rows come from a LIST call or an inventory/notification feed."""
    import time

    out = []
    # realpath: the ledger keys on the path string, so the same archive
    # must compare identically no matter how the caller spelled
    # --drop-dir (relative vs absolute, trailing slash, different cwd,
    # or a symlinked mount alias)
    drop_dir = os.path.realpath(drop_dir)
    for f in sorted(os.listdir(drop_dir)):
        if not f.endswith(_WARC_SUFFIXES):
            continue
        if f.startswith((".", "_")):
            continue
        path = os.path.join(drop_dir, f)
        try:
            st = os.stat(path)
        except OSError:
            continue  # vanished between listing and stat
        if settle_seconds > 0 and time.time() - st.st_mtime < settle_seconds:
            continue  # still settling: picked up next round
        out.append((path, int(st.st_size), int(st.st_mtime * 1000)))
    return out


def discover_new_warcs(
    store: TableStore, drop_dir: str, settle_seconds: float = 0.0
) -> list[str]:
    """Drop-dir listing minus the committed ingest ledger, sorted for
    determinism. The subtraction is a Spark anti-join on the FULL path
    against the ``ingest_ledger`` delta table, so the driver holds only
    the listing and the new paths — the ingest history stays distributed
    and (after compaction) the ledger read is O(recent rounds) files.

    Producers must land archives by ATOMIC RENAME into the directory
    under a fresh name (the same contract Spark's own file sources
    assume): hidden files and common in-flight conventions
    (``.tmp``/``.partial``/``.part`` suffixes, ``_``/``.`` prefixes) are
    never picked up, so a file still being copied under a temp name
    cannot be half-ingested and then permanently skipped; re-dropping
    DIFFERENT content under an already-ingested path is ignored by
    design (path is the dedup key). For producers that cannot rename
    atomically, ``settle_seconds > 0`` additionally skips any file
    modified within that window (it is simply discovered on a later
    round)."""
    return _subtract_ledger(store, _list_candidates(drop_dir, settle_seconds))


def _legacy_ingested_basenames(store: TableStore) -> set[str]:
    """Basenames recorded by the PRE-ledger discovery checkpoint
    (rounds committed before the ``ingest_ledger`` delta table existed
    kept an ``ingested_files`` basename list in manifest lineage).
    Resuming such a store with ledger-only subtraction would silently
    re-ingest every archive those rounds already ingested — duplicate
    pages in the corpus — so these names stay subtracted forever."""
    out: set[str] = set()
    for lin in store.read_manifest().get("lineage", {}).values():
        names = lin.get("ingested_files")
        if isinstance(names, (list, tuple)):
            out.update(os.path.basename(str(n)) for n in names)
    return out


def _subtract_ledger(
    store: TableStore, cand: list[tuple[str, int, int]]
) -> list[str]:
    if not cand:
        return []
    legacy = _legacy_ingested_basenames(store)
    if legacy:
        cand = [c for c in cand if os.path.basename(c[0]) not in legacy]
        if not cand:
            return []
    led = ingest_ledger(store)
    if led is None:
        return [p for p, _, _ in cand]
    cdf = store.spark.createDataFrame(cand, _LEDGER_SCHEMA)
    new = cdf.join(led.select("path"), on="path", how="left_anti")
    return sorted(r["path"] for r in new.select("path").collect())


def ingest_new_warcs(
    store: TableStore, drop_dir: str, round_no: int,
    settle_seconds: float = 0.0,
) -> list[str]:
    """Stage every not-yet-ingested WARC file as the round's
    ``pages_ingest`` partition plus the matching ``ingest_ledger``
    partition (both idempotent insert-overwrites; both become visible
    only when the round commits). Returns the staged full paths."""
    import shutil

    committed = round_no in store.read_manifest()["committed_rounds"]
    cand = _list_candidates(drop_dir, settle_seconds)
    new = _subtract_ledger(store, cand)
    if not new:
        # remove any stale staging from a crashed earlier attempt at
        # this round: rows whose source files are no longer discoverable
        # must not ride into a commit whose ingest ledger says nothing
        # was ingested (they would double-ingest if the files reappear
        # later). NEVER touch a COMMITTED partition — a replay with an
        # already-committed round_no must be a no-op, not data loss.
        if not committed:
            for table in ("pages_ingest", LEDGER_TABLE):
                stale = store.part_path(table, round_no)
                if os.path.exists(stale):
                    shutil.rmtree(stale)
        return []
    if committed:
        raise ValueError(
            f"round {round_no} is already committed; staging new files "
            "into it would overwrite committed partitions"
        )
    files = store.spark.read.format("binaryFile").load(new)
    store.write("pages_ingest", pages_from_warc_files(files), round_no)
    stat_by_path = {p: (sz, mt) for p, sz, mt in cand}
    rows = [(p, *stat_by_path[p]) for p in new]
    store.write(
        LEDGER_TABLE,
        store.spark.createDataFrame(rows, _LEDGER_SCHEMA),
        round_no,
    )
    return new


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
    ledger_compact_every: int = 8,
    **round_kwargs,
) -> list[dict]:
    """Multi-round crawl whose corpus is whatever WARC files have landed
    in ``drop_dir`` by the time each round starts. Same resume and
    ``auto_host_reputation`` contracts as ``run_crawl``. The files each
    round ingested live in the ``ingest_ledger`` delta partition that
    commits with the round (the discovery checkpoint); lineage carries
    only the COUNT, so the JSON manifest stays O(rounds) no matter how
    many archives ever arrive. Every ``ledger_compact_every`` committed
    rounds the ledger's round partitions are folded into one base
    partition (``TableStore.compact``), bounding what discovery reads."""
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
            extra_lineage={"n_ingested_files": len(staged)},
            **kwargs,
        )
        pages_latest.unpersist()
        lineages.append(lineage)
        if ledger_compact_every > 0 and r % ledger_compact_every == 0:
            store.compact(LEDGER_TABLE)
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
