"""Recrawl scheduling: freshness signals × stored corpus → re-fetch
candidates.

The reference re-runs its whole scrape every quarter (the `Quarterly
Runner/` layout — a full sweep regardless of what changed). A web-scale
crawler cannot: at 10^10 stored pages the fetch budget must go to pages
that CHANGED, and the change evidence is exactly what the discovery
sources already emit — sitemap ``lastmod``, feed ``published``/
``updated``. This operator joins those signals against the stored
corpus and ranks what to re-fetch:

- ``fresh_signal``: a discovery source declares content newer than the
  stored fetch — highest priority, ordered by how much newer;
- ``stale_age``: no (usable) signal and the stored copy is older than
  ``max_age_days`` — the blind-revisit tier every crawler needs because
  most of the web publishes no change signal at all;
- everything else is NOT a candidate: the signal says the stored copy
  is still current, so the fetch budget skips it (this is the saving).

Scale shape: signals first collapse to one row per url via a map-side
combinable ``max(signal_ts)`` groupBy, then ONE equi-join against the
corpus keyed on ``(url_hash, url)`` — the hash leads so at 10^10 rows
both tables bucket on ``url_hash`` (the engine-wide convention) and
the join co-locates with zero exchange, while the url equality keeps
hash collisions from merging distinct pages. No window over the full
corpus, no driver-side state; the priority is a pure per-row
expression.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.canon import host_col

#: seconds per day, for age arithmetic on timestamps
_DAY = 86400.0


def recrawl_candidates(
    corpus: DataFrame,
    signals: DataFrame,
    now_ts: str,
    max_age_days: float = 30.0,
) -> DataFrame:
    """Rank stored pages for re-fetch.

    ``corpus``: one row per stored page — ``url``, ``fetch_ts``
    (timestamp of the stored copy). ``signals``: discovery-source
    freshness evidence — ``url``, ``signal_ts`` (sitemap lastmod, feed
    published/updated; multiple rows per url fine, nulls fine).
    ``now_ts`` is the evaluation instant (explicit, never wall-clock —
    plans must be replayable).

    Returns ``url, host, fetch_ts, signal_ts, reason, staleness_days,
    priority`` for candidate pages only:

    - reason='fresh_signal' when ``max(signal_ts) > fetch_ts``;
      staleness = days between them (how far behind the copy is)
    - reason='stale_age' when no newer signal exists and the copy is
      older than ``max_age_days``; staleness = age beyond the limit

    ``priority`` is the scheduler's 0-is-soonest integer: fresh signals
    land in 0-3 by recency-gap doubling buckets, blind revisits start
    at 4 — change evidence always beats calendar age.

    Raises ``ValueError`` on an unparseable ``now_ts``: a silent NULL
    instant would suppress the whole stale_age tier with zero
    diagnostics."""
    try:
        datetime.fromisoformat(now_ts)
    except (TypeError, ValueError) as e:
        raise ValueError(f"now_ts is not ISO 8601: {now_ts!r}") from e
    latest = signals.filter(F.col("signal_ts").isNotNull()).groupBy(
        F.xxhash64("url").alias("url_hash"), F.col("url")
    ).agg(F.max("signal_ts").alias("signal_ts"))

    now = F.to_timestamp(F.lit(now_ts))
    joined = corpus.select(
        F.xxhash64("url").alias("url_hash"), "url", "fetch_ts"
    ).join(latest, ["url_hash", "url"], "left")

    age_days = (now.cast("double") - F.col("fetch_ts").cast("double")) / _DAY
    gap_days = (
        F.col("signal_ts").cast("double") - F.col("fetch_ts").cast("double")
    ) / _DAY

    fresh = F.col("signal_ts").isNotNull() & (
        F.col("signal_ts") > F.col("fetch_ts")
    )
    # blind revisits are only for signal-LESS pages: a non-newer signal
    # is positive evidence the stored copy is current, however old
    stale = F.col("signal_ts").isNull() & (age_days > F.lit(max_age_days))

    return (
        joined.filter(fresh | stale)
        .select(
            F.col("url"),
            host_col("url").alias("host"),
            F.col("fetch_ts"),
            F.col("signal_ts"),
            F.when(fresh, F.lit("fresh_signal"))
             .otherwise(F.lit("stale_age")).alias("reason"),
            F.round(
                F.when(fresh, gap_days)
                 .otherwise(age_days - F.lit(max_age_days)), 4
            ).alias("staleness_days"),
            F.when(
                fresh,
                # doubling buckets of the signal gap (a comparison
                # ladder, not log2 — exact across engines): a week-
                # stale page beats a day-stale one
                F.when(gap_days >= 8, F.lit(0))
                 .when(gap_days >= 4, F.lit(1))
                 .when(gap_days >= 2, F.lit(2))
                 .otherwise(F.lit(3)),
            ).otherwise(F.lit(4)).alias("priority"),
        )
    )


def signal_recrawl(
    corpus: DataFrame,
    signals: DataFrame,
    now_ts: str,
    max_age_days: float = 30.0,
    limit: "int | None" = None,
) -> DataFrame:
    """Candidate selection for ``run_round(recrawl=...)``: rank
    :func:`recrawl_candidates` by ``(priority, staleness desc)`` and
    take the round's invalidation budget (``limit``), returning the
    ``url`` column the round plan's forced-refetch path consumes.
    The global top-k compiles to TakeOrderedAndProject (per-partition
    heads merged on the driver), never a full sort materialization —
    the budget is small by definition."""
    cands = recrawl_candidates(corpus, signals, now_ts, max_age_days)
    if limit is not None:
        cands = cands.orderBy(
            F.col("priority").asc(),
            F.col("staleness_days").desc(),
            F.col("url"),
        ).limit(limit)
    return cands.select("url")
