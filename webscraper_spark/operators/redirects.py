"""Redirect-chain resolution: pointer doubling over the 3xx map.

A crawl's fetched table is full of HTTP redirects; frontier admission,
dedup and link analysis all want the FINAL target (a chain of
``a→b→c`` should credit ``c``, and ``a``/``b`` are aliases). The
reference follows redirects implicitly inside the browser
(``Quarterly Runner/GlassDoor/Glassdoor_Scraper_New.py`` — Selenium
navigation lands on the final URL); a dataflow engine gets the hops as
ROWS and must resolve them itself.

Resolution is pointer DOUBLING, not per-hop iteration: each round
composes the mapping with itself (``m2(x) = m(m(x))``), so a chain of
length L resolves in ``ceil(log2 L)`` self-joins — the same
diameter-independent trick as the contraction connected-components
clusterer (``similarity.connected_components_contract``). Real crawls
contain redirect LOOPS; a source still inside a cycle (or a chain
longer than ``max_hops``) after the final round reports
``terminated = false`` with its position after exactly ``max_hops``
steps — callers drop or quarantine those.

Scale shape: the redirect subset is a small fraction of fetches, and
each round is ONE equi-join of the mapping with itself on the current
target (shuffle on one key) followed by a ``localCheckpoint`` to
truncate lineage — ``ceil(log2 max_hops)`` rounds total, never
per-hop. No driver-side state beyond the loop counter.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 64,
) -> DataFrame:
    """``edges`` is the functional redirect map (one ``dst`` per
    ``src``; duplicate rows collapse, CONFLICTING targets for one src
    raise — a crawl should record one Location per fetch). Returns one
    row per source: ``src, final_dst, n_hops, terminated`` where
    ``terminated`` means the walk reached a node with no outgoing
    redirect within ``max_hops`` steps; unterminated rows (loops,
    over-long chains) report their position after exactly ``max_hops``
    steps, matching a sequential walk. ``max_hops`` rounds UP to the
    next power of two (doubling composes in powers of two; a mid-round
    cap would corrupt later compositions)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    # rounds first, then the normalized cap: with max_hops=1 the
    # initial state (one hop taken) IS the answer — zero rounds
    rounds = math.ceil(math.log2(max_hops))
    max_hops = 1 << rounds
    m = (
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("cur"),
        )
        .dropDuplicates()
        .persist()  # reused by the conflict check, round 1, final join
    )
    # functional check: tiny aggregate over the redirect subset
    n_conflicts = (
        m.groupBy("src").count().filter(F.col("count") > 1).limit(1).count()
    )
    if n_conflicts:
        m.unpersist()
        raise ValueError(
            "redirect map is not functional: a src has conflicting targets"
        )
    state = m.withColumn("hops", F.lit(1).cast("long"))
    for _ in range(rounds):
        nxt = state.alias("a").join(
            state.select(
                F.col("src").alias("b_src"),
                F.col("cur").alias("b_cur"),
                F.col("hops").alias("b_hops"),
            ),
            F.col("a.cur") == F.col("b_src"),
            "left",
        )
        state = nxt.select(
            F.col("a.src").alias("src"),
            F.coalesce(F.col("b_cur"), F.col("a.cur")).alias("cur"),
            # terminated walks stop composing (b side null), so hops is
            # the exact chain length; loop rows double every round and
            # land on exactly max_hops (a power of two) after the last
            (F.col("a.hops") + F.coalesce(F.col("b_hops"), F.lit(0))
             ).alias("hops"),
        ).localCheckpoint(eager=True)
    # a row is terminated when its final node has no outgoing redirect
    # (src is unique in m — the functional check proved it)
    out = state.alias("s").join(
        m.select(F.col("src").alias("t_src")),
        F.col("s.cur") == F.col("t_src"),
        "left",
    ).select(
        F.col("s.src").alias("src"),
        F.col("s.cur").alias("final_dst"),
        F.col("s.hops").alias("n_hops"),
        F.col("t_src").isNull().alias("terminated"),
    ).localCheckpoint(eager=True)  # materialize, then free the map
    m.unpersist()
    return out
