"""Link-graph ranking for frontier prioritization.

The reference crawls whatever its seed CSV lists, in file order
(`Glassdoor_url_finder.py` main loop). A web-scale frontier needs an
importance signal to spend its politeness budget on the right URLs;
PageRank over the discovered outlink graph is the classic one, and it
slots into the engine as priorities for :func:`..operators.schedule.
schedule_round` (lower int = sooner).

Scale shape: the edge list is the crawl's own ``(src, dst)`` outlink
table. Each iteration is one shuffle on ``dst`` (contribution sum) plus
one broadcast scalar (dangling mass); no driver-side graph. Ranks are
quantized to 9 decimals per iteration, which pins the result across
partitionings (double addition order varies; 1e-9 absorbs it) — the
same determinism discipline as ``similarity.ivf_train``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame, n_iters: int = 5, damping: float = 0.85,
    src_col: str = "src", dst_col: str = "dst",
) -> DataFrame:
    """PageRank over ``edges(src, dst)``. Nodes = union of both endpoint
    sets; duplicate edges count once; dangling mass (nodes with no
    outlinks) is redistributed uniformly. Returns (node, rank) with
    ranks summing to ~1."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("__deg"))
    ranks = nodes.withColumn("rank", F.lit(round(1.0 / n, 9)))
    for _ in range(n_iters):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "__deg")
        dangling = (
            with_deg.filter(F.col("__deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        )
        contribs = (
            e.join(
                with_deg.filter(F.col("__deg").isNotNull()),
                e["src"] == with_deg["node"],
            )
            .select("dst", (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("m") / n),
                    9,
                ).alias("rank"),
            )
            # truncate lineage each iteration — without this the nested
            # join plan grows superlinearly and Catalyst analysis time
            # dominates (the standard iterative-DataFrame discipline)
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    return ranks


def priorities_from_rank(
    ranks: DataFrame, n_buckets: int = 8, node_col: str = "node"
) -> DataFrame:
    """Quantize ranks into ``n_buckets`` scheduler priorities (0 = best)
    by log2-distance from the max rank: priority = min(n-1,
    floor(log2(max_rank / rank))) — each bucket is a 2× rank band.
    Scale-safe: one broadcast scalar and a map-side expression, no
    global sort window (an ntile would serialize 10^10 rows through one
    task)."""
    mx = F.broadcast(ranks.agg(F.max("rank").alias("__mx")))
    return (
        ranks.crossJoin(mx)
        .withColumn(
            "priority",
            F.least(
                F.lit(n_buckets - 1),
                F.floor(F.log2(F.col("__mx") / F.col("rank"))).cast("int"),
            ).cast("int"),
        )
        .drop("__mx")
    )
