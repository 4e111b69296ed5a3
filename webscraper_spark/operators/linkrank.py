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
    reliable_checkpoint_dir: str | None = None, tol: float | None = None,
) -> DataFrame:
    """PageRank over ``edges(src, dst)``. Nodes = union of both endpoint
    sets; duplicate edges count once; dangling mass (nodes with no
    outlinks) is redistributed uniformly. Returns (node, rank) with
    ranks summing to ~1.

    ``reliable_checkpoint_dir``: when set, per-iteration lineage is cut
    with reliable ``checkpoint()`` into that directory instead of
    ``localCheckpoint()`` — local checkpoint blocks die with their
    executor, so a multi-hour iterative job on a real cluster wants the
    fault-tolerant variant (the sandbox default stays local: cheaper,
    single-JVM).
    ``tol``: optional early stop — iterate until max |Δrank| < tol
    (costs one extra small agg per iteration, so off by default).

    Quantization scales with graph size: ranks are rounded to
    ``max(9, ceil(log10 n) + 7)`` decimals — enough to absorb
    double-addition order noise across partitionings (determinism) while
    never flattening the ~1/n rank mass to 0.0 on a 10^10-node graph
    (a fixed 1e-9 grid would)."""
    import math

    # persist the deduped edge list for the duration of the build: it is
    # referenced by out_deg and by every iteration's contribution join,
    # and without the cache each reference re-runs the scan + distinct
    # (unpersisted before returning, so nothing outlives the call)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    q = max(9, int(math.ceil(math.log10(n))) + 7)
    spark = edges.sparkSession
    if reliable_checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(reliable_checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        if reliable_checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    out_deg = e.groupBy("src").agg(F.count("*").alias("__deg")).persist()
    ranks = nodes.withColumn("rank", F.lit(round(1.0 / n, q)))
    for _it in range(n_iters):
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
        prev = ranks
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("m") / n),
                    q,
                ).alias("rank"),
            )
        )
        # truncate lineage each iteration — without this the nested
        # join plan grows superlinearly and Catalyst analysis time
        # dominates (the standard iterative-DataFrame discipline)
        ranks = _cut(ranks)
        if tol is not None:
            delta = (
                prev.select("node", F.col("rank").alias("__r0"))
                .join(ranks, on="node")
                .agg(F.max(F.abs(F.col("rank") - F.col("__r0"))).alias("d"))
                .first()["d"]
            )
            if delta is not None and delta < tol:
                break
    nodes.unpersist()
    out_deg.unpersist()
    e.unpersist()
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
            F.coalesce(
                F.least(
                    F.lit(n_buckets - 1),
                    F.floor(
                        F.log2(F.try_divide(F.col("__mx"), F.col("rank")))
                    ).cast("int"),
                ),
                F.lit(n_buckets - 1),  # rank 0/NULL → worst bucket, not NULL
            ).cast("int"),
        )
        .drop("__mx")
    )
