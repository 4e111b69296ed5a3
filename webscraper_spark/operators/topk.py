"""Skew-aware per-group top-k (W1/W3/O3 budget filtering).

A plain ``row_number().over(Window.partitionBy(host))`` serializes each
host into one task — a hot host (Zipf head) becomes the round's straggler
at 10^10 scale. Since the scheduler only ever keeps ``k`` rows per host,
we prune in two phases:

  phase 1: rank within (host, salt) sub-groups — parallelism ×``n_salt``
           for every host, keep local top-k;
  phase 2: re-rank the surviving ≤ k·n_salt rows per host — tiny.

The salt shards only the *pruning computation*; the final per-host rank
(= the politeness sequence number) is computed over the pruned set and is
identical to the unsalted result (SURVEY §7.4: salting must never change
the per-host fetch order). Phase 2's window sees ≤ k·n_salt rows per
host, so no task can be large regardless of input skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
    n_salt: int = 16,
) -> DataFrame:
    """Deterministic top-k per group with two-phase skew salting.

    ``order_cols`` must be a total order within each group (include a
    unique tie-breaker like ``url_hash``) or ranks are nondeterministic.
    """
    if n_salt > 1:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in group_cols], F.monotonically_increasing_id()), F.lit(n_salt))
        w_local = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
        df = (
            df.withColumn("__salt", salt)
            .withColumn("__lrank", F.row_number().over(w_local))
            .filter(F.col("__lrank") <= k)
            .drop("__salt", "__lrank")
        )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
