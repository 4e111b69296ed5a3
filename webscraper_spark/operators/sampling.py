"""Deterministic stratified / quota sampling for training-data mixing.

An LLM data pipeline rarely trains on the crawl's natural distribution:
it samples a target mix (per language, per source, per quality bucket).
Two requirements separate this from ``df.sample()``:

- **Determinism**: the same corpus + seed must select the same rows on
  every run and every cluster size, or ablations and resumed runs
  diverge. Rows are ranked inside each stratum by
  ``xxhash64(seed ":" id)`` — a pseudorandom but reproducible order —
  never by ``rand()``.
- **Exactness**: quotas are hard row counts per stratum, not Bernoulli
  rates. Ranking + ``row_number() <= n`` gives exactly n (or the whole
  stratum when it is smaller).

Scale shape: a literal per-stratum limit compiles to WindowGroupLimit
(rank pushdown — each task keeps a bounded heap per stratum; no stratum
ever fully sorts or materializes). Dynamic quotas (a per-stratum quota
table) cannot push a non-literal limit, so :func:`quota_sample` first
applies WindowGroupLimit at the LARGEST quota (a literal, read from the
tiny quota table driver-side) and then the exact per-stratum filter —
the full-corpus work stays bounded-heap, and the dynamic comparison
touches at most ``max_quota`` rows per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK = "_sample_rank"


def _rank_in_stratum(df: DataFrame, strata: list, id_col: str,
                     seed: str) -> DataFrame:
    """row_number per stratum in the deterministic pseudorandom order
    (hash first, id tiebreak for hash collisions)."""
    h = F.xxhash64(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(id_col).asc())
    return df.withColumn(_RANK, F.row_number().over(w))


def stratified_sample(
    df: DataFrame,
    strata: list,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows from every stratum (all rows of a
    smaller stratum), chosen by the seeded hash order. Keeps all input
    columns plus ``sample_rank`` (1-based within the stratum)."""
    return (
        _rank_in_stratum(df, strata, id_col, seed)
        .filter(F.col(_RANK) <= n_per_stratum)
        .withColumnRenamed(_RANK, "sample_rank")
    )


def quota_sample(
    df: DataFrame,
    strata: list,
    quotas: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum hard quotas: ``quotas`` has the strata columns plus
    ``quota`` (rows to keep; a stratum absent from the table keeps
    nothing). The quota table is tiny by definition (one row per
    stratum) — it broadcasts, and its max quota is read driver-side to
    keep the window in WindowGroupLimit territory."""
    max_quota = quotas.agg(F.max("quota")).first()[0]
    if max_quota is None:
        return df.limit(0).withColumn("sample_rank", F.lit(1))
    ranked = _rank_in_stratum(df, strata, id_col, seed).filter(
        F.col(_RANK) <= int(max_quota)  # literal → WindowGroupLimit
    )
    return (
        ranked.join(F.broadcast(quotas), on=strata, how="inner")
        .filter(F.col(_RANK) <= F.col("quota"))
        .drop("quota")
        .withColumnRenamed(_RANK, "sample_rank")
    )
