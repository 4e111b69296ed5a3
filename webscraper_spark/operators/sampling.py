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

The rank-filter itself delegates to :func:`~.topk.topk_per_group`
(WindowGroupLimit / skew notes live there). Dynamic quotas cannot push
a non-literal limit, so :func:`quota_sample` first ranks at the LARGEST
quota (a literal, read from the tiny quota table driver-side) and then
applies the exact per-stratum filter — the full-corpus work stays
bounded-heap, and the dynamic comparison touches at most ``max_quota``
rows per stratum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import topk_per_group

RANK_COL = "sample_rank"


def _sample_order(id_col: str, seed: str) -> list:
    h = F.xxhash64(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    return [h.asc(), F.col(id_col).asc()]  # id tiebreak for collisions


def _check_no_rank_col(df: DataFrame) -> None:
    if RANK_COL in df.columns:
        raise ValueError(
            f"input already has a {RANK_COL!r} column — drop or rename "
            "it before re-sampling (silent clobber would corrupt a "
            "two-stage mixing pipeline)"
        )


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
    _check_no_rank_col(df)
    return topk_per_group(
        df, strata, _sample_order(id_col, seed), n_per_stratum,
        rank_col=RANK_COL,
    ).select(*df.columns, RANK_COL)


def quota_sample(
    df: DataFrame,
    strata: list,
    quotas: DataFrame,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum hard quotas: ``quotas`` has the strata columns plus
    ``quota`` (rows to keep; a stratum absent from the table keeps
    nothing). The quota table is one row per stratum BY CONTRACT — it
    is collected driver-side (tiny by definition) to read the max
    quota, and duplicate strata rows raise rather than silently fanning
    out the join and double-weighting a stratum. Output columns =
    input columns + ``sample_rank`` in both the populated and the
    empty-quota paths."""
    _check_no_rank_col(df)
    q = quotas.select(*strata, "quota")
    qrows = q.collect()  # tiny by contract: one row per stratum
    keys = [tuple(r[c] for c in strata) for r in qrows]
    if len(keys) != len(set(keys)):
        raise ValueError("duplicate strata rows in quotas table")
    out_cols = [*df.columns, RANK_COL]
    if not qrows:
        return df.limit(0).withColumn(RANK_COL, F.lit(1)).select(*out_cols)
    max_quota = max(int(r["quota"]) for r in qrows)
    ranked = topk_per_group(
        df, strata, _sample_order(id_col, seed), max_quota,
        rank_col=RANK_COL,
    )
    return (
        ranked.join(F.broadcast(q), on=strata, how="inner")
        .filter(F.col(RANK_COL) <= F.col("quota"))
        .select(*out_cols)
    )
