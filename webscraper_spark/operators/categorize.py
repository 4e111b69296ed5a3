"""Location categorization — the reference's multi-strategy join pipeline.

Re-expresses ``categorize_employee_counts`` + friends
(``Quarterly Runner/LinkedIn/LinkedIn-Updated-Script.py:1220-1419``, the
5%-threshold filter ``:1166-1197``, and the 5-strategy fallback matching
``:1290-1345``) as one declarative dataflow:

    facts (url, location, cnt)
      │  W2: per-group share-of-total threshold (window, no self-join)
      │  J3: candidate-key generation (vectorized) → posexplode →
      │      broadcast join vs dim → row_number by strategy pos → best hit
      ▼  A1/A2/A3: grouped conditional sums + sorted formatted collects
    per-url rollup (hq/us counts, city/country strings, record ids)

The reference probes 5 normalization strategies sequentially per location
in Python; here all candidates join at once and ``row_number() over
(partition by url, location order by strategy)`` keeps the first hit —
same first-match-wins semantics, one broadcast hash join instead of an
O(strategies) loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUFFIXES = (" metropolitan area", " metro area", " area")


def candidate_keys(name: str | None) -> list[str | None]:
    """Positional match candidates for one location name (first hit wins).

    Fixed 5-slot strategy vector (reference ``:1290-1345``); a slot is
    None when the strategy does not apply, and slots may repeat — the
    downstream ``row_number`` keeps the lowest strategy index that hits,
    so the reported ``strategy`` is always the true strategy number:

      0 exact (lowercased, trimmed)
      1 suffix-stripped ("X Metropolitan Area" → "x")
      2 city part (text before first comma)
      3 metro-cleaned ("Greater X" → "x", suffixes stripped)
      4 state/country part (text after last comma)
    """
    if name is None:
        return []
    base = " ".join(name.strip().lower().split())
    if not base:
        return []
    stripped = base
    for suf in _SUFFIXES:
        if stripped.endswith(suf):
            stripped = stripped[: -len(suf)].strip()
            break
    city = base.split(",", 1)[0].strip() if "," in base else None
    metro = stripped[len("greater "):].strip() if stripped.startswith("greater ") else stripped
    state = base.rsplit(",", 1)[1].strip() if "," in base else None
    return [base, stripped, city, metro, state]


@F.pandas_udf(T.ArrayType(T.StringType()))
def candidate_keys_udf(names: pd.Series) -> pd.Series:
    return names.map(candidate_keys)


def threshold_filter(
    facts: DataFrame,
    group_col: str = "url",
    cnt_col: str = "cnt",
    frac: float = 0.05,
) -> DataFrame:
    """W2/P6: keep rows with ``cnt >= max(1, frac * group_total)`` — the
    reference's per-company 5% noise filter (``:1166-1197``), expressed as
    an analytic window (one shuffle, no self-join)."""
    w = Window.partitionBy(group_col)
    return (
        facts.withColumn("__total", F.sum(cnt_col).over(w))
        .filter(
            F.col(cnt_col)
            >= F.greatest(F.lit(1.0), F.col("__total") * F.lit(frac))
        )
        .drop("__total")
    )


def match_locations(
    facts: DataFrame,
    geo_dim: DataFrame,
    url_col: str = "url",
    loc_col: str = "location",
) -> DataFrame:
    """J3 multi-key fallback join. ``geo_dim(name, record_id, geo_id,
    loc_type)`` is broadcast (it is a dimension). Returns facts +
    ``matched_record_id / matched_geo_id / matched_loc_type / strategy``
    (null strategy = no match). Deterministic: ties broken by record_id.
    """
    dim = F.broadcast(
        geo_dim.select(
            F.lower(F.trim(F.col("name"))).alias("__key"),
            F.col("record_id").alias("matched_record_id"),
            F.col("geo_id").alias("matched_geo_id"),
            F.col("loc_type").alias("matched_loc_type"),
        )
    )
    cands = facts.withColumn("__cands", candidate_keys_udf(F.col(loc_col))).select(
        "*", F.posexplode_outer("__cands").alias("__pos", "__key")
    ).drop("__cands")
    hits = cands.join(dim, on="__key", how="left")
    w = Window.partitionBy(url_col, loc_col).orderBy(
        F.col("matched_record_id").isNull().asc(),  # real hits first
        F.col("__pos").asc(),
        F.col("matched_record_id").asc_nulls_last(),
    )
    best = (
        hits.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "strategy", F.when(F.col("matched_record_id").isNotNull(), F.col("__pos"))
        )
        .drop("__rn", "__pos", "__key")
    )
    return best


def categorize_counts(
    matched: DataFrame,
    hq_record_ids: DataFrame | None = None,
    url_col: str = "url",
) -> DataFrame:
    """A1/A2/A3 rollup per url (reference ``:1346-1419``):

    - ``hq_ee_count``: counts whose matched record is an HQ record
    - ``us_ee_count``: counts categorized US (us_city type or the
      'united states' country row)
    - ``other_us_cities`` / ``other_countries``: ``"Name (cnt)"`` joined
      ', ' in count-descending order (deterministic name tie-break)
    - ``matched_record_ids``: distinct matched records (sorted array)
    """
    df = matched
    if hq_record_ids is not None:
        hq = F.broadcast(
            hq_record_ids.select(F.col("record_id").alias("matched_record_id"))
            .withColumn("__is_hq", F.lit(True))
        )
        df = df.join(hq, on="matched_record_id", how="left")
    else:
        df = df.withColumn("__is_hq", F.lit(None).cast("boolean"))

    is_us = F.col("matched_loc_type").contains("us_city") | (
        F.lower(F.col("location")) == "united states"
    )
    # dual-typed records ("country, us_city" — the US row) are US, not
    # "other country" (reference U2 overlap handling, ``:414-434``)
    is_country = (
        F.col("matched_loc_type").contains("country")
        & ~F.col("matched_loc_type").contains("us_city")
        & (F.lower(F.col("location")) != "united states")
    )
    is_us_city = F.col("matched_loc_type").contains("us_city")

    def _fmt_sorted(pred):
        # A2: collect (cnt desc, name asc) → "Name (cnt)" → ', ' join.
        # struct sort on (-cnt, name) keeps it deterministic under ties.
        return F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            pred,
                            F.struct(
                                (-F.col("cnt")).alias("negcnt"),
                                F.col("location").alias("name"),
                                F.col("cnt").alias("cnt"),
                            ),
                        )
                    )
                ),
                lambda x: F.concat(
                    x["name"], F.lit(" ("), x["cnt"].cast("string"), F.lit(")")
                ),
            ),
            ", ",
        )

    return df.groupBy(url_col).agg(
        F.coalesce(
            F.sum(F.when(F.col("__is_hq"), F.col("cnt"))), F.lit(0)
        ).alias("hq_ee_count"),
        F.coalesce(F.sum(F.when(is_us, F.col("cnt"))), F.lit(0)).alias("us_ee_count"),
        _fmt_sorted(is_us_city & ~F.coalesce(F.col("__is_hq"), F.lit(False))).alias(
            "other_us_cities"
        ),
        _fmt_sorted(is_country).alias("other_countries"),
        F.array_sort(
            F.collect_set(F.col("matched_record_id"))
        ).alias("matched_record_ids"),
        F.sum("cnt").alias("total_ee_count"),
    )


def geo_pipeline(
    facts: DataFrame,
    geo_dim: DataFrame,
    hq_record_ids: DataFrame | None = None,
    threshold_frac: float = 0.05,
) -> DataFrame:
    """EP3's analytics tail as one declarative plan: threshold → match →
    rollup (reference runs this per company inside a Selenium loop)."""
    kept = threshold_filter(facts, frac=threshold_frac)
    matched = match_locations(kept, geo_dim)
    return categorize_counts(matched, hq_record_ids)
