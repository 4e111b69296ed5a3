"""Host-level curation signals for frontier admission.

Real CC-scale pipelines gate crawling (and training-data inclusion) on
per-HOST reputation, not just per-page features: a host whose pages are
mostly duplicates or low-quality boilerplate should stop receiving
politeness budget. This is the natural extension of the reference's
per-host dimension table (``Quarterly Runner/LinkedIn/
LinkedIn-Updated-Script.py:387-448`` keys every company row by its site)
to aggregate signals.

Scale shape: one groupBy(host) over per-document features that are all
JVM expressions (quality score, lang flag) plus one content hash — a
single shuffle whose key cardinality is #hosts (~10^7 at web scale,
trivially partitionable). The admission join is host→stats, a narrow
equi-join that AQE broadcasts when the stats side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import (
    fingerprint_kernel_pandas,
    quality_features,
    quality_score_col,
)


def host_stats(
    docs: DataFrame, host_col: str = "host", id_col: str = "doc_id",
    text_col: str = "text", lang_col: str = "lang", portable: bool = True,
) -> DataFrame:
    """Per-host curation aggregates over a documents/pages table:

    - ``n_docs``   — pages seen for the host,
    - ``dup_rate`` — 1 − distinct(content hash)/n (exact-dup share),
    - ``mean_quality`` — mean Gopher-style quality score,
    - ``en_ratio`` — share of pages identified as English.

    ``portable=True`` hashes content with the oracle polynomial
    fingerprint; production flips to ``xxhash64(text)`` (same plan).
    Quality scores are multiples of 0.25 (exact binary fractions), so
    the averages are float-order-independent — deterministic across
    partitionings without quantization tricks."""
    # portable hash via the Arrow fingerprint kernel (bit-identical to
    # the expression twin; the interpreted char-fold was this operator's
    # dominant cost and GC source)
    content_hash = (
        fingerprint_kernel_pandas()(F.col(text_col)) if portable
        else F.xxhash64(F.col(text_col))
    )
    feats = quality_features(docs, text_col=text_col).withColumn(
        "__q", quality_score_col()
    )
    per_doc = feats.select(
        F.col(host_col).alias("host"),
        content_hash.alias("__fp"),
        F.col("__q"),
        (F.col(lang_col) == "en").cast("double").alias("__is_en"),
    )
    return per_doc.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.lit(1.0) - F.countDistinct("__fp") / F.count("*"), 4
        ).alias("dup_rate"),
        F.round(F.avg("__q"), 4).alias("mean_quality"),
        F.round(F.avg("__is_en"), 4).alias("en_ratio"),
    )


def host_stats_from_store(
    store, up_to: int | None = None, portable: bool = False,
) -> DataFrame | None:
    """Host reputation from the crawl's OWN evidence: aggregates the
    ``fetched`` table's extracted text/lang (already materialized per
    round — zero extra scans of raw html). Returns None when nothing
    has been fetched yet, so round 1 runs ungated. Feed the result to
    ``run_round(host_reputation=...)``; production default is the
    xxhash64 content hash (``portable=False``)."""
    fetched = store.read_delta("fetched", up_to=up_to)
    if fetched is None:
        return None
    ok = fetched.filter(
        (F.col("fetch_status") == "ok") & F.col("text").isNotNull()
    ).select(
        "host",
        F.col("url_hash").alias("doc_id"),
        "text",
        "lang",
    )
    return host_stats(ok, portable=portable)


def throttle_admission(
    candidates: DataFrame, stats: DataFrame,
    max_dup_rate: float = 0.8, min_quality: float = 0.3,
    host_col: str = "host", priority_col: str = "priority",
    demote_by: int = 4,
) -> DataFrame:
    """Apply host reputation to frontier admission: candidates from a
    host whose ``dup_rate`` exceeds ``max_dup_rate`` OR whose
    ``mean_quality`` is below ``min_quality`` are DROPPED; hosts that
    merely fail one soft signal (low ``en_ratio``) are demoted by
    ``demote_by`` priority levels instead (priority: lower = sooner,
    matching :func:`..operators.schedule.schedule_round`). Unknown hosts
    (no stats row yet) pass through unchanged — reputation only ever
    applies to hosts we have evidence about."""
    s = stats.select(
        F.col("host").alias(host_col),
        "dup_rate", "mean_quality", "en_ratio",
    )
    joined = candidates.join(s, on=host_col, how="left")
    kept = joined.filter(
        F.col("dup_rate").isNull()
        | ~(
            (F.col("dup_rate") > max_dup_rate)
            | (F.col("mean_quality") < min_quality)
        )
    )
    if priority_col in candidates.columns:
        kept = kept.withColumn(
            priority_col,
            F.when(
                F.col("en_ratio").isNotNull() & (F.col("en_ratio") < 0.5),
                F.col(priority_col) + demote_by,
            ).otherwise(F.col(priority_col)),
        )
    return kept.drop("dup_rate", "mean_quality", "en_ratio")
