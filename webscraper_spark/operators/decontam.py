"""Benchmark decontamination: n-gram overlap flags for training data.

A training corpus must not contain the evaluation benchmarks — a doc
sharing a long-enough word n-gram with any benchmark item leaks test
answers into training. The standard recipe (GPT-3 appendix C and
successors, public) flags a document when any 13-gram of normalized
text also appears in the benchmark set. This module implements it
entirely with JVM-side higher-order functions: tokenize → n-grams via
``transform(sequence(...))`` → explode → one equi-join against the
(broadcast) benchmark gram set. No Python in the hot path.

Scale shape: the benchmark side is tiny relative to the corpus (a few
10^6 grams even for a large eval suite) — broadcast it and the corpus
side never shuffles; gram explosion is O(tokens) per doc inside the
scan task, then the per-doc hit count is a map-side-combinable groupBy
on doc_id (which at 10^10 docs rides the same bucketing as everything
else). For a benchmark set too large to broadcast, pass
``broadcast_bench=False`` to fall back to a shuffle join on the gram
string.

Determinism: normalization is lowercase + whitespace collapse, and the
gram is the literal space-joined token string — no hashing, so the
DuckDB oracle states the identical computation in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_col(text_col: str, n: int) -> Column:
    """array<string> of word ``n``-grams of the normalized text (empty
    when the doc has fewer than ``n`` tokens)."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")),
        " ",
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-document contamination evidence: ``id_col, n_hits,
    contaminated`` for EVERY input doc — ``n_hits`` is the number of
    distinct ``n``-grams shared with any benchmark item, and docs with
    no grams (shorter than ``n`` tokens) report 0. ``benchmark`` needs
    the same ``text_col``."""
    bench = benchmark.select(
        F.explode(ngram_col(text_col, n)).alias("gram")
    ).distinct()
    if broadcast_bench:
        bench = F.broadcast(bench)
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_col(text_col, n)).alias("gram")
    )
    # join BEFORE deduplicating: only the hit rows (contaminated grams)
    # ever shuffle — a distinct on the full exploded gram table would
    # shuffle the whole corpus ×tokens
    hits = doc_grams.join(bench, "gram").groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_hits")
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.when(F.col("n_hits").isNotNull(), F.lit(1))
         .otherwise(F.lit(0)).alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Drop contaminated docs: the input minus every doc whose distinct
    shared-gram count reaches ``min_hits`` (an anti-join on ``id_col``,
    so the surviving rows keep all their columns)."""
    flagged = contamination_flags(
        docs, benchmark, text_col, id_col, n, broadcast_bench
    ).filter(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(flagged, id_col, "left_anti")
