"""Benchmark decontamination: n-gram overlap flags for training data.

A training corpus must not contain the evaluation benchmarks — a doc
sharing a long-enough word n-gram with any benchmark item leaks test
answers into training. The standard recipe (GPT-3 appendix C and
successors, public) flags a document when any 13-gram of normalized
text also appears in the benchmark set. The gram expression reuses the
similarity family's ``words_sql``/``shingles_sql`` (one tokenization
contract engine-wide), wrapped in ``bind_sql`` so the split evaluates
once per row; probing is one equi-join of the exploded grams against
the (broadcast) benchmark gram set. No Python in the hot path.

Scale shape: the benchmark side is tiny relative to the corpus (a few
10^6 grams even for a large eval suite) — broadcast it and the corpus
side never shuffles for the probe: grams explode inside the scan task,
deduplication happens AFTER the join so only contaminated grams leave
their task, and the per-doc distinct-hit count is a partial-aggregating
groupBy on the id. For a benchmark set too large to broadcast, pass
``broadcast_bench=False`` to fall back to a shuffle join on the gram
string.

Determinism: the gram is the literal space-joined token string — no
hashing — so the DuckDB oracle states the identical computation in SQL
(with Java's ``\\s`` class written out explicitly, since RE2's ``\\s``
omits vertical tab).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import bind_sql, shingles_sql, words_sql


def ngram_col(text_col: str, n: int) -> Column:
    """array<string> of word ``n``-grams of the normalized text (empty
    when the doc has fewer than ``n`` tokens). ``text_col`` is a column
    name (or SQL expression) — the gram semantics are exactly the
    similarity family's shingles."""
    return F.expr(bind_sql(words_sql(text_col), "w", shingles_sql("w", n)))


def _hit_counts(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    broadcast_bench: bool,
) -> DataFrame:
    """``id_col, n_hits`` for docs with ≥1 shared gram — the probe join
    both public entry points build on."""
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
    return doc_grams.join(bench, "gram").groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_hits")
    )


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
    hits = _hit_counts(docs, benchmark, text_col, id_col, n,
                       broadcast_bench)
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
    shared-gram count reaches ``min_hits`` — one probe join feeding one
    anti-join (NOT the reporting join of :func:`contamination_flags`,
    which would rescan the corpus just to coalesce zeros this filter
    discards). Surviving rows keep all their columns."""
    flagged = _hit_counts(
        docs, benchmark, text_col, id_col, n, broadcast_bench
    ).filter(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(flagged, id_col, "left_anti")
