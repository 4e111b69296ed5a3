"""Benchmark decontamination: n-gram semantics, normalization, the
short-doc edge, and plan shape (broadcast, no Python)."""

from __future__ import annotations

import pandas as pd

from webscraper_spark.operators.decontam import (
    contamination_flags,
    decontaminate,
)

BENCH_TEXT = "the quick brown fox jumps over the lazy dog near the old barn"


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def test_flags_and_counts(spark):
    docs = _docs(spark, [
        # shares the benchmark's full 13-gram span (verbatim leak)
        (0, BENCH_TEXT + " and then some trailing words"),
        # same words, different order: clean
        (1, "dog lazy the over jumps fox brown quick the barn old the near"),
        # NORMALIZATION: case + whitespace differences still match
        (2, "The  Quick   Brown Fox jumps over the lazy dog near the old barn"),
        # short doc (< 13 tokens): no grams, clean by construction
        (3, "too short to have any thirteen gram at all"),
    ])
    bench = _docs(spark, [(100, BENCH_TEXT)])
    out = {r["doc_id"]: r for r in
           contamination_flags(docs, bench).collect()}
    assert out[0]["contaminated"] == 1 and out[0]["n_hits"] >= 1
    assert out[1]["contaminated"] == 0 and out[1]["n_hits"] == 0
    assert out[2]["contaminated"] == 1
    assert out[3]["contaminated"] == 0 and out[3]["n_hits"] == 0
    assert len(out) == 4  # every input doc reports, hit or not


def test_hits_count_distinct_grams(spark):
    # doc repeats the same contaminated span twice -> the shared gram
    # set is counted distinct, not per occurrence
    docs = _docs(spark, [(0, BENCH_TEXT + " filler " + BENCH_TEXT)])
    bench = _docs(spark, [(100, BENCH_TEXT)])
    [row] = contamination_flags(docs, bench).collect()
    # the 13-token benchmark has exactly 1 gram; the doc shares it
    [brow] = contamination_flags(bench, bench, id_col="doc_id").collect()
    assert brow["n_hits"] == 1
    assert row["n_hits"] == 1


def test_decontaminate_drops_and_keeps_columns(spark):
    import pyspark.sql.functions as F

    docs = _docs(spark, [
        (0, BENCH_TEXT + " extra tail of words"),
        (1, "completely unrelated text with plenty of harmless tokens"),
    ]).withColumn("lang", F.lit("en"))
    bench = _docs(spark, [(100, BENCH_TEXT)])
    kept = decontaminate(docs, bench).collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["lang"] == "en"


def test_plan_shape(spark):
    from webscraper_spark.operators.decontam import _hit_counts

    docs = _docs(spark, [(0, BENCH_TEXT)])
    bench = _docs(spark, [(100, BENCH_TEXT)])
    # assert on the PROBE join itself (not the reporting join, whose
    # tiny hits side would broadcast anyway and mask a regression)
    plan = _hit_counts(
        docs, bench, "text", "doc_id", 13, True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the benchmark side broadcasts


def test_shuffle_fallback_matches_broadcast(spark):
    """broadcast_bench=False must change only the physical join, never
    the rows."""
    docs = _docs(spark, [
        (0, BENCH_TEXT + " extra tail"),
        (1, "unrelated text " * 8),
        (2, BENCH_TEXT),
    ])
    bench = _docs(spark, [(100, BENCH_TEXT)])
    a = sorted(map(tuple, contamination_flags(docs, bench).collect()))
    b = sorted(map(tuple, contamination_flags(
        docs, bench, broadcast_bench=False).collect()))
    assert a == b


def test_tokenization_treats_vertical_tab_as_whitespace(spark):
    """The engine's \\s (Java) includes vertical tab; the oracle writes
    the class out explicitly — pin the engine side so they can't
    drift."""
    docs = _docs(spark, [(0, BENCH_TEXT.replace(" ", "\x0b", 3))])
    bench = _docs(spark, [(100, BENCH_TEXT)])
    [row] = contamination_flags(docs, bench).collect()
    assert row["contaminated"] == 1
