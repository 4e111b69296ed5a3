"""Text-analysis operators on the documents table + hand oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webscraper_spark.operators.textstats import (
    bpe_ish_token_count_col,
    fingerprint_col,
    lang_id,
    quality_features,
    quality_score_col,
    token_count_col,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",)], "text: string"
    )
    got = [r["n"] for r in df.select(token_count_col("text").alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("Hello, world42 !",)], "text: string")
    # pieces: Hello , world 42 !
    got = df.select(bpe_ish_token_count_col("text").alias("n")).collect()[0]["n"]
    assert got == 5


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house that is big"),
            (2, "der hund und die katze ist nicht ein problem"),
            (3, "le chien et la chatte est une belle chose pour nous"),
            (4, "zzz qqq www"),
        ],
        "id: long, text: string",
    )
    got = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_features_and_score(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs far away "
             "into the deep green forest near the old mill today")],
        "id: long, text: string",
    )
    row = quality_features(df).withColumn("q", quality_score_col()).collect()[0]
    assert row["n_tokens"] == 23
    assert row["n_chars"] == len(row["text"])
    assert row["mean_word_len"] == pytest.approx(row["n_chars"] / 23, abs=1e-3)
    assert 0 <= row["stopword_ratio"] <= 1
    assert row["q"] in (0.0, 0.25, 0.5, 0.75, 1.0)


def test_fingerprint_identity_and_order_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "gamma beta alpha")],
        "id: long, text: string",
    )
    fp = {r["id"]: r["fp"] for r in df.select("id", fingerprint_col("text").alias("fp")).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_full_documents_pipeline(spark, docs):
    out = quality_features(lang_id(docs)).withColumn("q", quality_score_col())
    rows = out.select("doc_id", "lang", "lang_pred", "n_tokens", "q").collect()
    assert len(rows) == docs.count()
    assert all(r["n_tokens"] > 0 for r in rows)


def test_lang_id_twenty_languages_accuracy(spark):
    """Labeled fixture: one natural sentence per STOPWORDS language; the
    widened profile must identify every one (and 'und' for no-hit text)."""
    from webscraper_spark.operators.textstats import STOPWORDS, lang_id

    fixtures = {
        "en": "the cat sat on the mat and it was happy that the sun is out",
        "de": "der hund lief nicht mit der katze und das war ein problem zu lösen",
        "fr": "le chat est sur la table et les enfants jouent pour une heure",
        "es": "el perro corre por el parque y los niños juegan con la pelota para divertirse",
        "it": "il gatto dorme per ore che non sono poche con una coperta",
        "pt": "o menino foi para casa em um dia quente com uma bola não muito grande",
        "nl": "het kind speelt een spel van de buren en dat is niet op zijn plaats",
        "sv": "och sedan gick det som det ofta går när en plan är av gammal sort för oss med på vägen",
        "da": "og så gik det ikke som det skulle til sidst er de på vej",
        "fi": "ja sitten hän sanoi että se oli mutta myös kuin ennen ei mitään",
        "pl": "i wtedy nie było na to się jest do zrobienia że z tym to koniec",
        "cs": "a pak se na to je že s tím z toho do konce to není snadné",
        "ro": "și apoi de la el cu un gând o zi este pentru cei care nu știu",
        "hu": "a ház az utcán és hogy nem is egy van de el kell menni",
        "tr": "ve sonra bir gün bu ev için de da ne gibi çok güzel ama oldu",
        "id": "yang penting dan baik di sini itu dengan cara untuk tidak lupa ini dari awal akan datang",
        "sw": "na watu wa hapa ya kwamba ni kwa ajili za kazi katika siku hii kuwa la kweli",
        "vi": "và đây là của chúng ta có không được ai trong nhà cho một ngày này",
        "ca": "el noi i la noia els dies que passen de pressa per amb tothom és així",
        "et": "ja siis ta ütles et see oli aga ka nagu enne ei oma midagi",
    }
    rows = [(lang, text) for lang, text in fixtures.items()]
    rows.append(("und", "zzz qqq xxx blorp glorp"))
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r.lang: r.lang_pred for r in lang_id(df).collect()}
    wrong = {k: v for k, v in got.items() if k != v}
    assert not wrong, wrong
    assert set(STOPWORDS) <= set(fixtures)


def test_lang_id_arrow_equals_expression(spark, docs):
    """The Arrow kernel and the pure-SQL expression twin are bit-identical
    (same counting algorithm, no hash family) — including on unicode
    whitespace and the 20-language fixture corpus."""
    from webscraper_spark.operators.textstats import lang_id

    sample = docs.limit(200).select("doc_id", "text")
    a = {r.doc_id: r.lang_pred for r in lang_id(sample, impl="arrow").collect()}
    b = {r.doc_id: r.lang_pred for r in lang_id(sample, impl="expr").collect()}
    assert a == b
    odd = spark.createDataFrame(
        [(1, "the and of to a in is it that for"),  # nbsp inside
         (2, "  le la les  et de \t un une est que pour \n"),
         (3, ""), (4, None)],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.lang_pred for r in lang_id(odd, impl="arrow").collect()}
    b = {r.doc_id: r.lang_pred for r in lang_id(odd, impl="expr").collect()}
    assert a == b


def test_gopher_structural_features(spark):
    """Hand-computed goldens for the structural quality signals."""
    from webscraper_spark.operators.textstats import quality_features

    text = "- bullet one\nplain line here...\n* bullet two\nword #tag word…"
    # lines: 4; bullets: 2 (-, *); ellipsis-enders: 2 ("...", "…")
    # tokens: 12; alpha words: 10 (the bare "-" and "*" bullets have no
    # letters); longest word = "here..." = 7
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = quality_features(df).collect()[0]
    assert r.bullet_line_ratio == 0.5
    assert r.ellipsis_line_ratio == 0.5
    assert r.n_tokens == 12
    assert r.alpha_word_ratio == 0.8333
    assert r.max_word_len == 7
    # symbols: one '#', one '...', one '…' → 3/12
    assert r.symbol_word_ratio == 0.25

    empty = spark.createDataFrame([(2, " ")], "doc_id long, text string")
    r2 = quality_features(empty).collect()[0]
    assert r2.n_tokens == 0
    assert r2.alpha_word_ratio is None and r2.max_word_len is None


def test_compression_ratio_detects_repetition(spark):
    from webscraper_spark.operators.textstats import compression_ratio_udf
    from pyspark.sql import functions as F

    rows = [
        (1, "spam " * 200),                      # pure repetition
        (2, " ".join(f"tok{i * 7919 % 104729}" for i in range(200))),  # varied
        (3, None),
        (4, ""),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["ratio"] for r in d.select(
        "doc_id", compression_ratio_udf()(F.col("text")).alias("ratio")
    ).collect()}
    assert out[1] < 0.05          # boilerplate compresses away
    assert out[2] > 0.3           # varied prose does not
    assert out[3] is None and out[4] is None
