"""Regression tests for the round-2 ADVICE findings (all five items)."""
from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from webscraper_spark.functions.extract import extract_fields, parse_page
from webscraper_spark.operators.linkrank import pagerank, priorities_from_rank
from webscraper_spark.operators.multimodal import (
    FAKE_AUDIO_MAGIC,
    audio_features,
    decode_audio,
    encode_fake_audio,
)
from webscraper_spark.operators.similarity import _gen_planes, sign_lsh_buckets


# -- ADVICE 1: audio sr<=0 / empty pcm must be error rows, not task death --

def _bad_sr_blob() -> bytes:
    # header claims 4 samples at sample_rate=0
    return FAKE_AUDIO_MAGIC + (4).to_bytes(4, "big") + (0).to_bytes(4, "big") + b"\x00" * 8


def _empty_pcm_blob() -> bytes:
    return FAKE_AUDIO_MAGIC + (0).to_bytes(4, "big") + (16000).to_bytes(4, "big")


def test_decode_audio_rejects_zero_sample_rate():
    with pytest.raises(ValueError):
        decode_audio(_bad_sr_blob())
    with pytest.raises(ValueError):
        decode_audio(_empty_pcm_blob())


def test_audio_features_isolates_bad_headers(spark):
    rows = [
        (1, "audio", encode_fake_audio(100, 16000, seed=7)),
        (2, "audio", _bad_sr_blob()),
        (3, "audio", _empty_pcm_blob()),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, blob binary")
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    assert out[1]["decode_error"] is None and out[1]["duration_sec"] > 0
    assert out[2]["decode_error"] == "ValueError"
    assert out[3]["decode_error"] == "ValueError"


# -- ADVICE 2: sign-LSH must fail loudly on a dim mismatch ------------------

def test_sign_lsh_dim_mismatch_raises(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception) as ei:
        sign_lsh_buckets(emb).collect()
    assert "plane dim" in str(ei.value)


def test_sign_lsh_custom_dim_planes(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -2.0, 3.0]), (2, [1.0, -2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    out = sign_lsh_buckets(emb, planes=_gen_planes(8, 3)).collect()
    assert out[0]["bucket"] == out[1]["bucket"]
    assert len(out[0]["bucket"]) == 8


# -- ADVICE 3: pagerank guards + scaled quantization + hardening ------------

def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges).count() == 0


def test_pagerank_tol_early_stop(spark):
    # a 2-cycle converges to the uniform fixed point after one iteration:
    # with tol set, later iterations must not change the result
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r_few = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=2).collect()}
    r_tol = {r["node"]: r["rank"] for r in
             pagerank(edges, n_iters=50, tol=1e-12).collect()}
    assert r_few == r_tol == {1: 0.5, 2: 0.5}


def test_pagerank_reliable_checkpoint(spark, tmp_path):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    local = {r["node"]: r["rank"] for r in pagerank(edges, n_iters=3).collect()}
    reli = {r["node"]: r["rank"] for r in pagerank(
        edges, n_iters=3, reliable_checkpoint_dir=str(tmp_path / "ckpt")
    ).collect()}
    assert local == reli
    # reliable checkpoint actually wrote RDD blocks to the chosen dir
    assert any((tmp_path / "ckpt").rglob("*"))


def test_priorities_null_safe(spark):
    ranks = spark.createDataFrame([(1, 0.5), (2, 0.0)], "node long, rank double")
    out = {r["node"]: r["priority"] for r in priorities_from_rank(ranks).collect()}
    assert out[1] == 0
    assert out[2] == 7  # zero rank → worst bucket, never NULL


# -- ADVICE 5: implicit </title> close must stop title capture --------------

def test_implicit_title_close_via_head():
    html = "<html><head><title>Real Title<meta charset='x'></head><body>BODY TEXT</body></html>"
    fields = extract_fields(html)
    assert fields["title"] == "Real Title"
    assert "BODY" not in fields["title"]


def test_implicit_title_close_at_eof():
    p = parse_page("<title>Only Title")
    assert p is not None
    assert not p._in_title  # EOF close cleared capture
    assert "".join(p.title_chunks).strip() == "Only Title"
