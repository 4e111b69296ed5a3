"""Multimodal plumbing: schemas, Arrow batching, stubbed codec seam."""

from __future__ import annotations

import numpy as np

from webscraper_spark.operators.multimodal import (
    MEDIA,
    decode_image,
    encode_fake_image,
    image_features,
    resize_stub,
)


def _media_df(spark, n=20):
    rows = [
        (i, "image", bytearray(encode_fake_image(32 + i, 24 + i, seed=i)), 32 + i, 24 + i)
        for i in range(n)
    ]
    rows.append((n, "image", bytearray(b"\x89PNG\r\n realpng"), None, None))  # real format → stub error
    rows.append((n + 1, "audio", bytearray(b"RIFF"), None, None))  # filtered out
    return spark.createDataFrame(rows, schema=MEDIA)


def test_fake_codec_roundtrip():
    img = decode_image(encode_fake_image(16, 8, seed=3))
    assert img.shape == (8, 16)
    assert img.dtype == np.uint8


def test_image_features(spark):
    out = {r["media_id"]: r for r in image_features(_media_df(spark)).collect()}
    assert len(out) == 21  # 20 fakes + 1 real-format error row; audio excluded
    ok = out[0]
    assert (ok["width"], ok["height"]) == (32, 24)
    assert ok["decode_error"] is None
    assert ok["phash"] is not None
    img = decode_image(encode_fake_image(32, 24, seed=0))
    assert ok["mean_luma"] == round(float(img.mean()), 4)
    # stub seam: real formats become error rows, not task failures
    assert out[20]["decode_error"] == "NotImplementedError"
    assert out[20]["width"] is None


def test_resize_stub(spark):
    out = {r["media_id"]: r for r in resize_stub(_media_df(spark), target=16).collect()}
    resized = decode_image(bytes(out[0]["blob"]))
    assert resized.shape == (16, 16)
    assert out[20]["blob"] is None  # real format → null passthrough


def test_image_near_pairs_finds_planted_duplicates(spark):
    """Planted near-identical images (same seed, same size) must pair;
    unrelated seeds must not all collapse into one bucket."""
    import pandas as pd
    from pyspark.sql import functions as F

    from webscraper_spark.operators.multimodal import (
        MEDIA,
        encode_fake_image,
        image_near_pairs,
    )

    rows = []
    for i in range(30):
        blob = encode_fake_image(24, 24, seed=i % 15)  # i and i+15 identical
        rows.append((i, "image", blob, 24, 24))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob", "meta_w", "meta_h"]),
        schema=MEDIA,
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in image_near_pairs(media, max_hamming=0).collect()}
    planted = {(i, i + 15) for i in range(15)}
    assert planted <= set(pairs)
    assert all(h == 0 for h in pairs.values())
    # identical-seed pairs only: fewer than all possible pairs matched
    assert len(pairs) < 30 * 29 // 2
