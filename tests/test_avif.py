"""AVIF/HEIC dimension index: primary-item resolution, malformed
contract, and the image_features decode-pending path."""

from __future__ import annotations

import random
import struct

import pytest

from webscraper_spark.functions.avif import build_avif, is_avif, parse_avif_dims


def test_parse_primary_item_dims():
    d = parse_avif_dims(build_avif(2048, 1536))
    assert d == {"format": "avif", "width": 2048, "height": 1536, "item_id": 1}
    assert parse_avif_dims(build_avif(640, 480, brand=b"heic"))["format"] == "heic"


def test_primary_resolved_via_ipma_not_first_ispe():
    """An alpha-plane/thumbnail item's ispe listed BEFORE the primary's
    must not win: pitm → ipma → the primary's own ispe."""
    blob = build_avif(800, 600, extra_items=((2, 400, 300),), primary_last=True)
    d = parse_avif_dims(blob)
    assert (d["width"], d["height"]) == (800, 600)
    # and with the primary first, same answer
    d2 = parse_avif_dims(build_avif(800, 600, extra_items=((2, 400, 300),)))
    assert (d2["width"], d2["height"]) == (800, 600)


def test_sniff():
    assert is_avif(build_avif(8, 8))
    assert is_avif(build_avif(8, 8, brand=b"heic"))
    assert not is_avif(b"\x00\x00\x00\x18ftypmp42mp42isom" + b"\x00" * 8)
    assert not is_avif(b"RIFF\x00\x00\x00\x00WEBP")
    assert not is_avif(b"")


def test_malformed_contract():
    blob = build_avif(320, 240)
    with pytest.raises(ValueError):
        parse_avif_dims(b"not avif at all")
    # meta chopped off
    with pytest.raises(ValueError):
        parse_avif_dims(blob[:28])
    # ipma pointing past the property list
    broken = blob.replace(struct.pack(">HB", 1, 1) + bytes([1]),
                          struct.pack(">HB", 1, 1) + bytes([9]))
    with pytest.raises(ValueError):
        parse_avif_dims(broken)
    # zero extent refused
    with pytest.raises(ValueError):
        parse_avif_dims(build_avif(320, 240).replace(
            struct.pack(">II", 320, 240), struct.pack(">II", 0, 240)))
    # byte-corruption sweep: ValueError is the only permitted failure
    rng = random.Random(7)
    for _ in range(300):
        bad = bytearray(blob)
        bad[rng.randrange(len(bad))] = rng.randrange(256)
        try:
            parse_avif_dims(bytes(bad))
        except ValueError:
            pass


def test_image_features_avif_dimension_index(spark):
    import pandas as pd

    from webscraper_spark.operators.multimodal import MEDIA, image_features

    rows = [(0, "image", build_avif(2048, 1536), None, None),
            (1, "image", build_avif(640, 480, brand=b"heic"), None, None),
            (2, "image", build_avif(320, 240)[:28], None, None)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob",
                                    "meta_w", "meta_h"]),
        schema=MEDIA,
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    # environment-independent: the header index fires both on the no-PIL
    # NotImplementedError and on the PIL-wrapped ValueError
    assert out[0]["decode_error"] == "decode_pending"
    assert (out[0]["width"], out[0]["height"]) == (2048, 1536)
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert out[0]["phash"] is None
    assert out[2]["decode_error"] == "ValueError"  # truncated meta


def test_image_features_int32_overflow_ispe_is_error_row(spark):
    """Regression (review finding): an ispe forging width=2^31 must be
    a per-item ValueError row — not a task-killing unsafe cast when the
    Int32 feature column is built."""
    import pandas as pd
    import struct as _s

    from webscraper_spark.operators.multimodal import MEDIA, image_features

    good = build_avif(320, 240)
    forged = good.replace(_s.pack(">II", 320, 240),
                          _s.pack(">II", 1 << 31, 240))
    rows = [(0, "image", forged, None, None),
            (1, "image", build_avif(64, 48), None, None)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob",
                                    "meta_w", "meta_h"]),
        schema=MEDIA,
    ).coalesce(1)
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert out[0]["decode_error"] == "ValueError"
    assert out[0]["width"] is None
    assert out[1]["decode_error"] == "decode_pending"  # batch survived
    assert (out[1]["width"], out[1]["height"]) == (64, 48)
