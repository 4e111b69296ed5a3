"""Pure-Python PNG codec: hand-built fixtures, filter coverage, PIL
parity (skip when absent), and the in-container image_features path on a
REAL format."""
from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from webscraper_spark.functions.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    png_to_gray,
)
from webscraper_spark.operators.multimodal import decode_image, image_features


def _img(h, w, ch=None, seed=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch is None else (h, w, ch)
    return rng.integers(0, 256, shape, dtype=np.uint8)


# -- round trips over every supported color type -----------------------------

@pytest.mark.parametrize("ch", [None, 2, 3, 4])
def test_roundtrip(ch):
    img = _img(13, 7, ch, seed=ch or 1)
    out = decode_png(encode_png(img))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_all_filter_types_decode():
    """Hand-assemble a 3-wide grayscale PNG using every filter type
    (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) and check the unfiltered
    pixels against the spec recurrences computed by hand."""
    rows = [
        bytes([0, 10, 20, 30]),     # None    → 10 20 30
        bytes([1, 5, 5, 5]),        # Sub     → 5 10 15
        bytes([2, 1, 1, 1]),        # Up      → 6 11 16
        bytes([3, 4, 4, 4]),        # Average → 7 = 4+(0+6)//2? per spec
        bytes([4, 2, 2, 2]),        # Paeth
    ]
    raw = b"".join(rows)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    blob = (PNG_SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))
    out = decode_png(blob)
    assert out.shape == (5, 3)
    # spec recurrences (bpp=1):
    # row0 None: [10, 20, 30]
    # row1 Sub:  x + left              → [5, 10, 15]
    # row2 Up:   x + up                → [6, 11, 16]
    # row3 Avg:  x + (left+up)//2      → [7, 13, 18]
    # row4 Paeth: x + paeth(left,up,ul)→ [9, 15, 20]
    expect = np.array(
        [[10, 20, 30], [5, 10, 15], [6, 11, 16], [7, 13, 18], [9, 15, 20]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(out, expect)


def test_gray_conversion_itu601():
    img = np.zeros((1, 3, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[0, 2] = [0, 0, 255]
    g = png_to_gray(encode_png(img))
    # PIL convert("L") integer form on pure channels
    assert list(g[0]) == [
        (255 * 19595 + 0x8000) >> 16,
        (255 * 38470 + 0x8000) >> 16,
        (255 * 7471 + 0x8000) >> 16,
    ]


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nGARBAGE")
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(_img(4, 4))
    with pytest.raises(ValueError):
        decode_png(good[:-8])  # truncated: IEND lost
    # interlaced flag → unsupported, loud
    bad_ihdr = bytearray(good)
    # IHDR data starts at 8 (sig) + 8 (len+type); interlace is byte 12 of data
    bad_ihdr[8 + 8 + 12] = 1
    with pytest.raises(ValueError):
        decode_png(bytes(bad_ihdr))


def test_pil_parity_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    for ch, seed in [(None, 3), (3, 4), (4, 5)]:
        blob = encode_png(_img(9, 11, ch, seed=seed))
        with PIL.open(io.BytesIO(blob)) as im:
            pil_gray = np.asarray(im.convert("L"), dtype=np.uint8)
        np.testing.assert_array_equal(png_to_gray(blob), pil_gray)


# -- the engine seam: a REAL format now decodes in-container ------------------

def test_decode_image_handles_png():
    img = _img(16, 16, seed=9)
    out = decode_image(encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_image_features_on_real_png(spark):
    rows = [
        (1, "image", encode_png(_img(32, 24, 3, seed=1))),
        (2, "image", encode_png(_img(32, 24, seed=2))),
        (3, "image", b"\x89PNG\r\n\x1a\nbroken"),
    ]
    media = spark.createDataFrame(rows, "media_id long, kind string, blob binary")
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert out[1]["decode_error"] is None
    assert (out[1]["width"], out[1]["height"]) == (24, 32)
    assert out[2]["decode_error"] is None and out[2]["phash"] is not None
    assert out[3]["decode_error"] == "ValueError"
