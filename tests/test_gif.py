"""GIF codec (functions/gif.py) and its wiring into video_frame_sample.

A gray-palette GIF is LOSSLESS, so round-trips are exact (the PNG
discipline). The encoder can emit interlaced, sub-rectangle,
transparent, and disposal-tagged frames, so every compositing path in
the decoder is exercised in-container.
"""

from __future__ import annotations

import numpy as np
import pytest

from webscraper_spark.functions.gif import (
    decode_gif_frames,
    encode_gif,
)


def _frames(n=4, h=24, w=32, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w), dtype=np.uint8)


def test_roundtrip_exact():
    f = _frames()
    got = decode_gif_frames(encode_gif(f))
    assert got.shape == f.shape
    assert np.array_equal(got, f)  # gray palette: lossless


def test_roundtrip_large_frame_grows_lzw_table():
    # >4096 distinct sequences force table growth through 10/11/12-bit
    # codes and a mid-stream CLEAR reset
    f = _frames(n=2, h=64, w=96, seed=9)
    got = decode_gif_frames(encode_gif(f))
    assert np.array_equal(got, f)


def test_interlaced_roundtrip():
    f = _frames(n=2, h=37, w=23, seed=3)
    got = decode_gif_frames(encode_gif(f, interlace=True))
    assert np.array_equal(got, f)


def test_subrectangle_compositing():
    base = np.full((20, 30), 10, dtype=np.uint8)
    patch = np.full((5, 7), 200, dtype=np.uint8)
    blob = encode_gif([base, patch], rects=[(0, 0), (11, 4)])
    got = decode_gif_frames(blob)
    assert np.array_equal(got[0], base)
    want = base.copy()
    want[4:9, 11:18] = 200
    assert np.array_equal(got[1], want)


def test_transparency_preserves_underlying_pixels():
    base = _frames(n=1, h=12, w=12, seed=1)[0]
    overlay = base.copy()
    overlay[:6] = 0  # index 0 will be transparent on frame 2
    overlay[6:] = 77
    got = decode_gif_frames(encode_gif([base, overlay], transparent=0))
    assert np.array_equal(got[0], base)
    assert np.array_equal(got[1][:6], base[:6])  # transparent rows kept
    assert np.all(got[1][6:] == 77)


def test_disposal_restore_background():
    base = np.full((10, 10), 50, dtype=np.uint8)
    f2 = np.full((10, 10), 90, dtype=np.uint8)
    # disposal=2: after each frame the region resets to background (0)
    got = decode_gif_frames(encode_gif([base, f2], disposal=2))
    assert np.all(got[0] == 50)
    assert np.all(got[1] == 90)


def test_malformed_raises_valueerror_only():
    import random

    blob = encode_gif(_frames(n=2, h=16, w=16))
    with pytest.raises(ValueError):
        decode_gif_frames(b"GIF89a")  # truncated header
    with pytest.raises(ValueError):
        decode_gif_frames(b"NOTAGIF!" * 4)
    rng = random.Random(13)
    for _ in range(200):
        bad = bytearray(blob)
        bad[rng.randrange(6, len(bad))] = rng.randrange(256)
        try:
            out = decode_gif_frames(bytes(bad))
            assert out.dtype == np.uint8
        except ValueError:
            pass  # only permitted failure type
    for cut in range(6, len(blob), max(1, len(blob) // 40)):
        try:
            decode_gif_frames(blob[:cut])
        except ValueError:
            pass


def test_video_frame_sample_on_gif_blobs(spark):
    from webscraper_spark.operators.multimodal import video_frame_sample

    gifs = {i: _frames(n=4 + i, h=16, w=16, seed=i) for i in range(3)}
    rows = [(i, "video", bytearray(encode_gif(gifs[i])), None, None)
            for i in range(3)]
    rows.append((9, "video", bytearray(b"FLV\x01 codec-seam junk"), None, None))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, blob binary, meta_w int, meta_h int"
    )
    out = video_frame_sample(media, every=2).collect()
    by_media: dict = {}
    for r in out:
        by_media.setdefault(r["media_id"], []).append(r)
    for i in range(3):
        frames = sorted(by_media[i], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in frames] == list(range(0, 4 + i, 2))
        for r in frames:
            assert r["decode_error"] is None
            assert r["n_frames"] == 4 + i
            want = float(gifs[i][r["frame_idx"]].mean())
            assert r["mean_luma"] == pytest.approx(want, abs=1e-3)
    assert by_media[9][0]["decode_error"] == "NotImplementedError"
