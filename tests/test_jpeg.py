"""Baseline JPEG codec tests (functions/jpeg.py) and its wiring into the
multimodal decode seam.

JPEG is lossy, so unlike the PNG decoder's bit-identical parity these
are tolerance tests: the in-container ground truth is the encoder twin
(same public T.81 math), and the PIL parity test (skipped where PIL is
absent) bounds the decoder against libjpeg within a few luma levels.
"""

from __future__ import annotations

import numpy as np
import pytest

from webscraper_spark.functions.jpeg import (
    ZIGZAG,
    _C,
    decode_jpeg_gray,
    encode_jpeg,
)

try:
    from PIL import Image

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _smooth(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return (128 + 100 * np.sin(xx / 10.0 + seed) * np.cos(yy / 12.0)).astype(
        np.uint8
    )


def test_zigzag_is_the_standard_order():
    # spot-check the generated order against the published sequence
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [47, 55, 62, 63]
    assert sorted(ZIGZAG) == list(range(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_C @ _C.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("quality,tol_max,tol_mean", [(95, 3, 1.0), (75, 8, 2.0)])
def test_gray_roundtrip(quality, tol_max, tol_mean):
    img = _smooth(48, 64)
    dec = decode_jpeg_gray(encode_jpeg(img, quality=quality))
    diff = np.abs(dec.astype(int) - img.astype(int))
    assert dec.shape == img.shape
    assert diff.max() <= tol_max
    assert diff.mean() <= tol_mean


def test_flat_image_is_near_exact():
    img = np.full((32, 32), 137, dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg(img, quality=90))
    assert np.abs(dec.astype(int) - 137).max() <= 1


@pytest.mark.parametrize("sub", ["444", "420"])
def test_color_roundtrip_luma(sub):
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [
            (128 + 90 * np.sin(xx / 9.0)).astype(np.uint8),
            (128 + 90 * np.cos(yy / 11.0)).astype(np.uint8),
            (((xx + yy) // 2) % 256).astype(np.uint8),
        ],
        axis=-1,
    )
    y_true = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    dec = decode_jpeg_gray(encode_jpeg(rgb, quality=92, subsampling=sub))
    assert dec.shape == (h, w)
    assert np.abs(dec - y_true).max() <= 4


def test_odd_dimensions_crop():
    img = _smooth(21, 13, seed=2)
    dec = decode_jpeg_gray(encode_jpeg(img, quality=90))
    assert dec.shape == (21, 13)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers():
    img = _smooth(40, 56, seed=1)
    with_rst = encode_jpeg(img, quality=88, restart_interval=2)
    without = encode_jpeg(img, quality=88)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    a = decode_jpeg_gray(with_rst)
    b = decode_jpeg_gray(without)
    # restart intervals change framing, not pixels
    assert np.array_equal(a, b)


def test_color_420_restart():
    rgb = np.stack([_smooth(33, 50, s) for s in range(3)], axis=-1)
    dec = decode_jpeg_gray(
        encode_jpeg(rgb, quality=85, subsampling="420", restart_interval=3)
    )
    assert dec.shape == (33, 50)


def test_corrupt_and_unsupported_raise_valueerror():
    img = _smooth(16, 16)
    blob = encode_jpeg(img, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob[: len(blob) // 2])  # truncated
    # forge a progressive SOF2 marker: must refuse, not misdecode
    assert b"\xff\xc0" in blob
    with pytest.raises(ValueError):
        decode_jpeg_gray(blob.replace(b"\xff\xc0", b"\xff\xc2", 1))


def test_tiny_images():
    for h, w in ((1, 1), (4, 4), (3, 9), (8, 8)):
        img = _smooth(h, w, seed=h * 31 + w)
        dec = decode_jpeg_gray(encode_jpeg(img, quality=95))
        assert dec.shape == (h, w)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_fuzz_roundtrip_and_malformed_contract():
    """Property sweep: (a) arbitrary-dimension smooth images round-trip
    within lossy bounds; (b) random single-byte corruptions of valid
    JPEGs either decode or raise ValueError — NEVER a parser-internal
    exception (the C7 error-row contract)."""
    rng = np.random.default_rng(7)
    for trial in range(12):
        h = int(rng.integers(9, 41))
        w = int(rng.integers(9, 41))
        yy, xx = np.mgrid[0:h, 0:w]
        img = (
            128
            + 70 * np.sin(xx / (3 + trial % 5) + trial)
            + 40 * np.cos(yy / (2 + trial % 7))
        ).clip(0, 255).astype(np.uint8)
        blob = encode_jpeg(img, quality=95)
        dec = decode_jpeg_gray(blob)
        assert dec.shape == (h, w)
        diff = np.abs(dec.astype(int) - img.astype(int))
        assert diff.max() <= 24 and diff.mean() <= 3.0
        # corruption sweep over the same blob
        for _ in range(20):
            pos = int(rng.integers(2, len(blob)))
            bad = bytearray(blob)
            bad[pos] = int(rng.integers(0, 256))
            try:
                out = decode_jpeg_gray(bytes(bad))
                assert out.dtype == np.uint8
            except ValueError:
                pass  # the only permitted failure type


def test_header_bomb_dimensions_refused():
    import struct

    from webscraper_spark.functions.jpeg import MAX_PIXELS

    img = _smooth(16, 16)
    blob = encode_jpeg(img, quality=90)
    sof = blob.index(b"\xff\xc0")
    # forge 65535x65535 dims: must refuse BEFORE allocating planes
    huge = (blob[:sof + 5] + struct.pack(">HH", 65535, 65535)
            + blob[sof + 9:])
    with pytest.raises(ValueError, match="pixel cap"):
        decode_jpeg_gray(huge)
    assert 65535 * 65535 > MAX_PIXELS
    # forge component count 255: per-component planes would multiply
    # the pixel cap away
    bad_nc = blob[:sof + 9] + bytes([255]) + blob[sof + 10:]
    with pytest.raises(ValueError):
        decode_jpeg_gray(bad_nc)


def test_truncation_contract():
    img = _smooth(24, 24)
    blob = encode_jpeg(img, quality=90)
    for cut in range(2, len(blob), max(1, len(blob) // 40)):
        try:
            decode_jpeg_gray(blob[:cut])
        except ValueError:
            pass


@pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed in container")
def test_pil_parity_both_directions(tmp_path):
    import io

    img = _smooth(40, 48, seed=3)
    # our encoder → PIL decoder
    with Image.open(io.BytesIO(encode_jpeg(img, quality=92))) as im:
        pil_dec = np.asarray(im.convert("L"), dtype=np.uint8)
    assert np.abs(pil_dec.astype(int) - img.astype(int)).max() <= 6
    # PIL encoder → our decoder
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=92)
    ours = decode_jpeg_gray(buf.getvalue())
    assert np.abs(ours.astype(int) - img.astype(int)).max() <= 6


def test_image_features_on_jpeg_blobs(spark):
    """The seam contract: JPEG blobs flow through image_features as real
    decodes (no decode_error), with features matching the source pixels
    within lossy tolerance."""
    from webscraper_spark.operators.multimodal import image_features

    imgs = {i: _smooth(24, 24, seed=i) for i in range(4)}
    rows = [(i, "image", bytearray(encode_jpeg(imgs[i], quality=92)), 24, 24)
            for i in range(4)]
    rows.append((9, "image", bytearray(b"\xff\xd8\xff corrupt"), 24, 24))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, blob binary, meta_w int, meta_h int"
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    for i in range(4):
        r = out[i]
        assert r["decode_error"] is None
        assert (r["width"], r["height"]) == (24, 24)
        assert abs(r["mean_luma"] - float(imgs[i].mean())) <= 2.0
    assert out[9]["decode_error"] == "ValueError"


# --- dimension index (parse_jpeg_dims) -------------------------------------

def test_parse_dims_progressive_fixture():
    from webscraper_spark.functions.jpeg import (
        UnsupportedJpegError,
        build_progressive_jpeg,
        parse_jpeg_dims,
    )

    blob = build_progressive_jpeg(1280, 720)
    d = parse_jpeg_dims(blob)
    assert (d["width"], d["height"]) == (1280, 720)
    assert d["coding"] == "progressive" and d["progressive"]
    assert d["n_components"] == 1 and d["precision"] == 8
    # the decoder refuses the same bytes with the SEAM exception type
    with pytest.raises(UnsupportedJpegError):
        decode_jpeg_gray(blob)


def test_parse_dims_baseline_and_forged_sof():
    from webscraper_spark.functions.jpeg import parse_jpeg_dims

    img = _smooth(24, 16)  # w=24? _smooth(h, w) — assert from result
    blob = encode_jpeg(img, quality=85)
    d = parse_jpeg_dims(blob)
    assert (d["height"], d["width"]) == img.shape
    assert d["coding"] == "baseline" and not d["progressive"]
    # a forged SOF2 still indexes (that is the point): same dims
    d2 = parse_jpeg_dims(blob.replace(b"\xff\xc0", b"\xff\xc2", 1))
    assert (d2["width"], d2["height"]) == (d["width"], d["height"])
    assert d2["progressive"]


def test_parse_dims_malformed_contract():
    from webscraper_spark.functions.jpeg import (
        build_progressive_jpeg,
        parse_jpeg_dims,
    )

    blob = build_progressive_jpeg(64, 48)
    with pytest.raises(ValueError):
        parse_jpeg_dims(b"\x00\x00")  # bad SOI
    with pytest.raises(ValueError):
        parse_jpeg_dims(b"\xff\xd8\xff\xd9")  # EOI before SOF
    sof = blob.index(b"\xff\xc2")
    with pytest.raises(ValueError):
        parse_jpeg_dims(blob[:sof + 4])  # truncated inside SOF
    # DNL-deferred height (h=0) refused
    import struct as _s
    forged = bytearray(blob)
    _s.pack_into(">H", forged, sof + 5, 0)
    with pytest.raises(ValueError):
        parse_jpeg_dims(bytes(forged))
    # every fuzzed prefix obeys the ValueError-only contract
    for cut in range(2, len(blob), 7):
        try:
            parse_jpeg_dims(blob[:cut])
        except ValueError:
            pass
    # fill bytes running to EOF must be ValueError, not IndexError
    with pytest.raises(ValueError):
        parse_jpeg_dims(b"\xff\xd8" + b"\xff" * 4)
    # bare-RST prefix desyncs the walk into a trailing 0xFF run: still
    # the ValueError-only contract (this shape escaped into the Spark
    # task as IndexError before the wrapper)
    with pytest.raises(ValueError):
        parse_jpeg_dims(b"\xff\xd8\xff\xd0\xff\xe0" + b"\xff" * 64)
