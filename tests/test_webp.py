"""WebP dimension parser — RIFF framing + VP8/VP8L/VP8X header bits,
built from the public container and RFC 6386 specs."""

import struct

import pytest

from webscraper_spark.functions.webp import (
    build_webp,
    is_webp,
    parse_webp_dims,
)


def test_vp8_lossy_dims():
    d = parse_webp_dims(build_webp(640, 480, "VP8"))
    assert (d["format"], d["width"], d["height"]) == ("VP8", 640, 480)
    assert not d["lossless"] and not d["has_animation"]


def test_vp8l_lossless_dims_and_alpha():
    d = parse_webp_dims(build_webp(16383, 1, "VP8L", has_alpha=True))
    assert (d["format"], d["width"], d["height"]) == ("VP8L", 16383, 1)
    assert d["lossless"] and d["has_alpha"]


def test_vp8x_canvas_and_flags():
    d = parse_webp_dims(
        build_webp(20000, 1080, "VP8X", has_alpha=True, has_animation=True)
    )
    assert (d["format"], d["width"], d["height"]) == ("VP8X", 20000, 1080)
    assert d["has_alpha"] and d["has_animation"]


def test_sniff():
    assert is_webp(build_webp(8, 8))
    assert not is_webp(b"RIFF\x04\x00\x00\x00WAVE")
    assert not is_webp(b"RIFF")


def test_malformed_inputs_raise_valueerror():
    good = build_webp(64, 64, "VP8")
    with pytest.raises(ValueError):
        parse_webp_dims(b"GIF89a not riff")
    # RIFF size overruns the blob
    big = bytearray(good)
    struct.pack_into("<I", big, 4, len(good))  # declares 8 bytes too many
    with pytest.raises(ValueError, match="RIFF declares"):
        parse_webp_dims(bytes(big))
    # chunk overruns the RIFF payload
    over = bytearray(good)
    struct.pack_into("<I", over, 16, 10_000)
    with pytest.raises(ValueError, match="overruns"):
        parse_webp_dims(bytes(over))
    # interframe where a keyframe is required
    inter = bytearray(good)
    inter[20] |= 0x01  # frame-type bit of the VP8 tag
    with pytest.raises(ValueError, match="keyframe"):
        parse_webp_dims(bytes(inter))
    # forged zero dims: corruption, not an indexable 0x0 row (matches
    # the avif/jpeg walkers' zero-extent refusal)
    zeroed = bytearray(good)
    struct.pack_into("<HH", zeroed, 26, 0x4000, 0x4000)  # 14-bit dims = 0
    with pytest.raises(ValueError, match="zero extent"):
        parse_webp_dims(bytes(zeroed))
    # broken start code
    sc = bytearray(good)
    sc[23] = 0x00
    with pytest.raises(ValueError, match="start code"):
        parse_webp_dims(bytes(sc))
    # unexpected leading chunk
    alien = bytearray(good)
    alien[12:16] = b"EXIF"
    with pytest.raises(ValueError, match="unexpected leading"):
        parse_webp_dims(bytes(alien))
    # bad VP8L signature / reserved VP8X flags
    l = bytearray(build_webp(32, 32, "VP8L"))
    l[20] = 0x30
    with pytest.raises(ValueError, match="VP8L signature"):
        parse_webp_dims(bytes(l))
    x = bytearray(build_webp(32, 32, "VP8X"))
    x[20] |= 0x80
    with pytest.raises(ValueError, match="reserved VP8X"):
        parse_webp_dims(bytes(x))


def test_builder_rejects_out_of_range_dims():
    with pytest.raises(ValueError, match="14 bits"):
        build_webp(0x4000, 10, "VP8")
    with pytest.raises(ValueError, match="24 bits"):
        build_webp((1 << 24) + 1, 10, "VP8X")
