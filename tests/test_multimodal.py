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
    # codec seam: undecodable real-format bytes become error rows, not
    # task failures (NotImplementedError without PIL, ValueError with it)
    assert out[20]["decode_error"] in ("NotImplementedError", "ValueError")
    assert out[20]["width"] is None


def test_phash_exact_next_to_null_in_same_batch(spark):
    """Regression: a decode-error row (phash=None) in the same Arrow
    batch as decoded rows must not coerce the phash column to float64 —
    that silently rounds 64-bit hashes (>2^53) by up to 128 ulps."""
    from webscraper_spark.operators.multimodal import _phash

    rows = []
    for i in range(8):
        blob = encode_fake_image(32, 24, seed=i)
        rows.append((i, "image", bytearray(blob), 32, 24))
    rows.append((8, "image", bytearray(b"\x89PNG\r\n nope"), None, None))
    media = spark.createDataFrame(rows, schema=MEDIA).coalesce(1)
    out = {r["media_id"]: r["phash"] for r in image_features(media).collect()}
    for i in range(8):
        want = _phash(decode_image(encode_fake_image(32, 24, seed=i)))
        assert out[i] == want, f"id {i}: {out[i]} != {want}"
    assert out[8] is None


def test_image_features_webp_dimension_index(spark):
    """A WebP gets its RIFF/VP8 header parsed when pixel decode raises
    toward the PIL seam: real dimensions, decode_pending marker."""
    import pandas as pd

    from webscraper_spark.operators.multimodal import MEDIA
    from webscraper_spark.functions.webp import build_webp

    rows = [(0, "image", build_webp(640, 360, "VP8"), None, None),
            (1, "image", build_webp(320, 200, "VP8L", has_alpha=True),
             None, None),
            (2, "image", b"RIFF\x08\x00\x00\x00WEBPxx", None, None)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob",
                                    "meta_w", "meta_h"]),
        schema=MEDIA,
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    # environment-independent: the header index fires both on the no-PIL
    # NotImplementedError and on the PIL-wrapped ValueError (PIL present
    # but unable to decode the fake-payload webp)
    assert out[0]["decode_error"] == "decode_pending"
    assert (out[0]["width"], out[0]["height"]) == (640, 360)
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert out[0]["phash"] is None
    assert out[2]["decode_error"] == "ValueError"  # corrupt framing


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


def test_image_near_pairs_negative_phash_hamming_gt0(spark):
    """Regression: near-but-NOT-identical images whose phash has the sign
    bit set must still pair. The old div/% banding broke the pigeonhole
    guarantee for negative (signed) phash values — identical slices hashed
    to different band keys, so hamming-1 negative-phash pairs matched in
    NO band and were silently dropped."""
    import pandas as pd

    from webscraper_spark.operators.multimodal import (
        FAKE_MAGIC,
        MEDIA,
        _phash,
        decode_image,
        image_near_pairs,
    )

    def blob_from_bits(bits):
        # 8x8 image, pixel = 255 where bit set else 0; with a mixed
        # pattern the mean sits strictly between, so phash bits == pixels.
        px = np.where(np.array(bits, dtype=bool), 255, 0).astype(np.uint8)
        return FAKE_MAGIC + (8).to_bytes(4, "big") + (8).to_bytes(4, "big") + px.tobytes()

    base = [1, 0] * 32  # bit 0 set → phash sign bit set → negative
    near = list(base)
    near[37] = 1 - near[37]  # flip one mid bit → hamming 1
    far = [0, 1] * 32  # complement-ish: far from both
    a, b, c = blob_from_bits(base), blob_from_bits(near), blob_from_bits(far)
    assert _phash(decode_image(a)) < 0 and _phash(decode_image(b)) < 0

    media = spark.createDataFrame(
        pd.DataFrame(
            [(0, "image", a, 8, 8), (1, "image", b, 8, 8), (2, "image", c, 8, 8)],
            columns=["media_id", "kind", "blob", "meta_w", "meta_h"],
        ),
        schema=MEDIA,
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in image_near_pairs(media, max_hamming=6).collect()}
    assert pairs == {(0, 1): 1}


def test_codec_seam_with_and_without_pil(monkeypatch):
    """The seam tries PIL when importable and degrades to
    NotImplementedError when not — both paths per-item-isolated."""
    import pytest as _pytest

    from webscraper_spark.operators import multimodal as mm

    # forced no-PIL path: real format raises NotImplementedError
    monkeypatch.setattr(mm, "_PIL", None)
    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n junk")
    # fake format decodes regardless of PIL availability
    img = mm.decode_image(mm.encode_fake_image(8, 8, seed=1))
    assert img.shape == (8, 8)

    # with-PIL path (skipped in containers without PIL)
    Image = _pytest.importorskip("PIL.Image")
    import io

    import numpy as _np

    monkeypatch.setattr(mm, "_PIL", Image)
    buf = io.BytesIO()
    Image.fromarray(_np.full((4, 6), 7, dtype=_np.uint8), mode="L").save(buf, "PNG")
    out = mm.decode_image(buf.getvalue())
    assert out.shape == (4, 6) and (out == 7).all()
    with _pytest.raises(ValueError):
        mm.decode_image(b"\x89PNG corrupt")


def test_video_frame_sample_plumbing(spark):
    """Frames explode in order, re-encoded frames round-trip through the
    image codec, and sampled frames feed image_features directly."""
    import pandas as pd
    from pyspark.sql import functions as F

    from webscraper_spark.operators.multimodal import (
        decode_image,
        decode_video,
        encode_fake_video,
        image_features,
        video_frame_sample,
    )

    rows = [(i, "video", encode_fake_video(16, 8, 5, seed=i), None, None)
            for i in range(4)]
    # truncated mp4/webm → malformed-container ValueError; FLV → seam
    rows.append((4, "video", b"FLV\x01 codec-seam junk", None, None))
    rows.append((5, "video", b"\x00\x00\x00 ftypmp42", None, None))
    rows.append((6, "video", b"\x1aE\xdf\xa3webm" + b"x" * 8, None, None))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob", "meta_w", "meta_h"]),
        schema=MEDIA,
    )
    out = video_frame_sample(media, every=2).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.media_id, []).append(r)
    assert sorted(r.frame_idx for r in by_vid[0]) == [0, 2, 4]
    # sampled frame equals the decoded source frame
    src = decode_video(bytes(encode_fake_video(16, 8, 5, seed=0)))
    fr0 = next(r for r in by_vid[0] if r.frame_idx == 2)
    assert (decode_image(bytes(fr0.frame_blob)) == src[2]).all()
    assert fr0.mean_luma == round(float(src[2].mean()), 4)
    # error isolation for real containers
    assert by_vid[4][0].decode_error == "NotImplementedError"
    assert by_vid[5][0].decode_error == "ValueError"
    assert by_vid[6][0].decode_error == "ValueError"

    # frames → image pipeline: frame_blob is valid image_features input
    frames_media = video_frame_sample(media, every=2).filter(
        F.col("frame_blob").isNotNull()
    ).select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("frame_blob").alias("blob"),
        F.lit(None).cast("int").alias("meta_w"),
        F.lit(None).cast("int").alias("meta_h"),
    )
    feats = image_features(frames_media).collect()
    assert len(feats) == 12 and all(r.phash is not None for r in feats)


def test_audio_features_values(spark):
    import numpy as np
    import pandas as pd

    from webscraper_spark.operators.multimodal import (
        audio_features,
        encode_fake_audio,
    )

    from webscraper_spark.functions.flac import build_flac
    from webscraper_spark.functions.ogg import _F_BOS, _F_EOS, _page, build_ogg

    theora = _page(7, 0, 0, _F_BOS, [b"\x80theora" + b"\x00" * 30]) + _page(
        7, 1, 100, _F_EOS, [b"\x00" * 10]
    )
    rows = [(0, "audio", encode_fake_audio(1600, 16000, seed=9), None, None),
            (1, "audio", b"RIFF....WAVE", None, None),  # malformed WAV
            (2, "audio", b"OggS\x00vorbis junk", None, None),  # truncated page
            (3, "audio", b"ID3\x03mp3 junk", None, None),  # malformed mp3
            (4, "audio", build_ogg("opus", n_samples=4800), None, None),
            (5, "audio",
             build_ogg("vorbis", n_samples=22050, sample_rate=44100),
             None, None),
            (6, "audio", theora, None, None),  # valid ogg, uncovered codec
            (7, "audio", build_flac(n_samples=8000, sample_rate=16000),
             None, None),
            (8, "audio", build_flac(n_samples=0), None, None)]  # unknown total
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob", "meta_w", "meta_h"]),
        schema=MEDIA,
    )
    out = {r.media_id: r for r in audio_features(media).collect()}
    rng = np.random.default_rng(9)
    pcm = rng.integers(-(2**15), 2**15, 1600, dtype=np.int16).astype(np.float64)
    assert out[0].duration_sec == 0.1
    assert out[0].rms == round(float(np.sqrt(np.mean(pcm * pcm))), 4)
    assert out[0].zero_crossings > 0
    # WAV is a real decodable format; mp3 AND ogg are real parsed
    # containers: malformed bytes of any are a ValueError row, while a
    # VALID ogg holding an uncovered codec (Theora) routes to the
    # NotImplementedError seam
    assert out[1].decode_error == "ValueError"
    assert out[2].decode_error == "ValueError"
    assert out[3].decode_error == "ValueError"
    assert (out[4].decode_error, out[4].n_samples, out[4].sample_rate,
            out[4].duration_sec) == ("decode_pending", 4800, 48000, 0.1)
    assert (out[5].decode_error, out[5].n_samples, out[5].sample_rate,
            out[5].duration_sec) == ("decode_pending", 22050, 44100, 0.5)
    assert out[6].decode_error == "NotImplementedError"
    assert out[6].n_samples is None
    assert (out[7].decode_error, out[7].n_samples, out[7].sample_rate,
            out[7].duration_sec) == ("decode_pending", 8000, 16000, 0.5)
    # declared-unknown total: duration needs the frame walk -> seam row
    assert out[8].decode_error == "NotImplementedError"


def test_image_features_progressive_jpeg_dimension_index(spark):
    """A progressive JPEG gets its SOF2 header indexed when the decoder
    raises UnsupportedJpegError: real dimensions, decode_pending marker
    (PIL absent) — while a CORRUPT baseline JPEG stays an error row."""
    import pandas as pd

    from webscraper_spark.operators.multimodal import MEDIA, _PIL
    from webscraper_spark.functions.jpeg import build_progressive_jpeg

    rows = [(0, "image", build_progressive_jpeg(1280, 720), None, None),
            (1, "image", b"\xff\xd8\xff\xd9", None, None)]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "blob",
                                    "meta_w", "meta_h"]),
        schema=MEDIA,
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    if _PIL is None:
        assert out[0]["decode_error"] == "decode_pending"
        assert (out[0]["width"], out[0]["height"]) == (1280, 720)
        assert out[0]["phash"] is None and out[0]["mean_luma"] is None
    else:  # PIL tries the fake scan data and fails -> error row
        assert out[0]["decode_error"] == "ValueError"
    assert out[1]["decode_error"] == "ValueError"  # EOI before SOF
    assert out[1]["width"] is None
