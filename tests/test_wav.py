"""WAV codec (functions/wav.py) and its wiring into audio_features."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webscraper_spark.functions.wav import decode_wav, encode_wav


def _tone(n=4000, sr=16000, f=440.0):
    t = np.arange(n) / sr
    return (np.sin(2 * np.pi * f * t) * 12000).astype(np.int16)


def test_roundtrip_16bit_mono_exact():
    x = _tone()
    got, sr = decode_wav(encode_wav(x, 16000))
    assert sr == 16000
    assert np.array_equal(got, x)  # PCM is lossless: exact


def test_stereo_mixdown():
    left = _tone(f=440.0)
    right = _tone(f=880.0)
    inter = np.empty(2 * len(left), dtype=np.int16)
    inter[0::2] = left
    inter[1::2] = right
    got, sr = decode_wav(encode_wav(inter, 16000, channels=2))
    want = np.clip(
        np.round((left.astype(np.float64) + right) / 2.0), -32768, 32767
    ).astype(np.int16)
    assert np.array_equal(got, want)


def _wav_with_fmt(audio_format, channels, sr, bits, data):
    fmt = struct.pack(
        "<HHIIHH", audio_format, channels, sr,
        sr * channels * max(1, bits // 8), channels * max(1, bits // 8), bits,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_8bit_and_float32_depths():
    x8 = np.array([0, 128, 255], dtype=np.uint8)
    got, _ = decode_wav(_wav_with_fmt(1, 1, 8000, 8, x8.tobytes()))
    assert got.tolist() == [-32768, 0, 32512]
    xf = np.array([0.0, 0.5, -1.0], dtype="<f4")
    got, _ = decode_wav(_wav_with_fmt(3, 1, 8000, 32, xf.tobytes()))
    assert got.tolist() == [0, 16384, -32767]


def test_24bit_depth():
    vals = [0, 1 << 22, -(1 << 22)]
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    got, _ = decode_wav(_wav_with_fmt(1, 1, 8000, 24, raw))
    assert got.tolist() == [0, 16384, -16384]


def test_unknown_chunks_are_skipped():
    x = _tone(100)
    blob = encode_wav(x, 8000)
    # splice a LIST chunk between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 4) + b"info"
    spliced = blob[:12] + extra + blob[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, sr = decode_wav(spliced)
    assert sr == 8000 and np.array_equal(got, x)


def test_malformed_raises_valueerror_only():
    import random

    x = _tone(500)
    blob = encode_wav(x, 8000)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(_wav_with_fmt(85, 1, 8000, 16, b"\x00\x00"))  # mp3-in-wav
    rng = random.Random(3)
    for _ in range(150):
        bad = bytearray(blob)
        bad[rng.randrange(len(bad))] = rng.randrange(256)
        try:
            decode_wav(bytes(bad))
        except ValueError:
            pass  # only permitted failure type


def test_audio_features_on_wav_blobs(spark):
    from webscraper_spark.operators.multimodal import audio_features

    tones = {i: _tone(2000 + 500 * i, 16000, 220.0 * (i + 1)) for i in range(3)}
    rows = [(i, "audio", bytearray(encode_wav(tones[i], 16000)), None, None)
            for i in range(3)]
    rows.append((9, "audio", bytearray(b"ID3\x03mp3 junk"), None, None))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, blob binary, meta_w int, meta_h int"
    )
    out = {r["media_id"]: r for r in audio_features(media).collect()}
    for i in range(3):
        r = out[i]
        assert r["decode_error"] is None
        assert r["n_samples"] == 2000 + 500 * i
        assert r["sample_rate"] == 16000
        assert r["duration_sec"] == pytest.approx((2000 + 500 * i) / 16000, abs=1e-6)
        x = tones[i].astype(np.float64)
        assert r["rms"] == pytest.approx(float(np.sqrt((x ** 2).mean())), rel=1e-6)
    # ID3 magic + garbage: the mp3 indexer rejects malformed framing
    # with a ValueError row (C7) — not the NotImplementedError seam,
    # which is reserved for well-formed files awaiting a codec
    assert out[9]["decode_error"] == "ValueError"
