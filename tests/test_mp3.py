"""MPEG-audio frame-header index (functions/mp3.py) — the audio twin of
the mp4 container index: duration/sample-rate metadata from a validated
frame walk, decode still behind the soundfile/ffmpeg seam. Malformed
input raises ValueError (C7).
"""

from __future__ import annotations

import pytest

from webscraper_spark.functions.mp3 import build_mp3, is_mp3, parse_mp3_index


def test_cbr_walk_counts_frames_and_duration():
    blob = build_mp3(n_frames=57, bitrate_kbps=128, sample_rate=44100)
    assert is_mp3(blob)
    idx = parse_mp3_index(blob)
    assert idx["n_frames"] == 57
    assert idx["n_samples"] == 57 * 1152
    assert idx["sample_rate"] == 44100
    assert idx["duration_sec"] == round(57 * 1152 / 44100, 6)
    assert idx["bitrate_kbps"] == 128 and idx["vbr"] is False


def test_id3v2_tag_skipped_and_id3v1_trailer_ignored():
    blob = build_mp3(n_frames=10, id3v2_bytes=200)
    assert blob[:3] == b"ID3" and is_mp3(blob)
    idx = parse_mp3_index(blob)
    assert idx["n_frames"] == 10
    trailer = blob + b"TAG" + b"\x00" * 125  # ID3v1: 128 bytes
    assert parse_mp3_index(trailer)["n_frames"] == 10


def test_vbr_detected_across_bitrate_change():
    a = build_mp3(n_frames=5, bitrate_kbps=128)
    b = build_mp3(n_frames=5, bitrate_kbps=192)
    idx = parse_mp3_index(a + b)
    assert idx["n_frames"] == 10 and idx["vbr"] is True


def test_mpeg2_frame_math():
    # 22050 Hz is an MPEG-2 rate: 576 samples/frame, V2 bitrate table
    blob = bytes([0xFF, 0xE0 | (2 << 3) | (1 << 1) | 1,
                  (4 << 4) | (0 << 2), 0xC4])
    # V2 idx 4 = 32 kbps @ 22050: frame_len = 576//8*32000//22050 = 104
    blob = blob + b"\x00" * (104 - 4)
    idx = parse_mp3_index(blob)
    assert idx["sample_rate"] == 22050
    assert idx["n_samples"] == 576 and idx["bitrate_kbps"] == 32


def test_id3v24_footer_flag_skipped():
    frames = build_mp3(n_frames=4)
    size = 30
    tag = (
        b"ID3\x04\x00\x10"  # v2.4, footer flag set
        + bytes([0, 0, (size >> 7) & 0x7F, size & 0x7F])
        + b"\x00" * size
        + b"3DI\x04\x00\x10" + bytes([0, 0, (size >> 7) & 0x7F, size & 0x7F])
    )
    idx = parse_mp3_index(tag + frames)
    assert idx["n_frames"] == 4


def test_tag_bytes_inside_final_frame_are_not_a_trailer():
    # 'TAG' sitting exactly 128 bytes from EOF INSIDE a frame payload
    # must not truncate the stream (the trailer is only recognized
    # where the frame walk ends)
    blob = bytearray(build_mp3(n_frames=3))  # 3 × 417-byte frames
    pos = len(blob) - 128
    assert blob[pos] == 0  # inside the last frame's zero payload
    blob[pos:pos + 3] = b"TAG"
    idx = parse_mp3_index(bytes(blob))
    assert idx["n_frames"] == 3 and idx["n_samples"] == 3 * 1152


def test_sample_count_always_fits_int32():
    # MAX_FRAMES is the int32 guard for the AUDIO_FEATURES n_samples
    # column: the largest walkable stream stays under 2^31 samples
    from webscraper_spark.functions.mp3 import MAX_FRAMES

    assert MAX_FRAMES * 1152 < 2**31


def test_malformed_inputs_raise():
    good = build_mp3(n_frames=3)
    with pytest.raises(ValueError, match="past EOF|lost frame sync"):
        parse_mp3_index(good[:-10])  # truncated final frame
    with pytest.raises(ValueError, match="lost frame sync"):
        parse_mp3_index(good + b"garbage!")  # trailing junk mid-walk
    with pytest.raises(ValueError, match="syncsafe|ID3v2"):
        parse_mp3_index(b"ID3\x04\x00\x00\xff\xff\xff\xff" + good)
    with pytest.raises(ValueError, match="extends past EOF"):
        parse_mp3_index(b"ID3\x04\x00\x00\x00\x00\x7f\x00junk")
    with pytest.raises(ValueError, match="no MPEG"):
        parse_mp3_index(b"OggS\x00not an mp3 at all")
    assert not is_mp3(b"OggS\x00junk")


def test_audio_features_emits_index_row_for_mp3(spark):
    from webscraper_spark.operators.multimodal import (
        DECODE_PENDING,
        audio_features,
        decode_audio,
        encode_fake_audio,
    )

    mp3 = build_mp3(n_frames=57, bitrate_kbps=128, sample_rate=44100,
                    id3v2_bytes=64)
    fake = encode_fake_audio(4000, 16000, seed=2)
    media = spark.createDataFrame(
        [(0, "audio", mp3, None, None), (1, "audio", fake, None, None),
         (2, "audio", b"OggS\x00vorbis junk", None, None)],
        "media_id long, kind string, blob binary, meta_w int, meta_h int",
    )
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    r0 = rows[0]
    assert r0["decode_error"] == DECODE_PENDING
    assert r0["n_samples"] == 57 * 1152 and r0["sample_rate"] == 44100
    assert r0["duration_sec"] == round(57 * 1152 / 44100, 6)
    assert r0["rms"] is None and r0["zero_crossings"] is None
    assert rows[1]["decode_error"] is None and rows[1]["rms"] is not None
    # OggS magic + garbage: the ogg indexer rejects malformed framing
    # with a ValueError row (C7) — not the NotImplementedError seam,
    # which is reserved for well-formed files awaiting a codec
    assert rows[2]["decode_error"] == "ValueError"
    # PCM decode is still the seam
    with pytest.raises(NotImplementedError):
        decode_audio(mp3)
