"""webm/Matroska cue index (functions/webm.py) — the EBML member of the
container-index trio. The parser must recover cue timestamps and
absolute cluster byte offsets that point at real Cluster elements in
the blob; malformed input raises ValueError (C7).
"""

from __future__ import annotations

import struct

import pytest

from webscraper_spark.functions.webm import (
    build_webm,
    is_webm,
    parse_webm_index,
)

CLUSTER_ID = b"\x1fC\xb6u"


def test_roundtrip_cue_index():
    blob = build_webm([0, 500, 1500], cluster_size=48, duration_ms=2000)
    assert is_webm(blob)
    idx = parse_webm_index(blob)
    assert idx["width"] == 320 and idx["height"] == 180
    assert idx["timescale_ns"] == 1_000_000
    assert idx["duration_sec"] == 2.0
    assert [k["time_sec"] for k in idx["keyframes"]] == [0.0, 0.5, 1.5]
    # offsets point at REAL Cluster elements inside the blob
    for k in idx["keyframes"]:
        assert blob[k["byte_offset"]:k["byte_offset"] + 4] == CLUSTER_ID


def test_no_duration_is_null_not_error():
    blob = build_webm([100], cluster_size=16)
    idx = parse_webm_index(blob)
    assert idx["duration_sec"] is None
    assert len(idx["keyframes"]) == 1


def test_audio_only_track_rejected():
    blob = build_webm([0, 400], cluster_size=16)
    # TrackType 1 (video) → 2 (audio): payload byte of the 0x83 element
    pos = blob.find(b"\x83")
    mutated = blob[:pos + 3] + b"\x02" + blob[pos + 4:]
    with pytest.raises(ValueError, match="no video track"):
        parse_webm_index(mutated)


def test_missing_cues_routes_to_codec_seam():
    # a VALID but Cues-less webm (live-muxed / MediaRecorder output) is
    # seam work, not corruption: NotImplementedError, so the error-row
    # label stays distinguishable from malformed bytes
    blob = build_webm([0], cluster_size=16)
    pos = blob.find(b"\x1cS\xbbk")  # Cues id
    # rename Cues to a Void-like unknown id of the same length
    mutated = blob[:pos] + b"\x1cS\xbbj" + blob[pos + 4:]
    with pytest.raises(NotImplementedError, match="no Cues"):
        parse_webm_index(mutated)


def test_unknown_size_cluster_does_not_swallow_cues():
    # stream-muxed layout: an unknown-size Cluster BEFORE the Cues; the
    # cluster's extent must end at the next same-level id, leaving the
    # trailing Cues discoverable (RFC 8794 unknown-size rule). The
    # baked cue offsets go stale when elements are rearranged, so this
    # asserts discovery + times only.
    blob = build_webm([0, 400], cluster_size=16)
    # move Cues after the clusters and give the first cluster an
    # unknown size (all-ones 2-byte VINT = 0x7FFF)
    cues_pos = blob.find(b"\x1cS\xbbk")
    cl_pos = blob.find(CLUSTER_ID)
    assert cues_pos < cl_pos
    cues_end = cl_pos
    cues_bytes = blob[cues_pos:cues_end]
    rest = blob[cues_end:]
    streamed = bytearray(blob[:cues_pos] + rest + cues_bytes)
    # first cluster: id(4) + size(2) — overwrite size with unknown
    new_cl = streamed.find(CLUSTER_ID)
    streamed[new_cl + 4:new_cl + 6] = b"\x7f\xff"
    idx = parse_webm_index(bytes(streamed))
    assert [k["time_sec"] for k in idx["keyframes"]] == [0.0, 0.4]


def test_unknown_size_leaf_element_rejected():
    blob = bytearray(build_webm([0], cluster_size=16))
    pos = blob.find(b"\x15I\xa9f")  # Info id
    blob[pos + 4:pos + 6] = b"\x7f\xff"  # Info with unknown size: illegal
    with pytest.raises(ValueError, match="unknown-size"):
        parse_webm_index(bytes(blob))


def test_malformed_inputs_raise_valueerror():
    good = build_webm([0, 400], cluster_size=16)
    with pytest.raises(ValueError):
        parse_webm_index(b"\x00\x00\x00\x00nonsense")
    with pytest.raises(ValueError):
        parse_webm_index(good[:30])  # truncated inside Segment
    # forge a CueClusterPosition past EOF (8-byte uint after 0xF1 id)
    pos = good.find(b"\xf1")
    forged = (
        good[:pos + 3] + struct.pack(">Q", 1 << 40)[1:] + good[pos + 10:]
    )
    with pytest.raises(ValueError, match="past EOF|overruns"):
        parse_webm_index(forged)


def test_video_frame_sample_emits_cue_rows_for_webm(spark):
    from webscraper_spark.operators.multimodal import (
        DECODE_PENDING,
        decode_video,
        video_frame_sample,
    )

    blob = build_webm([j * 400 for j in range(5)], cluster_size=40,
                      duration_ms=1600)
    media = spark.createDataFrame(
        [(0, "video", blob, None, None)],
        "media_id long, kind string, blob binary, meta_w int, meta_h int",
    )
    rows = sorted(
        video_frame_sample(media, every=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["time_sec"] for r in rows] == [0.0, 0.8, 1.6]
    assert all(
        r["decode_error"] == DECODE_PENDING and r["n_frames"] is None
        for r in rows
    )
    for r in rows:
        assert blob[r["byte_offset"]:r["byte_offset"] + 4] == CLUSTER_ID
    # pixel decode is still the seam
    with pytest.raises(NotImplementedError):
        decode_video(blob)
