"""ISO-BMFF keyframe index (functions/mp4.py) — VERDICT r04 #5.

Box-parse fixtures built by the module's own builder (the
warc.build_warc pattern): the parser must recover sync-sample numbers,
timestamps, and byte offsets that point at the actual sample bytes in
the blob — index-only, no codec. Malformed input raises ValueError
(C7), including declared entry counts the bytes can't back.
"""

from __future__ import annotations

import struct

import pytest

from webscraper_spark.functions.mp4 import (
    MDAT_PAYLOAD_START,
    build_mp4,
    is_mp4,
    parse_mp4_index,
)


def _samples(sizes, fill=ord("x")):
    return [bytes([fill + i % 7]) * s for i, s in enumerate(sizes)]


def test_roundtrip_keyframe_index():
    sizes = [50, 23, 17, 61, 9, 30, 44, 12, 70, 5]
    samples = _samples(sizes)
    blob = build_mp4(samples, sync_samples=[1, 4, 8], timescale=12288, delta=512)
    assert is_mp4(blob)
    idx = parse_mp4_index(blob)
    assert idx["n_samples"] == 10
    assert idx["width"] == 32 and idx["height"] == 24
    assert idx["timescale"] == 12288
    assert [k["sample"] for k in idx["keyframes"]] == [0, 3, 7]
    # timestamps: sample s starts at s*delta/timescale
    assert [k["time_sec"] for k in idx["keyframes"]] == [
        0.0, round(3 * 512 / 12288, 6), round(7 * 512 / 12288, 6)
    ]
    # offsets point at the REAL sample bytes inside the blob
    for k in idx["keyframes"]:
        want = samples[k["sample"]]
        assert blob[k["byte_offset"]:k["byte_offset"] + k["size"]] == want
    assert idx["keyframes"][0]["byte_offset"] == MDAT_PAYLOAD_START


def test_no_stss_means_every_sample_is_sync():
    blob = build_mp4(_samples([10, 20, 30]), sync_samples=[1, 2, 3])
    # strip the stss box: rebuild without it by asking for all-sync and
    # removing the box bytes — simpler: parse a build where stss covers
    # all samples, then a surgically stss-free variant must match it
    pos = blob.find(b"stss") - 4
    (size,) = struct.unpack(">I", blob[pos:pos + 4])
    no_stss = blob[:pos] + blob[pos + size:]
    # fix the enclosing stbl/minf/mdia/trak/moov sizes
    for btype in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        bpos = no_stss.find(btype) - 4
        (bsize,) = struct.unpack(">I", no_stss[bpos:bpos + 4])
        no_stss = (
            no_stss[:bpos] + struct.pack(">I", bsize - size) + no_stss[bpos + 4:]
        )
    idx = parse_mp4_index(no_stss)
    assert [k["sample"] for k in idx["keyframes"]] == [0, 1, 2]


def test_co64_wide_offsets():
    samples = _samples([40, 8, 15])
    blob = build_mp4(samples, sync_samples=[2], use_co64=True)
    idx = parse_mp4_index(blob)
    k = idx["keyframes"][0]
    assert k["sample"] == 1
    assert blob[k["byte_offset"]:k["byte_offset"] + k["size"]] == samples[1]


def test_largesize_box_header():
    blob = build_mp4(_samples([12, 12]), sync_samples=[1])
    # rewrite the mdat header as a 64-bit largesize box; stco offsets
    # shift by 8, so patch the single chunk offset too
    mpos = blob.find(b"mdat") - 4
    (msize,) = struct.unpack(">I", blob[mpos:mpos + 4])
    wide = (
        blob[:mpos]
        + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", msize + 8)
        + blob[mpos + 8:]
    )
    spos = wide.find(b"stco") - 4
    wide = (
        wide[:spos + 16]
        + struct.pack(">I", MDAT_PAYLOAD_START + 8)
        + wide[spos + 20:]
    )
    idx = parse_mp4_index(wide)
    k = idx["keyframes"][0]
    assert wide[k["byte_offset"]:k["byte_offset"] + k["size"]] == b"x" * 12


def test_malformed_inputs_raise_valueerror():
    good = build_mp4(_samples([10, 10]), sync_samples=[1])
    with pytest.raises(ValueError):
        parse_mp4_index(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises(ValueError):
        parse_mp4_index(good[:40])  # truncated mid-mdat
    # header bomb: stsz declares 2^31 samples the bytes can't back
    pos = good.find(b"stsz") - 4
    bombed = (
        good[:pos + 16] + struct.pack(">I", 1 << 31) + good[pos + 20:]
    )
    with pytest.raises(ValueError):
        parse_mp4_index(bombed)
    # stss pointing past the sample count
    pos = good.find(b"stss") - 4
    bad_sync = good[:pos + 20] + struct.pack(">I", 99) + good[pos + 24:]
    with pytest.raises(ValueError):
        parse_mp4_index(bad_sync)


def test_fixed_size_stsz_bomb_rejected():
    # a ~300-byte file declaring 2^24 fixed-size samples must raise at
    # the header, not expand 16.7M-entry tables (review finding)
    good = build_mp4(_samples([10, 10]), sync_samples=[1])
    pos = good.find(b"stsz") - 4
    bombed = (
        good[:pos + 12]
        + struct.pack(">II", 1, 1 << 24)  # fixed=1 byte, count=2^24
        + good[pos + 20:]
    )
    with pytest.raises(ValueError, match="stsz|stts|chunk"):
        parse_mp4_index(bombed)


def test_missing_mdhd_raises_valueerror_not_typeerror():
    blob = build_mp4(_samples([10]), sync_samples=[1])
    with pytest.raises(ValueError, match="mdhd"):
        parse_mp4_index(blob.replace(b"mdhd", b"free"))


def test_sample_past_eof_rejected():
    # truncating the tail of mdat (moov intact would be the faststart
    # shape; emulate by forging a larger final sample size) must raise
    blob = build_mp4(_samples([10, 10]), sync_samples=[1])
    pos = blob.find(b"stsz") - 4
    forged = (
        blob[:pos + 20 + 4]
        + struct.pack(">I", 1 << 20)  # second sample claims 1 MiB
        + blob[pos + 28:]
    )
    with pytest.raises(ValueError, match="past EOF"):
        parse_mp4_index(forged)


def test_empty_stss_keeps_media_accounted(spark):
    from webscraper_spark.operators.multimodal import (
        DECODE_PENDING,
        video_frame_sample,
    )

    blob = build_mp4(_samples([10, 10]), sync_samples=[1])
    pos = blob.find(b"stss") - 4
    # entry_count = 0 (legal empty stss); the stale entry bytes become
    # in-box padding the parser never reads
    empty_sync = blob[:pos + 12] + struct.pack(">I", 0) + blob[pos + 16:]
    idx = parse_mp4_index(empty_sync)
    assert idx["keyframes"] == []
    media = spark.createDataFrame(
        [(7, "video", empty_sync, None, None)],
        "media_id long, kind string, blob binary, meta_w int, meta_h int",
    )
    rows = video_frame_sample(media, every=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["media_id"] == 7 and r["frame_idx"] is None
    assert r["n_frames"] == 2 and r["decode_error"] == DECODE_PENDING


def test_audio_only_mp4_has_no_video_track():
    blob = build_mp4(_samples([10]), sync_samples=[1])
    mutated = blob.replace(b"vide", b"soun")
    with pytest.raises(ValueError, match="no video track"):
        parse_mp4_index(mutated)


def test_video_frame_sample_emits_index_rows_for_mp4(spark):
    from webscraper_spark.operators.multimodal import (
        DECODE_PENDING,
        encode_fake_video,
        video_frame_sample,
    )

    sizes = [50, 23, 17, 61, 9, 30, 44, 12, 70, 5]
    mp4 = build_mp4(_samples(sizes), sync_samples=[1, 4, 8])
    fake = encode_fake_video(16, 16, 4, seed=1)
    media = spark.createDataFrame(
        [(0, "video", mp4, None, None), (1, "video", fake, None, None)],
        "media_id long, kind string, blob binary, meta_w int, meta_h int",
    )
    rows = video_frame_sample(media, every=2).collect()
    mp4_rows = sorted(
        (r for r in rows if r["media_id"] == 0), key=lambda r: r["frame_idx"]
    )
    # every 2nd keyframe of [0, 3, 7] → samples 0 and 7
    assert [r["frame_idx"] for r in mp4_rows] == [0, 7]
    assert all(r["decode_error"] == DECODE_PENDING for r in mp4_rows)
    assert all(r["frame_blob"] is None and r["mean_luma"] is None for r in mp4_rows)
    assert mp4_rows[0]["byte_offset"] == MDAT_PAYLOAD_START
    assert mp4_rows[1]["time_sec"] == round(7 * 512 / 12288, 6)
    assert all(r["n_frames"] == 10 for r in mp4_rows)
    # the fake-codec path still decodes pixels with null index columns
    fake_rows = [r for r in rows if r["media_id"] == 1]
    assert [r["frame_idx"] for r in fake_rows] == [0, 2]
    assert all(
        r["decode_error"] is None and r["byte_offset"] is None
        for r in fake_rows
    )


def test_decode_video_still_raises_for_mp4():
    from webscraper_spark.operators.multimodal import decode_video

    blob = build_mp4(_samples([10]), sync_samples=[1])
    with pytest.raises(NotImplementedError):
        decode_video(blob)
