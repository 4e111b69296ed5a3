"""Ogg (Opus/Vorbis) page-header indexer — RFC 3533 / RFC 7845 /
Vorbis-I structures, built from the public specs. Fixtures come from
``build_ogg`` (structurally valid pages with REAL Ogg CRCs), so the
round trip exercises the same byte layout a crawler sees."""

import struct

import pytest

from webscraper_spark.functions.ogg import (
    _F_BOS,
    _F_EOS,
    _page,
    build_ogg,
    is_ogg,
    ogg_crc,
    parse_ogg_index,
)


def test_opus_round_trip():
    blob = build_ogg("opus", n_samples=96000, pre_skip=312)
    idx = parse_ogg_index(blob, check_crc=True)
    assert idx["codec"] == "opus"
    assert idx["sample_rate"] == 48000  # granule clock, not input rate
    assert idx["n_samples"] == 96000  # pre-skip already subtracted
    assert idx["duration_sec"] == 2.0
    assert idx["pre_skip"] == 312
    assert idx["channels"] == 1


def test_opus_input_rate_independent_of_granule_clock():
    blob = build_ogg("opus", n_samples=48000, sample_rate=16000)
    idx = parse_ogg_index(blob)
    assert idx["input_sample_rate"] == 16000
    assert idx["sample_rate"] == 48000
    assert idx["duration_sec"] == 1.0


def test_vorbis_round_trip():
    blob = build_ogg("vorbis", n_samples=66150, sample_rate=44100, channels=2)
    idx = parse_ogg_index(blob, check_crc=True)
    assert idx["codec"] == "vorbis"
    assert idx["sample_rate"] == 44100
    assert idx["n_samples"] == 66150
    assert idx["duration_sec"] == 1.5
    assert idx["channels"] == 2


def test_sniff():
    assert is_ogg(build_ogg("opus", n_samples=960))
    assert not is_ogg(b"RIFF1234WAVE")
    assert not is_ogg(b"Og")


def test_crc_catches_flipped_byte_when_asked():
    blob = bytearray(build_ogg("opus", n_samples=9600))
    blob[-3] ^= 0x41  # body byte of the EOS page
    with pytest.raises(ValueError, match="CRC mismatch"):
        parse_ogg_index(bytes(blob), check_crc=True)
    # default walk is O(pages) and skips CRC — structure still parses
    assert parse_ogg_index(bytes(blob))["n_samples"] == 9600


def test_uncovered_codec_routes_to_seam():
    th = _page(7, 0, 0, _F_BOS, [b"\x80theora" + b"\x00" * 30]) + _page(
        7, 1, 100, _F_EOS, [b"\x00" * 10]
    )
    with pytest.raises(NotImplementedError, match="not Opus/Vorbis"):
        parse_ogg_index(th)


def test_secondary_video_stream_skipped():
    # grouped mux: a Theora BOS first, then the Opus stream — the
    # indexer must pick the audio stream and skip the other serial
    opus = build_ogg("opus", n_samples=4800, samples_per_page=4800, serial=11)
    th_bos = _page(7, 0, 0, _F_BOS, [b"\x80theora" + b"\x00" * 30])
    th_data = _page(7, 1, 50, _F_EOS, [b"\x00" * 16])
    pages = [opus[:opus.find(b"OggS", 4)]]  # opus BOS page
    rest = opus[len(pages[0]):]
    blob = th_bos + pages[0] + th_data + rest
    idx = parse_ogg_index(blob)
    assert (idx["codec"], idx["n_samples"]) == ("opus", 4800)


def test_malformed_inputs_raise_valueerror():
    good = build_ogg("opus", n_samples=9600)
    with pytest.raises(ValueError):
        parse_ogg_index(b"not ogg at all")
    with pytest.raises(ValueError):
        parse_ogg_index(good[:40])  # truncated mid-page
    ver = bytearray(good)
    ver[4] = 1  # nonzero version
    with pytest.raises(ValueError, match="version"):
        parse_ogg_index(bytes(ver))
    flags = bytearray(good)
    flags[5] |= 0x40  # reserved header-type bit
    with pytest.raises(ValueError, match="reserved"):
        parse_ogg_index(bytes(flags))


def test_sequence_gap_rejected():
    opus = build_ogg("opus", n_samples=19200, samples_per_page=4800)
    # bump the page_seq of the final page
    last = opus.rfind(b"OggS")
    mutated = bytearray(opus)
    (seq,) = struct.unpack_from("<I", mutated, last + 18)
    struct.pack_into("<I", mutated, last + 18, seq + 1)
    with pytest.raises(ValueError, match="sequence gap"):
        parse_ogg_index(bytes(mutated))


def test_backwards_granule_rejected():
    opus = build_ogg("opus", n_samples=19200, samples_per_page=4800)
    last = opus.rfind(b"OggS")
    mutated = bytearray(opus)
    struct.pack_into("<q", mutated, last + 6, 5)  # below prior page granule
    with pytest.raises(ValueError, match="backwards"):
        parse_ogg_index(bytes(mutated))


def test_missing_eos_is_truncation():
    opus = build_ogg("opus", n_samples=9600, samples_per_page=4800)
    last = opus.rfind(b"OggS")
    mutated = bytearray(opus[:last])  # drop the EOS page entirely
    with pytest.raises(ValueError, match="missing EOS"):
        parse_ogg_index(bytes(mutated))


def test_eos_without_finishing_packet_rejected():
    opus = build_ogg("opus", n_samples=4800, samples_per_page=4800)
    last = opus.rfind(b"OggS")
    mutated = bytearray(opus)
    struct.pack_into("<q", mutated, last + 6, -1)  # EOS, nothing finishes
    with pytest.raises(ValueError, match="finishing packet"):
        parse_ogg_index(bytes(mutated))


def test_builder_rejects_nonpositive_page_size():
    with pytest.raises(ValueError, match="samples_per_page"):
        build_ogg("opus", n_samples=100, samples_per_page=0)


def test_granule_bomb_rejected():
    opus = build_ogg("opus", n_samples=4800, samples_per_page=4800)
    last = opus.rfind(b"OggS")
    mutated = bytearray(opus)
    struct.pack_into("<q", mutated, last + 6, 2**40)  # forged EOS granule
    with pytest.raises(ValueError, match="exceeds"):
        parse_ogg_index(bytes(mutated))


def test_crc_self_check():
    # RFC 3533 CRC: forward 0x04C11DB7, init 0 — spot value computed
    # independently from the bitwise definition
    def bitwise(data: bytes) -> int:
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7 if crc & 0x80000000
                       else crc << 1) & 0xFFFFFFFF
        return crc

    for probe in (b"", b"OggS", b"webscraper-spark", bytes(range(256))):
        assert ogg_crc(probe) == bitwise(probe)
