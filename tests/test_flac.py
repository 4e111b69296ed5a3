"""FLAC STREAMINFO indexer — RFC 9639 metadata-chain walk, built from
the public spec. Fixtures from ``build_flac`` (real bit-packed
STREAMINFO + real frame sync over fake payload)."""

import pytest

from webscraper_spark.functions.flac import (
    build_flac,
    is_flac,
    parse_flac_index,
)


def test_round_trip():
    blob = build_flac(n_samples=88200, sample_rate=44100, channels=2,
                      bits_per_sample=16)
    idx = parse_flac_index(blob)
    assert idx["codec"] == "flac"
    assert idx["sample_rate"] == 44100
    assert idx["channels"] == 2
    assert idx["bits_per_sample"] == 16
    assert idx["n_samples"] == 88200
    assert idx["duration_sec"] == 2.0


def test_bit_packing_edges():
    # max-width fields: 8 channels, 32-bit depth, odd rate
    idx = parse_flac_index(build_flac(
        n_samples=12345, sample_rate=96001, channels=8, bits_per_sample=32,
        extra_blocks=0,
    ))
    assert (idx["channels"], idx["bits_per_sample"], idx["sample_rate"],
            idx["n_samples"]) == (8, 32, 96001, 12345)
    assert idx["n_metadata_blocks"] == 1


def test_sniff():
    assert is_flac(build_flac())
    assert not is_flac(b"OggS")
    assert not is_flac(b"fLa")


def test_unknown_total_routes_to_seam():
    with pytest.raises(NotImplementedError, match="unknown total_samples"):
        parse_flac_index(build_flac(n_samples=0))


def test_malformed_inputs_raise_valueerror():
    good = build_flac()
    with pytest.raises(ValueError):
        parse_flac_index(b"not flac")
    with pytest.raises(ValueError):
        parse_flac_index(good[:20])  # truncated metadata block
    # first block not STREAMINFO
    mutated = bytearray(good)
    mutated[4] = (mutated[4] & 0x80) | 1  # type -> PADDING
    with pytest.raises(ValueError, match="not STREAMINFO"):
        parse_flac_index(bytes(mutated))
    # corrupt frame sync after the metadata chain
    mutated = bytearray(good)
    mutated[mutated.rfind(b"\xff\xf8")] = 0x00
    with pytest.raises(ValueError, match="frame sync"):
        parse_flac_index(bytes(mutated))
    # invalid block type 127
    mutated = bytearray(build_flac(extra_blocks=2))
    assert mutated[42] == 0x01  # first padding block's header (not last)
    mutated[42] = 127
    with pytest.raises(ValueError, match="type 127"):
        parse_flac_index(bytes(mutated))


def test_zero_rate_and_bomb_rejected():
    blob = bytearray(build_flac(n_samples=4800, sample_rate=48000))
    # zero the 20-bit sample-rate field (bits 80-99 of STREAMINFO,
    # i.e. bytes 14-16 of the block body at offset 8+10)
    info = 8  # 4 magic + 4 block header
    bits = int.from_bytes(blob[info:info + 34], "big")
    bits &= ~(0xFFFFF << (272 - 100))
    blob[info:info + 34] = bits.to_bytes(34, "big")
    with pytest.raises(ValueError, match="sample_rate 0"):
        parse_flac_index(bytes(blob))
    # a >int32 declared total is LEGAL on the wire — it routes to the
    # seam (not representable in the feature row), not to corruption
    blob = bytearray(build_flac(n_samples=4800))
    bits = int.from_bytes(blob[info:info + 34], "big")
    bits |= (2**36 - 1) << 128  # max 36-bit total
    blob[info:info + 34] = bits.to_bytes(34, "big")
    with pytest.raises(NotImplementedError, match="exceeds the int32"):
        parse_flac_index(bytes(blob))


def test_reserved_sync_bit_rejected():
    good = bytearray(build_flac())
    pos = good.rfind(b"\xff\xf8")
    good[pos + 1] = 0xFA  # reserved bit set: invalid per RFC 9639
    with pytest.raises(ValueError, match="frame sync"):
        parse_flac_index(bytes(good))
    good[pos + 1] = 0xF9  # blocking-strategy bit set: valid
    assert parse_flac_index(bytes(good))["n_samples"] == 44100


def test_builder_rejects_oversized_total():
    with pytest.raises(ValueError, match="36-bit"):
        build_flac(n_samples=2**36)


def test_duplicate_streaminfo_rejected():
    good = build_flac(extra_blocks=0)
    # splice a second STREAMINFO copy after the first, keeping last-flags
    info_block = good[4:4 + 38]
    first = bytes([info_block[0] & 0x7F]) + info_block[1:]  # clear last
    mutated = good[:4] + first + info_block + good[4 + 38:]
    with pytest.raises(ValueError, match="duplicate STREAMINFO"):
        parse_flac_index(mutated)
