"""FLAC STREAMINFO index — duration without a codec.

Completes the audio container family (``wav.py`` decodes PCM,
``mp3.py`` walks frame headers, ``ogg.py`` walks page granules): the
FLAC stream layout (RFC 9639, formerly the xiph.org spec) opens with a
``fLaC`` magic and a chain of metadata blocks whose first MUST be
STREAMINFO — 34 bytes of big-endian bit-packed fields holding sample
rate, channel count, bit depth and total sample count. That is the
whole curation payload (clip length, bandwidth class), parsed here
with the stdlib while PCM decode stays behind the soundfile/ffmpeg
seam (``operators/multimodal.decode_audio``).

Honesty note: unlike the mp3 walk, ``total_samples`` is DECLARED
metadata, not walked from frames. The parser therefore (a) verifies
the metadata chain is well-formed end-to-end, (b) verifies a real
FLAC frame sync immediately follows the last metadata block, and
(c) routes declared counts beyond the int32 feature-column bound to
the seam (``NotImplementedError`` — a >12 h declaration is legal on
the wire but not representable in the feature row) — and rows surface
as ``decode_error='decode_pending'``, so a lying header is caught at
decode time behind the seam, not silently trusted as features. A STREAMINFO that declares total_samples=0 ("unknown",
legal for live captures) needs a frame walk to get a duration — that
walk is seam work, so it raises ``NotImplementedError``, same split
as a Cues-less webm. All corruption raises ``ValueError`` (C7).
"""

from __future__ import annotations

__all__ = ["is_flac", "parse_flac_index", "build_flac"]

FLAC_MAGIC = b"fLaC"

#: declared-count ceiling — the int32 feature-column bound; larger
#: declarations (legal 36-bit values) route to the codec seam
MAX_SAMPLES = 2**31 - 1

_STREAMINFO = 0


def is_flac(blob: bytes) -> bool:
    """Sniff: RFC 9639 stream magic."""
    return len(blob) >= 4 and blob[:4] == FLAC_MAGIC


def parse_flac_index(blob: bytes) -> dict:
    """FLAC bytes → ``{"codec", "channels", "sample_rate",
    "bits_per_sample", "n_samples", "duration_sec", "n_metadata_blocks"}``.

    Walks the metadata-block chain (1-byte is-last/type header +
    24-bit big-endian length each), requires STREAMINFO first (type 0,
    exactly 34 bytes), and requires a valid frame-sync code
    (``0b11111111111110`` + reserved-0 bit) at the first audio byte.
    Raises ``ValueError`` on malformed input, ``NotImplementedError``
    when total_samples is declared unknown (duration needs the
    frame-walk behind the codec seam)."""
    if not is_flac(blob):
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = 4
    end = len(blob)
    info = None
    n_blocks = 0
    last = False
    while not last:
        if pos + 4 > end:
            raise ValueError(f"truncated FLAC metadata header at byte {pos}")
        hdr = blob[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        if btype == 127:
            raise ValueError("FLAC metadata block type 127 is invalid")
        length = int.from_bytes(blob[pos + 1:pos + 4], "big")
        body_start = pos + 4
        if body_start + length > end:
            raise ValueError(f"FLAC metadata block at byte {pos} past EOF")
        if n_blocks == 0:
            if btype != _STREAMINFO:
                raise ValueError("first FLAC metadata block is not STREAMINFO")
            if length != 34:
                raise ValueError(
                    f"STREAMINFO must be 34 bytes, declared {length}"
                )
            info = blob[body_start:body_start + 34]
        elif btype == _STREAMINFO:
            raise ValueError("duplicate STREAMINFO block")
        n_blocks += 1
        pos = body_start + length
    # first audio byte must carry the frame sync: 14 bits
    # 0b11111111111110, then a mandatory-zero reserved bit
    if pos + 2 > end:
        raise ValueError("FLAC stream ends before any audio frame")
    if blob[pos] != 0xFF or (blob[pos + 1] & 0xFE) != 0xF8:
        raise ValueError(f"no FLAC frame sync at byte {pos}")
    bits = int.from_bytes(info, "big")  # 272 bits, big-endian packed
    # field offsets from the top: min_block 16, max_block 16,
    # min_frame 24, max_frame 24, sample_rate 20, channels-1 3,
    # bits_per_sample-1 5, total_samples 36, md5 128
    sample_rate = (bits >> (272 - 80 - 20)) & 0xFFFFF
    channels = ((bits >> (272 - 100 - 3)) & 0x7) + 1
    bps = ((bits >> (272 - 103 - 5)) & 0x1F) + 1
    total = (bits >> 128) & 0xFFFFFFFFF
    if sample_rate == 0:
        raise ValueError("STREAMINFO declares sample_rate 0")
    if total == 0:
        raise NotImplementedError(
            "FLAC declares unknown total_samples (live capture); duration "
            "needs the frame walk behind the soundfile/ffmpeg seam"
        )
    if total > MAX_SAMPLES:
        # a >12 h declared length is valid on the wire (the 36-bit
        # field allows it) but exceeds the int32 feature column —
        # valid-but-unhandleable routes to the seam, like an
        # unknown total, not to the corruption bucket
        raise NotImplementedError(
            f"declared total_samples {total} exceeds the int32 feature "
            f"bound {MAX_SAMPLES}; route to the codec seam"
        )
    return {
        "codec": "flac",
        "channels": channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bps,
        "n_samples": total,
        "duration_sec": round(total / sample_rate, 6),
        "n_metadata_blocks": n_blocks,
    }


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def build_flac(
    n_samples: int = 44100,
    sample_rate: int = 44100,
    channels: int = 1,
    bits_per_sample: int = 16,
    extra_blocks: int = 1,
    frame_bytes: int = 64,
) -> bytes:
    """Structurally valid FLAC stream head: magic, STREAMINFO with the
    given fields, ``extra_blocks`` padding blocks, then one fake frame
    carrying a real sync code over zeroed payload. Audio payloads are
    fake — PCM stays behind the codec seam."""
    if not 1 <= channels <= 8 or not 4 <= bits_per_sample <= 32:
        raise ValueError("channels must be 1-8, bits_per_sample 4-32")
    if sample_rate <= 0 or sample_rate >= 1 << 20:
        raise ValueError("sample_rate must fit 20 bits")
    if not 0 <= n_samples < 1 << 36:
        raise ValueError("n_samples must fit the 36-bit STREAMINFO field")
    bits = 0
    for width, val in (
        (16, 4096), (16, 4096),            # min/max block size
        (24, 0), (24, 0),                  # min/max frame size (unknown)
        (20, sample_rate),
        (3, channels - 1),
        (5, bits_per_sample - 1),
        (36, n_samples),
        (128, 0),                          # md5 unset
    ):
        bits = (bits << width) | val
    info = bits.to_bytes(34, "big")
    out = FLAC_MAGIC
    blocks = [(0, info)]
    blocks += [(1, b"\x00" * 8)] * extra_blocks  # PADDING blocks
    for i, (btype, body) in enumerate(blocks):
        hdr = btype | (0x80 if i == len(blocks) - 1 else 0)
        out += bytes([hdr]) + len(body).to_bytes(3, "big") + body
    # fake frame: sync 0xFFF8 (fixed-blocksize, reserved bit 0)
    out += b"\xff\xf8" + b"\x00" * max(0, frame_bytes - 2)
    return out
