"""MPEG audio (mp3) frame-header index — duration without a codec.

The audio twin of ``functions/mp4.py``: ISO/IEC 11172-3 / 13818-3
frame headers are public knowledge and stdlib-parsable, so the engine
can walk the frame sequence of an mp3 (skipping a leading ID3v2 tag and
a trailing ID3v1 'TAG' block), validate sync on every frame, and report
sample rate, frame/sample counts, duration, and whether the stream is
CBR or VBR — the metadata a curation pipeline filters on (clip length,
bandwidth class) — while the PCM DECODE still raises toward the
soundfile/ffmpeg seam (``operators/multimodal.decode_audio``).

Contract (C7): every malformed input raises ``ValueError``; counts are
walked from actual bytes, so there is no declared-count bomb surface.
"""

from __future__ import annotations

__all__ = ["is_mp3", "parse_mp3_index", "build_mp3"]

#: walk guard — bounds both runaway walks and the sample count:
#: 1.5M frames × 1152 samples = 1.73e9 < 2^31, so n_samples always fits
#: the int32 AUDIO_FEATURES column (≈ 10.8 h of audio at 26 ms/frame —
#: no single crawl blob is legitimately longer)
MAX_FRAMES = 1_500_000

# bitrate kbps tables, index 1-14 (0 = "free", 15 = invalid)
_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
# sample-rate tables by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1)
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def is_mp3(blob: bytes) -> bool:
    """Sniff: ID3v2 tag, or a raw MPEG Layer-III frame sync."""
    if len(blob) < 4:
        return False
    if blob[:3] == b"ID3":
        return True
    return _header(blob, 0) is not None


def _header(blob: bytes, pos: int) -> "dict | None":
    """Parse the 4-byte frame header at pos; None if not a valid
    Layer-III header."""
    if pos + 4 > len(blob):
        return None
    b0, b1, b2, _b3 = blob[pos:pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (b1 >> 1) & 0x03  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (b2 >> 4) & 0x0F
    sr_idx = (b2 >> 2) & 0x03
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format and reserved are not walkable
    bitrate = (_BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3)[br_idx] * 1000
    sample_rate = _RATES[version][sr_idx]
    padding = (b2 >> 1) & 0x01
    spf = 1152 if version == 3 else 576  # samples per frame, Layer III
    frame_len = spf // 8 * bitrate // sample_rate + padding
    return {
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "frame_len": frame_len,
        "spf": spf,
    }


def _skip_id3v2(blob: bytes) -> int:
    if blob[:3] != b"ID3":
        return 0
    if len(blob) < 10:
        raise ValueError("truncated ID3v2 header")
    flags = blob[5]
    size_bytes = blob[6:10]
    if any(b & 0x80 for b in size_bytes):
        raise ValueError("ID3v2 size bytes must be syncsafe")
    size = (
        (size_bytes[0] << 21) | (size_bytes[1] << 14)
        | (size_bytes[2] << 7) | size_bytes[3]
    )
    end = 10 + size
    if flags & 0x10:
        end += 10  # v2.4 footer flag: a 10-byte '3DI' footer follows
    if end > len(blob):
        raise ValueError("ID3v2 tag extends past EOF")
    return end


def parse_mp3_index(blob: bytes) -> dict:
    """mp3 bytes → ``{"sample_rate", "n_frames", "n_samples",
    "duration_sec", "bitrate_kbps", "vbr"}``.

    Walks every frame (sync re-validated per frame, lengths from the
    header math — no seeking/guessing), skipping a leading ID3v2 tag
    (v2.4 footer included) and a trailing 128-byte ID3v1 block. The
    ID3v1 trailer is only recognized where the frame walk ENDS — 'TAG'
    bytes that merely happen to sit 128 bytes from EOF inside a frame's
    payload are never misread as a trailer. ``bitrate_kbps`` is the
    first frame's rate; ``vbr`` is True when any frame differs. Raises
    ``ValueError`` on anything that is not a clean frame sequence."""
    pos = _skip_id3v2(blob)
    end = len(blob)
    sample_rate = None
    first_bitrate = 0
    n_frames = 0
    n_samples = 0
    bitrates = set()
    while pos < end:
        h = _header(blob, pos)
        if h is None:
            if end - pos == 128 and blob[pos:pos + 3] == b"TAG":
                break  # ID3v1 trailer after the last frame
            if sample_rate is None:
                raise ValueError("no MPEG Layer-III frame sync at stream start")
            raise ValueError(f"lost frame sync at byte {pos}")
        if sample_rate is None:
            sample_rate = h["sample_rate"]
            first_bitrate = h["bitrate"]
        elif h["sample_rate"] != sample_rate:
            raise ValueError("sample rate changes mid-stream")
        if pos + h["frame_len"] > end:
            raise ValueError(f"frame at byte {pos} spans past EOF")
        bitrates.add(h["bitrate"])
        n_frames += 1
        if n_frames > MAX_FRAMES:
            raise ValueError(f"more than {MAX_FRAMES} frames")
        n_samples += h["spf"]
        pos += h["frame_len"]
    if sample_rate is None:
        raise ValueError("no MPEG Layer-III frame sync at stream start")
    return {
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_sec": round(n_samples / sample_rate, 6),
        "bitrate_kbps": first_bitrate // 1000,
        "vbr": len(bitrates) > 1,
    }


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def build_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    id3v2_bytes: int = 0,
) -> bytes:
    """Structurally valid CBR MPEG-1 Layer-III stream: ``n_frames``
    frames of zeroed payload (optionally behind an ID3v2 tag of
    ``id3v2_bytes`` of padding). Frame payloads are fake — the PCM
    layer stays behind the codec seam by design."""
    try:
        br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
        sr_idx = _RATES[3].index(sample_rate)
    except ValueError as exc:
        raise ValueError("unsupported MPEG-1 bitrate/sample rate") from exc
    frame_len = 1152 // 8 * (bitrate_kbps * 1000) // sample_rate  # no padding
    hdr = bytes([
        0xFF,
        0xE0 | (3 << 3) | (1 << 1) | 1,  # MPEG1, Layer III, no CRC
        (br_idx << 4) | (sr_idx << 2),  # no padding bit
        0xC4,  # mono, no emphasis quirks
    ])
    frame = hdr + b"\x00" * (frame_len - 4)
    out = b""
    if id3v2_bytes:
        size = id3v2_bytes
        out += b"ID3\x04\x00\x00" + bytes([
            (size >> 21) & 0x7F, (size >> 14) & 0x7F,
            (size >> 7) & 0x7F, size & 0x7F,
        ]) + b"\x00" * size
    return out + frame * n_frames
