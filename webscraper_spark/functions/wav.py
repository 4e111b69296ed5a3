"""Pure-Python WAV (RIFF PCM) codec for the audio decode seam.

The audio feature extractors (`operators/multimodal.audio_features`)
previously decoded only the fake fixture format — every real file
raised into an error row. WAV is the lossless interchange format real
crawl audio most often lands in, and it is fully decodable from public
knowledge (RIFF chunking + the PCM `fmt ` layout) with stdlib + numpy:
8/16/24/32-bit integer PCM and 32-bit float, mono or multi-channel
(mixed down to mono int16, which is what the cheap curation features
consume). Lossy formats (mp3/ogg/flac magic) still raise toward the
soundfile/ffmpeg seam.

The encoder exists for fixtures: PCM 16-bit little-endian, the layout
every decoder on earth accepts. Because PCM is lossless, round-trip
tests are exact — the PNG discipline, not the JPEG tolerance one.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_RIFF = b"RIFF"
WAV_WAVE = b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """int16 samples (flat, interleaved if multi-channel) → WAV bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return WAV_RIFF + struct.pack("<I", len(body)) + body


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 samples, sample_rate).

    Multi-channel input is mixed down by channel mean; 8-bit (unsigned),
    24/32-bit integer and 32-bit float PCM are rescaled to int16. Every
    malformed input raises ``ValueError`` (the C7 error-row contract)."""
    try:
        return _decode_wav(blob)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed WAV: {type(e).__name__}") from e


def _decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    if blob[:4] != WAV_RIFF or blob[8:12] != WAV_WAVE:
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    n = len(blob)
    while pos + 8 <= n:
        cid = blob[pos:pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + clen]
        if len(body) != clen:
            # a declared length past EOF is corruption, not a short read:
            # raise (C7 error-row contract) instead of silently computing
            # features over a truncated prefix
            raise ValueError(
                f"truncated {cid.decode('latin1')!r} chunk: "
                f"declared {clen}, got {len(body)} bytes"
            )
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if channels < 1 or sample_rate <= 0:
        raise ValueError("invalid WAV fmt")
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the REAL format code is the first two
        # bytes of the SubFormat GUID (fmt extension offset 24) — an
        # extensible float file must take the float path, not be
        # misread as integer PCM
        if len(fmt_body) < 26:
            raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (audio_format,) = struct.unpack("<H", fmt_body[24:26])
    if audio_format == 1:
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) * 256.0
        elif bits == 16:
            x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(
                np.float64
            )
        elif bits == 24:
            raw = np.frombuffer(data[: len(data) // 3 * 3], dtype=np.uint8)
            raw = raw.reshape(-1, 3).astype(np.int64)
            x = (raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16))
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
            x /= 256.0
        elif bits == 32:
            x = np.frombuffer(data[: len(data) // 4 * 4], dtype="<i4").astype(
                np.float64
            ) / 65536.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype="<f4").astype(
            np.float64
        ) * 32767.0
    else:
        raise ValueError(f"unsupported WAV format {audio_format}/{bits}")
    if len(x) == 0:
        raise ValueError("empty pcm")
    if channels > 1:
        x = x[: len(x) // channels * channels].reshape(-1, channels).mean(axis=1)
        if len(x) == 0:
            raise ValueError("empty pcm")
    return np.clip(np.round(x), -32768, 32767).astype(np.int16), sample_rate
