"""WebP dimension index — width/height without a codec.

The image-side member of the container-index family (mp4/webm/mp3/ogg/
flac cover video+audio): the RIFF container layout and the VP8 /
VP8L / VP8X header bit layouts are public specs (RFC 6386 §9.1 for the
lossy frame header, the WebP container + lossless-bitstream specs for
the rest), so the engine can report canvas dimensions, lossless/alpha/
animation flags for every WebP a crawl fetches — the metadata an image
curation filter needs (resolution class, icon-vs-photo, animated) —
while PIXEL decode stays behind the PIL/libwebp seam
(``operators/multimodal.decode_image``). ``image_features`` uses this
to emit ``decode_error='decode_pending'`` rows with real dimensions
when the seam is closed.

Contract (C7): every malformed input raises ``ValueError`` (bad RIFF
framing, chunk overruns, missing signature bytes, a lossy frame that
is not a keyframe). Dimension fields are header arithmetic only —
nothing is allocated from declared sizes, so there is no bomb surface.
"""

from __future__ import annotations

import struct

__all__ = ["is_webp", "parse_webp_dims", "build_webp"]

RIFF_MAGIC = b"RIFF"
WEBP_FOURCC = b"WEBP"

#: VP8 (lossy) keyframe start code — RFC 6386 §9.1
_VP8_START = b"\x9d\x01\x2a"
#: VP8L (lossless) signature byte
_VP8L_SIG = 0x2F


def is_webp(blob: bytes) -> bool:
    """Sniff: RIFF container with the WEBP form type."""
    return (
        len(blob) >= 12
        and blob[:4] == RIFF_MAGIC
        and blob[8:12] == WEBP_FOURCC
    )


def _vp8_dims(payload: bytes) -> dict:
    """Lossy still: 3-byte frame tag + start code + 14-bit dims."""
    if len(payload) < 10:
        raise ValueError("truncated VP8 chunk")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 0x1:  # frame type bit: 0 = keyframe (required for a still)
        raise ValueError("VP8 still image must start with a keyframe")
    if payload[3:6] != _VP8_START:
        raise ValueError("missing VP8 keyframe start code")
    w, h = struct.unpack_from("<HH", payload, 6)
    w &= 0x3FFF
    h &= 0x3FFF
    if w == 0 or h == 0:
        # match the avif/jpeg walkers: a zero extent is corruption, not
        # an indexable dimension row
        raise ValueError("VP8 frame declares zero extent")
    return {
        "format": "VP8", "width": w, "height": h,
        "lossless": False, "has_alpha": False, "has_animation": False,
    }


def _vp8l_dims(payload: bytes) -> dict:
    """Lossless: signature byte + 14+14-bit dims, alpha bit, version."""
    if len(payload) < 5:
        raise ValueError("truncated VP8L chunk")
    if payload[0] != _VP8L_SIG:
        raise ValueError("missing VP8L signature byte")
    bits = struct.unpack_from("<I", payload, 1)[0]
    if (bits >> 29) & 0x7:
        raise ValueError("unsupported VP8L version")
    return {
        "format": "VP8L",
        "width": (bits & 0x3FFF) + 1,
        "height": ((bits >> 14) & 0x3FFF) + 1,
        "lossless": True,
        "has_alpha": bool((bits >> 28) & 0x1),
        "has_animation": False,
    }


def _vp8x_dims(payload: bytes) -> dict:
    """Extended: flags byte + 24-bit canvas width/height minus one."""
    if len(payload) < 10:
        raise ValueError("truncated VP8X chunk")
    flags = payload[0]
    if flags & 0xC1:  # reserved bits must be clear
        raise ValueError("reserved VP8X flag bits set")
    w = int.from_bytes(payload[4:7], "little") + 1
    h = int.from_bytes(payload[7:10], "little") + 1
    return {
        "format": "VP8X", "width": w, "height": h,
        "lossless": False,  # per-frame; canvas-level is unknown here
        "has_alpha": bool(flags & 0x10),
        "has_animation": bool(flags & 0x02),
    }


def parse_webp_dims(blob: bytes) -> dict:
    """WebP bytes → ``{"format", "width", "height", "lossless",
    "has_alpha", "has_animation"}``.

    Validates the RIFF framing (declared size within the blob, chunk
    bounds-checked) and reads dimensions from the FIRST chunk, which
    the container spec requires to be the image-defining one: ``VP8 ``
    lossy keyframe header, ``VP8L`` lossless signature, or ``VP8X``
    extended canvas. Raises ``ValueError`` on malformed input."""
    if not is_webp(blob):
        raise ValueError("not a webp (no RIFF/WEBP framing)")
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    if riff_size < 4 or 8 + riff_size > len(blob):
        raise ValueError(
            f"RIFF declares {riff_size} bytes, blob holds {len(blob) - 8}"
        )
    end = 8 + riff_size
    if 12 + 8 > end:
        raise ValueError("RIFF payload too short for a chunk header")
    fourcc = blob[12:16]
    clen = struct.unpack_from("<I", blob, 16)[0]
    if 20 + clen > end:
        raise ValueError(f"chunk {fourcc!r} overruns RIFF payload")
    payload = blob[20:20 + clen]
    if fourcc == b"VP8 ":
        return _vp8_dims(payload)
    if fourcc == b"VP8L":
        return _vp8l_dims(payload)
    if fourcc == b"VP8X":
        return _vp8x_dims(payload)
    raise ValueError(f"unexpected leading chunk {fourcc!r}")


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def build_webp(
    width: int,
    height: int,
    kind: str = "VP8",
    has_alpha: bool = False,
    has_animation: bool = False,
    payload_bytes: int = 48,
) -> bytes:
    """Structurally valid WebP head: RIFF/WEBP framing plus one
    image-defining chunk of the requested ``kind`` with real header
    bits over zeroed payload. Pixel data is fake — decode stays behind
    the PIL/libwebp seam."""
    if kind in ("VP8", "VP8L") and not (
        1 <= width <= 0x3FFF and 1 <= height <= 0x3FFF
    ):
        raise ValueError("VP8/VP8L dimensions must fit 14 bits")
    if kind == "VP8X" and not (
        1 <= width <= 1 << 24 and 1 <= height <= 1 << 24
    ):
        raise ValueError("VP8X dimensions must fit 24 bits")
    if kind == "VP8":
        head = (b"\x00\x00\x00" + _VP8_START
                + struct.pack("<HH", width, height))
        chunk_id = b"VP8 "
    elif kind == "VP8L":
        bits = ((width - 1) & 0x3FFF) | (((height - 1) & 0x3FFF) << 14)
        if has_alpha:
            bits |= 1 << 28
        head = bytes([_VP8L_SIG]) + struct.pack("<I", bits)
        chunk_id = b"VP8L"
    elif kind == "VP8X":
        flags = (0x10 if has_alpha else 0) | (0x02 if has_animation else 0)
        head = (bytes([flags]) + b"\x00\x00\x00"
                + (width - 1).to_bytes(3, "little")
                + (height - 1).to_bytes(3, "little"))
        chunk_id = b"VP8X"
    else:
        raise ValueError(f"unsupported fixture kind {kind!r}")
    body = head + b"\x00" * payload_bytes
    # RIFF: declared length excludes the word-alignment pad byte, the
    # parent's size includes it
    chunk = chunk_id + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        chunk += b"\x00"
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunk)) + WEBP_FOURCC + chunk
