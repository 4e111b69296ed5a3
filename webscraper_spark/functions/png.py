"""Pure-Python PNG codec (stdlib only) for the multimodal decode seam.

The container has no PIL/ffmpeg, so round 2 left ``decode_image``
raising ``NotImplementedError`` for every real format. PNG is fully
decodable from public knowledge with nothing but ``zlib`` (W3C PNG spec
/ RFC 2083: chunk framing, IHDR, IDAT deflate stream, per-scanline
filters 0-4), which makes one real on-disk format work in-container —
and the decoder is environment-independent, so the same bytes decode to
the same ndarray with or without PIL present (parity with
``PIL.convert("L")`` is skip-tested when PIL exists).

Scope: 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA),
non-interlaced — the overwhelming majority of web PNGs. Everything else
raises ``ValueError``, which the feature extractors turn into per-item
error rows (C7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a PNG byte string → uint8 ndarray of shape (h, w) for
    grayscale or (h, w, channels) otherwise."""
    if blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
    if ihdr is None or not idat or not seen_iend:
        raise ValueError("incomplete PNG (missing IHDR/IDAT/IEND)")
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth}")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if w == 0 or h == 0:
        raise ValueError("empty PNG")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    cur[x] = (line[x] + _paeth(a, int(prev[x]), int(c))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def png_to_gray(blob: bytes) -> np.ndarray:
    """Decode a PNG and collapse to 8-bit grayscale with PIL's exact
    ``convert("L")`` arithmetic (ITU-R 601-2 integer form:
    ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16``), so the ndarray is
    bit-identical to the PIL path on the same bytes; alpha is ignored,
    matching PIL."""
    img = decode_png(blob)
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray+alpha
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def encode_png(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0 scanlines) for fixtures and for
    re-materializing sampled video frames as a real format. Accepts
    uint8 (h, w) grayscale or (h, w, 3|4) RGB(A)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        flat = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[img.shape[2]]
        ch = img.shape[2]
        flat = img
    else:
        raise ValueError("unsupported array shape for PNG encode")
    h, w = img.shape[0], img.shape[1]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
