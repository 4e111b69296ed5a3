"""Pure-Python GIF codec (stdlib + numpy) for the video decode seam.

Animated GIF is the one real multi-frame format fully decodable from
public knowledge with no native deps (GIF89a spec: logical screen
descriptor, color tables, LZW-compressed image data, graphic-control
extensions), and it is genuinely common in web crawl data. Decoding it
makes `operators/multimodal.video_frame_sample` real in-container:
frames composite onto the logical screen honoring sub-rectangle
renders, transparency, interlacing, and disposal methods 0-3, then
convert to 8-bit luma for the frame-sampling / image-near-dup
pipeline. True video containers (mp4/webm) still raise toward the
ffmpeg seam.

The encoder exists for fixtures: full- or sub-rectangle grayscale
frames behind a 256-entry gray palette with real LZW compression
(variable code width, CLEAR handling), optional interlacing and
transparency — so every decoder path is exercised by lossless
round-trips (the PNG discipline: GIF with a gray palette is exact).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# untrusted-header allocation caps (C7: a crafted 100-byte blob must
# raise ValueError, never drive a multi-GB allocation into MemoryError)
MAX_PIXELS = 1 << 24       # logical screen: 16.7M px
MAX_TOTAL_PIXELS = 1 << 27  # all composited frames together: 134M px

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _gray_from_palette(palette: np.ndarray, indices: np.ndarray) -> np.ndarray:
    # cast BEFORE the scalar multiplies: numpy 1.x promotes
    # `587 * uint8_array` only to int16, which overflows at 587*255
    rgb = palette[indices].astype(np.uint32)
    luma = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
    return luma.astype(np.uint8)


# --- LZW --------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF LZW: LSB-first variable-width codes → index array."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expected, dtype=np.uint8)
    n_out = 0
    table: list[bytes] = []
    code_size = 0

    def reset():
        nonlocal table, code_size
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        code_size = min_code_size + 1

    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            take = min(len(entry), expected - n_out)
            if take > 0:
                out[n_out:n_out + take] = np.frombuffer(entry[:take], np.uint8)
                n_out += take
            if n_out >= expected:
                return out
            prev = entry
            if len(table) >= (1 << code_size) and code_size < 12:
                code_size += 1
    return out[:n_out]


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for v in indices.tobytes():
        cand = buf + bytes([v])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = bytes([v])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def decode_gif_frames(blob: bytes) -> np.ndarray:
    """GIF bytes → (n_frames, h, w) uint8 luma, frames fully composited
    (sub-rectangles, transparency, interlace, disposal 0-3). Malformed
    input raises ``ValueError`` (C7 error-row contract)."""
    try:
        return _decode_gif(blob)
    except (struct.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed GIF: {type(e).__name__}") from e


def _read_subblocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(blob)
    while True:
        if pos >= n:
            raise ValueError("truncated sub-blocks")
        size = blob[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("truncated sub-block")
        chunks.append(blob[pos:pos + size])
        pos += size


def _decode_gif(blob: bytes) -> np.ndarray:
    if blob[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF: bad magic")
    w, h, packed, bg, _ = struct.unpack("<HHBBB", blob[6:13])
    if w == 0 or h == 0:
        raise ValueError("empty logical screen")
    if w * h > MAX_PIXELS:
        raise ValueError(f"logical screen {w}x{h} exceeds decoder pixel cap")
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        gct = np.frombuffer(blob[pos:pos + 3 * size], np.uint8)
        if len(gct) != 3 * size:
            raise ValueError("truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * size
    canvas = np.zeros((h, w), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = _gray_from_palette(gct, np.full((1, 1), bg, np.uint8))[0, 0]
    bg_luma = canvas[0, 0] if canvas.size else 0
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    n = len(blob)
    while pos < n:
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated extension")
            label = blob[pos]
            pos += 1
            data, pos = _read_subblocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != 0x2C:  # image descriptor
            raise ValueError(f"unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", blob[pos:pos + 9])
        pos += 9
        palette = gct
        if fpacked & 0x80:
            size = 2 << (fpacked & 0x07)
            palette = np.frombuffer(blob[pos:pos + 3 * size], np.uint8)
            if len(palette) != 3 * size:
                raise ValueError("truncated local color table")
            palette = palette.reshape(-1, 3)
            pos += 3 * size
        if palette is None:
            raise ValueError("image without any color table")
        if left + fw > w or top + fh > h:
            # bounds-check BEFORE the LZW output buffer is sized from
            # the untrusted fw*fh (also caps it at MAX_PIXELS)
            raise ValueError("frame exceeds logical screen")
        if pos >= n:
            raise ValueError("truncated image data")
        mcs = blob[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("bad LZW min code size")
        data, pos = _read_subblocks(blob, pos)
        idx = _lzw_decode(data, mcs, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("short LZW stream")
        idx = idx.reshape(fh, fw)
        if fpacked & 0x40:  # interlaced
            order = _deinterlace_rows(fh)
            out = np.empty_like(idx)
            out[order] = idx
            idx = out
        if np.any(idx >= len(palette)):
            raise ValueError("palette index out of range")
        saved = canvas.copy() if disposal == 3 else None
        luma = _gray_from_palette(palette, idx)
        region = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = luma[mask]
        else:
            region[:] = luma
        if (len(frames) + 1) * h * w > MAX_TOTAL_PIXELS:
            raise ValueError("GIF exceeds total decoded-frame cap")
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top:top + fh, left:left + fw] = bg_luma
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no frames")
    return np.stack(frames)


# --- encoder (fixtures / tests) ---------------------------------------------


def encode_gif(
    frames: "np.ndarray | list[np.ndarray]",
    rects: list[tuple[int, int]] | None = None,
    interlace: bool = False,
    transparent: int | None = None,
    disposal: int = 0,
) -> bytes:
    """Grayscale frames → animated GIF89a behind a 256-entry gray
    palette (lossless: decoded luma == input bytes).

    ``rects``: optional per-frame (left, top) offsets — frames after the
    first may be sub-rectangles of the logical screen. ``transparent``:
    palette index treated as transparent on frames 2+ (frame 1 is always
    opaque so the canvas starts defined)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    gray = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out += gray.tobytes()  # palette i -> (i, i, i)
    for k, f in enumerate(frames):
        fh, fw = f.shape
        left, top = rects[k] if rects else (0, 0)
        gce_flags = (disposal & 0x07) << 2
        tr = 0
        if transparent is not None and k > 0:
            gce_flags |= 0x01
            tr = transparent
        out += b"\x21\xf9" + bytes([4, gce_flags, 4, 0, tr, 0])
        fpacked = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, fpacked)
        idx = f
        if interlace:
            idx = f[_deinterlace_rows(fh)]
        out.append(8)  # LZW min code size
        lzw = _lzw_encode(idx.reshape(-1), 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
