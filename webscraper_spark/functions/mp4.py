"""ISO-BMFF (MP4) box parsing — keyframe/sample index without a codec.

Implements the container layer of ISO/IEC 14496-12 (public spec) with
the Python stdlib: walk the box tree, find the video track, and expand
the sample tables (``stts`` decode times, ``stss`` sync samples,
``stsz`` sizes, ``stsc``+``stco``/``co64`` chunk offsets) into a
keyframe index — sample number, timestamp, byte offset and size for
every sync sample. That makes ``video_frame_sample`` meaningful on real
crawl mp4s (which frames to fetch, where their bytes live) while the
pixel DECODE still raises toward the ffmpeg/pyav seam
(``operators/multimodal.decode_video``): at cluster scale the index
drives ranged reads + a C codec; nothing in this module touches pixels.

Reference analog: the blob cache of fetched artifacts the reference
stores for later processing (``Quarterly Runner/GlassDoor/
Glassdoor_Scraper_New.py:155-166``) — here the artifact is indexed, not
just stored.

Contract (C7, same as the jpeg/gif/wav codecs): every malformed input
raises ``ValueError``, never a parser-internal exception; declared
entry counts are validated against the bytes actually present before
any allocation (header-bomb guard, the ``jpeg.MAX_PIXELS`` twin).
"""

from __future__ import annotations

import struct

__all__ = ["is_mp4", "parse_mp4_index", "build_mp4"]

#: expansion guard: a hostile header may declare 2^32-1 samples; every
#: count is first validated against the payload bytes present, and the
#: expanded per-sample tables are additionally capped here
MAX_SAMPLES = 1 << 24

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def is_mp4(blob: bytes) -> bool:
    """ISO-BMFF sniff: the first box is ``ftyp`` (every mp4/mov/m4a the
    crawl will meet leads with it)."""
    return len(blob) >= 12 and blob[4:8] == b"ftyp"


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in
    buf[start:end], handling 64-bit ``largesize`` and size-0
    (extends-to-end) boxes."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        btype = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"box {btype!r} overruns its container")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _iter_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def _full(buf: bytes, s: int, e: int) -> tuple[int, int]:
    """FullBox: consume version(1)+flags(3); returns (version, body_start)."""
    if s + 4 > e:
        raise ValueError("truncated FullBox header")
    return buf[s], s + 4


def _u32s(buf: bytes, s: int, e: int, count: int, what: str) -> list[int]:
    if count > (e - s) // 4:
        raise ValueError(f"{what} declares {count} entries, bytes for {(e - s) // 4}")
    return list(struct.unpack(f">{count}I", buf[s:s + 4 * count]))


def _parse_stts(buf: bytes, s: int, e: int) -> list[tuple[int, int]]:
    _, p = _full(buf, s, e)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    if n > (e - p - 4) // 8:
        raise ValueError("stts entry count exceeds box size")
    vals = struct.unpack(f">{2 * n}I", buf[p + 4:p + 4 + 8 * n])
    return list(zip(vals[0::2], vals[1::2]))


def _parse_stss(buf: bytes, s: int, e: int) -> list[int]:
    _, p = _full(buf, s, e)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    return _u32s(buf, p + 4, e, n, "stss")


def _parse_stsz(buf: bytes, s: int, e: int) -> tuple[int, list[int]]:
    _, p = _full(buf, s, e)
    fixed, n = struct.unpack(">II", buf[p:p + 8])
    if n > MAX_SAMPLES:
        raise ValueError(f"stsz sample count {n} exceeds cap")
    if fixed:
        # fixed-size path has no per-entry bytes to validate against, so
        # bound the declared count by the file itself: n samples of
        # `fixed` bytes must fit in the blob (header-bomb guard — a
        # 300-byte file declaring 2^24 samples must not expand tables)
        if fixed * n > len(buf):
            raise ValueError(
                f"stsz declares {n}x{fixed}-byte samples, file has {len(buf)} bytes"
            )
        return n, [fixed] * n
    return n, _u32s(buf, p + 8, e, n, "stsz")


def _parse_stsc(buf: bytes, s: int, e: int) -> list[tuple[int, int]]:
    _, p = _full(buf, s, e)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    if n > (e - p - 4) // 12:
        raise ValueError("stsc entry count exceeds box size")
    out = []
    for i in range(n):
        first_chunk, per_chunk, _desc = struct.unpack(
            ">III", buf[p + 4 + 12 * i:p + 16 + 12 * i]
        )
        out.append((first_chunk, per_chunk))
    return out


def _parse_offsets(buf: bytes, s: int, e: int, wide: bool) -> list[int]:
    _, p = _full(buf, s, e)
    (n,) = struct.unpack(">I", buf[p:p + 4])
    width = 8 if wide else 4
    if n > (e - p - 4) // width:
        raise ValueError("chunk-offset entry count exceeds box size")
    fmt = ">%d%s" % (n, "Q" if wide else "I")
    return list(struct.unpack(fmt, buf[p + 4:p + 4 + width * n]))


def _tkhd_dims(buf: bytes, s: int, e: int) -> tuple[int, int]:
    ver, p = _full(buf, s, e)
    # v0: ctime/mtime/track_id/reserved/duration = 5×4; v1: 8+8+4+4+8
    p += 32 if ver == 1 else 20
    p += 8 + 2 + 2 + 2 + 2 + 36  # reserved, layer, alt_group, volume, pad, matrix
    if p + 8 > e:
        raise ValueError("truncated tkhd")
    w_fixed, h_fixed = struct.unpack(">II", buf[p:p + 8])
    return w_fixed >> 16, h_fixed >> 16  # 16.16 fixed point


def _mdhd_timescale(buf: bytes, s: int, e: int) -> int:
    ver, p = _full(buf, s, e)
    p += 16 if ver == 1 else 8  # ctime+mtime
    if p + 4 > e:
        raise ValueError("truncated mdhd")
    (ts,) = struct.unpack(">I", buf[p:p + 4])
    if ts <= 0:
        raise ValueError("mdhd timescale must be positive")
    return ts


def parse_mp4_index(blob: bytes) -> dict:
    """ISO-BMFF bytes → the video track's keyframe index.

    Returns ``{"width", "height", "timescale", "n_samples",
    "keyframes": [{"sample", "time_sec", "byte_offset", "size"}, ...]}``
    with ``sample`` 0-based. An absent ``stss`` means every sample is a
    sync sample (spec 8.6.2). Raises ``ValueError`` on anything
    malformed, including declared counts the bytes can't back."""
    try:
        return _parse_mp4_index(blob)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed mp4: {type(exc).__name__}") from exc


def _parse_mp4_index(blob: bytes) -> dict:
    if not is_mp4(blob):
        raise ValueError("not an mp4: first box is not ftyp")
    moov = _find(blob, 0, len(blob), b"moov")
    if moov is None:
        raise ValueError("mp4 missing moov box")
    for t, ts_, te_ in _iter_boxes(blob, *moov):
        if t != b"trak":
            continue
        mdia = _find(blob, ts_, te_, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(blob, *mdia, b"hdlr")
        if hdlr is None:
            continue
        _, hp = _full(blob, *hdlr)
        if blob[hp + 4:hp + 8] != b"vide":
            continue
        tkhd = _find(blob, ts_, te_, b"tkhd")
        width, height = _tkhd_dims(blob, *tkhd) if tkhd else (0, 0)
        mdhd = _find(blob, *mdia, b"mdhd")
        if mdhd is None:
            raise ValueError("video trak missing mdhd")
        timescale = _mdhd_timescale(blob, *mdhd)
        minf = _find(blob, *mdia, b"minf")
        stbl = _find(blob, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("video trak missing minf/stbl")
        return _expand_tables(blob, stbl, width, height, timescale)
    raise ValueError("mp4 has no video track")


def _expand_tables(
    blob: bytes, stbl: tuple[int, int], width: int, height: int, timescale: int
) -> dict:
    boxes = {t: (s, e) for t, s, e in _iter_boxes(blob, *stbl)}
    for req in (b"stts", b"stsz", b"stsc"):
        if req not in boxes:
            raise ValueError(f"stbl missing {req.decode()}")
    if b"stco" not in boxes and b"co64" not in boxes:
        raise ValueError("stbl missing stco/co64")

    n_samples, sizes = _parse_stsz(blob, *boxes[b"stsz"])
    stts = _parse_stts(blob, *boxes[b"stts"])
    if sum(c for c, _ in stts) != n_samples:
        raise ValueError("stts sample count disagrees with stsz")
    # cumulative decode start time per sample
    times, t = [], 0
    for count, delta in stts:
        for _ in range(count):
            times.append(t)
            t += delta

    if b"co64" in boxes:
        chunk_offsets = _parse_offsets(blob, *boxes[b"co64"], wide=True)
    else:
        chunk_offsets = _parse_offsets(blob, *boxes[b"stco"], wide=False)
    stsc = _parse_stsc(blob, *boxes[b"stsc"])
    if not stsc or stsc[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")

    # sample → byte offset: expand stsc runs across the chunk list
    offsets: list[int] = []
    n_chunks = len(chunk_offsets)
    sample = 0
    for i, (first_chunk, per_chunk) in enumerate(stsc):
        last_chunk = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        if first_chunk > last_chunk:
            raise ValueError("stsc first_chunk values must increase")
        for c in range(first_chunk, last_chunk + 1):
            pos = chunk_offsets[c - 1]
            for _ in range(per_chunk):
                if sample >= n_samples:
                    break
                offsets.append(pos)
                pos += sizes[sample]
                sample += 1
    if sample < n_samples:
        raise ValueError("chunk map covers fewer samples than stsz declares")
    # the index is a ranged-read recipe: every sample's bytes must exist
    # in this blob (catches truncated-mid-mdat faststart files and forged
    # chunk offsets at parse time, not at read time)
    blob_len = len(blob)
    for k in range(n_samples):
        if offsets[k] + sizes[k] > blob_len:
            raise ValueError(
                f"sample {k + 1} spans [{offsets[k]}, {offsets[k] + sizes[k]}) "
                f"past EOF ({blob_len})"
            )

    if b"stss" in boxes:
        sync = _parse_stss(blob, *boxes[b"stss"])
        if any(s < 1 or s > n_samples for s in sync):
            raise ValueError("stss sample number out of range")
    else:
        sync = range(1, n_samples + 1)  # spec: no stss ⇒ all sync

    keyframes = [
        {
            "sample": s - 1,
            "time_sec": round(times[s - 1] / timescale, 6),
            "byte_offset": offsets[s - 1],
            "size": sizes[s - 1],
        }
        for s in sync
    ]
    return {
        "width": width,
        "height": height,
        "timescale": timescale,
        "n_samples": n_samples,
        "keyframes": keyframes,
    }


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only — the parse twin of warc.build_warc)
# ---------------------------------------------------------------------------

_FTYP = struct.pack(">I", 24) + b"ftypisom" + struct.pack(">I", 0) + b"isomiso2"
#: mdat payload always starts here: 24-byte ftyp + 8-byte mdat header
MDAT_PAYLOAD_START = len(_FTYP) + 8


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fullbox(btype: bytes, payload: bytes, version: int = 0,
             flags: int = 0) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


def build_mp4(
    samples: list[bytes],
    sync_samples: list[int],
    timescale: int = 12288,
    delta: int = 512,
    width: int = 32,
    height: int = 24,
    use_co64: bool = False,
) -> bytes:
    """Structurally valid single-track ISO-BMFF fixture: ``ftyp`` +
    ``mdat`` (samples concatenated in one chunk at
    ``MDAT_PAYLOAD_START``) + ``moov`` with the real sample tables.
    ``sync_samples`` is 1-based per the spec. Sample bytes are caller
    fakes — the pixel layer stays behind the codec seam by design."""
    n = len(samples)
    if not n:
        raise ValueError("need at least one sample")
    if any(s < 1 or s > n for s in sync_samples):
        raise ValueError("sync sample out of range")
    mdat = _box(b"mdat", b"".join(samples))

    stts = _fullbox(b"stts", struct.pack(">III", 1, n, delta))
    stss = _fullbox(
        b"stss",
        struct.pack(">I", len(sync_samples))
        + b"".join(struct.pack(">I", s) for s in sorted(sync_samples)),
    )
    stsz = _fullbox(
        b"stsz",
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stsc = _fullbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    if use_co64:
        stco = _fullbox(b"co64", struct.pack(">IQ", 1, MDAT_PAYLOAD_START))
    else:
        stco = _fullbox(b"stco", struct.pack(">II", 1, MDAT_PAYLOAD_START))
    stsd = _fullbox(b"stsd", struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stss + stsz + stsc + stco)
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + stbl)
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\0" * 12 + b"engine\0")
    mdhd = _fullbox(
        b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale, n * delta, 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fullbox(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, n * delta)
        + b"\0" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        version=0,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fullbox(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, n * delta) + b"\0" * 80,
    )
    moov = _box(b"moov", mvhd + trak)
    return _FTYP + mdat + moov
