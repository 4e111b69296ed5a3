"""AVIF/HEIC dimension index — width/height without a codec.

Completes the image-side container-index family (webp covers RIFF,
``jpeg.parse_jpeg_dims`` covers JFIF marker streams): AVIF and HEIC are
ISO-BMFF (ISO/IEC 14496-12) image collections — an ``ftyp`` brand, a
``meta`` box holding the primary-item pointer (``pitm``), the property
container (``iprp``/``ipco``) and the item→property association table
(``ipma``). The spatial extents of the PRIMARY item live in its
associated ``ispe`` property (ISO/IEC 23008-12 §6.5.3), so canvas
dimensions are pure header arithmetic — no AV1/HEVC decoder needed.
``multimodal.image_features`` uses this for ``decode_pending`` rows
with real dimensions ahead of the libavif/libheif seam.

Box-walking primitives are shared with the mp4 keyframe indexer
(``functions/mp4.py`` — same ISO-BMFF spec, same bounds rules).

Contract (C7): every malformed input raises ``ValueError``; dimension
fields are header arithmetic only, nothing is allocated from declared
sizes.
"""

from __future__ import annotations

import struct

from .mp4 import _box, _find, _full, _fullbox, _iter_boxes

__all__ = ["is_avif", "parse_avif_dims", "build_avif"]

#: ftyp brands that mark an ISO-BMFF *image* (not a video): AV1 image
#: file (avif), AV1 image sequence (avis), HEVC image (heic/heix), and
#: the generic image-collection brands (mif1/msf1).
_IMAGE_BRANDS = {b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"}


def _brands(blob: bytes) -> set[bytes]:
    """Major + compatible brands of the leading ftyp box (empty set if
    the blob does not start with a well-formed ftyp)."""
    if len(blob) < 16 or blob[4:8] != b"ftyp":
        return set()
    (size,) = struct.unpack(">I", blob[:4])
    if size < 16 or size > len(blob):
        return set()
    out = {blob[8:12]}
    for off in range(16, size, 4):  # skip minor_version at 12:16
        out.add(blob[off:off + 4])
    return out


def is_avif(blob: bytes) -> bool:
    """Sniff: ISO-BMFF ftyp whose brands include an image brand."""
    return bool(_brands(blob) & _IMAGE_BRANDS)


def _parse_pitm(blob: bytes, s: int, e: int) -> int:
    ver, p = _full(blob, s, e)
    need = 4 if ver >= 1 else 2
    if p + need > e:
        raise ValueError("truncated pitm")
    return int.from_bytes(blob[p:p + need], "big")


def _parse_ipma(blob: bytes, s: int, e: int) -> dict[int, list[int]]:
    """item_id → 1-based ipco property indices (essential bit dropped)."""
    ver, p = _full(blob, s, e)
    flags = int.from_bytes(blob[s + 1:s + 4], "big")
    if p + 4 > e:
        raise ValueError("truncated ipma")
    (n,) = struct.unpack(">I", blob[p:p + 4])
    p += 4
    out: dict[int, list[int]] = {}
    for _ in range(n):
        id_len = 4 if ver >= 1 else 2
        if p + id_len + 1 > e:
            raise ValueError("ipma entry overruns box")
        item_id = int.from_bytes(blob[p:p + id_len], "big")
        p += id_len
        assoc_n = blob[p]
        p += 1
        props = []
        for _ in range(assoc_n):
            if flags & 1:
                if p + 2 > e:
                    raise ValueError("ipma association overruns box")
                (v,) = struct.unpack(">H", blob[p:p + 2])
                props.append(v & 0x7FFF)
                p += 2
            else:
                if p + 1 > e:
                    raise ValueError("ipma association overruns box")
                props.append(blob[p] & 0x7F)
                p += 1
        out[item_id] = props
    return out


def parse_avif_dims(blob: bytes) -> dict:
    """AVIF/HEIC bytes → ``{"format", "width", "height", "item_id"}``.

    Resolves the PRIMARY item (``pitm``) through the item→property
    association table (``ipma``) to ITS ``ispe`` spatial-extents
    property — not just the first ``ispe`` in the file, which may
    belong to an alpha plane or a thumbnail item. Raises ``ValueError``
    on malformed input or when the primary item has no associated
    ``ispe``."""
    brands = _brands(blob)
    if not brands & _IMAGE_BRANDS:
        raise ValueError("not an ISO-BMFF image (no avif/heic brand)")
    fmt = "avif" if brands & {b"avif", b"avis"} else "heic"
    meta = _find(blob, 0, len(blob), b"meta")
    if meta is None:
        raise ValueError("image file missing meta box")
    _, body = _full(blob, *meta)  # meta is a FullBox, unlike moov
    pitm = _find(blob, body, meta[1], b"pitm")
    if pitm is None:
        raise ValueError("meta missing pitm (no primary item)")
    primary = _parse_pitm(blob, *pitm)
    iprp = _find(blob, body, meta[1], b"iprp")
    if iprp is None:
        raise ValueError("meta missing iprp")
    ipco = _find(blob, *iprp, b"ipco")
    ipma = _find(blob, *iprp, b"ipma")
    if ipco is None or ipma is None:
        raise ValueError("iprp missing ipco/ipma")
    props = list(_iter_boxes(blob, *ipco))  # 1-based index order
    assoc = _parse_ipma(blob, *ipma)
    if primary not in assoc:
        raise ValueError(f"primary item {primary} has no ipma entry")
    for idx in assoc[primary]:
        if not 1 <= idx <= len(props):
            raise ValueError(f"ipma references property {idx} of {len(props)}")
        t, s, e = props[idx - 1]
        if t == b"ispe":
            _, p = _full(blob, s, e)
            if p + 8 > e:
                raise ValueError("truncated ispe")
            w, h = struct.unpack(">II", blob[p:p + 8])
            if w == 0 or h == 0:
                raise ValueError("ispe declares zero extent")
            if w > 0x7FFFFFFF or h > 0x7FFFFFFF:
                # ispe extents are u32 but the feature schema's
                # width/height are int32 — an overflowing forge must be
                # a per-item ValueError row, not a task-killing cast
                # error downstream
                raise ValueError(f"implausible ispe extent {w}x{h}")
            return {"format": fmt, "width": w, "height": h,
                    "item_id": primary}
    raise ValueError("primary item has no ispe property")


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def build_avif(
    width: int,
    height: int,
    brand: bytes = b"avif",
    extra_items: tuple[tuple[int, int, int], ...] = (),
    primary_last: bool = False,
) -> bytes:
    """Structurally valid AVIF/HEIC head: ftyp + meta{hdlr, pitm,
    iprp{ipco{ispe...}, ipma}} over a fake mdat. ``extra_items`` adds
    (item_id, width, height) non-primary items each with its own ispe —
    the alpha-plane/thumbnail shape that makes first-ispe-wins parsers
    wrong; ``primary_last`` additionally places the primary item's ispe
    AFTER the extras in ipco. Pixel payload is fake — decode stays
    behind the libavif/libheif seam."""
    ftyp = _box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand + b"mif1")
    hdlr = _fullbox(b"hdlr", b"\x00" * 4 + b"pict" + b"\x00" * 12 + b"\x00")
    pitm = _fullbox(b"pitm", struct.pack(">H", 1))
    # (item_id, w, h) in ipco order; ipma index = position + 1
    items = [(1, width, height)] + list(extra_items)
    if primary_last:
        items = list(extra_items) + [(1, width, height)]
    ispes = [_fullbox(b"ispe", struct.pack(">II", w, h))
             for _, w, h in items]
    ipco = _box(b"ipco", b"".join(ispes))
    entries = [struct.pack(">HB", item_id, 1) + bytes([pos + 1])
               for pos, (item_id, _, _) in enumerate(items)]
    ipma = _fullbox(b"ipma", struct.pack(">I", len(entries)) + b"".join(entries))
    iprp = _box(b"iprp", ipco + ipma)
    meta = _fullbox(b"meta", hdlr + pitm + iprp)
    mdat = _box(b"mdat", b"\x00" * 32)
    return ftyp + meta + mdat
