"""Pure-Python baseline JPEG codec (stdlib + numpy) for the multimodal
decode seam.

The container has no PIL/libjpeg, so real crawl images in the dominant
web format could previously only raise. Baseline sequential JPEG
(ITU-T T.81 / ISO 10918-1) is decodable from public knowledge with no
dependencies: marker segments, DQT/DHT tables, canonical Huffman codes,
zigzag dequantization, 8x8 inverse DCT, YCbCr planes with 4:4:4 / 4:2:2
/ 4:2:0 subsampling, and restart markers. That covers the overwhelming
majority of web JPEGs (progressive SOF2 raises ``ValueError`` and falls
through to the PIL seam when importable).

``decode_jpeg_gray`` returns the luma (Y) plane directly — the input
every downstream feature extractor (mean luma, pHash) wants.  PIL's
``convert("L")`` round-trips through RGB, so parity with PIL is
approximate (±2 levels; also libjpeg's fixed-point IDCT vs this float
IDCT is ±1): the parity test is tolerance-based, unlike the lossless
PNG decoder's bit-identical one.

The encoder exists for fixtures and tests (the reference caches fetched
artifacts, Quarterly Runner/Glassdoor/Glassdoor_Scraper_New.py:155-166;
the engine needs deterministic in-container JPEG bytes to prove the
decode path). It writes baseline JFIF with the Annex K quantization and
Huffman tables, quality-scaled the way libjpeg scales them, optional
4:2:0 subsampling and restart intervals — so the decoder's interleave,
upsampling, and RST paths are all exercised in-container.

Decode cost is pure Python per block — the same budget class as the
HTML parse kernel; at 100 TB the seam swaps to a C-backed codec, and
these tests become its parity harness (same slot-in contract as
``WS_SPARK_HTML_KERNEL``).
"""

from __future__ import annotations

import math
import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# untrusted-header allocation cap: 16.7M pixels (float64 working plane
# ≈ 134 MB) — far above real web images, far below a memory-bomb header
MAX_PIXELS = 1 << 24


class UnsupportedJpegError(ValueError):
    """A well-formed JPEG using a coding process this decoder does not
    implement (progressive, arithmetic, lossless, non-interleaved
    multi-scan). Distinct from plain ``ValueError`` (malformed bytes) so
    feature extractors can emit a ``decode_pending`` dimension-index row
    (the header is still parseable via :func:`parse_jpeg_dims`) instead
    of an error row — a codec-seam limitation is not a corrupt input."""


#: SOFn marker id → coding-process name (T.81 table B.1). C4/C8/CC are
#: DHT/JPG/DAC, not frame headers.
_SOF_CODING = {
    0xC0: "baseline", 0xC1: "extended sequential", 0xC2: "progressive",
    0xC3: "lossless", 0xC5: "differential sequential",
    0xC6: "differential progressive", 0xC7: "differential lossless",
    0xC9: "extended sequential arithmetic", 0xCA: "progressive arithmetic",
    0xCB: "lossless arithmetic", 0xCD: "differential sequential arithmetic",
    0xCE: "differential progressive arithmetic",
    0xCF: "differential lossless arithmetic",
}

# --- shared tables ----------------------------------------------------------


def _zigzag() -> list[int]:
    """Natural (raster) index of each zigzag position, generated rather
    than transcribed."""
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else \
            range(max(0, s - 7), min(s, 7) + 1)
        for r in rng:
            order.append(r * 8 + (s - r))
    return order


ZIGZAG = _zigzag()

# Annex K base quantization tables (luminance, chrominance), raster order
_QT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K typical Huffman tables: (bits[1..16], symbols)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

for _bits, _vals in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
    assert sum(_bits) == len(_vals), "corrupt built-in Huffman table"


def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(symbol, code, length) triples for a canonical JPEG Huffman table."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("corrupt Huffman table")
            out.append((vals[k], code, length))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict:
    return {(ln, code): sym for sym, code, ln in _canonical_codes(bits, vals)}


def _encode_table(bits: list[int], vals: list[int]) -> dict:
    return {sym: (code, ln) for sym, code, ln in _canonical_codes(bits, vals)}


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        a = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * a * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return c


_C = _dct_matrix()


def _scaled_qt(base: list[int], quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling (public: jcparam.c semantics)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(t, 1, 255)


# --- decoder ----------------------------------------------------------------


class _Bits:
    """Entropy-coded-segment bit reader with 0xFF00 de-stuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy segment")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("marker inside entropy segment")
            self.cur = b
            self.n = 8
        self.n -= 1
        return (self.cur >> self.n) & 1

    def receive_extend(self, size: int) -> int:
        if size == 0:
            return 0
        v = 0
        for _ in range(size):
            v = (v << 1) | self.bit()
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def align_restart(self, m: int) -> None:
        """Byte-align and consume the expected RSTm marker."""
        self.n = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("missing restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != 0xD0 + m:
            raise ValueError("bad restart marker")
        self.pos += 2


def _decode_block(bits: _Bits, dc_tab: dict, ac_tab: dict,
                  qt: np.ndarray, pred: int) -> tuple[np.ndarray, int]:
    coeffs = np.zeros(64, dtype=np.float64)
    t = bits.huff(dc_tab)
    diff = bits.receive_extend(t)
    dc = pred + diff
    coeffs[0] = dc * qt[0]
    k = 1
    while k < 64:
        rs = bits.huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overflow")
        coeffs[ZIGZAG[k]] = bits.receive_extend(s) * qt[k]
        k += 1
    # coeffs is already in natural (raster) order — ZIGZAG mapped above
    block = _C.T @ coeffs.reshape(8, 8) @ _C
    return block, dc


def decode_jpeg_gray(blob: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 luma plane of shape (h, w).

    Contract: every malformed input raises ``ValueError`` (the C7
    per-item error-row type), never a parser-internal exception."""
    try:
        return _decode_jpeg_gray(blob)
    except (struct.error, IndexError, StopIteration, KeyError) as e:
        raise ValueError(f"malformed JPEG: {type(e).__name__}") from e


def parse_jpeg_dims(blob: bytes) -> dict:
    """JPEG header walk → ``{"width", "height", "n_components",
    "precision", "coding", "progressive"}`` from the first SOFn marker —
    NO entropy decode, O(header bytes).

    This is the image-side dimension index for coding processes behind
    the codec seam (progressive/arithmetic/lossless): dimensions,
    component count and coding process come straight from the frame
    header, so resolution-class curation filters run without a decoder.
    Raises ``ValueError`` on malformed bytes (bad SOI, truncated
    segments, DNL-deferred height, no SOF before EOI/EOF) — like
    ``decode_jpeg_gray``, stray indexing/unpack errors on hostile
    input are wrapped so the contract stays ValueError-only (C7)."""
    try:
        return _parse_jpeg_dims(blob)
    except (IndexError, struct.error) as e:
        raise ValueError(f"malformed JPEG header: {type(e).__name__}") from e


def _parse_jpeg_dims(blob: bytes) -> dict:
    if blob[:2] != JPEG_SOI:
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2 fill bytes, as in the decoder's segment loop
        while pos + 1 < n and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:  # fill bytes ran to EOF
            raise ValueError("truncated marker")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any frame header
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: bare
            continue
        if pos + 2 > n:
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack(">H", blob[pos:pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated segment")
        if marker in _SOF_CODING:
            if seglen < 8 or pos + 8 > n:
                raise ValueError("truncated SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", blob[pos + 2:pos + 8])
            if h == 0:
                raise ValueError("frame height deferred to DNL")
            if w == 0 or not 1 <= nc <= 4:
                raise ValueError("implausible frame header")
            return {
                "width": w, "height": h, "n_components": nc,
                "precision": prec, "coding": _SOF_CODING[marker],
                "progressive": marker in (0xC2, 0xC6, 0xCA, 0xCE),
            }
        if marker == 0xDA:  # SOS without a frame header first
            raise ValueError("SOS before SOF")
        pos += seglen
    raise ValueError("no SOF marker in JPEG header")


def _decode_jpeg_gray(blob: bytes) -> np.ndarray:
    if blob[:2] != JPEG_SOI:
        raise ValueError("not a JPEG: bad SOI")
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    dri = 0
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ValueError("expected marker")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip padding so the id is the first non-FF byte
        while pos + 1 < n and blob[pos + 1] == 0xFF:
            pos += 1
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", blob[pos:pos + 2])
        seg = blob[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    zz = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                else:
                    zz = np.frombuffer(seg[i:i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                qts[tq] = zz
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                nv = sum(counts)
                vals = list(seg[i + 17:i + 17 + nv])
                huff[(tc, th)] = _decode_table(counts, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline & ext. sequential
            _, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if h * w > MAX_PIXELS:
                # header dims are untrusted crawl input: refuse before
                # allocating plane buffers (C7: ValueError row, never a
                # MemoryError task failure)
                raise ValueError(f"frame {w}x{h} exceeds decoder pixel cap")
            if not 1 <= nc <= 4:
                # per-COMPONENT planes multiply the allocation: a forged
                # nc=255 header would turn the pixel cap into 255 planes
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                f"non-baseline JPEG ({_SOF_CODING[marker]})"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for si in range(ns):
                cid, tt = seg[1 + 2 * si:3 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0x0F))
            if ns != len(frame["comps"]):
                raise UnsupportedJpegError("non-interleaved multi-scan unsupported")
            return _decode_scan(blob, pos + seglen, frame, scan, qts, huff, dri)
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no scan data")


def _decode_scan(data, pos, frame, scan, qts, huff, dri) -> np.ndarray:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    if w == 0 or h == 0:
        raise ValueError("empty frame")
    if len(scan) == 1:
        # T.81 A.2.2: a non-interleaved scan's MCU is ONE data unit —
        # the component's frame sampling factors do not apply
        comps = [dict(scan[0][0], h=1, v=1)]
        scan = [(comps[0], scan[0][1], scan[0][2])]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("unsupported sampling factor")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
    bits = _Bits(data, pos)
    preds = {c["id"]: 0 for c in comps}
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_no = my * mcux + mx
            if dri and mcu_no and mcu_no % dri == 0:
                bits.align_restart(rst)
                rst = (rst + 1) % 8
                preds = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                qt = qts.get(comp["tq"])
                dc_tab = huff.get((0, td))
                ac_tab = huff.get((1, ta))
                if qt is None or dc_tab is None or ac_tab is None:
                    raise ValueError("missing table")
                for bv in range(comp["v"]):
                    for bh in range(comp["h"]):
                        block, dc = _decode_block(
                            bits, dc_tab, ac_tab, qt, preds[comp["id"]]
                        )
                        preds[comp["id"]] = dc
                        y0 = (my * comp["v"] + bv) * 8
                        x0 = (mx * comp["h"] + bh) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = block
    # luma is the first frame component; upsample not needed for Y when
    # Y carries the max sampling factors (always true in practice)
    yc = comps[0]
    plane = planes[yc["id"]]
    plane = np.repeat(np.repeat(plane, vmax // yc["v"], axis=0),
                      hmax // yc["h"], axis=1)
    out = np.clip(np.round(plane[:h, :w] + 128.0), 0, 255).astype(np.uint8)
    return out


# --- encoder (fixtures / tests) ---------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1 bits


def _magnitude(v: int) -> tuple[int, int]:
    """(size, bits) for a DC diff / AC value."""
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(bw: _BitWriter, block: np.ndarray, qt_zz: np.ndarray,
                  dc_tab: dict, ac_tab: dict, pred: int) -> int:
    f = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    zz = np.round(f.reshape(64)[ZIGZAG] / qt_zz).astype(np.int64)
    dc = int(zz[0])
    size, mag = _magnitude(dc - pred)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    bw.write(mag, size)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, mag = _magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(mag, size)
        run = 0
    if last < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_to(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mult_y - h % mult_y) % mult_y
    pw = (mult_x - w % mult_x) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "444", restart_interval: int = 0) -> bytes:
    """Encode uint8 gray (h, w) or RGB (h, w, 3) as baseline JFIF."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    # permute the raster-order Annex K tables into zigzag order ONCE:
    # both the per-block division and the DQT payload are zigzag-indexed
    # per T.81, so the effective quantizer matrix is exactly Annex K
    zz = np.array(ZIGZAG)
    qt_l = _scaled_qt(_QT_LUMA, quality)[zz]
    qt_c = _scaled_qt(_QT_CHROMA, quality)[zz]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            cb2 = _pad_to(cb, 2, 2)
            cr2 = _pad_to(cr, 2, 2)
            cb = (cb2[0::2, 0::2] + cb2[0::2, 1::2]
                  + cb2[1::2, 0::2] + cb2[1::2, 1::2]) / 4.0
            cr = (cr2[0::2, 0::2] + cr2[0::2, 1::2]
                  + cr2[1::2, 0::2] + cr2[1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its full MCU grid
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        target_h, target_w = mcuy * sv * 8, mcux * sh * 8
        p = _pad_to(p, 8, 8)
        ph, pw = p.shape
        p = np.pad(p, ((0, target_h - ph), (0, target_w - pw)), mode="edge") \
            if (ph < target_h or pw < target_w) else p[:target_h, :target_w]
        padded.append(p)

    out = bytearray(JPEG_SOI)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT
    for tq, qt in ((0, qt_l),) if gray else ((0, qt_l), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in qt)
    # SOF0
    nc = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        tq = 0 if ci == 0 else 1
        out += bytes([ci + 1, (sh << 4) | sv, tq])
    # DHT
    tabs = [((0, 0), _DC_LUMA), ((1, 0), _AC_LUMA)]
    if not gray:
        tabs += [((0, 1), _DC_CHROMA), ((1, 1), _AC_CHROMA)]
    for (tc, th), (bits, vals) in tabs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        td_ta = 0 if ci == 0 else 0x11
        out += bytes([ci + 1, td_ta])
    out += b"\x00\x3f\x00"
    # entropy-coded data
    enc_dc = [_encode_table(*_DC_LUMA), _encode_table(*_DC_CHROMA)]
    enc_ac = [_encode_table(*_AC_LUMA), _encode_table(*_AC_CHROMA)]
    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_no = my * mcux + mx
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                ti = 0 if ci == 0 else 1
                qt = qt_l if ci == 0 else qt_c
                for bv in range(sv):
                    for bh in range(sh):
                        y0 = (my * sv + bv) * 8
                        x0 = (mx * sh + bh) * 8
                        preds[ci] = _encode_block(
                            bw, padded[ci][y0:y0 + 8, x0:x0 + 8],
                            qt.astype(np.float64), enc_dc[ti], enc_ac[ti],
                            preds[ci],
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def build_progressive_jpeg(width: int, height: int) -> bytes:
    """Fixture builder (tests/goldens only): a structurally valid
    PROGRESSIVE JPEG head — SOI, JFIF APP0, DQT, SOF2 frame header with
    the requested dimensions, DHT, first-scan SOS over fake entropy
    bytes, EOI. ``parse_jpeg_dims`` reads real dimensions from it;
    ``decode_jpeg_gray`` raises :class:`UnsupportedJpegError` at the
    SOF2 marker (the codec-seam behavior the fixture exists to pin).
    Scan data is fake — a real progressive decoder would reject it."""
    if not (1 <= width <= 0xFFFF and 1 <= height <= 0xFFFF):
        raise ValueError("JPEG dimensions must fit 16 bits")
    zz = _zigzag()
    qt = bytes(int(_QT_LUMA[i]) for i in zz)
    out = bytearray(JPEG_SOI)
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qt
    # SOF2: progressive DCT, 8-bit precision, one component
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes([1, 0x11, 0])
    bits, vals = _DC_LUMA
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
        + b"\x00" + bytes(bits) + bytes(vals)
    # first scan: DC, successive approximation Ah=0 Al=1
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00]) \
        + bytes([0, 0, 0x01])
    out += b"\x5a\xa5\x00"  # fake entropy-coded bytes
    out += b"\xff\xd9"
    return bytes(out)
