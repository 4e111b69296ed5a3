"""webm/Matroska (EBML) cue index — keyframes without a codec.

Completes the container-index trio (``mp4.py`` ISO-BMFF keyframes,
``mp3.py`` MPEG-audio frames): RFC 8794 EBML plus the public Matroska
element IDs are enough to walk a webm's element tree with the stdlib
and read the **Cues** — the seek index whose entries point at the
keyframe-bearing clusters — plus the video track's dimensions and the
segment duration. ``video_frame_sample`` turns those cue points into
index-only rows (timestamp + absolute byte offset per keyframe,
``decode_error='decode_pending'``); VP8/VP9/AV1 pixel decode stays
behind the ffmpeg/pyav seam (``operators/multimodal.decode_video``).

Contract (C7): every malformed input raises ``ValueError``. EBML sizes
are walked against the bytes actually present (every element's extent
is bounds-checked against its parent), so there is no declared-count
expansion surface; cue counts are additionally capped.
"""

from __future__ import annotations

import struct

__all__ = ["is_webm", "parse_webm_index", "build_webm"]

#: cap on cue points — each cue consumes ≥14 bytes, so this also bounds
#: the expanded index at ~2^22 entries for a ≥56 MiB file
MAX_CUES = 1 << 22

EBML_MAGIC = b"\x1aE\xdf\xa3"

# Matroska element IDs (with marker bits, as they appear on the wire)
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CUES = 0x1C53BB6B
_CUE_POINT = 0xBB
_CUE_TIME = 0xB3
_CUE_TRACK_POSITIONS = 0xB7
_CUE_TRACK = 0xF7
_CUE_CLUSTER_POSITION = 0xF1


def is_webm(blob: bytes) -> bool:
    return len(blob) >= 4 and blob[:4] == EBML_MAGIC


def _vint_len(first: int, max_n: int, what: str) -> int:
    if first == 0:
        raise ValueError(f"invalid EBML {what} lead byte 0x00")
    n = 1
    mask = 0x80
    while not first & mask:
        mask >>= 1
        n += 1
    if n > max_n:
        raise ValueError(f"EBML {what} wider than {max_n} bytes")
    return n


def _read_id(buf: bytes, pos: int, end: int) -> tuple[int, int]:
    """EBML element ID: 1-4 bytes, length from leading-zero count,
    returned WITH marker bits (the on-wire value)."""
    if pos >= end:
        raise ValueError("EBML id past end of parent")
    n = _vint_len(buf[pos], 4, "id")
    if pos + n > end:
        raise ValueError("EBML id overruns parent")
    val = 0
    for b in buf[pos:pos + n]:
        val = (val << 8) | b
    return val, pos + n


def _read_size(buf: bytes, pos: int, end: int) -> tuple["int | None", int]:
    """EBML size VINT: 1-8 bytes, marker stripped; all-ones = unknown
    (None)."""
    if pos >= end:
        raise ValueError("EBML size past end of parent")
    first = buf[pos]
    n = _vint_len(first, 8, "size")
    if pos + n > end:
        raise ValueError("EBML size overruns parent")
    mask = 0x80 >> (n - 1)
    val = first & (mask - 1)
    all_ones = val == mask - 1
    for b in buf[pos + 1:pos + n]:
        val = (val << 8) | b
        all_ones = all_ones and b == 0xFF
    return (None if all_ones else val), pos + n


_CLUSTER = 0x1F43B675
_CLUSTER_BYTES = b"\x1fC\xb6u"
_CUES_BYTES = b"\x1cS\xbbk"


def _iter_elements(buf: bytes, start: int, end: int):
    """Yield (id, payload_start, payload_end) for the elements in
    buf[start:end]. Unknown size is legal only for Segment (extends to
    the parent's end) and Cluster (RFC 8794: ends at the next
    same-level element — the next Cluster or Cues id); any other
    unknown-size element is malformed and raises rather than silently
    swallowing its siblings."""
    pos = start
    while pos < end:
        eid, pos = _read_id(buf, pos, end)
        size, pos = _read_size(buf, pos, end)
        if size is None:
            if eid == _SEGMENT:
                pend = end
            elif eid == _CLUSTER:
                nxt = [
                    i for i in (
                        buf.find(_CLUSTER_BYTES, pos, end),
                        buf.find(_CUES_BYTES, pos, end),
                    ) if i != -1
                ]
                pend = min(nxt) if nxt else end
            else:
                raise ValueError(
                    f"unknown-size element 0x{eid:X} (only Segment/Cluster may)"
                )
        else:
            pend = pos + size
        if pend > end:
            raise ValueError(f"element 0x{eid:X} overruns its parent")
        yield eid, pos, pend
        pos = pend


def _find(buf: bytes, start: int, end: int, eid: int):
    for e, s, p in _iter_elements(buf, start, end):
        if e == eid:
            return s, p
    return None


def _uint(buf: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise ValueError("EBML uint wider than 8 bytes")
    val = 0
    for b in buf[s:e]:
        val = (val << 8) | b
    return val


def _float(buf: bytes, s: int, e: int) -> float:
    if e - s == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if e - s == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError("EBML float must be 4 or 8 bytes")


def parse_webm_index(blob: bytes) -> dict:
    """webm/Matroska bytes → the video track's cue (keyframe) index.

    Returns ``{"width", "height", "timescale_ns", "duration_sec",
    "keyframes": [{"time_sec", "byte_offset"}, ...]}`` where
    ``byte_offset`` is the ABSOLUTE blob offset of the keyframe's
    cluster (CueClusterPosition is segment-relative on the wire).
    Cues for non-video tracks are ignored. Raises ``ValueError`` on
    malformed input or a missing video track; raises
    ``NotImplementedError`` for a VALID but Cues-less file (live-muxed/
    MediaRecorder output) — indexing one requires a cluster scan, which
    belongs behind the codec seam, and the distinct exception keeps
    'recoverable seam work' separable from 'corrupt bytes' in the
    error-row column."""
    try:
        return _parse_webm_index(blob)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed webm: {type(exc).__name__}") from exc


def _parse_webm_index(blob: bytes) -> dict:
    if not is_webm(blob):
        raise ValueError("not EBML: bad magic")
    seg = None
    for eid, s, e in _iter_elements(blob, 0, len(blob)):
        if eid == _SEGMENT:
            seg = (s, e)
            break
    if seg is None:
        raise ValueError("webm missing Segment")
    seg_start = seg[0]  # CueClusterPosition is relative to this

    timescale_ns = 1_000_000  # Matroska default
    duration_units = None
    info = _find(blob, *seg, _INFO)
    if info is not None:
        ts = _find(blob, *info, _TIMESTAMP_SCALE)
        if ts is not None:
            timescale_ns = _uint(blob, *ts)
            if timescale_ns <= 0:
                raise ValueError("TimestampScale must be positive")
        dur = _find(blob, *info, _DURATION)
        if dur is not None:
            duration_units = _float(blob, *dur)

    tracks = _find(blob, *seg, _TRACKS)
    if tracks is None:
        raise ValueError("webm missing Tracks")
    video_track = None
    width = height = 0
    for eid, s, e in _iter_elements(blob, *tracks):
        if eid != _TRACK_ENTRY:
            continue
        ttype = _find(blob, s, e, _TRACK_TYPE)
        if ttype is None or _uint(blob, *ttype) != 1:  # 1 = video
            continue
        tnum = _find(blob, s, e, _TRACK_NUMBER)
        if tnum is None:
            raise ValueError("video TrackEntry missing TrackNumber")
        video_track = _uint(blob, *tnum)
        video = _find(blob, s, e, _VIDEO)
        if video is not None:
            w = _find(blob, *video, _PIXEL_WIDTH)
            h = _find(blob, *video, _PIXEL_HEIGHT)
            width = _uint(blob, *w) if w else 0
            height = _uint(blob, *h) if h else 0
        break
    if video_track is None:
        raise ValueError("webm has no video track")

    cues = _find(blob, *seg, _CUES)
    if cues is None:
        raise NotImplementedError(
            "webm has no Cues index (live-muxed/unindexed file); a "
            "cluster scan belongs behind the ffmpeg seam, not this path"
        )
    keyframes = []
    for eid, s, e in _iter_elements(blob, *cues):
        if eid != _CUE_POINT:
            continue
        ct = _find(blob, s, e, _CUE_TIME)
        if ct is None:
            raise ValueError("CuePoint missing CueTime")
        time_units = _uint(blob, *ct)
        for eid2, s2, e2 in _iter_elements(blob, s, e):
            if eid2 != _CUE_TRACK_POSITIONS:
                continue
            trk = _find(blob, s2, e2, _CUE_TRACK)
            if trk is None or _uint(blob, *trk) != video_track:
                continue
            cpos = _find(blob, s2, e2, _CUE_CLUSTER_POSITION)
            if cpos is None:
                raise ValueError("CueTrackPositions missing CueClusterPosition")
            off = seg_start + _uint(blob, *cpos)
            if off >= len(blob):
                raise ValueError("cue cluster offset past EOF")
            keyframes.append({
                "time_sec": round(time_units * timescale_ns / 1e9, 6),
                "byte_offset": off,
            })
            if len(keyframes) > MAX_CUES:
                raise ValueError(f"more than {MAX_CUES} cue points")
    return {
        "width": width,
        "height": height,
        "timescale_ns": timescale_ns,
        "duration_sec": (
            round(duration_units * timescale_ns / 1e9, 6)
            if duration_units is not None else None
        ),
        "keyframes": keyframes,
    }


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def _enc_id(eid: int) -> bytes:
    out = []
    v = eid
    while v:
        out.append(v & 0xFF)
        v >>= 8
    return bytes(reversed(out))


def _enc_size(n: int, width: int = 2) -> bytes:
    """Fixed-width VINT (width bytes): marker bit in the first byte."""
    if n >= (1 << (7 * width)) - 1:
        raise ValueError("size too large for fixed VINT width")
    raw = n | (1 << (7 * width))
    return raw.to_bytes(width, "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _enc_id(eid) + _enc_size(len(payload)) + payload


def _uint_payload(v: int, width: int) -> bytes:
    return v.to_bytes(width, "big")


def build_webm(
    cue_times_ms: list[int],
    cluster_size: int = 64,
    width: int = 320,
    height: int = 180,
    duration_ms: "int | None" = None,
) -> bytes:
    """Structurally valid single-video-track Matroska fixture: EBML
    header + Segment{Info, Tracks, Cues, Clusters}. One cluster per cue
    point (``cluster_size`` bytes of fake payload each); cue offsets are
    computed segment-relative exactly as a muxer would. Frame bytes are
    fake — the pixel layer stays behind the codec seam by design."""
    header = _elem(
        0x1A45DFA3,
        _elem(0x4282, b"webm")  # DocType
        + _elem(0x4287, _uint_payload(2, 1)),  # DocTypeVersion
    )
    info = _elem(
        _INFO,
        _elem(_TIMESTAMP_SCALE, _uint_payload(1_000_000, 3))
        + (
            _elem(_DURATION, struct.pack(">d", float(duration_ms)))
            if duration_ms is not None else b""
        ),
    )
    tracks = _elem(
        _TRACKS,
        _elem(
            _TRACK_ENTRY,
            _elem(_TRACK_NUMBER, _uint_payload(1, 1))
            + _elem(_TRACK_TYPE, _uint_payload(1, 1))
            + _elem(
                _VIDEO,
                _elem(_PIXEL_WIDTH, _uint_payload(width, 2))
                + _elem(_PIXEL_HEIGHT, _uint_payload(height, 2)),
            ),
        ),
    )
    # cues reference cluster offsets relative to segment-payload start;
    # every element below uses fixed-width sizes so the layout is exact
    n = len(cue_times_ms)
    cue_entries = []
    cues_payload_len = 0
    for t in cue_times_ms:
        entry_len = (
            len(_elem(_CUE_TIME, _uint_payload(0, 4)))
            + len(_elem(
                _CUE_TRACK_POSITIONS,
                _elem(_CUE_TRACK, _uint_payload(1, 1))
                + _elem(_CUE_CLUSTER_POSITION, _uint_payload(0, 8)),
            ))
        )
        cues_payload_len += len(_enc_id(_CUE_POINT)) + 2 + entry_len
    cues_total = len(_enc_id(_CUES)) + 2 + cues_payload_len
    base = len(info) + len(tracks) + cues_total  # first cluster, seg-relative
    cluster = _elem(0x1F43B675, b"\xa3" + b"\x00" * (cluster_size - 1))
    for k, t in enumerate(cue_times_ms):
        off = base + k * len(cluster)
        cue_entries.append(_elem(
            _CUE_POINT,
            _elem(_CUE_TIME, _uint_payload(t, 4))
            + _elem(
                _CUE_TRACK_POSITIONS,
                _elem(_CUE_TRACK, _uint_payload(1, 1))
                + _elem(_CUE_CLUSTER_POSITION, _uint_payload(off, 8)),
            ),
        ))
    cues = _elem(_CUES, b"".join(cue_entries))
    assert len(cues) == cues_total
    segment_payload = info + tracks + cues + cluster * n
    return header + _elem(_SEGMENT, segment_payload)
