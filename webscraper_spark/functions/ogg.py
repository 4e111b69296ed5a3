"""Ogg (Opus/Vorbis) page-header index — duration without a codec.

The last member of the container-index family (``mp4.py`` sample
tables, ``webm.py`` cues, ``mp3.py`` frame headers): RFC 3533 Ogg page
headers, the RFC 7845 ``OpusHead`` identification header, and the
Vorbis-I identification header are all public specs and
stdlib-parsable, so the engine can walk the page sequence of an Ogg
stream and report codec, channel count, sample rate, total samples and
duration — the metadata a curation filter needs (clip length,
bandwidth class) — while the PCM DECODE still raises toward the
soundfile/ffmpeg seam (``operators/multimodal.decode_audio``).

The walk is O(pages): page extents come from the segment (lacing)
table, granule positions from the page header — packet bodies are
never touched past the BOS identification packet. Per-page CRC verify
is O(bytes) and off by default (``check_crc=True`` turns it on); at
scale, integrity checking rides with the C codec behind the seam.

Contract (C7): every malformed input raises ``ValueError`` (bad
capture pattern, nonzero version, reserved flag bits, sequence gaps,
granules running backwards, pages past EOF, missing EOS = truncated
download). A VALID Ogg whose BOS packet is a codec this indexer does
not cover (Theora, FLAC-in-Ogg, Speex, …) raises
``NotImplementedError`` toward the seam — same split as a Cues-less
webm: 'seam work pending' stays separable from 'corrupt bytes' in the
error-row column. Granule totals are capped so ``n_samples`` always
fits the int32 AUDIO_FEATURES column (2^31-1 @ 48 kHz ≈ 12.4 h — no
single crawl blob is legitimately longer).
"""

from __future__ import annotations

import struct

__all__ = ["is_ogg", "parse_ogg_index", "build_ogg"]

OGG_MAGIC = b"OggS"

#: n_samples ceiling — int32 column bound doubles as the granule-bomb
#: guard (a forged EOS granule cannot allocate anything, but it could
#: otherwise overflow the feature column)
MAX_SAMPLES = 2**31 - 1

_F_CONTINUED, _F_BOS, _F_EOS = 0x01, 0x02, 0x04


def is_ogg(blob: bytes) -> bool:
    """Sniff: RFC 3533 capture pattern."""
    return len(blob) >= 4 and blob[:4] == OGG_MAGIC


# ---------------------------------------------------------------------------
# Ogg CRC32: forward polynomial 0x04C11DB7, init 0, no reflection/xor
# (RFC 3533 §6). Table is computed, not transcribed.
# ---------------------------------------------------------------------------

def _crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc


def _read_page(blob: bytes, pos: int, check_crc: bool) -> dict:
    """Parse the page header at ``pos``; returns header fields plus
    ``body_start``/``body_end``/``first_lacings`` (the lacing values of
    the page's segment table, for BOS packet extraction)."""
    end = len(blob)
    if pos + 27 > end:
        raise ValueError(f"truncated ogg page header at byte {pos}")
    if blob[pos:pos + 4] != OGG_MAGIC:
        raise ValueError(f"lost ogg capture pattern at byte {pos}")
    version = blob[pos + 4]
    if version != 0:
        raise ValueError(f"unsupported ogg page version {version}")
    htype = blob[pos + 5]
    if htype & ~(_F_CONTINUED | _F_BOS | _F_EOS):
        raise ValueError(f"reserved ogg header-type bits set: 0x{htype:02x}")
    granule, serial, seq, crc = struct.unpack_from("<qIIi", blob, pos + 6)
    n_seg = blob[pos + 26]
    seg_end = pos + 27 + n_seg
    if seg_end > end:
        raise ValueError(f"ogg segment table past EOF at byte {pos}")
    lacings = blob[pos + 27:seg_end]
    body_len = sum(lacings)
    if seg_end + body_len > end:
        raise ValueError(f"ogg page body past EOF at byte {pos}")
    if check_crc:
        page = bytearray(blob[pos:seg_end + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc & 0xFFFFFFFF:
            raise ValueError(f"ogg page CRC mismatch at byte {pos}")
    return {
        "htype": htype, "granule": granule, "serial": serial, "seq": seq,
        "body_start": seg_end, "body_end": seg_end + body_len,
        "lacings": lacings,
    }


def _first_packet(blob: bytes, page: dict) -> bytes:
    """First packet of a page (BOS identification headers MUST fit in
    their page alone — RFC 7845 §3, Vorbis I §4.2.1)."""
    n = 0
    for lac in page["lacings"]:
        n += lac
        if lac < 255:
            return blob[page["body_start"]:page["body_start"] + n]
    raise ValueError("ogg BOS identification packet spans pages")


def _ident(packet: bytes) -> dict:
    """Identification-header parse → codec/channels/rates/pre_skip.
    ``granule_rate`` is the clock granule positions tick at: always
    48 kHz for Opus (RFC 7845 §4), the declared rate for Vorbis."""
    if packet[:8] == b"OpusHead":
        if len(packet) < 19:
            raise ValueError("truncated OpusHead packet")
        version = packet[8]
        if version >> 4 != 0:  # RFC 7845 §5.1: major version must be 0
            raise ValueError(f"unsupported OpusHead version {version}")
        channels = packet[9]
        pre_skip, input_rate = struct.unpack_from("<HI", packet, 10)
        if channels == 0:
            raise ValueError("OpusHead declares zero channels")
        return {
            "codec": "opus", "channels": channels, "pre_skip": pre_skip,
            "granule_rate": 48000, "input_sample_rate": input_rate,
        }
    if packet[:7] == b"\x01vorbis":
        if len(packet) < 30:
            raise ValueError("truncated vorbis identification packet")
        version, channels, rate = struct.unpack_from("<IBI", packet, 7)
        if version != 0:
            raise ValueError(f"unsupported vorbis version {version}")
        if channels == 0 or rate == 0:
            raise ValueError("vorbis ident declares zero channels/rate")
        return {
            "codec": "vorbis", "channels": channels, "pre_skip": 0,
            "granule_rate": rate, "input_sample_rate": rate,
        }
    raise NotImplementedError(
        "ogg stream is not Opus/Vorbis (Theora/FLAC/Speex/…); decode "
        "belongs behind the soundfile/ffmpeg seam"
    )


def parse_ogg_index(blob: bytes, check_crc: bool = False) -> dict:
    """Ogg bytes → ``{"codec", "channels", "sample_rate", "pre_skip",
    "n_samples", "duration_sec", "n_pages", "input_sample_rate"}``.

    Walks every page of the FIRST audio (Opus/Vorbis) logical stream —
    concurrent streams under other serials (e.g. a Theora video mux)
    are structure-checked and skipped. ``sample_rate`` is the granule
    clock (48 kHz for Opus regardless of input rate); ``n_samples`` is
    the final granule position minus the Opus pre-skip, so
    ``duration_sec = n_samples / sample_rate`` is playback time.
    Chained streams (a new BOS after the audio stream's EOS) stop the
    walk; a stream that never reaches EOS is a truncated download and
    raises. Raises ``ValueError`` on malformed input,
    ``NotImplementedError`` for valid-but-uncovered codecs."""
    try:
        return _parse_ogg_index(blob, check_crc)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed ogg: {exc}") from exc


def _parse_ogg_index(blob: bytes, check_crc: bool) -> dict:
    if not is_ogg(blob):
        raise ValueError("not an ogg stream (no OggS capture pattern)")
    pos = 0
    n_pages = 0
    target = None  # serial of the chosen audio stream
    ident = None
    expect_seq = 0
    last_granule = 0
    seen_serials = set()
    got_eos = False
    while pos < len(blob) and not got_eos:
        page = _read_page(blob, pos, check_crc)
        n_pages += 1
        serial = page["serial"]
        if page["htype"] & _F_BOS:
            if serial in seen_serials:
                raise ValueError(f"duplicate BOS for serial {serial}")
            seen_serials.add(serial)
            if target is None:
                try:
                    ident = _ident(_first_packet(blob, page))
                    target = serial
                except NotImplementedError:
                    pass  # not audio — keep looking at other BOS pages
        elif serial not in seen_serials:
            raise ValueError(f"page for serial {serial} before its BOS")
        if serial == target:
            if page["seq"] != expect_seq:
                raise ValueError(
                    f"ogg page sequence gap: expected {expect_seq}, "
                    f"got {page['seq']}"
                )
            expect_seq += 1
            g = page["granule"]
            if g != -1:  # -1 = no packet finishes on this page
                if g < last_granule:
                    raise ValueError("ogg granule position runs backwards")
                last_granule = g
            if page["htype"] & _F_EOS:
                if g == -1:
                    # the stream's final packet never completed — a
                    # truncated upload remuxed with an EOS flag, not a
                    # playable clip
                    raise ValueError(
                        "ogg EOS page without a finishing packet "
                        "(granule -1: truncated final packet)"
                    )
                got_eos = True
        pos = page["body_end"]
    if target is None:
        raise NotImplementedError(
            "ogg stream is not Opus/Vorbis (Theora/FLAC/Speex/…); decode "
            "belongs behind the soundfile/ffmpeg seam"
        )
    if not got_eos:
        raise ValueError("ogg audio stream missing EOS page (truncated)")
    n_samples = max(0, last_granule - ident["pre_skip"])
    if n_samples > MAX_SAMPLES:
        raise ValueError(f"ogg granule total {n_samples} exceeds {MAX_SAMPLES}")
    rate = ident["granule_rate"]
    return {
        "codec": ident["codec"],
        "channels": ident["channels"],
        "sample_rate": rate,
        "pre_skip": ident["pre_skip"],
        "n_samples": n_samples,
        "duration_sec": round(n_samples / rate, 6),
        "n_pages": n_pages,
        "input_sample_rate": ident["input_sample_rate"],
    }


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def _lacings(n: int) -> bytes:
    """Segment table for one packet of ``n`` bytes (RFC 3533 §5.2)."""
    full, last = divmod(n, 255)
    return b"\xff" * full + bytes([last])


def _page(serial: int, seq: int, granule: int, htype: int,
          packets: list[bytes]) -> bytes:
    lacings = b"".join(_lacings(len(p)) for p in packets)
    if len(lacings) > 255:
        raise ValueError("fixture page needs more than 255 segments")
    body = b"".join(packets)
    head = OGG_MAGIC + bytes([0, htype]) + struct.pack(
        "<qIIi", granule, serial, seq, 0
    ) + bytes([len(lacings)]) + lacings
    crc = ogg_crc(head + body)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body


def build_ogg(
    codec: str = "opus",
    n_samples: int = 96000,
    sample_rate: int = 48000,
    channels: int = 1,
    pre_skip: int = 312,
    samples_per_page: int = 9600,
    serial: int = 0x1D0B,
) -> bytes:
    """Structurally valid (real CRCs) single-stream Ogg Opus/Vorbis
    file: BOS identification page, comment-header page, then data pages
    of zeroed fake packets with accumulating granules and an EOS page
    whose granule encodes ``n_samples`` (+ ``pre_skip`` for Opus).
    Packet payloads are fake — PCM stays behind the codec seam."""
    if samples_per_page <= 0:
        raise ValueError("samples_per_page must be positive")
    if codec == "opus":
        ident = (b"OpusHead" + bytes([1, channels])
                 + struct.pack("<HIhB", pre_skip, sample_rate, 0, 0))
        comment = b"OpusTags" + struct.pack("<I", 2) + b"ws" + struct.pack("<I", 0)
        base = pre_skip
    elif codec == "vorbis":
        # three bitrate fields + blocksizes byte + framing bit = 30 bytes
        ident = (b"\x01vorbis" + struct.pack("<IBI", 0, channels, sample_rate)
                 + struct.pack("<iiiBB", 0, 0, 0, 0x88, 1))
        comment = b"\x03vorbis" + struct.pack("<I", 2) + b"ws" + struct.pack("<I", 0)
        base = 0
    else:
        raise ValueError(f"unsupported fixture codec {codec!r}")
    pages = [
        _page(serial, 0, 0, _F_BOS, [ident]),
        _page(serial, 1, 0, 0, [comment]),
    ]
    seq, done = 2, 0
    while done < n_samples:
        done = min(n_samples, done + samples_per_page)
        eos = _F_EOS if done >= n_samples else 0
        pkt_len = 20 + (done * 251) % 400  # vary packet sizes a little
        pages.append(_page(serial, seq, base + done, eos, [b"\x00" * pkt_len]))
        seq += 1
    if n_samples == 0:
        pages.append(_page(serial, seq, base, _F_EOS, [b"\x00" * 8]))
    return b"".join(pages)
