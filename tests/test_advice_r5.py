"""Regression tests for the round-5 ADVICE findings.

- jpeg: T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
  marker; the header loop must skip them instead of misreading the
  second 0xFF as the marker id (jpeg.py:292).
- wav: a data chunk whose declared length exceeds the remaining bytes is
  corruption and must raise ValueError (C7 error-row contract), never
  silently compute features over a truncated prefix (wav.py:66).
- warc_drop: the ingest ledger keys by FULL path (+size/mtime recorded),
  and an overwrite under an already-ingested path is ignored by design —
  the documented fresh-name atomic-rename producer contract
  (warc_drop.py ledger).
- round: extra_lineage keys that collide with built-in lineage counts
  must be rejected, not silently overwrite the committed round record
  (round.py _merge_extra_lineage).
"""

from __future__ import annotations

import numpy as np
import pytest

from webscraper_spark.functions.jpeg import decode_jpeg_gray, encode_jpeg
from webscraper_spark.functions.wav import decode_wav, encode_wav
from webscraper_spark.plans.round import _merge_extra_lineage


def _rng_img(h=24, w=32, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


def test_jpeg_fill_bytes_before_markers_are_skipped():
    blob = encode_jpeg(_rng_img(), quality=88)
    want = decode_jpeg_gray(blob)
    # pad EVERY header marker (0xFF id with id not 0x00/data) with fill
    # bytes up to the SOS segment, the region the header loop parses
    padded = bytearray(blob[:2])  # SOI
    i = 2
    while i < len(blob):
        if blob[i] == 0xFF and blob[i + 1] not in (0x00,):
            padded += b"\xff\xff\xff"  # three fill bytes before the marker
            padded += blob[i:]
            break
        i += 1
    got = decode_jpeg_gray(bytes(padded))
    assert np.array_equal(got, want)


def test_jpeg_fill_bytes_before_every_header_marker():
    import struct as _struct

    blob = encode_jpeg(_rng_img(seed=9), quality=90)
    want = decode_jpeg_gray(blob)
    # walk the segment structure and inject fill bytes before each marker
    out = bytearray(blob[:2])
    pos = 2
    while pos + 4 <= len(blob):
        assert blob[pos] == 0xFF
        marker = blob[pos + 1]
        out += b"\xff"  # one fill byte before this marker
        if marker == 0xDA:  # SOS: copy the rest verbatim (entropy data)
            out += blob[pos:]
            break
        (seglen,) = _struct.unpack(">H", blob[pos + 2:pos + 4])
        out += blob[pos:pos + 2 + seglen]
        pos += 2 + seglen
    got = decode_jpeg_gray(bytes(out))
    assert np.array_equal(got, want)


def test_wav_truncated_data_chunk_raises():
    x = (np.sin(np.linspace(0, 40, 4000)) * 20000).astype(np.int16)
    blob = encode_wav(x, 16000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(blob[:-10])  # declared data length now exceeds EOF


def test_wav_intact_still_decodes():
    x = (np.sin(np.linspace(0, 40, 4000)) * 20000).astype(np.int16)
    got, sr = decode_wav(encode_wav(x, 16000))
    assert sr == 16000 and np.array_equal(got, x)


def test_extra_lineage_collision_rejected():
    lineage = {"scheduled": 10, "fetched": 8, "elapsed_sec": 1.2}
    with pytest.raises(ValueError, match="collide.*scheduled"):
        _merge_extra_lineage(lineage, {"scheduled": 0})
    assert lineage["scheduled"] == 10  # untouched on rejection
    merged = _merge_extra_lineage(lineage, {"n_ingested_files": 3})
    assert merged["n_ingested_files"] == 3 and merged["scheduled"] == 10
    assert _merge_extra_lineage(lineage, None) is lineage


def test_ledger_ignores_overwrite_under_ingested_path(
    spark, tmp_path_factory
):
    # full-path keying: re-dropping DIFFERENT bytes under an
    # already-ingested path is ignored by design (fresh-name contract);
    # the ledger's size/mtime columns make the ignored overwrite
    # detectable after the fact
    import os

    from webscraper_spark.sources.tables import TableStore
    from webscraper_spark.sources.warc import build_warc
    from webscraper_spark.sources.warc_drop import (
        discover_new_warcs,
        ingest_ledger,
        ingest_new_warcs,
    )

    from datetime import datetime

    drop = str(tmp_path_factory.mktemp("drop_overwrite"))
    p = os.path.join(drop, "seg.warc")
    rec = {
        "url": "https://a.example/1",
        "warc_ts": datetime(2025, 7, 25),
        "html": b"<p>v1</p>",
    }
    with open(p, "wb") as f:
        f.write(build_warc([rec]))
    store = TableStore(spark, str(tmp_path_factory.mktemp("ov_store")))
    staged = ingest_new_warcs(store, drop, round_no=1)
    assert staged == [p]
    store.commit_round(1)
    old_size = ingest_ledger(store).collect()[0]["size"]
    with open(p, "wb") as f:  # overwrite with different content
        f.write(build_warc([dict(rec, html=b"<p>v2 much longer body</p>")]))
    assert discover_new_warcs(store, drop) == []  # ignored by design
    assert os.path.getsize(p) != old_size  # ...but detectable via ledger
