"""PDF text extraction: object scan, filters, text operators, the C7
malformed contract, and the Spark decode-pending/error-row path."""

from __future__ import annotations

import random
import zlib

import pytest

from webscraper_spark.functions.pdf import (
    build_pdf,
    extract_pdf_text,
    is_pdf,
)


def test_roundtrip_multiline_multipage():
    pages = [["Hello crawl world.", "Second line."],
             ["Page two text."],
             ["Third page, (parens) and \\ backslash #42."]]
    r = extract_pdf_text(build_pdf(pages))
    assert r["n_pages"] == 3
    assert not r["has_type0_fonts"]
    assert r["pages"] == ["\n".join(p) for p in pages]


def test_uncompressed_and_compressed_agree():
    pages = [["same text either way", "line 2"]]
    a = extract_pdf_text(build_pdf(pages, compress=True))
    b = extract_pdf_text(build_pdf(pages, compress=False))
    assert a["pages"] == b["pages"]


def test_sniff_allows_leading_junk():
    blob = build_pdf([["x"]])
    assert is_pdf(blob)
    assert is_pdf(b"HTTP junk prefix\r\n" + blob)
    assert not is_pdf(b"%PDX-nope")
    r = extract_pdf_text(b"junk " * 10 + blob)
    assert r["pages"] == ["x"]


def test_string_escapes_and_hex_strings():
    # hand-built content exercising TJ arrays, hex strings, ', octal
    content = (b"BT /F1 10 Tf 72 720 Td "
               b"[(kern) -120 (ed)] TJ T* "
               b"<48657821> Tj "
               b"(line\\050two\\051) ' "
               b"(tab\\there) Tj ET")
    blob = _pdf_with_content(content)
    r = extract_pdf_text(blob)
    # Tj after ' stays on the same line: only Td/TD/T*/Tm/'/" break
    assert r["pages"] == ["kerned\nHex!\nline(two)tab\there"]


def _pdf_with_content(content: bytes, extra_objs: bytes = b"",
                      filt: bytes = b"") -> bytes:
    """Minimal hand-rolled PDF around one raw content stream."""
    out = bytearray(b"%PDF-1.4\n")
    out += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    out += (b"2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\n"
            b"endobj\n")
    out += (b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/Contents 4 0 R >>\nendobj\n")
    out += (b"4 0 obj\n<< " + filt
            + f"/Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream\nendobj\n")
    out += extra_objs
    out += b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    return bytes(out)


def test_ascii_filters():
    body = b"BT /F1 10 Tf (filtered) Tj ET"
    hex_stream = body.hex().encode() + b">"
    r = extract_pdf_text(_pdf_with_content(
        hex_stream, filt=b"/Filter /ASCIIHexDecode "))
    assert r["pages"] == ["filtered"]
    import base64

    a85 = base64.a85encode(body) + b"~>"
    r = extract_pdf_text(_pdf_with_content(
        a85, filt=b"/Filter /ASCII85Decode "))
    assert r["pages"] == ["filtered"]


def test_object_stream_expansion():
    """PDF 1.5 layout: page objects packed inside a Flate ObjStm."""
    inner = (b"<< /Type /Catalog /Pages 2 0 R >> "
             b"<< /Type /Pages /Count 1 /Kids [3 0 R] >> "
             b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    # offsets of the three objects inside `inner`
    offs = [0, inner.index(b"<<", 1), inner.rindex(b"<<")]
    header = f"1 {offs[0]} 2 {offs[1]} 3 {offs[2]} ".encode()
    payload = zlib.compress(header + inner)
    content = b"BT /F1 9 Tf (from objstm) Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    out += (b"5 0 obj\n<< /Type /ObjStm /N 3 "
            + f"/First {len(header)} ".encode()
            + b"/Filter /FlateDecode "
            + f"/Length {len(payload)} >>".encode()
            + b"\nstream\n" + payload + b"\nendstream\nendobj\n")
    out += (b"4 0 obj\n<< /Length "
            + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    out += b"%%EOF\n"
    r = extract_pdf_text(bytes(out))
    assert r["pages"] == ["from objstm"]


def test_type0_fonts_flagged():
    extra = (b"5 0 obj\n<< /Type /Font /Subtype /Type0 "
             b"/BaseFont /Noto /Encoding /Identity-H >>\nendobj\n")
    content = b"BT /F1 10 Tf (cid text) Tj ET"
    blob = _pdf_with_content(content, extra_objs=extra)
    # wire the font into page resources
    blob = blob.replace(
        b"/Contents 4 0 R",
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R",
    )
    r = extract_pdf_text(blob)
    assert r["has_type0_fonts"] is True
    assert r["pages"] == ["cid text"]


def test_encrypted_raises_seam_not_valueerror():
    blob = build_pdf([["secret"]])
    enc = blob.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(enc)
    # the literal text '/Encrypt' inside page CONTENT must not trigger
    ok = build_pdf([["the /Encrypt key in PDF specs"]], compress=False)
    assert extract_pdf_text(ok)["n_pages"] == 1


def test_unsupported_filter_raises_seam():
    content = b"irrelevant"
    blob = _pdf_with_content(content, filt=b"/Filter /LZWDecode ")
    with pytest.raises(NotImplementedError):
        extract_pdf_text(blob)


def test_malformed_contract_fuzz():
    blob = build_pdf([["fuzz me", "second line"]])
    # truncations
    for cut in range(10, len(blob), 13):
        try:
            extract_pdf_text(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    # byte corruptions
    rng = random.Random(11)
    for _ in range(250):
        bad = bytearray(blob)
        bad[rng.randrange(len(bad))] = rng.randrange(256)
        try:
            extract_pdf_text(bytes(bad))
        except (ValueError, NotImplementedError):
            pass


def test_reference_cycle_refused():
    out = bytearray(b"%PDF-1.4\n")
    out += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    out += b"2 0 obj\n3 0 R\nendobj\n"
    out += b"3 0 obj\n2 0 R\nendobj\n"
    out += b"%%EOF\n"
    with pytest.raises(ValueError):
        extract_pdf_text(bytes(out))


def test_pdf_text_operator(spark):
    """Spark path: per-item error isolation, int-exact columns, page
    joining — one partition so error rows share a batch with good ones."""
    import pandas as pd

    from webscraper_spark.operators.multimodal import pdf_text

    rows = [
        (0, build_pdf([["alpha", "beta"], ["gamma"]])),
        (1, build_pdf([["solo"]], compress=False)),
        (2, build_pdf([["x"]])[:60]),          # truncated -> ValueError
        (3, None),                             # null blob -> ValueError
        (4, build_pdf([["enc"]]).replace(     # encrypted -> seam row
            b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "blob"]),
        "doc_id long, blob binary",
    ).coalesce(1)
    out = {r["doc_id"]: r for r in pdf_text(docs).collect()}
    assert out[0]["n_pages"] == 2
    assert out[0]["text"] == "alpha\nbeta\n\ngamma"
    assert out[0]["has_type0_fonts"] is False
    assert out[1]["text"] == "solo"
    assert out[2]["pdf_error"] == "ValueError"
    assert out[2]["n_pages"] is None and out[2]["text"] is None
    assert out[3]["pdf_error"] == "ValueError"
    assert out[4]["pdf_error"] == "NotImplementedError"


def test_stream_body_cannot_inject_phantom_objects():
    """An uncompressed content stream containing the literal 'N 0 obj'
    (a document about PDF syntax) must not override real objects."""
    evil = b"BT /F1 9 Tf (see: 1 0 obj << /Type /Catalog >> endobj) Tj ET"
    blob = _pdf_with_content(evil)
    r = extract_pdf_text(blob)
    assert r["pages"] == ["see: 1 0 obj << /Type /Catalog >> endobj"]


def test_plain_object_string_cannot_inject_phantom_objects():
    """'N 0 obj' inside a literal STRING of a later non-stream object
    (e.g. a document-info /Title) must not override real objects
    either — the scan skips every parsed object body, not just
    streams."""
    info = (b"6 0 obj\n<< /Title "
            b"(2 0 obj << /Type /Pages /Count 0 /Kids [] >>) >>"
            b"\nendobj\n")
    blob = _pdf_with_content(b"BT /F1 9 Tf (real text) Tj ET",
                             extra_objs=info)
    r = extract_pdf_text(blob)
    assert r["pages"] == ["real text"]


def test_objstm_redefinition_wins_by_file_order():
    """Incremental updates repack redefined objects into appended
    ObjStms: an unpacked definition overrides a direct one that appears
    EARLIER in the file, and loses to one that appears later."""
    def objstm(num: int, inner: bytes, onum: int) -> bytes:
        header = f"{onum} 0 ".encode()
        payload = zlib.compress(header + inner)
        return (f"{num} 0 obj\n<< /Type /ObjStm /N 1 "
                f"/First {len(header)} ".encode()
                + b"/Filter /FlateDecode "
                + f"/Length {len(payload)} >>".encode()
                + b"\nstream\n" + payload + b"\nendstream\nendobj\n")

    new_content = b"BT /F1 9 Tf (NEW TEXT) Tj ET"
    new_obj = (b"6 0 obj\n<< /Length "
               + str(len(new_content)).encode()
               + b" >>\nstream\n" + new_content + b"\nendstream\nendobj\n")
    repage = b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"
    # appended ObjStm redefines page 3 to point at the new content
    blob = _pdf_with_content(
        b"BT /F1 9 Tf (OLD TEXT) Tj ET",
        extra_objs=new_obj + objstm(7, repage, 3),
    )
    assert extract_pdf_text(blob)["pages"] == ["NEW TEXT"]
    # mirror order: ObjStm first, then a direct redefinition after it
    direct = b"3 0 obj\n" + repage + b"\nendobj\n"
    blob2 = _pdf_with_content(
        b"BT /F1 9 Tf (OLD TEXT) Tj ET",
        extra_objs=new_obj + objstm(
            7, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>", 3
        ) + direct,
    )
    assert extract_pdf_text(blob2)["pages"] == ["NEW TEXT"]


def test_encryption_probe_ignores_page_content():
    """A crawled document ABOUT PDF internals — its text contains
    'trailer << /Encrypt ... >>' — must extract, not hit the seam."""
    line = "trailer << /Encrypt 9 0 R >> is how encryption is declared"
    r = extract_pdf_text(build_pdf([[line]], compress=False))
    assert r["pages"] == [line]
    assert r["n_pages"] == 1


def test_encryption_probe_streams_hostile_blob():
    """Millions of 'trailer' tokens must not accumulate slices (the
    probe is a generator-style scan) — degrade to ValueError, fast."""
    blob = b"%PDF-1.4\n" + b"trailer" * 200_000
    with pytest.raises(ValueError):
        extract_pdf_text(blob)


def test_winansi_upper_range_decodes_cp1252():
    """WinAnsi 0x80-0x9F are smart quotes/dashes, not C1 controls."""
    line = "\x93quoted\x94 \x97 em"
    r = extract_pdf_text(build_pdf([[line]]))
    assert r["pages"] == ["“quoted” — em"]


def test_type0_flag_respects_inherited_resources():
    """Fonts declared once on the /Pages node (spec-legal inheritance,
    pages omit /Resources) still set has_type0_fonts."""
    extra = (b"5 0 obj\n<< /Type /Font /Subtype /Type0 "
             b"/BaseFont /Noto /Encoding /Identity-H >>\nendobj\n")
    blob = _pdf_with_content(b"BT /F1 10 Tf (cid text) Tj ET",
                             extra_objs=extra)
    blob = blob.replace(
        b"/Type /Pages /Count 1",
        b"/Type /Pages /Resources << /Font << /F1 5 0 R >> >> /Count 1",
    )
    r = extract_pdf_text(blob)
    assert r["has_type0_fonts"] is True
    assert r["pages"] == ["cid text"]
