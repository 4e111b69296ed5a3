"""DOCX text extraction: package walk, WordprocessingML text, the C7
malformed contract, and the Spark error-row path."""

from __future__ import annotations

import io
import random
import zipfile

import pytest

from webscraper_spark.functions.docx import (
    build_docx,
    extract_docx_text,
    is_docx,
)


def test_roundtrip_paragraphs():
    paras = ["Hello crawl world.", "Second paragraph.",
             "  leading spaces preserved"]
    r = extract_docx_text(build_docx(paras))
    assert r["n_paragraphs"] == 3
    assert r["text"] == "\n".join(paras)
    assert r["has_fields"] is False


def test_stored_and_deflated_agree():
    paras = ["same text either way"]
    a = extract_docx_text(build_docx(paras, compress=True))
    b = extract_docx_text(build_docx(paras, compress=False))
    assert a["text"] == b["text"]


def test_builder_is_deterministic():
    assert build_docx(["x"]) == build_docx(["x"])


def test_xml_escapes_roundtrip():
    line = '<tag> & "amp" text'
    assert extract_docx_text(build_docx([line]))["text"] == line


def test_tabs_breaks_and_tables():
    """Hand-built document.xml: w:tab/w:br render, table cell
    paragraphs linearize in document order, w:delText is excluded."""
    doc = (
        '<?xml version="1.0"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
        "<w:t>c</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell1</w:t></w:r></w:p>"
        "</w:tc><w:tc><w:p><w:r><w:t>cell2</w:t></w:r></w:p></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:delText>gone</w:delText><w:t>kept</w:t></w:r>"
        "</w:p>"
        "</w:body></w:document>"
    )
    blob = _repack(doc)
    r = extract_docx_text(blob)
    assert r["text"] == "a\tb\nc\ncell1\ncell2\nkept"
    assert r["n_paragraphs"] == 4


def _repack_bytes(document_xml: bytes) -> bytes:
    """Swap a custom word/document.xml into a built package."""
    base = build_docx(["placeholder"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, \
            zipfile.ZipFile(buf, "w") as dst:
        for item in src.infolist():
            data = (document_xml
                    if item.filename == "word/document.xml"
                    else src.read(item))
            dst.writestr(item, data)
    return buf.getvalue()


def _repack(document_xml: str) -> bytes:
    return _repack_bytes(document_xml.encode())


def test_field_codes_flagged_approximate():
    r = extract_docx_text(build_docx(["body"], with_field=True))
    assert r["has_fields"] is True
    assert r["text"] == "body\n1"  # cached field result extracted
    assert extract_docx_text(build_docx(["body"]))["has_fields"] is False


def test_ole2_raises_seam_not_valueerror():
    with pytest.raises(NotImplementedError):
        extract_docx_text(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 56)


def test_non_wordprocessingml_zip_is_valueerror():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("data.csv", "a,b\n1,2\n")
    with pytest.raises(ValueError, match="word/document.xml"):
        extract_docx_text(buf.getvalue())


def test_dtd_refused():
    doc = ('<?xml version="1.0"?><!DOCTYPE lol [<!ENTITY a "x">]>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body/></w:document>')
    with pytest.raises(ValueError, match="DTD"):
        extract_docx_text(_repack(doc))


def test_dtd_refused_past_prefix_and_in_utf16():
    """Parser-level refusal: comment padding cannot push the DOCTYPE
    past a byte-prefix window, and a UTF-16 document.xml can't hide it
    behind the encoding."""
    padded = ('<?xml version="1.0"?><!--' + "x" * 5000 + "-->"
              '<!DOCTYPE lol [<!ENTITY a "BOOM">]>'
              '<w:document xmlns:w="http://schemas.openxmlformats.org/'
              'wordprocessingml/2006/main"><w:body><w:p><w:r><w:t>&a;'
              "</w:t></w:r></w:p></w:body></w:document>")
    with pytest.raises(ValueError, match="DTD"):
        extract_docx_text(_repack(padded))
    u16 = ('<?xml version="1.0" encoding="utf-16"?>'
           '<!DOCTYPE l [<!ENTITY a "B">]>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body/></w:document>')
    with pytest.raises(ValueError, match="DTD"):
        extract_docx_text(_repack_bytes(u16.encode("utf-16")))


def test_doctype_in_comment_is_not_refused():
    doc = ('<!-- generator note: no <!DOCTYPE used -->'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body><w:p><w:r><w:t>fine'
           "</w:t></w:r></w:p></w:body></w:document>")
    assert extract_docx_text(_repack(doc))["text"] == "fine"


def test_encrypted_zip_member_is_seam_row_not_task_failure():
    """ZipCrypto flag bit on word/document.xml routes to the
    decryption seam (NotImplementedError), never an uncaught
    RuntimeError killing the Spark task."""
    blob = bytearray(build_docx(["secret"]))
    # set general-purpose flag bit 0 on every local + central header
    for magic, off in ((b"PK\x03\x04", 6), (b"PK\x01\x02", 8)):
        i = 0
        while True:
            i = blob.find(magic, i)
            if i < 0:
                break
            blob[i + off] |= 0x01
            i += 4
    with pytest.raises(NotImplementedError):
        extract_docx_text(bytes(blob))


def test_textbox_paragraph_extracts_once():
    """A w:p nested in another w:p (textbox/shape) appears once, at
    its own position — never inlined into the outer paragraph too."""
    doc = ('<?xml version="1.0"?>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body>'
           "<w:p><w:r><w:t>outer</w:t></w:r>"
           "<w:pict><w:txbxContent><w:p><w:r><w:t>inner</w:t></w:r>"
           "</w:p></w:txbxContent></w:pict>"
           "<w:r><w:t>-after</w:t></w:r></w:p>"
           "</w:body></w:document>")
    r = extract_docx_text(_repack(doc))
    assert r["text"] == "outer-after\ninner"
    assert r["n_paragraphs"] == 2


def test_alternate_content_extracts_fallback_once():
    """mc:AlternateContent duplicates content across Choice and
    Fallback; only the Fallback branch contributes text."""
    doc = ('<?xml version="1.0"?>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main" '
           'xmlns:mc="http://schemas.openxmlformats.org/'
           'markup-compatibility/2006"><w:body>'
           "<mc:AlternateContent>"
           "<mc:Choice><w:p><w:r><w:t>fancy</w:t></w:r></w:p>"
           "</mc:Choice>"
           "<mc:Fallback><w:p><w:r><w:t>plain</w:t></w:r></w:p>"
           "</mc:Fallback>"
           "</mc:AlternateContent>"
           "</w:body></w:document>")
    r = extract_docx_text(_repack(doc))
    assert r["text"] == "plain"
    assert r["n_paragraphs"] == 1
    # the same shape nested INSIDE a paragraph (the common Word form)
    doc2 = ('<?xml version="1.0"?>'
            '<w:document xmlns:w="http://schemas.openxmlformats.org/'
            'wordprocessingml/2006/main" '
            'xmlns:mc="http://schemas.openxmlformats.org/'
            'markup-compatibility/2006"><w:body>'
            "<w:p><w:r><w:t>pre </w:t></w:r>"
            "<mc:AlternateContent>"
            "<mc:Choice><w:r><w:t>fancy</w:t></w:r></mc:Choice>"
            "<mc:Fallback><w:r><w:t>plain</w:t></w:r></mc:Fallback>"
            "</mc:AlternateContent></w:p>"
            "</w:body></w:document>")
    assert extract_docx_text(_repack(doc2))["text"] == "pre plain"


def test_size_cap_refused_before_inflate(monkeypatch):
    """A member whose DECLARED size exceeds the cap is refused without
    reading its (potentially bomb) payload."""
    from webscraper_spark.functions import docx as m

    blob = build_docx(["x" * 100])
    monkeypatch.setattr(m, "MAX_XML_BYTES", 10)
    with pytest.raises(ValueError, match="size cap"):
        extract_docx_text(blob)


def test_sniff():
    assert is_docx(build_docx(["x"]))
    assert not is_docx(b"%PDF-1.4")


def test_malformed_contract_fuzz():
    blob = build_docx(["fuzz me", "second para"])
    for cut in range(4, len(blob), 11):
        try:
            extract_docx_text(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(13)
    for _ in range(250):
        bad = bytearray(blob)
        bad[rng.randrange(len(bad))] = rng.randrange(256)
        try:
            extract_docx_text(bytes(bad))
        except (ValueError, NotImplementedError):
            pass


def test_docx_text_operator(spark):
    """Spark path: per-item error isolation, one partition so error
    rows share a batch with good ones."""
    import pandas as pd

    from webscraper_spark.operators.multimodal import docx_text

    rows = [
        (0, build_docx(["alpha", "beta"])),
        (1, build_docx(["solo"], compress=False)),
        (2, build_docx(["x"])[:30]),           # truncated -> ValueError
        (3, None),                             # null blob -> ValueError
        (4, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 8),  # seam
        (5, build_docx(["f"], with_field=True)),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "blob"]),
        "doc_id long, blob binary",
    ).coalesce(1)
    out = {r["doc_id"]: r for r in docx_text(docs).collect()}
    assert out[0]["n_paragraphs"] == 2
    assert out[0]["text"] == "alpha\nbeta"
    assert out[0]["has_fields"] is False
    assert out[1]["text"] == "solo"
    assert out[2]["docx_error"] == "ValueError"
    assert out[2]["n_paragraphs"] is None and out[2]["text"] is None
    assert out[3]["docx_error"] == "ValueError"
    assert out[4]["docx_error"] == "NotImplementedError"
    assert out[5]["has_fields"] is True
