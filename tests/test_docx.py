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


def _repack(document_xml: str) -> bytes:
    """Swap a custom word/document.xml into a built package."""
    base = build_docx(["placeholder"])
    buf = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as src, \
            zipfile.ZipFile(buf, "w") as dst:
        for item in src.infolist():
            data = (document_xml.encode()
                    if item.filename == "word/document.xml"
                    else src.read(item))
            dst.writestr(item, data)
    return buf.getvalue()


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


def test_size_cap_refused_before_inflate():
    """A member whose DECLARED size exceeds the cap is refused without
    reading its (potentially bomb) payload."""
    doc = "x" * 100
    blob = bytearray(_repack(
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        "<w:p><w:r><w:t>" + doc + "</w:t></w:r></w:p>"
        "</w:body></w:document>"))
    # forging the central-directory size upward triggers either the cap
    # (ValueError) or zipfile's own consistency error (wrapped) — both
    # are the C7 contract
    with pytest.raises(ValueError):
        from webscraper_spark.functions import docx as m
        old = m.MAX_XML_BYTES
        try:
            m.MAX_XML_BYTES = 10
            extract_docx_text(bytes(blob))
        finally:
            m.MAX_XML_BYTES = old


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
