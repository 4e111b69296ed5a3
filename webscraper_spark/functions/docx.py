"""DOCX text extraction — stdlib-only (zipfile + xml.etree).

Crawled corpora carry ``application/vnd.openxmlformats`` Word documents
alongside PDFs; both hold long-form text a webtext curation pipeline
should not drop. A .docx is a ZIP package (OPC) whose main part,
``word/document.xml``, is WordprocessingML — so extraction needs no
Office libraries at all:

- the package opens with :mod:`zipfile` (the stored/deflate methods the
  OPC spec allows are both stdlib);
- ``word/document.xml`` parses with :mod:`xml.etree` after a
  parser-level DOCTYPE refusal (an expat prolog scan — OOXML never
  declares a DTD, and refusing one at the parser closes the
  entity-expansion bomb class in every encoding, with no false
  positive on '<!DOCTYPE' inside a comment);
- paragraph text concatenates ``w:t`` runs in document order with
  ``w:tab``/``w:br``/``w:cr`` rendered as tab/newline; paragraphs join
  with a newline (tables contribute their cell paragraphs in document
  order, matching how Word's own "Save as text" linearizes them);
  textbox/shape paragraphs nested inside a paragraph extract once, at
  their own position, and ``mc:AlternateContent`` contributes only its
  Fallback branch (Choice+Fallback carry duplicate renderings).

Honesty contract: literal run text extracts exactly — the fixture
builder emits plain runs and the goldens assert byte-equal text. Field
code RESULTS (``w:fldSimple``/``w:instrText`` — page numbers, TOC
entries, cross-references) are render-dependent and may be stale in the
file, so documents containing them are flagged ``has_fields=True`` and
downstream curation can treat the text as approximate (the same
declared-metadata honesty pattern as the PDF ``has_type0_fonts`` and
FLAC index flags). Tracked-change deletions (``w:delText``) are
excluded — they are not part of the document's accepted text.

Seams: a legacy binary ``.doc`` (OLE2 magic — also the container that
wraps ENCRYPTED OOXML) raises ``NotImplementedError`` toward the
antiword/msoffcrypto seam. Every malformed input raises ``ValueError``
(C7: per-item error rows, never task failures).

Scale shape: one document parses entirely inside its executor task
(mapInPandas batch) — no shuffle, no driver involvement; the declared
size of ``word/document.xml`` is capped (64 MiB) BEFORE decompression
and :mod:`zipfile` truncates reads at the declared size, so a
zip-bomb member degrades to an error row, never an executor OOM.
"""

from __future__ import annotations

import io
import struct
import zipfile
import zlib
from xml.etree import ElementTree
from xml.parsers import expat as _expat
from xml.sax.saxutils import escape as _xml_escape

__all__ = ["is_docx", "extract_docx_text", "build_docx"]

ZIP_MAGIC = b"PK\x03\x04"
OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

#: untrusted-input cap: declared (post-inflate) size of document.xml
MAX_XML_BYTES = 1 << 26  # 64 MiB of XML is ~a 10k-page document

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_MC = "{http://schemas.openxmlformats.org/markup-compatibility/2006}"


class _RootSeen(Exception):
    pass


def _refuse_dtd(xml: bytes) -> None:
    """Parser-level DOCTYPE refusal: an expat pass whose handlers abort
    at the first start element (a DOCTYPE must precede the root, so
    this reads only the prolog — O(prolog bytes), not O(document)).
    Catches encodings and comment padding a byte scan would miss, and
    never false-positives on '<!DOCTYPE' inside a comment/CDATA."""
    p = _expat.ParserCreate()

    def _doctype(*_a):
        raise ValueError("DTD in document.xml refused (OOXML has none)")

    def _start(*_a):
        raise _RootSeen()

    p.StartDoctypeDeclHandler = _doctype
    p.StartElementHandler = _start
    try:
        p.Parse(xml, True)
    except _RootSeen:
        return
    except _expat.ExpatError:
        return  # malformed: ElementTree reports the real parse error


def _mc_children(el) -> list:
    """``mc:AlternateContent`` duplicates its content across one or
    more ``mc:Choice`` branches and an ``mc:Fallback``; extract the
    Fallback (the down-level form every consumer can render) once."""
    chosen = el.find(_MC + "Fallback")
    if chosen is None:
        chosen = next(iter(el), None)
    return list(chosen) if chosen is not None else []


def _paragraph(p) -> tuple[list, bool, list]:
    """One ``w:p`` → ``(text_parts, has_fields, nested_paragraphs)``.
    Nested ``w:p`` (textbox/shape content) are returned for extraction
    at their own position, never inlined — a subtree ``iter()`` would
    emit their text twice."""
    parts: list[str] = []
    has_fields = False
    nested: list = []
    stack = list(reversed(list(p)))
    while stack:
        el = stack.pop()
        tag = el.tag
        if tag == _W + "p":
            nested.append(el)
            continue
        if tag == _W + "t":
            parts.append(el.text or "")
        elif tag == _W + "tab":
            parts.append("\t")
        elif tag == _W + "br" or tag == _W + "cr":
            parts.append("\n")
        elif tag == _MC + "AlternateContent":
            stack.extend(reversed(_mc_children(el)))
        else:
            if tag == _W + "fldSimple" or tag == _W + "instrText":
                has_fields = True
            stack.extend(reversed(list(el)))
    return parts, has_fields, nested


def is_docx(blob: bytes) -> bool:
    """Sniff: ZIP local-file header. (Positively identifying the OPC
    content type needs the package opened — ``extract_docx_text`` does
    the authoritative check on ``word/document.xml``.)"""
    return blob[:4] == ZIP_MAGIC


def extract_docx_text(blob: bytes) -> dict:
    """DOCX bytes → ``{"n_paragraphs", "text", "has_fields"}``.

    ``text`` is the document's paragraphs joined with newlines;
    ``has_fields`` is True when any field code appears (its cached
    result text is extracted but may be stale — approximate, per the
    module honesty contract). Raises ``ValueError`` for malformed input
    and ``NotImplementedError`` for OLE2 containers (legacy ``.doc``
    and encrypted OOXML — the antiword/msoffcrypto seam)."""
    if blob[:8] == OLE2_MAGIC:
        raise NotImplementedError(
            "OLE2 container (legacy .doc or encrypted OOXML) — "
            "binary Word seam"
        )
    if blob[:4] != ZIP_MAGIC:
        raise ValueError("not a DOCX (no ZIP header)")
    try:
        zf = zipfile.ZipFile(io.BytesIO(blob))
        try:
            info = zf.getinfo("word/document.xml")
        except KeyError:
            raise ValueError(
                "no word/document.xml (ZIP but not WordprocessingML)"
            ) from None
        if info.flag_bits & 0x1:
            # ZipCrypto/AES-protected member: zipfile would raise
            # RuntimeError('password required') mid-read — route it to
            # the same seam as encrypted OOXML instead
            raise NotImplementedError(
                "password-protected ZIP member — decryption seam"
            )
        if info.file_size > MAX_XML_BYTES:
            raise ValueError("document.xml exceeds size cap")
        # zipfile truncates the read at the declared file_size, so the
        # cap above bounds memory even against a lying deflate stream
        xml = zf.read(info)
    except NotImplementedError as e:
        # ours (the decryption seam) propagates; zipfile's own (an
        # unsupported compression method) is corruption here. Must be
        # checked BEFORE RuntimeError: NotImplementedError subclasses it
        if "seam" in str(e):
            raise
        raise ValueError(f"bad ZIP package: {type(e).__name__}") from e
    except (zipfile.BadZipFile, zlib.error, struct.error, EOFError,
            OverflowError, RuntimeError) as e:
        # zipfile leaks zlib/struct errors for corrupt deflate payloads
        # and headers, and RuntimeError for encryption shapes the flag
        # check above didn't cover — all malformed here (C7)
        raise ValueError(f"bad ZIP package: {type(e).__name__}") from e
    _refuse_dtd(xml)
    try:
        root = ElementTree.fromstring(xml)
    except ElementTree.ParseError as e:
        raise ValueError(f"malformed document.xml: {e}") from e

    paragraphs: list[str] = []
    has_fields = False
    stack = [root]
    while stack:
        el = stack.pop()
        tag = el.tag
        if tag == _W + "p":
            parts, hf, nested = _paragraph(el)
            paragraphs.append("".join(parts))
            has_fields = has_fields or hf
            stack.extend(reversed(nested))
        elif tag == _MC + "AlternateContent":
            stack.extend(reversed(_mc_children(el)))
        else:
            stack.extend(reversed(list(el)))
    return {
        "n_paragraphs": len(paragraphs),
        "text": "\n".join(paragraphs),
        "has_fields": has_fields,
    }


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/>'
    "</Relationships>"
)


def build_docx(paragraphs: list[str], compress: bool = True,
               with_field: bool = False) -> bytes:
    """Deterministic minimal OPC package: one ``w:p`` per entry, each a
    single literal run (``xml:space='preserve'`` so leading/trailing
    spaces round-trip). ``with_field`` appends a PAGE field paragraph
    whose cached result is '1' (sets ``has_fields``). Fixed ZIP
    timestamps keep the bytes reproducible."""
    body = []
    for text in paragraphs:
        body.append(
            f'<w:p><w:r><w:t xml:space="preserve">{_xml_escape(text)}'
            "</w:t></w:r></w:p>"
        )
    if with_field:
        body.append(
            '<w:p><w:fldSimple w:instr=" PAGE "><w:r><w:t>1</w:t></w:r>'
            "</w:fldSimple></w:p>"
        )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _RELS),
            ("word/document.xml", doc),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = method
            zf.writestr(zi, data)
    return buf.getvalue()
