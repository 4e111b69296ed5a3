"""PDF text extraction — stdlib-only (zlib is in the standard library).

Crawled corpora carry a long tail of ``application/pdf`` documents; a
webtext curation pipeline that drops them loses a disproportionate
share of long-form text (reports, papers, manuals). This module
extracts page text from the dominant shape of real-world PDFs with no
dependencies:

- body objects discovered by scanning for ``N G obj`` (robust to both
  classic xref tables and cross-reference streams without parsing
  either — crawled PDFs frequently have broken xref offsets anyway);
- object streams (``/Type /ObjStm``) expanded, so PDF-1.5+ compressed
  object layouts work;
- content streams decoded for the filters that matter in text PDFs:
  none, ``FlateDecode`` (zlib), ``ASCIIHexDecode``, ``ASCII85Decode``;
  anything else raises toward the codec seam;
- the text operators interpreted positionally: ``BT/ET``, ``Tj``,
  ``TJ``, ``'``, ``"``, with ``Td/TD/T*/Tm`` treated as line breaks.

Honesty contract: simple (Type1/TrueType) fonts with standard
encodings extract exactly — the fixture builder emits these and the
goldens assert byte-equal text. ``/WinAnsiEncoding`` decodes via
cp1252 (smart quotes/dashes in 0x80-0x9F land on the right code
points); the translation applies page-wide, so a page mixing WinAnsi
with another simple encoding is approximate in that byte range. Composite ``/Type0`` (CID) fonts need
a CMap to map bytes to Unicode; pages using them are flagged
``has_type0_fonts=True`` so downstream curation can treat the text as
approximate, the same honesty pattern as the FLAC declared-metadata
index. Encrypted PDFs raise ``NotImplementedError`` (the decryption
seam); every malformed input raises ``ValueError`` (C7: per-item error
rows, never task failures).

Scale shape: one PDF is parsed entirely inside its executor task
(mapInPandas batch) — no shuffle, no driver involvement; the regex
object scan is O(bytes) single-pass.
"""

from __future__ import annotations

import bisect
import re
import zlib

__all__ = ["is_pdf", "extract_pdf_text", "build_pdf"]

PDF_MAGIC = b"%PDF-"

#: untrusted-input caps (C7: refuse before allocating)
MAX_OBJECTS = 1 << 17
MAX_PAGES = 1 << 14
MAX_STREAM_BYTES = 1 << 27  # 128 MiB decompressed per stream


def is_pdf(blob: bytes) -> bool:
    """Sniff: the spec allows junk before the header in the first
    1024 bytes; real crawls exercise that allowance."""
    return blob[:5] == PDF_MAGIC or PDF_MAGIC in blob[:1024]


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug only
        return f"_Ref({self.num})"


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment to EOL
            while i < n and data[i] not in b"\r\n":
                i += 1
        else:
            break
    return i


def _parse_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Literal string ``(...)`` with escapes and balanced parens."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                raise ValueError("string escape at EOF")
            e = data[i + 1]
            i += 2
            if e in b"nrtbf":
                out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                            0x62: 8, 0x66: 12}[e])
            elif e in b"()\\":
                out.append(e)
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_ = chr(e)
                while (len(oct_) < 3 and i < n
                       and 0x30 <= data[i] <= 0x37):
                    oct_ += chr(data[i])
                    i += 1
                out.append(int(oct_, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated literal string")


def _dehex(body: bytes) -> bytes:
    """ASCIIHex payload → bytes (whitespace stripped, odd length padded
    with '0' per spec). Shared by hex strings and ASCIIHexDecode."""
    hx = bytes(c for c in body if c not in _WS)
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii"))
    except (UnicodeDecodeError, ValueError) as e:
        raise ValueError("bad hex string") from e


def _parse_hex_string(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i + 1)
    if end < 0:
        raise ValueError("unterminated hex string")
    return _dehex(data[i + 1:end]), end + 1


_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d+)\s+(\d+)\s+R\b")


def _parse_name(data: bytes, i: int) -> tuple[str, int]:
    j = i + 1
    n = len(data)
    while j < n and data[j] not in _WS and data[j] not in _DELIM:
        j += 1
    raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]),
                        data[i + 1:j])
    return "/" + raw.decode("latin-1"), j


def _parse_value(data: bytes, i: int):
    """One PDF object at ``data[i:]`` → (value, next_index). Indirect
    references become :class:`_Ref` (generation ignored — the object
    scan keeps the last definition of each number, which is how
    incremental updates are meant to resolve)."""
    i = _skip_ws(data, i)
    if i >= len(data):
        raise ValueError("unexpected EOF in object")
    c = data[i]
    if c == 0x3C:  # < or <<
        if data[i + 1:i + 2] == b"<":
            d = {}
            i += 2
            while True:
                i = _skip_ws(data, i)
                if data[i:i + 2] == b">>":
                    return d, i + 2
                if data[i:i + 1] != b"/":
                    raise ValueError("dict key is not a name")
                k, i = _parse_name(data, i)
                v, i = _parse_value(data, i)
                d[k] = v
        return _parse_hex_string(data, i)
    if c == 0x28:
        return _parse_string(data, i)
    if c == 0x2F:
        return _parse_name(data, i)
    if c == 0x5B:  # array
        arr = []
        i += 1
        while True:
            i = _skip_ws(data, i)
            if data[i:i + 1] == b"]":
                return arr, i + 1
            v, i = _parse_value(data, i)
            arr.append(v)
    m = _REF_RE.match(data, i)
    if m:
        return _Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(data, i)
    if m:
        tok = m.group(0)
        val = float(tok) if b"." in tok else int(tok)
        return val, m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data[i:i + len(lit)] == lit:
            return val, i + len(lit)
    raise ValueError(f"unparseable object at byte {i}")


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream(?:\r\n|\n|\r)")


class _Stream:
    __slots__ = ("d", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.d = d
        self.raw = raw


def _decode_stream(obj: _Stream, objects: dict) -> bytes:
    filters = obj.d.get("/Filter")
    if isinstance(filters, _Ref):
        filters = objects.get(filters.num)
    if filters is None:
        filters = []
    elif not isinstance(filters, list):
        filters = [filters]
    if obj.d.get("/DecodeParms") not in (None, [], {}):
        raise ValueError("stream predictors unsupported for content")
    data = obj.raw
    for f in filters:
        if f == "/FlateDecode":
            try:
                dec = zlib.decompressobj()
                data = dec.decompress(data, MAX_STREAM_BYTES)
                if dec.unconsumed_tail:
                    raise ValueError("stream exceeds decompression cap")
            except zlib.error as e:
                raise ValueError(f"bad Flate stream: {e}") from e
        elif f == "/ASCIIHexDecode":
            data = _dehex(data.split(b">", 1)[0])
        elif f == "/ASCII85Decode":
            import base64

            body = data.split(b"~>", 1)[0]
            body = bytes(c for c in body if c not in _WS)
            try:
                data = base64.a85decode(body)
            except ValueError as e:
                raise ValueError("bad ASCII85 stream") from e
        else:
            raise NotImplementedError(f"stream filter {f} unsupported")
    return data


def _scan_objects(blob: bytes) -> tuple[dict, list]:
    """All indirect objects by number (last definition in FILE ORDER
    wins, matching incremental-update semantics — objects unpacked from
    a ``/ObjStm`` take the stream's own offset), object streams
    expanded. Returns ``(objects, spans)`` where ``spans`` is the
    sorted list of ``(start, end)`` byte ranges of every parsed object
    body. Matches that begin inside ANY previously parsed object body —
    stream bytes or a literal string in a plain object — are skipped:
    an uncompressed content stream or a string containing the literal
    text ``N 0 obj`` (a document about PDF syntax) must not inject
    phantom objects over real ones."""
    objects: dict[int, object] = {}
    positions: dict[int, int] = {}  # winning definition's file offset
    spans: list[tuple[int, int]] = []
    # one pass for endstream anchors; per-stream lookup is a bisect,
    # not a find-to-EOF (hostile repeated broken /Length would
    # otherwise cost O(n_objects * blob_size))
    endstreams = [em.start() for em in re.finditer(rb"endstream", blob)]
    count = 0
    skip_until = 0
    for m in _OBJ_RE.finditer(blob):
        if m.start() < skip_until:
            continue
        count += 1
        if count > MAX_OBJECTS:
            raise ValueError("object count exceeds cap")
        num = int(m.group(1))
        try:
            val, j = _parse_value(blob, m.end())
        except (ValueError, IndexError, RecursionError):
            continue  # tolerate one broken object, keep scanning
        body_end = j
        if isinstance(val, dict):
            sm = _STREAM_RE.match(blob, _skip_ws(blob, j))
            if sm:
                start = sm.end()
                ln = val.get("/Length")
                if isinstance(ln, _Ref):
                    ln = None  # resolve below via endstream anchor
                if isinstance(ln, int) and 0 <= ln <= len(blob) - start:
                    end = start + ln
                    # trust /Length only if endstream actually follows
                    tail = blob[end:end + 20]
                    if b"endstream" not in tail:
                        ln = None
                if not isinstance(ln, int):
                    k = bisect.bisect_left(endstreams, start)
                    if k >= len(endstreams):
                        continue
                    ln = endstreams[k] - start
                    # anchor span includes the EOL before 'endstream' —
                    # strip it here ONLY; a trusted, endstream-verified
                    # /Length slice is stream data byte-for-byte (an
                    # uncompressed stream may legitimately end in
                    # 0x0A/0x0D — ADVICE r05)
                    raw = blob[start:start + ln].rstrip(b"\r\n")
                else:
                    raw = blob[start:start + ln]
                val = _Stream(val, raw)
                body_end = start + ln
        skip_until = body_end
        spans.append((m.start(), body_end))
        objects[num] = val
        positions[num] = m.start()
    # expand object streams (PDF 1.5 compressed objects) in file order;
    # an unpacked object overrides a direct definition only when the
    # ObjStm appears LATER in the file (incremental updates repack
    # redefined objects into appended ObjStms)
    objstms = sorted(
        (positions[num], num)
        for num, obj in objects.items()
        if isinstance(obj, _Stream) and obj.d.get("/Type") == "/ObjStm"
    )
    for st_pos, num in objstms:
        obj = objects[num]
        try:
            data = _decode_stream(obj, objects)
            n_objs = obj.d.get("/N")
            first = obj.d.get("/First")
            if not (isinstance(n_objs, int) and isinstance(first, int)):
                continue
            hdr, i = [], 0
            for _ in range(min(n_objs, MAX_OBJECTS)):
                onum, i = _parse_value(data, i)
                off, i = _parse_value(data, i)
                hdr.append((onum, off))
            for onum, off in hdr:
                v, _ = _parse_value(data, first + off)
                if isinstance(onum, int) and positions.get(onum, -1) < st_pos:
                    objects[onum] = v
                    positions[onum] = st_pos
        except (ValueError, NotImplementedError, IndexError, TypeError):
            continue
    return objects, spans


def _resolve(v, objects: dict):
    seen = 0
    while isinstance(v, _Ref):
        v = objects.get(v.num)
        seen += 1
        if seen > 32:
            raise ValueError("reference cycle")
    return v


def _walk_pages(node, objects: dict, out: list, inherited_res=None,
                depth: int = 0):
    """Collect ``(page_dict, effective_resources)`` in page-tree order.
    ``/Resources`` is a spec-inheritable attribute: real generators
    declare fonts once on a ``/Pages`` node and omit them per page, so
    the effective resources carry down the tree."""
    node = _resolve(node, objects)
    if not isinstance(node, dict) or depth > 64:
        return
    res = node.get("/Resources", inherited_res)
    t = node.get("/Type")
    if t == "/Page":
        if len(out) >= MAX_PAGES:
            raise ValueError("page count exceeds cap")
        out.append((node, res))
    elif t == "/Pages" or "/Kids" in node:
        kids = _resolve(node.get("/Kids"), objects)
        if isinstance(kids, list):
            for k in kids:
                _walk_pages(k, objects, out, res, depth + 1)


_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")

# WinAnsiEncoding is cp1252: bytes 0x80-0x9F are smart quotes, dashes,
# ellipsis etc., NOT the Latin-1 C1 controls. Translate just that range
# on top of a latin-1 decode (the 5 cp1252-undefined bytes keep their
# latin-1 identity so no byte is ever dropped).
_WINANSI_FIX: dict[int, str] = {}
for _b in range(0x80, 0xA0):
    try:
        _WINANSI_FIX[_b] = bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:
        pass
del _b


def _page_text(content: bytes, translate: "dict[int, str] | None" = None
               ) -> str:
    """Interpret the text operators of one content stream.
    ``translate`` is an optional ``str.translate`` map applied to each
    shown string (used for WinAnsiEncoding's cp1252 upper range)."""
    out: list[str] = []
    operands: list[object] = []
    i = 0
    n = len(content)

    def _show(b: bytes):
        s = b.decode("latin-1")
        if translate:
            s = s.translate(translate)
        out.append(s)

    def _newline():
        if out and not out[-1].endswith("\n"):
            out.append("\n")

    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i]
        if c == 0x28:
            s, i = _parse_string(content, i)
            operands.append(s)
        elif c == 0x3C and content[i + 1:i + 2] != b"<":
            s, i = _parse_hex_string(content, i)
            operands.append(s)
        elif c == 0x3C:  # inline dict (e.g. BDC property list)
            v, i = _parse_value(content, i)
            operands.append(v)
        elif c == 0x2F:
            nm, i = _parse_name(content, i)
            operands.append(nm)
        elif c == 0x5B:
            v, i = _parse_value(content, i)
            operands.append(v)
        elif _NUM_RE.match(content, i):
            m = _NUM_RE.match(content, i)
            tok = m.group(0)
            operands.append(float(tok) if b"." in tok else int(tok))
            i = m.end()
        else:
            m = _OP_RE.match(content, i)
            if not m:
                i += 1  # unknown byte: skip, stay per-item robust
                continue
            op = m.group(0)
            i = m.end()
            if op == b"Tj" and operands and isinstance(operands[-1], bytes):
                _show(operands[-1])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        _show(el)
            elif op == b"'" and operands and isinstance(operands[-1], bytes):
                _newline()
                _show(operands[-1])
            elif op == b'"' and operands and isinstance(operands[-1], bytes):
                _newline()
                _show(operands[-1])
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                _newline()
            elif op == b"BI":  # inline image: skip to EI
                end = content.find(b"EI", i)
                i = n if end < 0 else end + 2
            operands = []
    return "".join(out)


def extract_pdf_text(blob: bytes) -> dict:
    """PDF bytes → ``{"n_pages", "pages": [str, ...],
    "has_type0_fonts"}``.

    ``pages`` holds one extracted-text string per page in page-tree
    order. ``has_type0_fonts`` is True when any page's resources use a
    composite (CID) font — the byte-to-Unicode mapping then needs a
    CMap this extractor does not implement, so the text should be
    treated as approximate. Raises ``ValueError`` for malformed input
    and ``NotImplementedError`` for encrypted files or unsupported
    stream filters (the seam cases)."""
    try:
        return _extract(blob)
    except (IndexError, KeyError, TypeError, RecursionError,
            OverflowError) as e:
        raise ValueError(f"malformed PDF: {type(e).__name__}") from e


def _is_encrypted(blob: bytes, objects: dict, spans: list) -> bool:
    """/Encrypt lives in the trailer dictionary (classic) or the xref
    stream dict (1.5+). Parse actual trailer dicts outside any object
    body — a page whose TEXT mentions ``trailer``/``/Encrypt`` (a
    document about PDF internals) must not be misrouted to the seam.
    Streaming check: no slices are accumulated, so hostile repeated
    ``trailer`` tokens cost O(bytes), not O(matches * window)."""
    starts = [s for s, _ in spans]

    def _inside(pos: int) -> bool:
        k = bisect.bisect_right(starts, pos) - 1
        return k >= 0 and pos < spans[k][1]

    for tm in re.finditer(rb"trailer\b", blob):
        if _inside(tm.start()):
            continue
        j = _skip_ws(blob, tm.end())
        if blob[j:j + 2] != b"<<":
            continue
        try:
            d, _ = _parse_value(blob, j)
        except (ValueError, IndexError, RecursionError):
            continue
        if isinstance(d, dict) and "/Encrypt" in d:
            return True
    for v in objects.values():
        if (isinstance(v, _Stream) and v.d.get("/Type") == "/XRef"
                and "/Encrypt" in v.d):
            return True
    return False


def _extract(blob: bytes) -> dict:
    if not is_pdf(blob):
        raise ValueError("not a PDF (no %PDF- header)")
    objects, spans = _scan_objects(blob)
    if _is_encrypted(blob, objects, spans):
        raise NotImplementedError("encrypted PDF (decryption seam)")
    catalog = None
    for v in objects.values():
        if isinstance(v, dict) and v.get("/Type") == "/Catalog":
            catalog = v  # last one wins (incremental updates append)
    if catalog is None:
        raise ValueError("PDF has no document catalog")
    pages: list = []
    _walk_pages(catalog.get("/Pages"), objects, pages)
    if not pages:
        raise ValueError("PDF catalog has no pages")
    texts = []
    has_type0 = False
    for pg, res in pages:
        res = _resolve(res, objects)
        translate = None
        if isinstance(res, dict):
            fonts = _resolve(res.get("/Font"), objects)
            if isinstance(fonts, dict):
                for f in fonts.values():
                    fd = _resolve(f, objects)
                    if not isinstance(fd, dict):
                        continue
                    if fd.get("/Subtype") == "/Type0":
                        has_type0 = True
                    enc = _resolve(fd.get("/Encoding"), objects)
                    if enc == "/WinAnsiEncoding":
                        translate = _WINANSI_FIX
        contents = _resolve(pg.get("/Contents"), objects)
        parts = contents if isinstance(contents, list) else [contents]
        buf = bytearray()
        for part in parts:
            part = _resolve(part, objects)
            if isinstance(part, _Stream):
                buf += _decode_stream(part, objects)
                buf += b"\n"
        texts.append(_page_text(bytes(buf), translate).rstrip("\n"))
    return {"n_pages": len(texts), "pages": texts,
            "has_type0_fonts": has_type0}


# ---------------------------------------------------------------------------
# fixture builder (tests/goldens only)
# ---------------------------------------------------------------------------

def build_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Deterministic single-font PDF: one page per entry, each entry a
    list of text lines shown with ``Tj`` + ``T*``. Classic xref table
    with correct offsets, optional Flate content streams. Text is
    WinAnsi/ASCII so extraction is exact — the golden states the input
    lines back."""
    objs: list[bytes] = []  # 1-based object bodies

    def esc(s: str) -> bytes:
        return (s.replace("\\", r"\\").replace("(", r"\(")
                 .replace(")", r"\)").encode("latin-1"))

    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(f"<< /Type /Pages /Count {n_pages} /Kids [{kids}] >>"
                .encode())  # 2
    font_num = 3 + 2 * n_pages
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        content = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for ln in lines:
            content += b"(" + esc(ln) + b") Tj T*\n"
        content += b"ET"
        body = bytes(content)
        if compress:
            body = zlib.compress(body)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {page_num + 1} 0 R >>".encode()
        )
        objs.append(b"<< " + filt
                    + f"/Length {len(body)} >>".encode()
                    + b"\nstream\n" + body + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                b"/Encoding /WinAnsiEncoding >>")
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)
