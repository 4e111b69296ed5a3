"""Fast HTML parse kernel for the extraction UDFs.

Round-2 profiling put ~80 % of ``extract_fields``' per-page cost inside
the stdlib ``html.parser`` tokenizer (general regexes, line/column
bookkeeping, layered method dispatch). At 100 TB the parse kernel is the
single largest CPU line item, so this module fuses tokenizer + tree
builder into ONE scanning loop over local variables — the
``tests/independent_extract.py`` design productionized, now building the
full ``_Node`` tree and all collectors, not just text.

Parity contract (the byte-identical ``pages.text`` invariant from
BASELINE.json input_hint): on the grammar subset it accepts, the fused
parser reproduces EXACTLY what ``extract._PageParser`` fed by
``html.parser`` produces — same chunks (⇒ same extract_text bytes), same
title capture, same hrefs, same tree, same close-order span/rating
collectors. The moment the input leaves that subset (exotic attribute
syntax, marked sections, unterminated constructs, tolerant-parse edge
cases) it raises :class:`FastParseBailout` and ``extract.parse_page``
re-parses with the stdlib kernel — so byte-parity holds for EVERY input
by construction, and the fixed + hypothesis-fuzz corpora assert
identical end-to-end output of the combined path against the pure-stdlib
twin (tests/test_fastparse.py).

Tokenizer spec anchors replicated from CPython 3.11 html.parser:
- data is entity-unescaped (``convert_charrefs``); ``<`` not opening a
  construct is literal text
- comments end at ``--\\s*>``; ``<!doctype`` ends at the first ``>``;
  other ``<!`` constructs / ``<![`` marked sections → bailout
- processing instructions end at the first ``>``
- tag and attr names lowercased; attr values entity-unescaped; ``/>``
  is a leaf (and never enters CDATA mode)
- ``script``/``style`` are CDATA: content runs raw to the first
  ``</\\s*<name>``; unterminated CDATA content is dropped
- ``</>`` vanishes silently (no event, no separator)
"""

from __future__ import annotations

import re
from html import unescape


class FastParseBailout(Exception):
    """Input left the verified fast-path grammar; caller must re-parse
    with the stdlib kernel."""


_STARTTAG_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:._-]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>'\"=`<]+))?)*)"
    r"\s*(/?)>"
)
_ATTR_RE = re.compile(
    r"\s+([a-zA-Z_:][-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s>'\"=`<]+))?"
)
_ENDTAG_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_CDATA_ENDTAG = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")


class FastPage:
    """Duck-typed stand-in for ``extract._PageParser``'s public surface
    (chunks/title_chunks/hrefs/span_nodes/rating_nodes/root + the lazy
    text properties)."""

    __slots__ = (
        "root", "chunks", "title_chunks", "hrefs",
        "span_nodes", "rating_nodes", "_in_title", "_skip_depth",
    )

    @property
    def span_texts(self):
        return [n.text_content() for n in self.span_nodes]

    @property
    def rating_class_texts(self):
        return [n.text_content() for n in self.rating_nodes]


def fast_parse(s: str):
    """Parse ``s`` into a :class:`FastPage`, or raise
    :class:`FastParseBailout`."""
    from .extract import _SKIP_TAGS, _VOID_TAGS, _Node

    root = _Node("#root", "", None)
    open_stack = [root]
    chunks: list[str] = []
    title_chunks: list[str] = []
    hrefs: list[str] = []
    span_nodes: list = []
    rating_nodes: list = []
    skip_depth = 0
    in_title = False

    i, n = 0, len(s)
    find = s.find
    st_match = _STARTTAG_RE.match
    et_match = _ENDTAG_RE.match
    chunks_append = chunks.append

    def close_node(node) -> None:
        nonlocal in_title
        tag = node.tag
        if tag == "title":
            in_title = False
        if tag == "span":
            span_nodes.append(node)
        cls = node.cls
        if cls and "rating" in cls.lower():
            rating_nodes.append(node)

    while i < n:
        j = find("<", i)
        if j != i:
            if j < 0:
                j = n
            if not skip_depth:
                chunk = s[i:j]
                if "&" in chunk:
                    chunk = unescape(chunk)
                chunks_append(chunk)
                open_stack[-1].content.append(chunk)
                if in_title:
                    title_chunks.append(chunk)
            i = j
            if i >= n:
                break
        if i + 1 >= n:
            if not skip_depth:
                chunks_append("<")
                open_stack[-1].content.append("<")
                if in_title:
                    title_chunks.append("<")
            break
        nxt = s[i + 1]
        if nxt in _ASCII_LETTERS:
            m = st_match(s, i)
            if m is None:
                raise FastParseBailout("non-strict start tag")
            tag, attr_blob, selfclose = m.group(1, 2, 3)
            if not tag.islower():
                tag = tag.lower()
            i = m.end()
            cls = ""
            # the big regex already VALIDATED the attr grammar (group 2
            # is the same repetition); per-attr extraction only matters
            # for class (any tag) and href (<a>), so skip the tokenize
            # when neither name can be present
            grab_href = tag == "a" and not skip_depth
            if attr_blob and (
                "class" in attr_blob or (grab_href and "href" in attr_blob)
            ):
                pos, blob_len = 0, len(attr_blob)
                attr_match = _ATTR_RE.match
                while pos < blob_len:
                    am = attr_match(attr_blob, pos)
                    if am is None:
                        raise FastParseBailout("attr junk")
                    pos = am.end()
                    k, v = am.group(1, 2)
                    if v is not None:
                        if v[0] in "\"'":
                            v = v[1:-1]
                        if "&" in v:
                            v = unescape(v)
                    if not k.islower():
                        k = k.lower()
                    if grab_href and k == "href" and v is not None:
                        hrefs.append(v)
                    elif k == "class" and v and not cls:
                        cls = v
            if selfclose:
                # leaf: attach, never push, never CDATA
                if tag in _SKIP_TAGS or skip_depth:
                    if not skip_depth:
                        chunks_append(" ")
                    continue
                chunks_append(" ")
                top = open_stack[-1]
                top.content.append(_Node(tag, cls, top))
                continue
            if tag in _SKIP_TAGS:
                if not skip_depth:
                    chunks_append(" ")
                skip_depth += 1
            elif not skip_depth:
                chunks_append(" ")
                if tag == "title":
                    in_title = True
                top = open_stack[-1]
                node = _Node(tag, cls, top)
                top.content.append(node)
                if tag not in _VOID_TAGS:
                    open_stack.append(node)
            # CDATA mode is a TOKENIZER property: entered for script/
            # style regardless of skip depth (stdlib parity)
            if tag in _CDATA_CLOSE:
                cm = _CDATA_CLOSE[tag].search(s, i)
                if cm is None:
                    # unterminated rawtext is dropped; close never fires
                    i = n
                    break
                # content is raw data — _PageParser drops it (depth>0)
                em = _CDATA_ENDTAG[tag].match(s, cm.start())
                if em is None:
                    raise FastParseBailout("non-strict cdata close")
                # end tag event for a skip tag: decrement THEN separator
                skip_depth -= 1
                if not skip_depth:
                    chunks_append(" ")
                i = em.end()
            continue
        if nxt == "/":
            # string fast path for the plain `</name>` shape (no regex)
            gt = find(">", i + 2)
            if gt < 0:
                raise FastParseBailout("unterminated end tag")
            tag = s[i + 2 : gt]
            if tag and tag[0] in _ASCII_LETTERS and tag.isascii() and tag.isalnum():
                if not tag.islower():
                    tag = tag.lower()
                i = gt + 1
            else:
                m = et_match(s, i)
                if m is None:
                    if s[i : i + 3] == "</>":  # vanishes silently (stdlib)
                        i += 3
                        continue
                    raise FastParseBailout("non-strict end tag")
                tag = m.group(1)
                if not tag.islower():
                    tag = tag.lower()
                i = m.end()
            if tag in _SKIP_TAGS:
                if skip_depth:
                    skip_depth -= 1
                if not skip_depth:
                    chunks_append(" ")
                continue
            if skip_depth:
                continue
            chunks_append(" ")
            top = open_stack[-1]
            if top.tag == tag:  # fast path: well-nested close (inlined)
                if tag == "span":
                    span_nodes.append(top)
                elif tag == "title":
                    in_title = False
                cls = top.cls
                if cls and "rating" in cls.lower():
                    rating_nodes.append(top)
                open_stack.pop()
                continue
            for idx in range(len(open_stack) - 1, 0, -1):
                if open_stack[idx].tag == tag:
                    for node in reversed(open_stack[idx:]):
                        close_node(node)
                    del open_stack[idx:]
                    break
            continue
        if nxt == "!":
            if s.startswith("<!--", i):
                cm = _COMMENT_CLOSE_RE.search(s, i + 4)
                if cm is None:
                    raise FastParseBailout("unterminated comment")
                if not skip_depth:
                    chunks_append(" ")
                i = cm.end()
            elif s.startswith("<![", i):
                raise FastParseBailout("marked section")
            elif s[i : i + 9].lower() == "<!doctype":
                gt = find(">", i + 9)
                if gt < 0:
                    raise FastParseBailout("unterminated doctype")
                if not skip_depth:
                    chunks_append(" ")
                i = gt + 1
            else:
                raise FastParseBailout("bogus <! construct")
            continue
        if nxt == "?":
            gt = find(">", i + 2)
            if gt < 0:
                raise FastParseBailout("unterminated pi")
            if not skip_depth:
                chunks_append(" ")
            i = gt + 1
            continue
        # literal "<" — text, not markup, not a separator
        if not skip_depth:
            chunks_append("<")
            open_stack[-1].content.append("<")
            if in_title:
                title_chunks.append("<")
        i += 1

    # EOF: implicitly close anything left open (innermost first)
    for node in reversed(open_stack[1:]):
        close_node(node)
    del open_stack[1:]

    page = FastPage()
    page.root = root
    page.chunks = chunks
    page.title_chunks = title_chunks
    page.hrefs = hrefs
    page.span_nodes = span_nodes
    page.rating_nodes = rating_nodes
    page._in_title = in_title
    page._skip_depth = skip_depth
    return page
