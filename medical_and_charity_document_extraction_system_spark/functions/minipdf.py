"""Minimal real ``%PDF`` writer + text extractor, pure Python.

Why this exists: the reference's flagship input is real PDFs parsed
with PyMuPDF (/root/reference/backend/app/services/pdf_service.py:
107-229), but fitz is not installable in this environment — without
this module the real-PDF branch of ``operators/pdf.py`` would be an
untested import-gate. Here we implement the common *text-PDF* subset
from the PDF 1.4 spec (public ISO 32000):

- ``build_pdf(pages)``         — emits a structurally valid PDF:
  catalog -> page tree -> per-page FlateDecode (or raw) content
  streams, one ``Tj`` text-show per line, correct xref table.
- ``extract_text_pages(data)`` — walks the page tree (/Kids order),
  inflates content streams, and concatenates ``Tj``/``'``/``TJ``
  string operands inside BT/ET blocks; ``Td``/``TD``/``T*`` between
  shows emit line breaks. PDF string escapes and balanced parens are
  handled.
- ``merge_pdfs(datas)``        — page-level merge: re-emits one PDF
  whose pages are the concatenation of the inputs' extracted pages
  (the reference's merge_pdfs artifact, pdf_service.py:23-85).

Scope: text extraction covers uncompressed and FlateDecode content
streams with literal-string and hex-string operands (UTF-16BE when
BOM-prefixed, latin-1 otherwise) — what ``build_pdf`` and the
overwhelming majority of machine-generated text PDFs emit.
CMap-subsetted fonts and object streams raise ValueError so callers
degrade to the scanned/error route (pdf_service.py:258 semantics)
instead of silently extracting garbage.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:\[(.*?)\]|(\d+)\s+\d+\s+R)", re.DOTALL)

_OP_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+\d+\s+R)")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _show_operand(s: str) -> bytes:
    """One text-show operand for a single line: an escaped literal
    string for latin-1 text, a BOM-prefixed UTF-16BE hex string
    otherwise (so non-latin-1 documents degrade to a different
    encoding, never to a writer crash)."""
    try:
        out = s.encode("latin-1")
    except UnicodeEncodeError:
        return b"<FEFF" + s.encode("utf-16-be").hex().upper().encode() + b">"
    out = out.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    return b"(" + out.replace(b"\r", b"\\r").replace(b"\n", b"\\n") + b")"


def _decode_hex_string(h: bytes) -> str:
    """PDF hex string: whitespace ignored, odd length padded with 0.
    UTF-16BE when BOM-prefixed (the common no-CMap case for simple
    text), latin-1 byte codes otherwise."""
    compact = b"".join(h.split())
    if len(compact) % 2:
        compact += b"0"
    data = bytes.fromhex(compact.decode("ascii"))
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace")
    return data.decode("latin-1")


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt and nxt in b"01234567":  # octal, digits 0-7 ONLY
            # (spec 7.3.4.2: "\8" is a literal '8', "\48" is "\4"+'8')
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j] in b"01234567":
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            # spec 7.3.4.2: backslash-EOL is a single continuation;
            # a \<CR><LF> pair consumes BOTH bytes
            i += 2
            if nxt == b"\r" and raw[i : i + 1] == b"\n":
                i += 1
        else:  # lone backslash: drop it (spec: ignore)
            i += 1
    return out.decode("latin-1")


# ------------------------------------------------------------------ write
def build_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Emit a valid single-font text PDF, one input string per page;
    lines inside a page become separate Tj shows with Td line moves.
    Deterministic: same pages -> same bytes."""
    objs: list[bytes] = []  # 1-indexed bodies, object n = index n-1
    n_pages = len(pages)
    # 1: catalog, 2: page tree, 3: font; pages at 4..3+n; contents after
    kids = b" ".join(b"%d 0 R" % (4 + i) for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
    )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    content_ids = []
    for i in range(n_pages):
        cid = 4 + n_pages + i
        content_ids.append(cid)
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % cid
        )
    for i, page in enumerate(pages):
        shows = []
        for line in page.split("\n"):
            shows.append(_show_operand(line) + b" Tj")
        body = (
            b"BT /F1 11 Tf 72 720 Td "
            + b" 0 -14 Td ".join(shows)
            + b" ET"
        )
        if compress:
            data = zlib.compress(body, 9)
            objs.append(
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
                + data + b"\nendstream"
            )
        else:
            objs.append(
                b"<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream"
            )
    # assemble with xref
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)


# ------------------------------------------------------------------- read
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)(?:\r?\n)?endstream", re.DOTALL)


def _stream_bytes(body: bytes) -> bytes:
    m = _STREAM_START_RE.search(body)
    if m is None:
        raise ValueError("content object has no stream")
    head = body[: m.start()]
    lm = _LENGTH_RE.search(head)
    if lm is not None:
        # authoritative byte count: a regex scan for 'endstream' would
        # chop a trailing \r off ~1/256 of deflate payloads (the EOL
        # before 'endstream' is ambiguous with data bytes)
        n = int(lm.group(1))
        data = body[m.end() : m.end() + n]
        if len(data) < n:
            raise ValueError("stream shorter than /Length")
    else:
        # indirect or missing /Length: fall back to the delimiter scan
        e = _STREAM_RE.search(body, m.start())
        if e is None:
            raise ValueError("unterminated stream")
        data = e.group(1)
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error as exc:
            raise ValueError(f"bad FlateDecode stream: {exc}") from None
    elif b"/Filter" in head:
        raise ValueError("unsupported stream filter")
    return data


def _tokenize_content(content: bytes):
    """Linear scan of a content stream into (kind, payload) tokens:
    ``('str', bytes)`` for literal strings (balanced parens, escapes),
    ``('hex', bytes)`` for hex strings, ``('op', name)`` for
    operators. Operand-aware on purpose: a regex that looks for
    ``BT``/``ET``/``TJ`` markers directly would false-match them
    INSIDE string operands (e.g. the word "BUDGET" contains ET) and
    truncate the page text."""
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c == 0x28:  # '(' — literal string, balanced-paren scan
            depth, j = 1, i + 1
            out = bytearray()
            while j < n:
                ch = content[j]
                if ch == 0x5C:  # backslash: escape consumes 2 bytes
                    out += content[j : j + 2]
                    j += 2
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if depth == 0:
                        break
                out.append(ch)
                j += 1
            yield ("str", bytes(out))
            i = j + 1
        elif c == 0x3C:  # '<'
            if content[i : i + 2] == b"<<":  # inline dict: not a string
                i += 2
                continue
            j = content.find(b">", i + 1)
            if j == -1:
                break
            yield ("hex", content[i + 1 : j])
            i = j + 1
        else:
            m = _OP_RE.match(content, i)
            if m is not None:
                yield ("op", m.group(0))
                i = m.end()
            else:
                i += 1  # numbers, names, delimiters, whitespace


_SHOW_NEWLINE_OPS = (b"'", b'"')  # shows that imply move-to-next-line
_MOVE_OPS = (b"Td", b"TD", b"T*")


def _text_from_content(content: bytes) -> str:
    """Concatenate text shows between BT..ET; Td/TD/T* (and the
    '/\" show variants) between shows start a new line — what a
    layout-aware extractor (fitz get_text) returns for
    build_pdf-shaped pages. Postfix evaluation: string/hex operands
    collect until an operator consumes or discards them."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []
    in_text = False
    first_move = True

    def newline() -> None:
        nonlocal first_move
        if first_move:  # the initial cursor placement
            first_move = False
            return
        lines.append("".join(cur))
        cur.clear()

    for kind, payload in _tokenize_content(content):
        if kind == "str":
            if in_text:
                pending.append(_unescape_pdf_string(payload))
        elif kind == "hex":
            if in_text:
                pending.append(_decode_hex_string(payload))
        elif payload == b"BT":
            in_text, first_move = True, True
            pending.clear()
        elif payload == b"ET":
            in_text = False
            pending.clear()
            if cur:  # each BT block ends its own line
                lines.append("".join(cur))
                cur.clear()
        elif not in_text:
            continue
        elif payload == b"Tj":
            if pending:
                cur.append(pending[-1])
            pending.clear()
        elif payload in _SHOW_NEWLINE_OPS:
            newline()
            if pending:
                cur.append(pending[-1])
            pending.clear()
        elif payload == b"TJ":
            cur.extend(pending)  # array shows in operand order
            pending.clear()
        elif payload in _MOVE_OPS:
            newline()
            pending.clear()
        else:  # Tf, Tc, gs, ... — operands were not text shows
            pending.clear()
    if cur:
        lines.append("".join(cur))
    return "\n".join(lines)


def extract_text_pages(data: bytes) -> list[str]:
    """Page texts in /Kids order. Raises ValueError on encrypted,
    page-less, or unsupported-filter PDFs (callers route those to the
    error/scanned path, pdf_service.py:258)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a %PDF payload")
    if b"/Encrypt" in data:
        raise ValueError("encrypted PDF")
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    pages_nodes = [
        (n, b) for n, b in objs.items()
        if b"/Type" in b and re.search(rb"/Type\s*/Pages\b", b)
    ]
    page_ids: list[int] = []
    for _, body in sorted(pages_nodes):
        km = _KIDS_RE.search(body)
        if km:
            page_ids.extend(int(r.group(1)) for r in _REF_RE.finditer(km.group(1)))
    if not page_ids:  # no page tree: fall back to object order
        page_ids = sorted(
            n for n, b in objs.items() if re.search(rb"/Type\s*/Page\b", b)
        )
    page_ids = [
        n for n in page_ids
        if n in objs and re.search(rb"/Type\s*/Page\b", objs[n])
    ]
    if not page_ids:
        raise ValueError("PDF has no pages")
    out = []
    for pid in page_ids:
        cm = _CONTENTS_RE.search(objs[pid])
        if cm is None:
            out.append("")
            continue
        refs = (
            [int(r.group(1)) for r in _REF_RE.finditer(cm.group(1))]
            if cm.group(1) is not None
            else [int(cm.group(2))]
        )
        content = b"\n".join(_stream_bytes(objs[r]) for r in refs if r in objs)
        out.append(_text_from_content(content))
    return out


def merge_pages(
    datas: list[bytes], skip_errors: bool = False
) -> tuple[list[str], int]:
    """Extract and concatenate the inputs' pages in order. With
    ``skip_errors`` unparseable members are skipped and counted (the
    reference's encrypted-input degrade path, pdf_service.py:44-49);
    otherwise the first bad input raises. Returns (pages, n_skipped).
    The one definition of what a merge contains — both merge_pdfs and
    the distributed merge_pdfs_by_key build on it."""
    pages: list[str] = []
    skipped = 0
    for d in datas:
        try:
            pages.extend(extract_text_pages(bytes(d)))
        except (ValueError, TypeError):
            if not skip_errors:
                raise
            skipped += 1
    return pages, skipped


def merge_pdfs(datas: list[bytes], compress: bool = True) -> bytes:
    """One merged PDF whose pages are the inputs' pages concatenated
    in order — the reference's merge_pdfs output document
    (pdf_service.py:23-85), page-level (re-emitted, not object-copied,
    which is all the text-PDF subset needs)."""
    pages, _ = merge_pages(datas)
    return build_pdf(pages, compress=compress)
