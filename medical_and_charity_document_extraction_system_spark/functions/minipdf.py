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

Scope: text extraction covers uncompressed, FlateDecode and
LZWDecode content streams (including PNG-predictor /DecodeParms;
LZW is the legacy pre-Flate writer filter, decoded per ISO 32000-1
7.4.4 with the spec's worked example pinned in tests) with literal-string
and hex-string operands (UTF-16BE when BOM-prefixed, latin-1
otherwise), classic xref tables AND the PDF 1.5+ modern-writer shape:
cross-reference streams (/Type /XRef, /W-packed, /Prev chains) and
object streams (/Type /ObjStm). ``build_pdf(..., xref_stream=True)``
emits that modern shape itself, so the round-trip property covers it.
CMap-subsetted fonts raise ValueError so callers degrade to the
scanned/error route (pdf_service.py:258 semantics) instead of
silently extracting garbage.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:\[(.*?)\]|(\d+)\s+\d+\s+R)", re.DOTALL)

_OP_RE = re.compile(rb"[A-Za-z'\"*][A-Za-z0-9'\"*]*")
_NAME_RE = re.compile(rb"/([^\s/<>\[\]()%]*)")
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
def _stream_obj(body: bytes, compress: bool) -> bytes:
    if compress:
        data = zlib.compress(body, 9)
        return (
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(data)
            + data + b"\nendstream"
        )
    return b"<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream"


def _tounicode_cmap(chars: list[str]) -> bytes:
    """A /ToUnicode CMap stream body mapping subset CIDs (1-based,
    first-appearance order — the subsetted-font shape real generators
    emit) to Unicode, bfchar blocks capped at 100 entries per the
    CMap spec."""
    out = bytearray(
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    )
    for start in range(0, len(chars), 100):
        block = chars[start : start + 100]
        out += b"%d beginbfchar\n" % len(block)
        for i, ch in enumerate(block, start=start):
            dst = ch.encode("utf-16-be").hex().upper().encode()
            out += b"<%04X> <" % (i + 1) + dst + b">\n"
        out += b"endbfchar\n"
    out += (
        b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    )
    return bytes(out)


def _type0_objects(pages: list[str], compress: bool) -> tuple[list[bytes], int]:
    """Object list for the Type0 (composite, Identity-H, subsetted-CID)
    font shape — the other common modern-writer generation: text shows
    are 2-byte CID hex strings meaningless without the font's
    /ToUnicode CMap (reference handles these via fitz,
    pdf_service.py:174-229). Layout: 1 catalog, 2 page tree, 3 Type0
    font, 4 CIDFontType2 descendant, 5..4+n page dicts (all
    non-stream), then 5+n ToUnicode stream and 6+n..5+2n content
    streams (streams stay top-level for the ObjStm assembly)."""
    n_pages = len(pages)
    chars: list[str] = []
    seen: set[str] = set()
    for page in pages:
        for line in page.split("\n"):
            for ch in line:
                if ch not in seen:
                    seen.add(ch)
                    chars.append(ch)
    if len(chars) > 0xFFFF:
        raise ValueError("too many distinct characters for a 2-byte CID subset")
    cid_of = {ch: i + 1 for i, ch in enumerate(chars)}
    tounicode_id = 5 + n_pages
    kids = b" ".join(b"%d 0 R" % (5 + i) for i in range(n_pages))
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages)
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /AAAAAA+Synthetic "
        b"/Encoding /Identity-H /DescendantFonts [4 0 R] "
        b"/ToUnicode %d 0 R >>" % tounicode_id
    )
    objs.append(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /AAAAAA+Synthetic "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /DW 1000 >>"
    )
    for i in range(n_pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (6 + n_pages + i)
        )
    objs.append(_stream_obj(_tounicode_cmap(chars), compress))
    for page in pages:
        shows = []
        for line in page.split("\n"):
            hexs = "".join("%04X" % cid_of[ch] for ch in line)
            shows.append(b"<" + hexs.encode("ascii") + b"> Tj")
        body = b"BT /F1 11 Tf 72 720 Td " + b" 0 -14 Td ".join(shows) + b" ET"
        objs.append(_stream_obj(body, compress))
    return objs, 4 + n_pages


def build_pdf(
    pages: list[str],
    compress: bool = True,
    xref_stream: bool = False,
    font: str = "type1",
) -> bytes:
    """Emit a valid single-font text PDF, one input string per page;
    lines inside a page become separate Tj shows with Td line moves.
    Deterministic: same pages -> same bytes.

    ``xref_stream=True`` emits the PDF 1.5+ modern-writer shape
    instead of the classic table: catalog/page-tree/font/page dicts
    packed into a /Type /ObjStm object stream, content streams
    top-level (streams cannot live inside an ObjStm, spec 7.5.7), and
    a /W-packed FlateDecode cross-reference STREAM with type-1 and
    type-2 entries — the dominant shape modern generators write and
    the fixture source for the reader's xref-stream path.

    ``font="type0"`` emits the subsetted-CID composite-font shape
    (Identity-H Type0 + /ToUnicode CMap, 2-byte hex CID shows) — the
    other common modern generation, readable only through the CMap."""
    n_pages = len(pages)
    if font == "type0":
        objs, n_nonstream = _type0_objects(pages, compress)
    elif font == "type1":
        objs = []  # 1-indexed bodies, object n = index n-1
        # 1: catalog, 2: page tree, 3: font; pages 4..3+n; contents after
        kids = b" ".join(b"%d 0 R" % (4 + i) for i in range(n_pages))
        objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
        objs.append(
            b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages
        )
        objs.append(
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        )
        for i in range(n_pages):
            objs.append(
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
                % (4 + n_pages + i)
            )
        for page in pages:
            shows = []
            for line in page.split("\n"):
                shows.append(_show_operand(line) + b" Tj")
            body = (
                b"BT /F1 11 Tf 72 720 Td "
                + b" 0 -14 Td ".join(shows)
                + b" ET"
            )
            objs.append(_stream_obj(body, compress))
        n_nonstream = 3 + n_pages
    else:
        raise ValueError(f"unknown font shape {font!r}")
    if xref_stream:
        return _assemble_xref_stream(objs, n_nonstream)
    # assemble with the classic xref table
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


def _assemble_xref_stream(objs: list[bytes], n_nonstream: int) -> bytes:
    """PDF 1.5 assembly: the first ``n_nonstream`` objects (catalog,
    page tree, font dicts, page dicts) into one ObjStm; stream objects
    (ToUnicode, content) top-level; then the /W [1 4 2] xref stream."""
    stm_id = len(objs) + 1  # the ObjStm
    xref_id = len(objs) + 2  # the xref stream
    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for n in range(n_nonstream + 1, len(objs) + 1):  # content streams
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n - 1] + b"\nendobj\n"
    # object stream: header pairs, then packed bodies
    bodies = [objs[i] for i in range(n_nonstream)]
    packed = bytearray()
    pairs = []
    for n, body in enumerate(bodies, start=1):
        pairs.append(b"%d %d" % (n, len(packed)))
        packed += body + b"\n"
    header = b" ".join(pairs) + b"\n"
    stm_payload = zlib.compress(bytes(header) + bytes(packed), 9)
    offsets[stm_id] = len(out)
    out += (
        b"%d 0 obj\n<< /Type /ObjStm /N %d /First %d /Length %d "
        b"/Filter /FlateDecode >>\nstream\n"
        % (stm_id, n_nonstream, len(header), len(stm_payload))
        + stm_payload
        + b"\nendstream\nendobj\n"
    )
    # xref stream rows: W = [1 4 2]
    xref_pos = len(out)
    rows = bytearray()
    rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
    for n in range(1, xref_id + 1):
        if n <= n_nonstream:  # type 2: (ObjStm number, index inside)
            rows += bytes([2]) + stm_id.to_bytes(4, "big") + (n - 1).to_bytes(2, "big")
        else:  # type 1: byte offset
            off = offsets[n] if n != xref_id else xref_pos
            rows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    xref_payload = zlib.compress(bytes(rows), 9)
    out += (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 4 2] /Root 1 0 R "
        b"/Length %d /Filter /FlateDecode >>\nstream\n"
        % (xref_id, xref_id + 1, len(xref_payload))
        + xref_payload
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref_pos
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
        data = _apply_predictor(head, data)
    elif b"/LZWDecode" in head:
        em = _EARLY_RE.search(head)
        data = _lzw_decode(data, early=int(em.group(1)) if em else 1)
        data = _apply_predictor(head, data)
    elif b"/Filter" in head:
        raise ValueError("unsupported stream filter")
    return data


_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """PDF /LZWDecode (spec 7.4.4 — the TIFF LZW variant): MSB-first
    variable-width codes 9..12 bits, clear code 256, EOD 257, code
    width grows one code EARLY by default (/EarlyChange 1). The
    legacy-writer filter (pre-Flate PDFs and Acrobat <= 3 output);
    decode-only, like every reader — the writer side stays Flate."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:  # clear table
                table = []
                width = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("bad LZW stream: first code not literal")
                entry = bytes([code])
            elif code < 256:
                entry = bytes([code])
            elif 258 <= code < 258 + len(table):
                entry = table[code - 258]
            elif code == 258 + len(table):  # KwKwK
                entry = prev + prev[:1]
            else:
                raise ValueError("bad LZW stream: code out of range")
            if prev is not None:
                table.append(prev + entry[:1])
            out += entry
            prev = entry
            # the decoder's table lags the encoder's by ONE entry at
            # read time (the next read's add completes it), so the
            # width check anticipates that pending entry: +1
            if 258 + len(table) + 1 + early >= (1 << width) and width < 12:
                width += 1
        acc &= (1 << nbits) - 1  # keep the residue bounded
    return bytes(out)  # missing EOD: tolerate (readers do)


_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")


def _apply_predictor(head: bytes, data: bytes) -> bytes:
    """PNG predictors (/DecodeParms /Predictor >= 10) — what xref
    streams almost universally use. Reuses the spec-identical row
    unfilter from functions/png.py (PDF 7.4.4.4 defers to the PNG
    filter spec)."""
    pm = _PRED_RE.search(head)
    pred = int(pm.group(1)) if pm else 1
    if pred == 1:
        return data
    if pred < 10:
        raise ValueError(f"unsupported TIFF predictor {pred}")
    cm, km, bm = _COLUMNS_RE.search(head), _COLORS_RE.search(head), _BPC_RE.search(head)
    columns = int(cm.group(1)) if cm else 1
    colors = int(km.group(1)) if km else 1
    bpc = int(bm.group(1)) if bm else 8
    bpp = max(1, colors * bpc // 8)
    rowbytes = (columns * colors * bpc + 7) // 8
    if len(data) % (rowbytes + 1):
        raise ValueError("predictor data not a whole number of rows")
    from .png import _unfilter

    return _unfilter(data, len(data) // (rowbytes + 1), rowbytes, bpp).tobytes()


# --------------------------------------------- modern xref / ObjStm read
_N_RE = re.compile(rb"/N\s+(\d+)")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_W_RE = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_INDEX_RE = re.compile(rb"/Index\s*\[([\d\s]+)\]")
_SIZE_RE = re.compile(rb"/Size\s+(\d+)")
_PREV_RE = re.compile(rb"/Prev\s+(\d+)")
_OBJ_AT_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")


def _parse_objstm(body: bytes) -> dict[int, bytes]:
    """/Type /ObjStm -> {objnum: body bytes}. Layout (spec 7.5.7):
    N (objnum, byte-offset) integer pairs, then the objects packed
    back to back starting at /First."""
    nm, fm = _N_RE.search(body), _FIRST_RE.search(body)
    if nm is None or fm is None:
        raise ValueError("ObjStm missing /N or /First")
    n, first = int(nm.group(1)), int(fm.group(1))
    data = _stream_bytes(body)
    header = data[:first].split()
    if len(header) < 2 * n:
        raise ValueError("ObjStm header shorter than /N pairs")
    nums = [int(header[2 * i]) for i in range(n)]
    offs = [int(header[2 * i + 1]) for i in range(n)]
    out: dict[int, bytes] = {}
    for i in range(n):
        end = first + offs[i + 1] if i + 1 < n else len(data)
        out[nums[i]] = data[first + offs[i] : end]
    return out


def _walk_xref_streams(data: bytes):
    """Follow startxref -> /Type /XRef -> /Prev chain; yields
    (objnum, entry) with entry ('top', offset) or ('stm', stream_obj,
    index). First sighting in chain order wins (newest section first —
    the incremental-update rule). Returns None when the file uses a
    classic xref table (the scan path covers those)."""
    sm = None
    for sm in _STARTXREF_RE.finditer(data):
        pass  # last startxref = newest section
    if sm is None:
        return None
    pos, seen = int(sm.group(1)), set()
    entries: dict[int, tuple] = {}
    while pos and pos not in seen and 0 <= pos < len(data):
        seen.add(pos)
        m = _OBJ_AT_RE.match(data, pos)
        if m is None or not re.search(rb"/Type\s*/XRef\b", m.group(2)):
            return None  # classic table (or damage) — scan fallback
        body = m.group(2)
        wm = _W_RE.search(body)
        if wm is None:
            raise ValueError("xref stream missing /W")
        w = [int(x) for x in wm.groups()]
        im, zm = _INDEX_RE.search(body), _SIZE_RE.search(body)
        if im is not None:
            idx = [int(x) for x in im.group(1).split()]
        elif zm is not None:
            idx = [0, int(zm.group(1))]
        else:
            raise ValueError("xref stream missing /Index and /Size")
        raw = _stream_bytes(body)
        rowlen = sum(w)
        pos_in = 0
        for s in range(0, len(idx), 2):
            start, count = idx[s], idx[s + 1]
            for objnum in range(start, start + count):
                row = raw[pos_in : pos_in + rowlen]
                if len(row) < rowlen:
                    raise ValueError("truncated xref stream")
                pos_in += rowlen
                f = []
                o = 0
                for width in w:
                    f.append(int.from_bytes(row[o : o + width], "big") if width else None)
                    o += width
                ftype = 1 if f[0] is None else f[0]  # default type 1
                if objnum in entries:
                    continue  # newer section already defined it
                if ftype == 1:
                    entries[objnum] = ("top", f[1])
                elif ftype == 2:
                    entries[objnum] = ("stm", f[1], f[2])
        pm = _PREV_RE.search(body)
        pos = int(pm.group(1)) if pm else 0
    return entries


def _load_objects(data: bytes) -> dict[int, bytes]:
    """All reachable objects, ObjStm-embedded included.

    Primary path: walk the cross-reference stream chain (modern
    writers), resolving type-1 entries at their byte offsets and
    type-2 entries out of their object streams. Fallback (classic
    tables, damaged chains): linear ``N G obj .. endobj`` scan — the
    repair strategy real extractors use — then expand any /Type
    /ObjStm members found by the scan."""
    objs: dict[int, bytes] = {}
    try:
        entries = _walk_xref_streams(data)
    except ValueError:
        entries = None
    if entries:
        stms: dict[int, dict[int, bytes]] = {}
        for objnum, ent in entries.items():
            if ent[0] == "top":
                m = _OBJ_AT_RE.match(data, ent[1])
                if m is not None and int(m.group(1)) == objnum:
                    objs[objnum] = m.group(2)
        for objnum, ent in entries.items():
            if ent[0] != "stm":
                continue
            stm_num = ent[1]
            if stm_num not in stms and stm_num in objs:
                try:
                    stms[stm_num] = _parse_objstm(objs[stm_num])
                except ValueError:
                    stms[stm_num] = {}
            objs.setdefault(objnum, stms.get(stm_num, {}).get(objnum, b""))
        objs = {n: b for n, b in objs.items() if b}
        if objs:
            return objs
    # scan fallback
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(2)
    for n, body in sorted(objs.items()):
        if re.search(rb"/Type\s*/ObjStm\b", body):
            try:
                for num, obody in _parse_objstm(body).items():
                    objs.setdefault(num, obody)
            except ValueError:
                continue  # damaged member: other objects still usable
    return objs


# --------------------------------------------------- Type0 / CMap read
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_CMAP_TOK_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>|\[|\]")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_FONT_DICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.DOTALL)
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R")
_RESOURCES_REF_RE = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")


def _hex_to_unicode(h: bytes) -> str:
    compact = b"".join(h.split())
    if len(compact) % 2:
        compact += b"0"
    return bytes.fromhex(compact.decode("ascii")).decode("utf-16-be", "replace")


def _parse_tounicode(body: bytes) -> dict[int, str]:
    """/ToUnicode CMap stream -> {2-byte code: unicode str}. Handles
    bfchar pairs and all three bfrange entry shapes (spec 9.10.3):
    <lo> <hi> <dstStart> (last UTF-16 unit increments across the
    range) and <lo> <hi> [<dst> ...] (one dst per code)."""
    data = _stream_bytes(body)
    cmap: dict[int, str] = {}
    for m in _BFCHAR_RE.finditer(data):
        toks = [t for t in _CMAP_TOK_RE.findall(m.group(1)) if t]
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap[int(b"".join(src.split()), 16)] = _hex_to_unicode(dst)
    for m in _BFRANGE_RE.finditer(data):
        toks: list = []
        for tm in _CMAP_TOK_RE.finditer(m.group(1)):
            if tm.group(0) == b"[":
                toks.append("[")
            elif tm.group(0) == b"]":
                toks.append("]")
            else:
                toks.append(tm.group(1))
        i = 0
        while i < len(toks):
            if not isinstance(toks[i], bytes) or i + 2 >= len(toks):
                break
            lo = int(b"".join(toks[i].split()), 16)
            hi = int(b"".join(toks[i + 1].split()), 16)
            if toks[i + 2] == "[":
                j = i + 3
                code = lo
                while j < len(toks) and toks[j] != "]":
                    cmap[code] = _hex_to_unicode(toks[j])
                    code += 1
                    j += 1
                i = j + 1
            else:
                base = _hex_to_unicode(toks[i + 2])
                for k in range(hi - lo + 1):
                    # increment the LAST code unit (spec 9.10.3 note)
                    cmap[lo + k] = base[:-1] + chr(ord(base[-1]) + k) if base else ""
                i += 3
    return cmap


def _cid_decode(raw: bytes, cmap: dict[int, str]) -> str:
    """2-byte-code string bytes -> text via the font's ToUnicode map;
    unmapped codes become U+FFFD (what fitz shows for them)."""
    if len(raw) % 2:
        raw += b"\x00"
    return "".join(
        cmap.get(int.from_bytes(raw[i : i + 2], "big"), "�")
        for i in range(0, len(raw), 2)
    )


def _font_cmap(objs: dict[int, bytes], num: int) -> dict[int, str] | None:
    """Font object -> ToUnicode map for Type0 fonts, None for simple
    (single-byte) fonts. Type0 without a usable /ToUnicode raises so
    callers degrade to the scanned/error route instead of emitting
    garbage codes (pdf_service.py:258 semantics)."""
    body = objs.get(num)
    if body is None or not re.search(rb"/Subtype\s*/Type0\b", body):
        return None
    if not re.search(rb"/Encoding\s*/Identity-[HV]\b", body):
        raise ValueError("Type0 font with a non-Identity CMap encoding")
    tm = _TOUNICODE_RE.search(body)
    if tm is None:
        raise ValueError("Type0 font without /ToUnicode")
    tobody = objs.get(int(tm.group(1)))
    if tobody is None:
        raise ValueError("/ToUnicode object missing")
    cmap = _parse_tounicode(tobody)
    if not cmap:
        raise ValueError("empty /ToUnicode CMap")
    return cmap


def _page_fonts(
    page_body: bytes,
    objs: dict[int, bytes],
    parents: list[bytes],
    cache: dict[int, dict[int, str] | None],
) -> dict[bytes, dict[int, str] | None]:
    """Resolve the page's /Resources /Font dict (inline or indirect,
    falling back to inherited page-tree resources) to
    {font resource name: ToUnicode map or None}."""
    for src in (page_body, *parents):
        rm = _RESOURCES_REF_RE.search(src)
        if rm is not None:
            src = objs.get(int(rm.group(1)), b"")
        fm = _FONT_DICT_RE.search(src)
        if fm is None:
            continue
        fonts: dict[bytes, dict[int, str] | None] = {}
        for name, num in _FONT_ENTRY_RE.findall(fm.group(1)):
            n = int(num)
            if n not in cache:
                cache[n] = _font_cmap(objs, n)
            fonts[name] = cache[n]
        return fonts
    return {}


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
        elif c == 0x2F:  # '/' — name (a Tf operand selects the font)
            m = _NAME_RE.match(content, i)
            yield ("name", m.group(1))
            i = m.end()
        else:
            m = _OP_RE.match(content, i)
            if m is not None:
                yield ("op", m.group(0))
                i = m.end()
            else:
                i += 1  # numbers, delimiters, whitespace


_SHOW_NEWLINE_OPS = (b"'", b'"')  # shows that imply move-to-next-line
_MOVE_OPS = (b"Td", b"TD", b"T*")


def _text_from_content(
    content: bytes,
    fonts: dict[bytes, dict[int, str] | None] | None = None,
) -> str:
    """Concatenate text shows between BT..ET; Td/TD/T* (and the
    '/\" show variants) between shows start a new line — what a
    layout-aware extractor (fitz get_text) returns for
    build_pdf-shaped pages. Postfix evaluation: string/hex operands
    collect until an operator consumes or discards them.

    ``fonts`` maps the page's font resource names to ToUnicode maps
    (None for simple single-byte fonts); the ``Tf`` operator switches
    the active map, under which show operands are decoded as 2-byte
    CIDs (Type0/Identity-H) instead of byte codes."""
    fonts = fonts or {}
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []
    in_text = False
    first_move = True
    last_name: bytes | None = None
    cur_cmap: dict[int, str] | None = None

    def newline() -> None:
        nonlocal first_move
        if first_move:  # the initial cursor placement
            first_move = False
            return
        lines.append("".join(cur))
        cur.clear()

    for kind, payload in _tokenize_content(content):
        if kind == "name":
            last_name = payload
        elif kind == "str":
            if in_text:
                if cur_cmap is not None:
                    raw = _unescape_pdf_string(payload).encode("latin-1")
                    pending.append(_cid_decode(raw, cur_cmap))
                else:
                    pending.append(_unescape_pdf_string(payload))
        elif kind == "hex":
            if in_text:
                if cur_cmap is not None:
                    compact = b"".join(payload.split())
                    if len(compact) % 2:
                        compact += b"0"
                    pending.append(
                        _cid_decode(bytes.fromhex(compact.decode("ascii")), cur_cmap)
                    )
                else:
                    pending.append(_decode_hex_string(payload))
        elif payload == b"Tf":
            if last_name is not None:
                cur_cmap = fonts.get(last_name)
            pending.clear()
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
    """Page texts in /Kids order. Raises structured taxonomy errors
    (functions/errors.py — all ValueError subclasses, so existing
    catch-ValueError degrade seams keep working) on encrypted,
    page-less, or unsupported-filter PDFs (callers route those to the
    error/scanned path, pdf_service.py:258; encrypted inputs are the
    reference's explicit detect-and-degrade, pdf_service.py:44-49).
    Error MESSAGES are load-bearing: the data-plane classifier
    (errors._RULES) maps "encrypted"/"no pages" substrings of the
    "pdf: ..." error record back to these codes."""
    from .errors import PdfCorruptedError, PdfEmptyError, PdfEncryptedError

    if not data.startswith(b"%PDF"):
        raise PdfCorruptedError("not a %PDF payload")
    if b"/Encrypt" in data:
        # conservative substring probe (an /Encrypt key can only
        # legitimately appear in the trailer dict; compressed content
        # streams can't alias it) — false positives degrade to the
        # scanned/error route, never extract ciphertext as text
        raise PdfEncryptedError("encrypted PDF")
    objs = _load_objects(data)
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
        raise PdfEmptyError("PDF has no pages")
    parents = [b for _, b in sorted(pages_nodes)]
    font_cache: dict[int, dict[int, str] | None] = {}
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
        fonts = _page_fonts(objs[pid], objs, parents, font_cache)
        content = b"\n".join(_stream_bytes(objs[r]) for r in refs if r in objs)
        out.append(_text_from_content(content, fonts))
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
