"""Real ``%PDF`` path: pure-Python writer/extractor round-trip, the
fitz-free fallback in operators/pdf.py, the merged-PDF artifact, and
the full pipeline routing a real PDF (reference flagship input,
pdf_service.py:107-229)."""

import pytest

from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
    build_pdf,
    extract_text_pages,
    merge_pdfs,
)
from medical_and_charity_document_extraction_system_spark.operators.pdf import (
    extract_pdf_pages,
    is_pdf_bytes,
)

PAGES = [
    "Patient: Jane Doe\nInvoice 12345 dated 01/02/23",
    "Total due: $1,234.56 (code A12.3)\nwith (nested (parens)) and \\slash",
]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_byte_identical_pages(compress):
    pdf = build_pdf(PAGES, compress=compress)
    assert pdf.startswith(b"%PDF-1.4")
    assert pdf.rstrip().endswith(b"%%EOF")
    assert extract_text_pages(pdf) == PAGES
    # determinism: same input -> same bytes
    assert pdf == build_pdf(PAGES, compress=compress)


def test_escapes_and_empty_page():
    tricky = ["()\\", "", "tab\tand\nnewline"]
    assert extract_text_pages(build_pdf(tricky)) == tricky


def test_unsupported_inputs_raise():
    with pytest.raises(ValueError):
        extract_text_pages(b"%PDF-1.4 no objects here")
    with pytest.raises(ValueError):
        extract_text_pages(b"not a pdf")
    with pytest.raises(ValueError):
        extract_text_pages(build_pdf(["x"]) + b"/Encrypt")


def test_operator_fallback_parses_real_pdf_without_fitz():
    """operators/pdf.extract_pdf_pages must handle a real %PDF through
    the pure-Python fallback (fitz absent in this environment)."""
    pdf = build_pdf(PAGES)
    assert is_pdf_bytes(pdf)
    assert extract_pdf_pages(pdf) == PAGES


def test_merge_pdfs_concatenates_pages():
    merged = merge_pdfs([build_pdf(PAGES[:1]), build_pdf(PAGES[1:])])
    assert extract_text_pages(merged) == PAGES


def test_pipeline_routes_real_pdf(spark):
    """A Common-Crawl-style pages row whose payload is a REAL %PDF
    must come out as direct_text_extraction with byte-identical page
    text — the reference's pdfplumber/fitz direct path
    (pdf_service.py:164-229)."""
    import datetime

    from medical_and_charity_document_extraction_system_spark.plans import run_extraction

    long_pages = [p + " " + ("lorem ipsum dolor sit amet " * 4) for p in PAGES]
    pdf = build_pdf(long_pages)
    ts = datetime.datetime(2024, 1, 1)
    rows = [("https://host9.example.com/doc/900001", ts, bytearray(pdf), None, "en")]
    pages_df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = run_extraction(pages_df).collect()
    assert len(out) == 1
    rec = out[0]
    assert rec.processing_method == "direct_text_extraction"
    assert rec.is_scanned is False
    assert rec.page_count == 2
    expected_text = (
        "--- Page 1 ---\n" + long_pages[0] + "\n\n--- Page 2 ---\n" + long_pages[1]
    )
    assert rec.text == expected_text  # byte-identical extracted text
    assert rec.total_characters == sum(len(p) for p in long_pages)


def test_pipeline_scanned_route_for_short_real_pdf(spark):
    """A real %PDF whose pages average <50 chars routes to the OCR
    pipeline (scanned predicate, pdf_service.py:231-259)."""
    import datetime

    from medical_and_charity_document_extraction_system_spark.plans import run_extraction

    pdf = build_pdf(["scan 900002"])
    ts = datetime.datetime(2024, 1, 1)
    rows = [("https://host9.example.com/doc/900002", ts, bytearray(pdf), None, "en")]
    pages_df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    rec = run_extraction(pages_df).collect()[0]
    assert rec.processing_method == "ocr_pipeline"
    assert rec.is_scanned is True
    assert "scan 900002" in rec.text


def test_merge_pdfs_by_key_operator(spark):
    """Distributed merged-PDF artifact: per-key applyInPandas merge
    (reference merge_pdfs, pdf_service.py:23-85)."""
    from medical_and_charity_document_extraction_system_spark.operators.maintenance import (
        merge_pdfs_by_key,
    )

    rows = [
        ("s1", 0, bytearray(build_pdf([PAGES[0]]))),
        ("s1", 1, bytearray(build_pdf([PAGES[1]]))),
        ("s1", 2, bytearray(b"broken not a pdf")),  # degrade path
        ("s2", 0, bytearray(build_pdf(["only page"]))),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, pdf binary")
    got = {r.source: r for r in merge_pdfs_by_key(df).collect()}
    assert got["s1"].page_count == 2 and got["s1"].n_skipped == 1
    assert extract_text_pages(bytes(got["s1"].merged_pdf)) == PAGES
    assert got["s2"].page_count == 1
    # empty-merge error path: all members broken -> None artifact
    df_bad = spark.createDataFrame(
        [("s3", 0, bytearray(b"junk"))], "source string, doc_id long, pdf binary"
    )
    bad = merge_pdfs_by_key(df_bad).collect()[0]
    assert bad.merged_pdf is None and bad.n_skipped == 1


def test_fuzzed_pdf_inputs_degrade_not_crash():
    """Malformed real-PDF payloads must raise ValueError (the
    error-record route), never crash or hang — the degrade-don't-fail
    contract (pdf_service.py:258) under truncation/corruption."""
    base = build_pdf(PAGES)
    cases = [
        base[: len(base) // 2],                 # truncated mid-object
        base.replace(b"stream", b"strXam", 1),  # broken stream marker
        base.replace(b"/FlateDecode", b"/LZWDecode", 1),  # mislabeled filter
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n",  # page, no tree/contents
        b"%PDF-1.4\n" + b"\x00" * 64,
        base[:-20],                             # missing trailer
    ]
    for i, data in enumerate(cases):
        try:
            pages = extract_text_pages(data)
            # tolerated only if it still parsed real pages cleanly
            assert isinstance(pages, list), i
        except ValueError:
            pass  # expected degrade signal


def test_fuzzed_flate_stream_raises():
    pdf = build_pdf(["x" * 100], compress=True)
    # corrupt the deflate payload but keep structure
    m = pdf.find(b"stream\n") + len(b"stream\n")
    bad = pdf[:m] + bytes([pdf[m] ^ 0xFF]) + pdf[m + 1 :]
    with pytest.raises(ValueError):
        extract_text_pages(bad)


def test_hex_string_operands():
    """Hex-string shows: plain latin-1 hex, UTF-16BE with BOM, and
    hex elements inside TJ arrays."""
    content = (
        b"BT /F1 11 Tf 72 720 Td "
        b"<48656C6C6F> Tj 0 -14 Td "                # "Hello"
        b"<FEFF00480069> Tj 0 -14 Td "              # UTF-16BE "Hi"
        b"[<41 42> -120 (cd) <4> ] TJ ET"           # "AB" + "cd" + "@" (odd pad)
    )
    pdf = (
        b"%%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%%%EOF\n"
    ) % (len(content), content)
    assert extract_text_pages(pdf) == ["Hello\nHi\nABcd@"]


def test_unescape_backslash_crlf_continuation():
    """Spec 7.3.4.2: backslash-EOL is ONE continuation; \\<CR><LF>
    consumes both bytes (no stray newline in the extracted text)."""
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        _unescape_pdf_string,
    )

    assert _unescape_pdf_string(b"ab\\\r\ncd") == "abcd"
    assert _unescape_pdf_string(b"ab\\\rcd") == "abcd"
    assert _unescape_pdf_string(b"ab\\\ncd") == "abcd"
    # a bare (unescaped) CRLF inside a literal string is data, per spec
    assert _unescape_pdf_string(b"ab\r\ncd") == "ab\r\ncd"


# ------------------------------------------- modern xref / ObjStm shape
def test_xref_stream_writer_roundtrip_and_primary_path():
    """The 1.5-mode writer emits ObjStm + /W-packed xref stream; the
    reader's PRIMARY path (xref chain walk, not the scan) resolves
    type-1 and type-2 entries."""
    import re as _re

    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    pages = ["alpha\nbeta", "gamma (x) \\ z", "Ünïcøde ✓"]
    d = m.build_pdf(pages, xref_stream=True)
    assert d.startswith(b"%PDF-1.5") and b"/Type /ObjStm" in d
    assert m.extract_text_pages(d) == pages
    ents = m._walk_xref_streams(d)
    kinds = {e[0] for e in ents.values()}
    assert kinds == {"top", "stm"}  # both entry types exercised
    # catalog/pages/font/page dicts live in the ObjStm
    assert all(ents[n][0] == "stm" for n in range(1, 4 + len(pages)))


def test_xref_stream_with_png_predictor12():
    """Foreign-writer shape: the xref stream rows run through PNG
    Predictor 12 (Up) — what real generators emit. Re-encode our own
    xref payload with the predictor and the reader must still parse
    via the chain walk."""
    import re as _re
    import zlib as _zlib

    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    pages = ["pred page one", "pred page two"]
    d = m.build_pdf(pages, xref_stream=True)
    mm = _re.search(
        rb"<< /Type /XRef /Size (\d+) /W \[1 4 2\] /Root 1 0 R "
        rb"/Length (\d+) /Filter /FlateDecode >>\nstream\n",
        d,
    )
    assert mm is not None
    rows = _zlib.decompress(d[mm.end() : mm.end() + int(mm.group(2))])
    rowlen = 7
    filt = bytearray()
    prev = bytes(rowlen)
    for r in range(0, len(rows), rowlen):
        row = rows[r : r + rowlen]
        filt.append(2)  # Up
        filt += bytes((row[j] - prev[j]) & 0xFF for j in range(rowlen))
        prev = row
    payload = _zlib.compress(bytes(filt), 9)
    newdict = (
        b"<< /Type /XRef /Size %s /W [1 4 2] /Root 1 0 R /Length %d "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >> "
        b">>\nstream\n" % (mm.group(1), len(payload))
    )
    d2 = d[: mm.start()] + newdict + payload + d[mm.end() + int(mm.group(2)) :]
    ents = m._walk_xref_streams(d2)
    assert ents and {e[0] for e in ents.values()} == {"top", "stm"}
    assert m.extract_text_pages(d2) == pages


def test_xref_stream_incremental_update_prev_chain():
    """Incremental update: an appended section replaces page 1's
    content; its xref stream /Prev-chains to the original. Newest
    section must win (first-sighting rule)."""
    import zlib as _zlib

    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    pages = ["original one", "original two"]
    d = m.build_pdf(pages, xref_stream=True)
    old_startxref = int(m._STARTXREF_RE.search(d).group(1))
    # content object for page 1 is object 6 (1 catalog, 2 tree, 3 font,
    # 4-5 pages, 6-7 contents)
    body = b"BT /F1 11 Tf 72 720 Td (updated one) Tj ET"
    newobj_off = len(d)
    upd = bytearray(d)
    upd += b"6 0 obj\n<< /Length %d >>\nstream\n" % len(body) + body + b"\nendstream\nendobj\n"
    xpos = len(upd)
    rows = bytes([1]) + newobj_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    payload = _zlib.compress(rows, 9)
    upd += (
        b"10 0 obj\n<< /Type /XRef /Size 11 /W [1 4 2] /Index [6 1] "
        b"/Root 1 0 R /Prev %d /Length %d /Filter /FlateDecode >>\nstream\n"
        % (old_startxref, len(payload))
        + payload
        + b"\nendstream\nendobj\n"
    )
    upd += b"startxref\n%d\n%%%%EOF\n" % xpos
    got = m.extract_text_pages(bytes(upd))
    assert got == ["updated one", "original two"]


def test_scan_fallback_expands_objstm_without_xref():
    """Damaged startxref: the scan path still finds the ObjStm and
    expands the page tree out of it."""
    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    pages = ["fall back"]
    d = m.build_pdf(pages, xref_stream=True).replace(b"startxref", b"startxrEf")
    assert m._walk_xref_streams(d) is None
    assert m.extract_text_pages(d) == pages


# ------------------------------------------------- Type0 / CMap (round 4)
def test_type0_roundtrip_all_assemblies():
    """Subsetted-CID Type0 generation (Identity-H + /ToUnicode CMap):
    byte-identical extraction across classic/xref-stream assembly and
    both compression settings."""
    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    pages = ["Hello World\nSecond line", "Ünïcødé ★ page\ntwo", "", "a(b)\\c"]
    for xs in (False, True):
        for comp in (False, True):
            d = m.build_pdf(pages, compress=comp, xref_stream=xs, font="type0")
            assert m.extract_text_pages(d) == pages, (xs, comp)


def test_type0_over_100_distinct_chars_splits_bfchar_blocks():
    """>100 distinct chars forces multiple beginbfchar blocks (the
    CMap-spec cap) — all must parse."""
    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    text = "".join(chr(0x100 + i) for i in range(260))
    d = m.build_pdf([text], font="type0")
    assert m.extract_text_pages(d) == [text]


def test_type0_without_tounicode_degrades():
    """A Type0 font with no /ToUnicode cannot be decoded -> ValueError
    (the scanned/error route, pdf_service.py:258 semantics)."""
    import re

    import pytest

    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    d = m.build_pdf(["x"], compress=False, font="type0")
    bad = re.sub(rb"/ToUnicode \d+ 0 R ", b"", d)
    with pytest.raises(ValueError, match="ToUnicode"):
        m.extract_text_pages(bad)


def test_type0_non_identity_encoding_degrades():
    import pytest

    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    d = m.build_pdf(["x"], compress=False, font="type0")
    bad = d.replace(b"/Encoding /Identity-H", b"/Encoding /UniJIS-UCS2-H")
    with pytest.raises(ValueError, match="Identity"):
        m.extract_text_pages(bad)


def test_bfrange_both_entry_shapes():
    """Hand-built ToUnicode exercising <lo> <hi> <dstStart> increments
    AND the [<dst> ...] array shape."""
    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    cmap_body = (
        b"begincmap\n"
        b"2 beginbfrange\n"
        b"<0001> <0003> <0041>\n"          # 1->A 2->B 3->C
        b"<0010> <0011> [<0058> <0059>]\n"  # 16->X 17->Y
        b"endbfrange\n"
        b"1 beginbfchar\n<0020> <005A>\nendbfchar\n"
        b"endcmap\n"
    )
    obj = b"<< /Length %d >>\nstream\n" % len(cmap_body) + cmap_body + b"\nendstream"
    cmap = m._parse_tounicode(obj)
    assert cmap[1] == "A" and cmap[3] == "C"
    assert cmap[0x10] == "X" and cmap[0x11] == "Y"
    assert cmap[0x20] == "Z"
    assert m._cid_decode(b"\x00\x01\x00\x10\x00\x20", cmap) == "AXZ"
    assert m._cid_decode(b"\x00\x99", cmap) == "�"  # unmapped


def test_type0_merge_with_type1_inputs():
    """Page-level merge across font generations."""
    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    merged = m.merge_pdfs([
        m.build_pdf(["cid page"], font="type0"),
        m.build_pdf(["simple page"]),
    ])
    assert m.extract_text_pages(merged) == ["cid page", "simple page"]


def test_type1_bytes_unchanged_by_type0_support():
    """The default generation's bytes are golden-pinned; the font
    parameter must not perturb them."""
    import hashlib

    from medical_and_charity_document_extraction_system_spark.functions import minipdf as m

    d = m.build_pdf(["abc\ndef"], compress=True)
    assert hashlib.md5(d).hexdigest() == "dbcb5448328bb9608d3df7d7343edf38"


def _encrypted_pdf(pages=None, **kw):
    """Fixture: a structurally valid PDF whose TRAILER carries an
    /Encrypt reference — the shape the reference detects and skips
    (pdf_service.py:44-49). The key is injected next to /Root, which
    appears exactly once (classic trailer or XRef stream dict)."""
    data = build_pdf(pages or ["top secret ciphertext"], **kw)
    assert data.count(b"/Root") == 1
    return data.replace(b"/Root", b"/Encrypt 999 0 R /Root", 1)


@pytest.mark.parametrize("xref_stream", [False, True])
def test_encrypted_trailer_raises_typed_taxonomy_error(xref_stream):
    from medical_and_charity_document_extraction_system_spark.functions.errors import (
        PdfEncryptedError,
    )

    data = _encrypted_pdf(xref_stream=xref_stream)
    with pytest.raises(PdfEncryptedError, match="encrypted"):
        extract_text_pages(data)
    # degrade seams catch ValueError — the typed error must BE one
    with pytest.raises(ValueError):
        extract_text_pages(data)
    # and operators/pdf.py's fitz-free branch propagates it
    with pytest.raises(ValueError):
        extract_pdf_pages(data)


def test_empty_and_corrupt_raise_typed_taxonomy_errors():
    from medical_and_charity_document_extraction_system_spark.functions.errors import (
        PdfCorruptedError,
        PdfEmptyError,
    )

    with pytest.raises(PdfCorruptedError):
        extract_text_pages(b"not a pdf at all")
    no_pages = b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n"
    with pytest.raises(PdfEmptyError):
        extract_text_pages(no_pages)
    assert issubclass(PdfEmptyError, ValueError)


def test_merge_skips_encrypted_members_and_counts():
    """merge_pages / merge_pdfs_by_key degrade exactly like the
    reference merge (pdf_service.py:44-49): encrypted members are
    skipped and counted, the rest merge normally."""
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        merge_pages,
    )

    good1 = build_pdf(["page one"])
    good2 = build_pdf(["page two"])
    pages, skipped = merge_pages([good1, _encrypted_pdf(), good2], skip_errors=True)
    assert pages == ["page one", "page two"]
    assert skipped == 1


def test_merge_pdfs_by_key_skips_encrypted(spark):
    from medical_and_charity_document_extraction_system_spark.operators.maintenance import (
        merge_pdfs_by_key,
    )

    rows = [
        ("s1", 0, bytearray(build_pdf(["alpha"]))),
        ("s1", 1, bytearray(_encrypted_pdf())),
        ("s1", 2, bytearray(build_pdf(["beta"]))),
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, pdf binary")
    out = merge_pdfs_by_key(df).collect()[0]
    assert out["n_inputs"] == 3 and out["n_skipped"] == 1
    assert extract_text_pages(bytes(out["merged_pdf"])) == ["alpha", "beta"]


def test_pipeline_error_record_classifies_encrypted(spark):
    """An encrypted real-PDF payload flows to an error RECORD whose
    data-plane classification is (pdf, PdfEncryptedError) — per-row
    degrade, never a task failure."""
    from pyspark.sql import functions as F

    from medical_and_charity_document_extraction_system_spark.functions.errors import (
        classify_error_cols,
    )
    from medical_and_charity_document_extraction_system_spark.plans import run_extraction

    df = spark.createDataFrame(
        [("https://x.test/enc", bytearray(_encrypted_pdf()), None, "en")],
        "url string, html binary, text string, lang string",
    )
    out = run_extraction(df)
    fam, code = classify_error_cols(F.col("error"))
    r = out.select(
        "processing_method",
        fam.alias("error_family"),
        code.alias("error_code"),
    ).collect()[0]
    assert r["processing_method"] == "error"
    assert (r["error_family"], r["error_code"]) == ("pdf", "PdfEncryptedError")


# ------------------------------------------------------------- LZWDecode
def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Reference TIFF-variant LZW encoder (test-side only): MSB-first
    9..12-bit codes, clear 256, EOD 257, early width change."""
    buf = bytearray()
    bits = nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal bits, nbits
        bits = (bits << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            buf.append((bits >> nbits) & 0xFF)
            bits &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        if next_code + early >= (1 << width) and width < 12:
            width += 1
        w = bytes([ch])
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        buf.append((bits << (8 - nbits)) & 0xFF)
    return bytes(buf)


def test_lzw_roundtrip_including_kwkwk_and_width_growth():
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        _lzw_decode,
    )

    cases = [
        b"",
        b"a",
        b"abababababababab",            # KwKwK codes
        b"-----A---B-----",
        bytes(range(256)) * 6,          # crosses the 9->10 bit boundary
        (b"the quick brown fox " * 64), # long repeats, multi-width
        bytes((i * 7 + (i >> 3)) % 256 for i in range(5000)),  # 10->11 bits
    ]
    for payload in cases:
        assert _lzw_decode(_lzw_encode(payload)) == payload, payload[:32]


def test_lzw_early_change_zero():
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        _lzw_decode,
    )

    payload = bytes(range(256)) * 4
    assert _lzw_decode(_lzw_encode(payload, early=0), early=0) == payload


def test_lzw_clear_code_mid_stream():
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        _lzw_decode,
    )

    # two independently-encoded halves joined by the shared clear code:
    # strip EOD from the first, the leading clear of the second resets
    a, b = _lzw_encode(b"xyxyxyxy"), _lzw_encode(b"zzzzzzzz")
    # re-encode as one stream: decode both separately and via manual concat
    assert _lzw_decode(a) + _lzw_decode(b) == b"xyxyxyxyzzzzzzzz"


def test_lzw_garbage_raises():
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        _lzw_decode,
    )

    with pytest.raises(ValueError):
        # first code after clear must be a literal; 0xFF-heavy junk
        # quickly references unassigned table slots
        _lzw_decode(bytes([0xFF] * 16))


def test_extract_text_from_lzw_compressed_pdf():
    """A legacy-writer PDF whose content stream is /LZWDecode still
    extracts (reference readers accept pre-Flate PDFs via fitz;
    pdf_service.py:174-229)."""
    import re as _re

    base = build_pdf(["hello lzw world"], compress=False)
    m = _re.search(rb"<< /Length (\d+) >>\nstream\n(.*?)\nendstream", base, _re.S)
    assert m is not None
    lzw = _lzw_encode(m.group(2) + b"\n")
    doctored = (
        base[: m.start()]
        + b"<< /Length %d /Filter /LZWDecode >>\nstream\n" % len(lzw)
        + lzw
        + b"\nendstream"
        + base[m.end() :]
    )
    assert extract_text_pages(doctored) == ["hello lzw world"]


def test_lzw_pdf_spec_worked_example():
    """ISO 32000-1 7.4.4.2's worked example: the encoded bytes
    80 0B 60 50 22 0C 0C 85 01 decode to 45 45 45 45 45 65 45 45 45 66
    (decimal, i.e. b'-----A---B') — external ground truth for the
    width/early-change conventions."""
    from medical_and_charity_document_extraction_system_spark.functions.minipdf import (
        _lzw_decode,
    )

    enc = bytes([0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01])
    assert _lzw_decode(enc) == bytes([45] * 5 + [65] + [45] * 3 + [66])
