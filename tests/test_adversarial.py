"""Degrade-don't-fail under hostile inputs (reference semantics,
ocr_service.py:154-157/229-243): every malformed payload must yield a
record — error or best-effort extraction — never a task failure, and
rerun output must be identical."""

import pytest

from pyspark.sql import types as T

from medical_and_charity_document_extraction_system_spark.plans import run_extraction
from medical_and_charity_document_extraction_system_spark.schema import PAGES_SCHEMA

NASTY = [
    b"\x00\xff\xfe garbage \x80\x81",                 # not utf-8
    b"<div>" * 2000,                                   # deep nesting, never closed
    b"<!-- unterminated comment <p>hidden</p>",
    b"<p " + b"a" * 100000 + b">attr bomb</p>",
    b"< not a tag < at all <<",
    b"<script>while(1){if(a<b)x()}</script>",          # rawtext with '<'
    b"<a href='x'><a><a>nested links</a>",
    b"%FPDF\n",                                        # empty fake pdf
    b"%PDF-1.4 real pdf but no fitz installed",
    b"",                                               # empty payload
    "<p>café ☃ &amp; &#x1F600; entity soup</p>".encode(),
]


@pytest.fixture(scope="module")
def nasty_pages(spark):
    rows = [
        (f"https://evil.example.com/doc/{i}", None, payload, None, "en")
        for i, payload in enumerate(NASTY)
    ]
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_every_nasty_payload_yields_a_record(spark, nasty_pages):
    rows = {r.url: r for r in run_extraction(nasty_pages).collect()}
    assert len(rows) == len(NASTY)  # no row lost, no task failure
    for url, r in rows.items():
        assert r.processing_method in (
            "html_extraction", "direct_text_extraction", "ocr_pipeline", "error"
        ), url
        if r.processing_method == "error":
            assert r.error


def test_specific_degradations(spark, nasty_pages):
    rows = {r.url.rsplit("/", 1)[-1]: r for r in run_extraction(nasty_pages).collect()}
    # non-utf8 bytes -> error record, not exception
    assert rows["0"].processing_method == "error"
    # empty fake pdf parses to one empty page -> scanned route (avg
    # chars < 50) through the stub OCR engine
    assert rows["7"].processing_method in ("ocr_pipeline", "error")
    # real-PDF magic without PyMuPDF installed -> error record
    assert rows["8"].processing_method == "error"
    assert "PyMuPDF" in rows["8"].error or "pdf" in rows["8"].error
    # entity soup decodes and extracts
    assert "café" in rows["10"].text


def test_nasty_rerun_deterministic(spark, nasty_pages):
    a = sorted(map(tuple, run_extraction(nasty_pages).select("url", "text", "error").collect()))
    b = sorted(map(tuple, run_extraction(nasty_pages).select("url", "text", "error").collect()))
    assert a == b
