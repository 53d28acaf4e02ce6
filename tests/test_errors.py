"""Structured error taxonomy (functions/errors.py)."""

import pytest

from medical_and_charity_document_extraction_system_spark.functions.errors import (
    ExtractionError,
    OcrEngineNotFoundError,
    PdfEncryptedError,
    classify_error,
    classify_error_cols,
)

CASES = [
    (None, ("none", "none")),
    ("html: 'utf-8' codec can't decode byte 0xff", ("html", "DecodeError")),
    ("html: unclosed tag", ("html", "HtmlParseError")),
    ("pdf: encrypted PDF", ("pdf", "PdfEncryptedError")),
    ("pdf: PDF has no pages", ("pdf", "PdfEmptyError")),
    ("pdf: bad FlateDecode stream", ("pdf", "PdfCorruptedError")),
    ("route: something odd", ("route", "RouteError")),
    ("missing: no html and no text", ("missing", "MissingPayloadError")),
    ("weird message", ("other", "UnknownError")),
]


@pytest.mark.parametrize("msg,expected", CASES)
def test_classify_error_python(msg, expected):
    assert classify_error(msg) == expected


def test_classify_error_cols_matches_python(spark):
    """The JVM CASE chain and the Python decision table are the same
    function — row-for-row over every rule's trigger strings."""
    from pyspark.sql import functions as F

    rows = [(m,) for m, _ in CASES]
    df = spark.createDataFrame(rows, "err string")
    fam, code = classify_error_cols(F.col("err"))
    got = {
        r.err: (r.f, r.c)
        for r in df.select("err", fam.alias("f"), code.alias("c")).collect()
    }
    for msg, expected in CASES:
        assert got[msg] == expected


def test_exception_hierarchy_to_record():
    e = PdfEncryptedError("password-protected input")
    assert isinstance(e, ExtractionError)
    assert e.to_record() == {
        "error": "PdfEncryptedError",
        "message": "password-protected input",
    }
    # engine-not-found doubles as ValueError for pre-taxonomy callers
    assert issubclass(OcrEngineNotFoundError, ValueError)


def test_engine_registry_raises_taxonomy_error():
    from medical_and_charity_document_extraction_system_spark.operators.engines import create_engine

    with pytest.raises(OcrEngineNotFoundError):
        create_engine("nope")
    with pytest.raises(ValueError, match="tesseract"):
        create_engine("tesseract")
