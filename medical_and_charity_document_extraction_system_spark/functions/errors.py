"""Structured error taxonomy for the extraction engine.

The reference carries a 324-LoC exception hierarchy with per-class
error codes and dict serialization
(/root/reference/backend/app/utils/exceptions.py) that its request
handlers raise. A Spark batch engine cannot raise per-document — a
bad document must degrade to an error *record*, never a task failure
— so the taxonomy here has two synchronized forms:

1. An exception hierarchy for DRIVER-side surfaces (validation,
   engine registry, job config): ``ExtractionError`` subclasses with
   ``error_code`` = class name and ``to_record()``, mirroring the
   reference's ``OCRSystemException.to_dict`` shape.
2. ``classify_error`` / ``classify_error_cols``: the DATA-plane form —
   a deterministic mapping from the pipeline's error-record strings
   (``"html: ..."``, ``"pdf: ..."``, ``"route: ..."``,
   ``"missing: ..."`` — plans/pipeline.py:_error_record) to
   (family, code). The column version is a pure JVM CASE expression
   (codegen'd, oracle-expressible in SQL), because at 10^12 rows
   error classification is an analytics query, not control flow.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class ExtractionError(Exception):
    """Base: error_code defaults to the class name (reference
    exceptions.py:4-25 semantics)."""

    def __init__(self, message: str, error_code: str | None = None) -> None:
        super().__init__(message)
        self.message = message
        self.error_code = error_code or type(self).__name__

    def to_record(self) -> dict:
        return {"error": self.error_code, "message": self.message}


# file / payload family (reference exceptions.py:28-56)
class FileError(ExtractionError): ...
class InvalidFileTypeError(FileError): ...
class FileReadError(FileError): ...
class MissingPayloadError(FileError): ...


# pdf family (reference exceptions.py:60-84)
class PdfError(ExtractionError, ValueError):
    """Also a ValueError: the parse/degrade seams (operators/pdf.py,
    minipdf.merge_pages skip_errors) catch ValueError — typed raises
    from minipdf must keep flowing through them."""


class PdfCorruptedError(PdfError): ...
class PdfEncryptedError(PdfError): ...
class PdfEmptyError(PdfError): ...


# image family (reference exceptions.py:88-108)
class ImageError(ExtractionError): ...
class ImageLoadError(ImageError): ...
class ImageFormatError(ImageError): ...


# ocr family (reference exceptions.py:112-140)
class OcrError(ExtractionError): ...
class OcrProcessingError(OcrError): ...


class OcrEngineNotFoundError(OcrError, ValueError):
    """Also a ValueError: pre-taxonomy callers catch ValueError for
    unknown/blocked engine names (operators/engines.py)."""


# validation family (reference exceptions.py:168-184)
class ValidationError(ExtractionError): ...
class SchemaValidationError(ValidationError): ...
class InputValidationError(ValidationError): ...


# --------------------------------------------------------------- data plane
# (family, code) decision table over the pipeline's error-string
# shapes. Order matters: first match wins (same rule in SQL).
_RULES: tuple[tuple[str, str, str], ...] = (
    # (prefix, substring-needle, code); empty needle = any
    ("missing: ", "", "MissingPayloadError"),
    ("html: ", "codec can't decode", "DecodeError"),
    ("html: ", "", "HtmlParseError"),
    ("pdf: ", "encrypted", "PdfEncryptedError"),
    ("pdf: ", "no pages", "PdfEmptyError"),
    ("pdf: ", "", "PdfCorruptedError"),
    ("route: ", "", "RouteError"),
)


def classify_error(msg: str | None) -> tuple[str, str]:
    """Error-record string -> (family, code); (none, none) for clean
    rows, (other, UnknownError) for unrecognized shapes."""
    if msg is None:
        return ("none", "none")
    for prefix, needle, code in _RULES:
        if msg.startswith(prefix) and (not needle or needle in msg):
            return (prefix[:-2], code)
    return ("other", "UnknownError")


def classify_error_cols(err: Column) -> tuple[Column, Column]:
    """The same decision table as pure JVM expressions:
    (error_family, error_code) columns. Whole-stage-codegen'd — no
    Python in the hot path — and shape-identical to a SQL CASE, which
    is what the oracle gate runs."""
    family = F.when(err.isNull(), F.lit("none"))
    code = F.when(err.isNull(), F.lit("none"))
    for prefix, needle, rule_code in _RULES:
        cond = err.startswith(prefix)
        if needle:
            cond = cond & err.contains(needle)
        family = family.when(cond, F.lit(prefix[:-2]))
        code = code.when(cond, F.lit(rule_code))
    return family.otherwise(F.lit("other")), code.otherwise(F.lit("UnknownError"))
