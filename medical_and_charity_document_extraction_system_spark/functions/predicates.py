"""Pure-Catalyst predicate/projection helpers (SURVEY.md §2.2).

All builtins — these stay inside whole-stage codegen and push down to
the scan where possible (P2's length predicate is the model case).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# P4 — image-format filter (reference validate_image_format,
# file_utils.py:271-273): suffix in {jpg jpeg png bmp tiff tif webp}
_IMAGE_SUFFIX_RE = r"(?i)\.(jpg|jpeg|png|bmp|tiff|tif|webp)$"


def is_image_url(url: Column) -> Column:
    return url.rlike(_IMAGE_SUFFIX_RE)


# content sniff on the binary column (P4 by content instead of name)
_MAGICS = [
    ("pdf", b"%PDF"),
    ("fpdf", b"%FPDF"),
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("netpbm", b"P5"),
    ("netpbm", b"P6"),
]


def content_kind(data: Column) -> Column:
    """Best-effort payload type from magic bytes; 'html' otherwise,
    NULL for NULL payloads."""
    out = F.lit("html")
    for kind, magic in reversed(_MAGICS):
        prefix = F.substring(data, 1, len(magic))
        out = F.when(prefix == F.lit(bytearray(magic)), kind).otherwise(out)
    return F.when(data.isNull(), F.lit(None).cast("string")).otherwise(out)


# P2 — text-based predicate (pdf_service.py:210)
def is_text_based(text: Column, min_chars: int = 100) -> Column:
    return F.length(text) > min_chars


# P5/A3 — confidence filter + mean over a word-record array
# (tesseract_engine.py:114-121: words with conf != -1 kept)
def confident_words(words: Column) -> Column:
    return F.filter(words, lambda w: w["confidence"] >= 0)


def mean_confidence(words: Column) -> Column:
    kept = confident_words(words)
    n = F.size(kept)
    total = F.aggregate(
        kept, F.lit(0.0), lambda acc, w: acc + w["confidence"]
    )
    return F.when(n > 0, total / n).otherwise(F.lit(0.0))
