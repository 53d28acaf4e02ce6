"""Service-surface facade — one function per reference API route, so
a user of the reference can switch call-for-call
(/root/reference/backend/app/api/routes/):

| reference route                      | here                        |
|--------------------------------------|-----------------------------|
| POST /api/v1/ocr/process (ocr_routes.py:18-49) | ``process_documents`` |
| GET  /api/v1/ocr/engines (ocr_routes.py:103-132) | ``get_available_engines`` |
| GET  /health/detailed (health_routes.py:22-62) | ``health_check``   |
| PDFService.merge_pdfs (pdf_service.py:23-85)   | ``merge_documents`` |
| task routes (vestigial, ocr_routes.py:52-100)  | checkpoint manifest queries (plans/checkpoint.py) |

The request/response dict shapes mirror the reference's JSON bodies;
"documents" are DataFrames instead of uploads.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_CONFIG, ExtractionConfig
from .operators.engines import DEFAULT_ENGINE, available_engines
from .plans.pipeline import run_extraction
from .schema import PAGES_SCHEMA
from .sources.validate import validate_pages_schema


def process_documents(
    spark: SparkSession,
    pages: DataFrame | str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
) -> dict:
    """The flagship route (ocr_routes.py:18-49): accept documents,
    run the extraction pipeline, return a status envelope. ``pages``
    is a DataFrame in the input_hint shape or a parquet/table path.
    The result DataFrame is lazy — callers count/write it; the
    envelope mirrors the reference response fields (:44-49) minus the
    materialized per-file results list (that IS the DataFrame)."""
    if isinstance(pages, str):
        pages = spark.read.schema(PAGES_SCHEMA).parquet(pages)
    validate_pages_schema(pages)
    out = run_extraction(pages, cfg)
    return {
        "status": "success",
        "results": out,  # DataFrame, one record per url
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }


def merge_documents(
    pdfs: DataFrame,
    key_col: str = "source",
    payload_col: str = "pdf",
    order_col: str = "doc_id",
) -> dict:
    """``PDFService.merge_pdfs`` (pdf_service.py:23-85) as a service
    call: per-key merged %PDF artifacts (operators/maintenance.
    merge_pdfs_by_key), unparseable members skipped like the
    reference's encrypted-input degrade path (:44-49). Returns the
    reference-shaped envelope with the artifact table lazy."""
    from .operators.maintenance import merge_pdfs_by_key

    merged = merge_pdfs_by_key(pdfs, key_col, payload_col, order_col)
    return {
        "status": "success",
        "results": merged,  # (key, merged_pdf, page_count, n_inputs, n_skipped)
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }


def get_available_engines() -> dict:
    """ocr_routes.py:103-132 / engine_factory.py:86-110 parity."""
    return {
        "engines": available_engines(),
        "default": DEFAULT_ENGINE,
        "blocked": ["tesseract"],  # engine_factory.py:43-47
    }


def health_check(spark: SparkSession) -> dict:
    """health_routes.py:22-62 analog: runtime snapshot from the Spark
    context instead of psutil."""
    sc = spark.sparkContext
    return {
        "status": "healthy",
        "spark_version": sc.version,
        "master": sc.master,
        "app_id": sc.applicationId,
        "default_parallelism": sc.defaultParallelism,
        "python_worker_reuse": spark.conf.get("spark.python.worker.reuse", "false"),
        "timestamp": datetime.datetime.now(datetime.timezone.utc).isoformat(),
    }
