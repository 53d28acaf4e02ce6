"""Maintenance operator tests: merge (reference merge_pdfs /
pdf_service.py:23-85 degrade semantics) and retention
(cleanup_files / file_utils.py:75-126)."""

import datetime

import pytest

from medical_and_charity_document_extraction_system_spark.operators.maintenance import (
    merge_sources,
    retention_filter,
)


def test_merge_counts_pages(spark):
    a = spark.range(10).withColumnRenamed("id", "doc_id")
    b = spark.range(5).withColumnRenamed("id", "doc_id")
    assert merge_sources(a, b).count() == 15


def test_merge_skips_incompatible_inputs(spark):
    a = spark.range(10).withColumnRenamed("id", "doc_id")
    broken = spark.range(3)  # wrong schema = the "encrypted pdf" analog
    b = spark.range(5).withColumnRenamed("id", "doc_id")
    assert merge_sources(a, broken, b).count() == 15


def test_merge_empty_raises():
    with pytest.raises(ValueError):
        merge_sources()


def test_retention_filter(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1)),
        (2, datetime.datetime(2024, 1, 20)),
        (3, datetime.datetime(2024, 2, 1)),
    ]
    df = spark.createDataFrame(rows, ["id", "ts"])
    kept = retention_filter(df, "ts", datetime.datetime(2024, 1, 15))
    assert sorted(r.id for r in kept.collect()) == [2, 3]


def test_validate_pages_schema_accepts_good(spark):
    from medical_and_charity_document_extraction_system_spark.schema import PAGES_SCHEMA
    from medical_and_charity_document_extraction_system_spark.sources.validate import (
        validate_pages_schema,
    )

    good = spark.createDataFrame([], PAGES_SCHEMA)
    assert validate_pages_schema(good) is good


def test_validate_pages_schema_rejects_bad(spark):
    from medical_and_charity_document_extraction_system_spark.sources.validate import (
        SchemaValidationError,
        validate_pages_schema,
    )

    bad = spark.createDataFrame([("u", 1)], ["url", "html"])  # html wrong type, cols missing
    with pytest.raises(SchemaValidationError) as e:
        validate_pages_schema(bad)
    assert "missing columns" in str(e.value)
    assert "type mismatches" in str(e.value)


def test_validate_pages_sample(spark, pages_small):
    from medical_and_charity_document_extraction_system_spark.sources.validate import (
        validate_pages_sample,
    )

    stats = validate_pages_sample(pages_small)
    assert stats["rows_sampled"] == 100
    assert stats["bad_schemes"] == 0
