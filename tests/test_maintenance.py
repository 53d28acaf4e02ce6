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
