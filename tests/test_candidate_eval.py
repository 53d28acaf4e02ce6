"""Blocking-scheme evaluation (operators/dedup.candidate_eval)."""

from medical_and_charity_document_extraction_system_spark.operators.dedup import (
    candidate_eval,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_confusion_counts(spark):
    cand = _pairs(spark, [(1, 2), (3, 4), (5, 6)])
    truth = _pairs(spark, [(1, 2), (3, 4), (7, 8)])
    r = candidate_eval(cand, truth).collect()[0]
    assert (r.tp, r.fp, r.fn) == (2, 1, 1)
    assert (r.n_candidates, r.n_truth) == (3, 3)
    assert r.precision_bp == 6666 and r.recall_bp == 6666


def test_duplicate_pairs_counted_once(spark):
    cand = _pairs(spark, [(1, 2), (1, 2)])
    truth = _pairs(spark, [(1, 2)])
    r = candidate_eval(cand, truth).collect()[0]
    assert (r.tp, r.fp, r.fn) == (1, 0, 0)
    assert r.precision_bp == 10000 and r.recall_bp == 10000


def test_empty_sides_yield_null_rates(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    truth = _pairs(spark, [(1, 2)])
    r = candidate_eval(empty, truth).collect()[0]
    assert (r.tp, r.fp, r.fn) == (0, 0, 1)
    assert r.precision_bp is None and r.recall_bp == 0
