"""Bin-bucketed range join (operators/rangejoin.py)."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.rangejoin import (
    range_join_bins,
)

P_SCHEMA = "pid long, k long, ts_us long"
I_SCHEMA = "iid long, k long, start_us long, end_us long"


def _run(spark, points, intervals, width=100):
    p = spark.createDataFrame(points, P_SCHEMA)
    iv = spark.createDataFrame(intervals, I_SCHEMA)
    out = range_join_bins(
        p, iv, key_col="k", ts_col="ts_us",
        start_col="start_us", end_col="end_us", bin_width_us=width,
    )
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_containment_inclusive_both_ends(spark):
    intervals = [(1, 1, 100, 200)]
    points = [(10, 1, 99), (11, 1, 100), (12, 1, 150), (13, 1, 200), (14, 1, 201)]
    assert _run(spark, points, intervals) == [(11, 1), (12, 1), (13, 1)]


def test_interval_spanning_many_bins_emits_once(spark):
    # interval covers 10 bins at width=100; each contained point pairs once
    intervals = [(1, 1, 50, 1049)]
    points = [(10, 1, 50), (11, 1, 500), (12, 1, 1049), (13, 1, 1050)]
    got = _run(spark, points, intervals, width=100)
    assert got == [(10, 1), (11, 1), (12, 1)]


def test_overlapping_intervals_both_match(spark):
    intervals = [(1, 1, 0, 100), (2, 1, 50, 150)]
    points = [(10, 1, 75)]
    assert _run(spark, points, intervals) == [(10, 1), (10, 2)]


def test_keys_do_not_cross(spark):
    assert _run(spark, [(10, 1, 50)], [(1, 2, 0, 100)]) == []


def test_width_must_be_positive(spark):
    p = spark.createDataFrame([(1, 1, 1)], P_SCHEMA)
    iv = spark.createDataFrame([(1, 1, 0, 2)], I_SCHEMA)
    with pytest.raises(ValueError):
        range_join_bins(p, iv, key_col="k", ts_col="ts_us",
                        start_col="start_us", end_col="end_us",
                        bin_width_us=0)


def test_partitioning_invariant_and_width_invariant(spark):
    points = [(i, i % 3, (i * 37) % 1000) for i in range(80)]
    intervals = [(i, i % 3, (i * 53) % 900, (i * 53) % 900 + 120) for i in range(30)]
    a = _run(spark, points, intervals, width=100)
    b = _run(spark, points, intervals, width=7)
    c = _run(spark, points, intervals, width=10_000)
    assert a == b == c and len(a) > 0


def test_plan_is_equi_join_not_nested_loop(spark):
    p = spark.createDataFrame([(1, 1, 50)], P_SCHEMA)
    iv = spark.createDataFrame([(1, 1, 0, 100)], I_SCHEMA)
    plan = (
        range_join_bins(p, iv, key_col="k", ts_col="ts_us",
                        start_col="start_us", end_col="end_us")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
