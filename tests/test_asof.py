"""Distributed as-of join (operators/asof.py)."""

import datetime as dt

from medical_and_charity_document_extraction_system_spark.operators.asof import (
    asof_join,
)

L_SCHEMA = "event_id long, user_id long, ts timestamp"
R_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _run(spark, lrows, rrows):
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    out = asof_join(
        left, right, key_col="user_id", ts_col="ts",
        right_cols=("event_id", "value"), right_id_col="event_id",
    )
    return {r["event_id"]: r.asDict() for r in out.collect()}


def test_latest_at_or_before_wins(spark):
    lrows = [(100, 1, _t(10)), (101, 1, _t(30))]
    rrows = [
        (1, 1, _t(5), 1.0),
        (2, 1, _t(9), 2.0),
        (3, 1, _t(20), 3.0),
        (4, 1, _t(40), 4.0),
    ]
    out = _run(spark, lrows, rrows)
    assert out[100]["r_event_id"] == 2 and out[100]["r_value"] == 2.0
    assert out[101]["r_event_id"] == 3
    assert out[100]["r_ts"] == _t(9)


def test_no_preceding_row_is_null(spark):
    out = _run(spark, [(100, 1, _t(1))], [(1, 1, _t(5), 1.0)])
    assert out[100]["r_event_id"] is None and out[100]["r_ts"] is None


def test_equal_timestamp_matches(spark):
    out = _run(spark, [(100, 1, _t(5))], [(1, 1, _t(5), 1.0)])
    assert out[100]["r_event_id"] == 1


def test_keys_do_not_cross(spark):
    out = _run(spark, [(100, 1, _t(10))], [(1, 2, _t(5), 1.0)])
    assert out[100]["r_event_id"] is None


def test_right_ties_resolve_to_min_id(spark):
    rrows = [(7, 1, _t(5), 7.0), (3, 1, _t(5), 3.0), (9, 1, _t(5), 9.0)]
    out = _run(spark, [(100, 1, _t(10))], rrows)
    assert out[100]["r_event_id"] == 3 and out[100]["r_value"] == 3.0


def test_ts_equal_left_rows_get_identical_match(spark):
    lrows = [(100, 1, _t(10)), (101, 1, _t(10))]
    rrows = [(1, 1, _t(5), 1.0), (2, 1, _t(8), 2.0)]
    out = _run(spark, lrows, rrows)
    assert out[100]["r_event_id"] == out[101]["r_event_id"] == 2


def test_partitioning_invariant(spark):
    lrows = [(i, i % 3, _t(i % 50)) for i in range(100, 160)]
    rrows = [(i, i % 3, _t((i * 7) % 50), float(i)) for i in range(60)]
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    kw = dict(key_col="user_id", ts_col="ts",
              right_cols=("event_id", "value"), right_id_col="event_id")
    a = sorted(tuple(r) for r in asof_join(left, right, **kw).collect())
    b = sorted(
        tuple(r)
        for r in asof_join(left.repartition(8), right.repartition(5), **kw).collect()
    )
    assert a == b


def test_plan_has_no_join_node(spark):
    left = spark.createDataFrame([(1, 1, _t(1))], L_SCHEMA)
    right = spark.createDataFrame([(1, 1, _t(1), 1.0)], R_SCHEMA)
    plan = (
        asof_join(left, right, right_cols=("event_id", "value"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
