"""Rolling per-key frame aggregates (operators/rolling.py)."""

from datetime import datetime, timedelta

import pytest

from medical_and_charity_document_extraction_system_spark.operators.rolling import (
    rolling_event_stats,
)

_T0 = datetime(2024, 3, 1)


def _ev(spark, rows):
    # rows: (event_id, user, minute_offset, value)
    data = [
        (e, _T0 + timedelta(minutes=m), u, "view", v) for (e, u, m, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_trailing_frame_contents(spark):
    rows = [
        (1, 1, 0, 1.0),
        (2, 1, 1, 2.0),
        (3, 1, 2, 4.0),
        (4, 1, 3, 8.0),
        (5, 1, 4, 16.0),
        (6, 2, 0, 100.0),  # other user: frames never cross keys
    ]
    out = {
        r.event_id: (r.n_window, r.roll_sum, r.roll_max)
        for r in rolling_event_stats(_ev(spark, rows), n_preceding=3).collect()
    }
    assert out == {
        1: (1, 1.0, 1.0),
        2: (2, 3.0, 2.0),
        3: (3, 7.0, 4.0),
        4: (4, 15.0, 8.0),
        5: (4, 30.0, 16.0),  # frame slid: event 1 dropped out
        6: (1, 100.0, 100.0),
    }


def test_tie_break_is_by_event_id(spark):
    # two events at the SAME timestamp: frame order must be (us, id),
    # so event 11 precedes 12 regardless of input order
    rows = [(12, 1, 5, 2.0), (11, 1, 5, 1.0)]
    out = {
        r.event_id: r.roll_sum
        for r in rolling_event_stats(_ev(spark, rows), n_preceding=1).collect()
    }
    assert out == {11: 1.0, 12: 3.0}


def test_rerun_identity_across_partitionings(spark):
    rows = [(e, e % 3, e, float(e)) for e in range(40)]
    df = _ev(spark, rows)
    a = sorted(map(tuple, rolling_event_stats(df, 2).collect()))
    b = sorted(map(tuple, rolling_event_stats(df.repartition(7), 2).collect()))
    assert a == b


def test_rejects_bad_frame(spark):
    df = _ev(spark, [(1, 1, 0, 1.0)])
    with pytest.raises(ValueError):
        rolling_event_stats(df, n_preceding=0)
