"""Cohort retention and funnel conversion (operators/cohorts.py)."""

from datetime import datetime, timedelta

from medical_and_charity_document_extraction_system_spark.operators.cohorts import (
    cohort_retention,
    funnel_stages,
)

_D0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    # rows: (user, day_offset, hour, event_type)
    data = [
        (u, _D0 + timedelta(days=d, hours=h), t, 1.0)
        for (u, d, h, t) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, value double"
    )


def test_cohort_retention_triangle(spark):
    rows = [
        (1, 0, 1, "view"), (1, 0, 5, "click"),   # u1: cohort day0
        (1, 1, 2, "view"), (1, 3, 2, "view"),    # active age 1 and 3
        (2, 1, 4, "view"),                        # u2: cohort day1 only
        (3, 0, 9, "view"), (3, 1, 9, "view"),    # u3: cohort day0, age 1
    ]
    out = {
        (r.cohort, r.age): r.n_active
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    d0 = (_D0 - datetime(1970, 1, 1)).days
    assert out == {
        (d0, 0): 2,       # u1, u3
        (d0, 1): 2,       # u1, u3
        (d0, 3): 1,       # u1
        (d0 + 1, 0): 1,   # u2
    }


def test_funnel_ordering_is_strict(spark):
    rows = [
        # u1 completes in order
        (1, 0, 1, "view"), (1, 0, 2, "click"), (1, 0, 3, "purchase"),
        # u2: click BEFORE the first view does not count; later click does
        (2, 0, 1, "click"), (2, 0, 2, "view"), (2, 0, 5, "click"),
        # u3: purchase without a click never reaches stage 3
        (3, 0, 1, "view"), (3, 0, 2, "purchase"),
        # u4: everything before the first view -> stage 1 only
        (4, 0, 1, "purchase"), (4, 0, 2, "click"), (4, 0, 3, "view"),
        # u5: click at the SAME instant as view: strictly-after, drops
        (5, 0, 1, "view"), (5, 0, 1, "click"),
    ]
    out = {r.step: r.n_users for r in funnel_stages(_ev(spark, rows)).collect()}
    assert out == {"view": 5, "click": 2, "purchase": 1}


def test_funnel_uses_earliest_continuing_event(spark):
    # u1's first click after view is at h2; the purchase at h3 sits
    # between click@2 and a later click@9 — it must count (first-touch
    # chain times are minima, not maxima)
    rows = [
        (1, 0, 1, "view"), (1, 0, 2, "click"),
        (1, 0, 3, "purchase"), (1, 0, 9, "click"),
    ]
    out = {r.step: r.n_users for r in funnel_stages(_ev(spark, rows)).collect()}
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_stage_order_column(spark):
    rows = [(1, 0, 1, "view")]
    got = [(r.stage, r.step) for r in
           funnel_stages(_ev(spark, rows)).orderBy("stage").collect()]
    assert got == [(1, "view"), (2, "click"), (3, "purchase")]
