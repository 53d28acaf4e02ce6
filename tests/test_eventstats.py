"""Event-stream analytics (operators/eventstats.py): Markov
transitions, integer-sigma anomalies, interval union, exact OLS
trends."""

from datetime import datetime, timedelta

from medical_and_charity_document_extraction_system_spark.operators.eventstats import (
    bucket_anomalies,
    event_transitions,
    interval_coverage,
    trend_slopes,
)

_D0 = datetime(2024, 1, 1)


def _ev(spark, rows):
    # rows: (event_id, user, seconds_offset, event_type, value)
    data = [
        (eid, _D0 + timedelta(seconds=s), u, t, v)
        for (eid, u, s, t, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )


def test_transitions_counts_and_rates(spark):
    rows = [
        (1, 1, 0, "a", 0.0),
        (2, 1, 10, "b", 0.0),
        (3, 1, 20, "a", 0.0),
        (4, 1, 30, "b", 0.0),
        (5, 2, 0, "a", 0.0),
        (6, 2, 10, "a", 0.0),
        # single-event user contributes no transition
        (7, 3, 0, "b", 0.0),
    ]
    out = {
        (r.prev_type, r.next_type): (r.n_trans, r.prev_total, r.rate_bp)
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    # from 'a': a->b twice, a->a once (total 3); from 'b': b->a once
    assert out == {
        ("a", "b"): (2, 3, 6666),
        ("a", "a"): (1, 3, 3333),
        ("b", "a"): (1, 1, 10000),
    }


def test_transitions_order_is_total_not_arrival(spark):
    # same-timestamp rows break ties by event_id
    rows = [
        (2, 1, 0, "b", 0.0),
        (1, 1, 0, "a", 0.0),
        (3, 1, 1, "c", 0.0),
    ]
    out = {
        (r.prev_type, r.next_type)
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


def test_anomalies_flag_only_the_spike(spark):
    # type 'x': four quiet hours of 2 events + one hour of 12
    rows = []
    eid = 0
    for h in range(4):
        for _ in range(2):
            rows.append((eid, 1, h * 3600 + eid % 60, "x", 0.0))
            eid += 1
    for _ in range(12):
        rows.append((eid, 1, 4 * 3600 + eid % 60, "x", 0.0))
        eid += 1
    out = bucket_anomalies(_ev(spark, rows)).collect()
    flagged = {r.bucket_us_start for r in out if r.is_anomaly}
    # n=5, total=20, sumsq=160: the spike bucket (5*12-20)^2=1600 vs
    # 9*(5*160-400)=3600? no: 5*160-400=400, 9*400=3600 -> 1600<3600
    # so nothing flags with 12; the arithmetic below pins exactness
    for r in out:
        n_b = 5
        tot = 20
        sumsq = 4 * 4 + 144
        assert r.dev_sq == (n_b * r.n_events - tot) ** 2
        assert r.thresh_sq == 9 * (n_b * sumsq - tot * tot)
        assert r.is_anomaly == (r.dev_sq > r.thresh_sq)
    assert flagged == {
        r.bucket_us_start for r in out if r.dev_sq > r.thresh_sq
    }


def test_anomalies_single_bucket_never_flags(spark):
    rows = [(i, 1, i, "solo", 0.0) for i in range(5)]
    out = bucket_anomalies(_ev(spark, rows)).collect()
    assert len(out) == 1 and not out[0].is_anomaly


def test_anomalies_extreme_spike_flags(spark):
    # 30 quiet hours of 1 event + one hour of 100. (A single outlier
    # among n buckets caps at z = (n-1)/sqrt(n), so n must be large
    # enough for 3 sigma to be reachable at all — 10 buckets is not.)
    rows = []
    eid = 0
    for h in range(30):
        rows.append((eid, 1, h * 3600, "x", 0.0))
        eid += 1
    for i in range(100):
        rows.append((eid, 1, 30 * 3600 + i % 3600, "x", 0.0))
        eid += 1
    out = bucket_anomalies(_ev(spark, rows)).collect()
    assert {r.n_events for r in out if r.is_anomaly} == {100}


def test_interval_union_merges_nested_intervals(spark):
    # u1: [0,100) swallows [10,20) AND [50,160) chains on; [200,210)
    # starts a new island. The gap rule (prev end) would wrongly
    # split after the nested [10,20).
    rows = [
        (1, 1, 0, "a", 100.0),
        (2, 1, 10, "a", 10.0),
        (3, 1, 50, "a", 110.0),
        (4, 1, 200, "a", 10.0),
    ]
    out = sorted(
        interval_coverage(_ev(spark, rows)).collect(),
        key=lambda r: (r.user_id, r.island),
    )
    d0us = int((_D0 - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    spans = [
        (r.start_us - d0us, r.end_us - d0us, r.n_events) for r in out
    ]
    assert spans == [
        (0, 160_000_000, 3),
        (200_000_000, 210_000_000, 1),
    ]


def test_interval_touching_endpoints_merge(spark):
    # end == next start merges (strict > breaks islands)
    rows = [(1, 1, 0, "a", 10.0), (2, 1, 10, "a", 5.0)]
    out = interval_coverage(_ev(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_trend_slope_exact_line(spark):
    # value = 2 cents/min * x + 5 for type 'up'; constant for 'flat'
    rows = []
    for i in range(6):
        rows.append((i, 1, i * 60, "up", (5.0 + 0.02 * i)))
    for i in range(4):
        rows.append((100 + i, 1, i * 60, "flat", 7.25))
    out = {r.event_type: r for r in trend_slopes(_ev(spark, rows)).collect()}
    up = out["up"]
    # y climbs 2 cents per minute exactly
    assert up.slope_den > 0
    assert up.slope_num == 2 * up.slope_den
    assert up.slope_cents_per_min == 2.0
    assert out["flat"].slope_num == 0
    assert out["flat"].slope_cents_per_min == 0.0


def test_trend_degenerate_den_is_null(spark):
    # all events in the same minute: den = 0 -> NULL slope
    rows = [(1, 1, 0, "x", 1.0), (2, 1, 30, "x", 9.0)]
    out = trend_slopes(_ev(spark, rows)).collect()[0]
    assert out.slope_den == 0 and out.slope_cents_per_min is None
