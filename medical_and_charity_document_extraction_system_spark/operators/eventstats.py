"""Event-stream analytics: transition matrices, integer z-score
anomaly flags, interval-union coverage, and exact least-squares
trends.

These extend the temporal family (tumbling/hopping windows,
sessionize, rolling frames, as-of/range joins, cohorts/funnels) with
the remaining shapes an operational analytics layer over an event
log needs — reference analog: the request/metrics telemetry the
extraction service emits per processed document
(/root/reference/backend/app/api/routes/ocr_routes.py logs one
record per request; at fleet scale those records ARE this events
table).

Determinism / oracle strategy (shared with the rest of the repo):

* Every fraction is either an exact integer comparison
  (cross-multiplied, never divided) or ONE final division of two
  exactly-agreed integers — so the DuckDB twins land on identical
  doubles without float-fold care.
* Window frames only ever order by a TOTAL key ((epoch_us,
  event_id)) — the rolling/sessionize precedent.
* Timestamps travel as ``unix_micros(cast(ts as timestamp))`` ==
  DuckDB ``epoch_us(ts)`` (session tz pinned UTC in config.py).

Scale shapes:

* ``event_transitions``: one lag-window shuffle on the entity key
  (sessionize's skew story: a whale user serializes only its own
  partition), then two hash-aggs over the TYPE-PAIR table — whose
  size is bounded by |event_type|^2, not the corpus.
* ``bucket_anomalies``: two map-side-combinable hash-aggs (bucket
  counts, then per-type moments) + a broadcast-sized join back on
  event_type. No window at all.
* ``interval_coverage``: one shuffle on the entity key, two
  rows-frame windows (running max-end, running island-id sum) that
  stream through each partition, one hash-agg. This is interval
  UNION (overlapping spans merge), not gap sessionization — a later
  event nested inside a long-running predecessor must NOT open a new
  island, which the gap rule gets wrong.
* ``trend_slopes``: one 1-row global-min agg (broadcast), then ONE
  map-side-combinable moment agg per type. Integer overflow bound:
  with x in whole minutes (<= ~43k over a 30-day log) and y in cents
  (<= ~50k), sum(x)*sum(y) stays under 2^63 through ~10^5 rows per
  type; beyond that move the moment sums to DECIMAL(38,0) (both
  engines compute them exactly) — documented, not needed at any test
  scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(ts_col: str) -> F.Column:
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts: for each consecutive
    event pair of the same key (ordered by the total (epoch_us, id)
    key), count (prev_type, next_type), and rate each transition
    against its prev_type row total in integer basis points. Returns
    (prev_type, next_type, n_trans, prev_total, rate_bp)."""
    base = events.select(
        F.col(key_col).alias("k"),
        _us(ts_col).alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("next_type"),
    )
    w = Window.partitionBy("k").orderBy("us", "eid")
    pairs = base.select(
        F.lag("next_type").over(w).alias("prev_type"), "next_type"
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    # row totals re-aggregate the |types|^2-bounded count table (never
    # the raw pairs a second time), then broadcast back
    totals = counts.groupBy("prev_type").agg(
        F.sum("n_trans").alias("prev_total")
    )
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.col("prev_total").cast("long").alias("prev_total"),
        F.expr("(n_trans * 10000) DIV prev_total").alias("rate_bp"),
    )


def bucket_anomalies(
    events: DataFrame,
    bucket_us: int = 3_600_000_000,
    k_sigma: int = 3,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type volume anomalies over fixed time buckets: a bucket is
    anomalous when its count deviates from the type's mean by more
    than ``k_sigma`` population standard deviations — evaluated
    entirely in cross-multiplied int64, no mean/variance division:

        (n*c - total)^2  >  k^2 * (n*sumsq - total^2)

    (both sides are the textbook inequality scaled by n^2). Only
    OBSERVED buckets participate — a type absent from a bucket
    contributes no row (documented; densifying to the full grid is a
    sequence() explode away if a caller needs it). Types with a
    single bucket have zero variance and are never flagged. Returns
    (event_type, bucket_us_start, n_events, dev_sq, thresh_sq,
    is_anomaly)."""
    c = bucket_counts(events, bucket_us, ts_col, type_col)
    return anomalies_from_counts(c, k_sigma)


def bucket_counts(
    events: DataFrame,
    bucket_us: int = 3_600_000_000,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The (event_type, bucket_us_start, n_events) count table the
    anomaly rule consumes — split out because counts merge by
    ADDITION, so a streaming maintainer can write per-epoch deltas
    and groupBy-SUM them back into exactly this table (the CMS
    register-delta pattern)."""
    return (
        events.select(
            F.col(type_col).alias("event_type"),
            (
                F.expr(
                    f"unix_micros(cast({ts_col} as timestamp)) DIV {bucket_us}"
                )
                * F.lit(bucket_us)
            ).alias("bucket_us_start"),
        )
        .groupBy("event_type", "bucket_us_start")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def anomalies_from_counts(c: DataFrame, k_sigma: int = 3) -> DataFrame:
    """The integer-sigma rule over an already-built count table (see
    bucket_anomalies for the inequality derivation)."""
    stats = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum("n_events").alias("tot"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sumsq"),
    )
    j = c.join(F.broadcast(stats), "event_type")
    dev_sq = F.expr("(nb * n_events - tot) * (nb * n_events - tot)")
    thresh_sq = F.expr(f"{k_sigma * k_sigma} * (nb * sumsq - tot * tot)")
    return j.select(
        "event_type",
        "bucket_us_start",
        F.col("n_events").cast("long").alias("n_events"),
        dev_sq.cast("long").alias("dev_sq"),
        thresh_sq.cast("long").alias("thresh_sq"),
        ((F.col("nb") > 1) & (dev_sq > thresh_sq)).alias("is_anomaly"),
    )


def interval_coverage(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    dur_col: str = "value",
) -> DataFrame:
    """Merge each key's overlapping activity intervals [start, start +
    duration) into maximal islands (interval UNION). Durations come
    from ``dur_col`` seconds converted to exact integer micros via
    DECIMAL(18,2) — never a double*1e6 cast, whose round-vs-truncate
    semantics differ between engines. An island breaks only where the
    next start exceeds the running max end over ALL predecessors —
    the cumulative-max form; comparing against the immediately
    previous end (the gap/sessionize rule) wrongly splits an interval
    nested inside a longer one. Returns one row per island:
    (user_id, island, start_us, end_us, n_events)."""
    base = events.select(
        F.col(key_col).alias("user_id"),
        _us(ts_col).alias("start_us"),
        F.col(id_col).alias("eid"),
        (
            _us(ts_col)
            + (F.col(dur_col).cast("decimal(18,2)") * 1_000_000).cast("long")
        ).alias("end_us"),
    )
    order = Window.partitionBy("user_id").orderBy("start_us", "eid")
    prev_max = (
        F.max("end_us")
        .over(order.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_max_end")
    )
    flagged = base.select(
        "user_id",
        "start_us",
        "end_us",
        "eid",
        F.when(
            prev_max.isNull() | (F.col("start_us") > prev_max), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    with_island = flagged.select(
        "user_id",
        "start_us",
        "end_us",
        F.sum("new_island")
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return with_island.groupBy("user_id", "island").agg(
        F.min("start_us").alias("start_us"),
        F.max("end_us").alias("end_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def trend_slopes(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Exact per-type least-squares trend of value over time. x is
    whole minutes since the global earliest event (one 1-row agg,
    broadcast); y is exact cents via DECIMAL(18,2). The OLS slope's
    numerator and denominator

        num = n*Sxy - Sx*Sy        den = n*Sxx - Sx*Sx

    are plain int64 cross-products of map-side-combinable moment
    sums, so both engines agree bit-for-bit; the exported slope
    (cents per minute) is ONE final division. den = 0 (all events of
    a type in the same minute) exports a NULL slope. Returns
    (event_type, n_events, slope_num, slope_den, slope_cents_per_min).
    """
    t0 = events.agg(F.min(_us(ts_col)).alias("t0"))
    base = events.join(F.broadcast(t0)).select(
        F.col(type_col).alias("event_type"),
        F.expr(
            f"(unix_micros(cast({ts_col} as timestamp)) - t0) DIV 60000000"
        ).alias("x"),
        (F.col(value_col).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    m = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.expr("n_events * sxy - sx * sy")
    den = F.expr("n_events * sxx - sx * sx")
    return m.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(
            den != 0, num.cast("double") / den.cast("double")
        ).alias("slope_cents_per_min"),
    )


def path_trigrams(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Second-order journey mining: counts of consecutive event-type
    TRIPLES per key (ordered by the total (epoch_us, id) key — the
    event_transitions rule), with each trigram's share of all
    trigrams in integer basis points. Two stacked lags over the same
    window spec collapse into ONE window node (single shuffle on the
    key, single sort); the count table is |types|^3-bounded, and the
    global total re-aggregates THAT table, never the raw rows."""
    base = events.select(
        F.col(key_col).alias("k"),
        _us(ts_col).alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("t3"),
    )
    w = Window.partitionBy("k").orderBy("us", "eid")
    tri = base.select(
        F.lag("t3", 2).over(w).alias("t1"),
        F.lag("t3", 1).over(w).alias("t2"),
        "t3",
    ).where(F.col("t1").isNotNull())
    counts = tri.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    total = counts.agg(F.sum("n_paths").alias("n_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "t1",
        "t2",
        "t3",
        "n_paths",
        F.expr("n_paths * 10000 div n_total").cast("long").alias("share_bp"),
    )


def time_weighted_means(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Time-weighted mean value per key (the TWAP integral): each
    event's value holds until the NEXT event of the same key (lead on
    the total (epoch_us, id) ordering). Weights are WHOLE SECONDS
    (floor of the micro gap — deterministic in both engines): cents
    x seconds keeps the weighted sum inside exact int64, where the
    micros form needs a 17-significant-digit decimal whose
    double-cast rounds differently across engines (measured: last-ulp
    mismatches). Output is all-integer plus ONE double division;
    sub-second gaps weigh 0, the last event of a key has no
    successor, single-event keys drop out, and keys whose whole span
    rounds to 0 seconds are excluded (0/0 is engine-dependent). One
    shuffle on the key, one window node."""
    base = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        (F.col(value_col).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("k").orderBy("us", "eid")
    seg = base.select(
        "k",
        "cents",
        F.expr("(lead(us) OVER (PARTITION BY k ORDER BY us, eid) - us)"
               " div 1000000").alias("dt_s"),
    ).where(F.col("dt_s").isNotNull())
    per = seg.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("dt_s").cast("long").alias("span_s"),
        F.sum(F.col("cents") * F.col("dt_s")).cast("long").alias("wsum"),
    ).where(F.col("span_s") > 0)
    return per.select(
        F.col("k").alias("user_id"),
        "n_segments",
        "span_s",
        F.col("wsum").alias("wsum_cents_s"),
        (
            F.col("wsum").cast("double")
            / (F.col("span_s") * 100).cast("double")
        ).alias("twap"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attr_col: str = "event_type",
) -> DataFrame:
    """Change-point compression into SCD2 validity intervals: per key,
    consecutive runs of the same attribute value (on the total
    (epoch_us, id) ordering) collapse to one row with
    [valid_from_us, valid_to_us) — valid_to is the next CHANGE's
    timestamp, NULL for the current run. The warehouse CDC-to-
    slowly-changing-dimension build. Plan: one lag to mark change
    points (a run's first row), one lead OVER THE CHANGE POINTS ONLY
    for the run's end — both windows share the key shuffle; repeated
    values never materialize per-row state."""
    base = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.col(attr_col).alias("attr"),
    )
    w = Window.partitionBy("k").orderBy("us", "eid")
    marked = base.select(
        "k", "us", "eid", "attr", F.lag("attr").over(w).alias("prev_attr")
    ).where(F.col("prev_attr").isNull() | (F.col("attr") != F.col("prev_attr")))
    # the closing lead keeps the SAME total (us, eid) ordering: two
    # change points in one microsecond must close deterministically
    w2 = Window.partitionBy("k").orderBy("us", "eid")
    return marked.select(
        F.col("k").alias("user_id"),
        "attr",
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w2).alias("valid_to_us"),
    )


def drift_report(
    events: DataFrame,
    split_ts: str = "2024-01-16",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Distribution-drift audit between two time halves (the retrain
    trigger a production pipeline watches): per category, reference
    and current counts plus a scaled chi-square contribution —
    ``(cur*n_ref - ref*n_cur)^2 * 10000 div (ref * n_ref * n_cur)``,
    every term an int64 cross product, ONE floor division per bin
    (each bin's statistic is exact; the total is the sum of the
    floored bins — deterministic in both engines, and floor error is
    < 1 unit per bin). Zero-reference bins report -1 (new category —
    the strongest drift signal, flagged rather than divided by
    zero)."""
    half = F.when(
        F.col(ts_col).cast("timestamp") < F.lit(split_ts).cast("timestamp"),
        F.lit("ref"),
    ).otherwise(F.lit("cur"))
    counts = (
        events.select(F.col(type_col).alias("category"), half.alias("h"))
        .groupBy("category")
        .agg(
            F.sum(F.when(F.col("h") == "ref", 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("h") == "cur", 1).otherwise(0))
            .cast("long")
            .alias("n_cur"),
        )
    )
    totals = counts.agg(
        F.sum("n_ref").alias("tot_ref"), F.sum("n_cur").alias("tot_cur")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "category",
        "n_ref",
        "n_cur",
        F.when(F.col("n_ref") == 0, F.lit(-1))
        .otherwise(
            F.expr(
                "((abs(n_cur * tot_ref - n_ref * tot_cur) * 100)"
                " div tot_ref)"
                " * ((abs(n_cur * tot_ref - n_ref * tot_cur) * 100)"
                " div tot_cur)"
                " div n_ref"
            )
        )
        .cast("long")
        .alias("chi2_contrib_bp"),
    )
