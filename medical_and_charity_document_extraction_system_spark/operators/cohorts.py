"""Cohort retention and funnel conversion over the events stream.

The two remaining event-analytics staples next to the windowed
rollups (tumbling/hopping), sessionization, and the temporal joins
(as-of, range). Both are built integer-only: event times become epoch
microseconds (the session timezone is pinned UTC, so Spark
``unix_micros`` equals DuckDB ``epoch_us`` — the sessionize
precedent), bucketed by integer floor division; every output column
is a bigint count — nothing for float fold order to disturb.

Scale shape:
- cohort_retention: one per-(user, bucket) distinct (map-side
  combinable), one per-user min agg, one equi-join back on the user
  key, one final (cohort, age) hash-agg. All shuffles key on user_id
  or the small (cohort, age) pair — AQE-splittable, no window.
- funnel_stages: one filter + user-keyed equi-join + per-user min agg
  PER STEP — the textbook iterative funnel, each stage's state is one
  row per surviving user (monotonically shrinking). A 30-step funnel
  over 10^10 users is 30 joins on the same key — bucketing the events
  table by user_id (plans/bucketing.py) makes all of them co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DAY_US = 86_400_000_000


def _us(ts_col: str):
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = _DAY_US,
) -> DataFrame:
    """(cohort, age, n_active): users whose FIRST-ever activity bucket
    is ``cohort``, active again ``age`` buckets later — the classic
    retention triangle (age 0 row = cohort size). Buckets are epoch
    floor-divisions (day by default): integer, tz-free, identical in
    any engine."""
    act = (
        events.select(
            F.col(user_col).alias("user"),
            F.expr(f"unix_micros(cast({ts_col} as timestamp)) DIV {bucket_us}")
            .alias("bucket"),
        )
        .distinct()
    )
    first = act.groupBy("user").agg(F.min("bucket").alias("cohort"))
    # act is distinct per (user, bucket) and (cohort, age) pins the
    # bucket, so a plain count IS the distinct-user count — no
    # count_distinct expansion needed
    return (
        act.join(first, "user")
        .groupBy("cohort", (F.col("bucket") - F.col("cohort")).alias("age"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


def funnel_stages(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: stage i counts users with a step-i
    event STRICTLY AFTER their earliest qualifying step-(i-1) event
    (the standard "first touch" funnel — each user's stage time is
    the earliest event that continues their chain). Returns
    (stage, step, n_users), one row per step."""
    if not steps:
        raise ValueError("steps must be non-empty")
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        _us(ts_col).alias("us"),
    )
    reached = (
        base.where(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("us").alias("t"))
    )
    counts = [reached.agg(F.count(F.lit(1)).cast("long").alias("n_users"))]
    for step in steps[1:]:
        reached = (
            base.where(F.col("etype") == step)
            .join(reached.select("user", F.col("t").alias("_prev")), "user")
            .where(F.col("us") > F.col("_prev"))
            .groupBy("user")
            .agg(F.min("us").alias("t"))
        )
        counts.append(
            reached.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        )
    out = None
    for i, (step, c) in enumerate(zip(steps, counts), 1):
        row = c.select(
            F.lit(i).cast("long").alias("stage"),
            F.lit(step).alias("step"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    price_col: str = "o_totalprice",
    recency_days: tuple = (90, 365),
    freq_min: tuple = (12, 8),
    monetary_cents: tuple = (300_000_000, 150_000_000),
) -> DataFrame:
    """RFM customer segmentation (the classic retention cube): per
    customer, Recency = whole days between their last order and the
    corpus's last order (integer epoch-DAY difference, never a
    calendar function — engines disagree on date_diff conventions),
    Frequency = order count, Monetary = exact cents. Each dimension
    buckets 2/1/0 by fixed integer thresholds (pure CASE — a scale-
    safe projection; data-driven terciles are ccnet_buckets' job),
    then one rollup over the <= 27 segments with the average order
    value as ONE integer division. Two aggs + a one-row broadcast —
    no window anywhere."""
    day = 86_400_000_000
    per = orders.groupBy(F.col(cust_col).alias("cust")).agg(
        F.max(
            F.expr(f"unix_micros(CAST({date_col} AS TIMESTAMP)) div {day}")
        ).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(
            (F.col(price_col).cast("decimal(18,2)") * 100).cast("long")
        ).alias("cents"),
    )
    gmax = per.agg(F.max("last_day").alias("corpus_last_day"))
    r2, r1 = recency_days
    f2, f1 = freq_min
    m2, m1 = monetary_cents
    scored = per.crossJoin(F.broadcast(gmax)).select(
        "cust",
        "freq",
        "cents",
        (F.col("corpus_last_day") - F.col("last_day")).alias("rec_days"),
    )
    return (
        scored.select(
            F.when(F.col("rec_days") < r2, 2)
            .when(F.col("rec_days") < r1, 1)
            .otherwise(0)
            .cast("long")
            .alias("r_bucket"),
            F.when(F.col("freq") >= f2, 2)
            .when(F.col("freq") >= f1, 1)
            .otherwise(0)
            .cast("long")
            .alias("f_bucket"),
            F.when(F.col("cents") >= m2, 2)
            .when(F.col("cents") >= m1, 1)
            .otherwise(0)
            .cast("long")
            .alias("m_bucket"),
            "cents",
        )
        .groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .withColumn(
            "avg_cents",
            F.expr("total_cents div n_customers").cast("long"),
        )
    )
