"""Rolling (sliding rows-frame) aggregates per key.

The last member of the temporal family next to tumbling/hopping
windows (time-bucketed), sessionization (gap-based), and the as-of /
range joins (cross-stream): a per-entity trailing statistic — "this
user's activity vs their last N events" — the standard feature shape
for rate-anomaly and engagement scoring.

Determinism: the frame order must be a TOTAL order or the frame
contents are partition-dependent — ``(ts, id)`` with a unique id
column is required, not optional. Sums run over ``decimal(18,2)``
(exact, order-free — the events_tumbling precedent); min/max of
doubles are order-free comparisons; counts are integers. Nothing
depends on float accumulation order, so the DuckDB twin is the same
window spelled in SQL.

Scale shape: one shuffle on the entity key, then a linear pass per
partition — rows-frames never materialize the whole partition (Spark
keeps a sliding buffer of ``n_preceding + 1`` rows). The skew story is
sessionize's: a pathological single entity serializes its own
partition only; AQE cannot split a window, so callers with known
whale keys should pre-filter or cap them (documented, as for
user_sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_event_stats(
    events: DataFrame,
    n_preceding: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per event: count / exact-decimal sum / max of ``value`` over the
    trailing ``n_preceding`` events of the same key plus the current
    row, ordered by (epoch micros, id). Returns
    (event_id, user_id, us, n_window, roll_sum, roll_max)."""
    if n_preceding < 1:
        raise ValueError("n_preceding must be >= 1")
    base = events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(value_col).cast("decimal(18,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-n_preceding, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "us",
        F.count(F.lit(1)).over(w).cast("long").alias("n_window"),
        F.sum("v").over(w).cast("double").alias("roll_sum"),
        F.max("v").over(w).cast("double").alias("roll_max"),
    )


def rolling_time_stats(
    events: DataFrame,
    window_us: int = 3_600_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per event: count / exact-decimal sum of ``value`` over the
    trailing ``window_us`` microseconds of the same key — a RANGE
    frame on the epoch-micros ordering, the time-based twin of
    ``rolling_event_stats``'s rows frame.

    RANGE frames need no tiebreak column: the frame is defined by the
    ORDER value alone, so rows sharing a timestamp are peers with
    identical frames in both engines — deterministic by construction
    (the rows-frame form needs the total (us, id) key instead).

    Scale shape: same as the rows frame — one shuffle on the key,
    then a linear sliding pass; Spark evicts rows that fall out of the
    range bound, so memory is the max events-per-key-per-window, not
    the partition."""
    base = events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("user_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(value_col).cast("decimal(18,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-window_us, 0)
    )
    return base.select(
        "event_id",
        "user_id",
        "us",
        F.count(F.lit(1)).over(w).cast("long").alias("n_window"),
        F.sum("v").over(w).cast("double").alias("win_sum"),
    )
