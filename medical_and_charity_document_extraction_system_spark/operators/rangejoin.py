"""Distributed range (interval) join — the second temporal operator
Spark's optimizer handles badly: a join whose ON clause is
``l.ts BETWEEN r.start AND r.end`` plans as
BroadcastNestedLoopJoin / CartesianProduct (O(N x M) pairs), which is
a non-starter at corpus scale.

The scale form is BIN BUCKETING (the published trick behind Spark's
range-join hints and every interval-join engine): pick a bin width W,
assign every point row to bin ts DIV W, expand every interval row to
the bins it covers (ceil(len/W) + 1 rows — bounded when intervals are
bounded), equi-join on (key, bin), then apply the exact range
predicate as a post-filter. Each point has exactly ONE bin and an
interval's bins are distinct, so a matching (point, interval) pair is
produced exactly once — no dedup step needed.

All arithmetic is exact int64 microseconds (unix_micros /
DuckDB epoch_us); the oracle twin is the plain BETWEEN join, which
DuckDB executes as its native IEJoin.

Scale shape: ONE equi shuffle on (key, bin) — partitioned,
AQE-splittable, skew-saltable like any hash join; the interval
expansion factor is interval_length/W + 1 (pick W near the typical
interval length, giving ~2x). Plan tests pin the absence of
nested-loop/cartesian nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bins(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bin_width_us: int = 1_800_000_000,
) -> DataFrame:
    """Equi-join ``points`` (one int64-microsecond instant per row)
    to every ``intervals`` row with the same key whose
    [start_us, end_us] (inclusive both ends) contains it. Column
    names must be disjoint apart from ``key_col``. Returns all
    columns from both sides."""
    if bin_width_us <= 0:
        raise ValueError("bin_width_us must be positive")
    width = int(bin_width_us)
    p = points.withColumn(
        "_bin", F.expr(f"CAST({ts_col} AS BIGINT) DIV {width}")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) DIV {width}"),
                F.expr(f"CAST({end_col} AS BIGINT) DIV {width}"),
            )
        ),
    )
    joined = p.join(iv, on=[key_col, "_bin"]).where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    l_start: str = "l_start_us",
    l_end: str = "l_end_us",
    r_start: str = "r_start_us",
    r_end: str = "r_end_us",
    bin_width_us: int = 1_800_000_000,
) -> DataFrame:
    """Interval-x-interval overlap join: every (left, right) pair with
    the same key whose CLOSED intervals intersect —
    ``max(starts) <= min(ends)``. The BETWEEN-style plan is again a
    nested loop; the scale form explodes BOTH sides to their covered
    bins and equi-joins on (key, bin), which alone would emit a pair
    once per SHARED bin. The exactly-once rule: a pair is kept only
    in the bin containing ``max(starts)`` — that instant lies inside
    both intervals whenever they overlap, so exactly one shared bin
    qualifies and no dedup shuffle is ever needed. Column names must
    be disjoint apart from ``key_col``; returns all columns from both
    sides plus the exact int64 ``overlap_us``."""
    if bin_width_us <= 0:
        raise ValueError("bin_width_us must be positive")
    width = int(bin_width_us)

    def _expand(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.expr(f"CAST({s} AS BIGINT) DIV {width}"),
                    F.expr(f"CAST({e} AS BIGINT) DIV {width}"),
                )
            ),
        )

    ls, le = F.col(l_start), F.col(l_end)
    rs, re_ = F.col(r_start), F.col(r_end)
    joined = (
        _expand(left, l_start, l_end)
        .join(_expand(right, r_start, r_end), on=[key_col, "_bin"])
        .where(
            (F.greatest(ls, rs) <= F.least(le, re_))
            & (F.col("_bin") == F.expr(f"greatest({l_start}, {r_start}) DIV {width}"))
        )
    )
    return joined.drop("_bin").withColumn(
        "overlap_us",
        (F.least(le, re_) - F.greatest(ls, rs)).cast("long"),
    )
