"""Distributed as-of join — the temporal operator Spark's DataFrame
API lacks (pandas has merge_asof; DuckDB has ASOF JOIN, which is the
oracle twin).

For each left row (key, ts) find the right row with the same key and
the LARGEST right.ts <= left.ts; emit the left row plus the matched
right columns (NULL when no right row precedes it). The classic uses
are event attribution (click -> latest preceding view, the catalog
query), slowly-changing-dimension lookups, and trade/quote alignment.

Implementation is the union-window form — the standard scalable
as-of, NOT a range join:

  1. dedup the right side to one row per (key, ts) with a
     deterministic arg-min rule (min_by on a unique id) — ties at the
     same instant would otherwise make both engines pick arbitrarily;
  2. union left and right rows into one stream tagged is_right,
     carrying the right payload as a struct (NULL on left rows);
  3. one window per key ordered by (ts, is_right DESC) — right rows
     sort BEFORE left rows at the same instant, so ts-equal matches
     are included (the >= convention, matching DuckDB ASOF) — taking
     last(payload, ignorenulls=True) over rows UNBOUNDED PRECEDING..
     CURRENT ROW;
  4. keep the left rows and expand the struct.

Determinism under equal sort keys: two left rows at the same (key,
ts) may order arbitrarily, but neither carries a payload, so the
last-non-null struct both see is identical; right-row ties are gone
after step 1. Hence the output is rerun- and partitioning-invariant.

Scale shape: ONE shuffle (hash partition by key for the window) over
left+right combined; no join node at all, no per-key materialization
beyond the running last() state. Skew is bounded by the hottest
key's row count — the sessionize bound already documented and
stress-tested for this partitioning. At 100 TB with a few mega-keys,
pre-split hot keys by time range and stitch (the documented
sessionize remedy); the union-window form is otherwise
shuffle-minimal: a sort within partitions, no N x M candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id", "value"),
    right_id_col: str = "event_id",
    prefix: str = "r_",
) -> DataFrame:
    """As-of join ``left`` to the latest ``right`` row per key with
    right.ts <= left.ts. Returns every left column plus
    ``<prefix>ts`` and ``<prefix><col>`` for each of ``right_cols``
    (NULL when unmatched). The right side is first deduplicated to
    one row per (key, ts) by min ``right_id_col`` — a deterministic
    tie rule both engines can express."""
    # 1. deterministic right dedup: arg-min payload per (key, ts)
    rdedup = right.groupBy(key_col, ts_col).agg(
        *[
            F.expr(f"min_by({c}, {right_id_col})").alias(c)
            for c in right_cols
        ]
    )
    payload = F.struct(
        F.col(ts_col).alias("ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    lcols = left.columns
    # 2. tagged union: left rows carry their row as a struct, right
    # rows carry the payload
    lpart = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.struct(*[F.col(c) for c in lcols]).alias("_left"),
        F.lit(None).cast(
            rdedup.select(payload.alias("p")).schema["p"].dataType
        ).alias("_payload"),
    )
    rpart = rdedup.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("l"))
            .schema["l"]
            .dataType
        ).alias("_left"),
        payload.alias("_payload"),
    )
    # 3. one window per key; right rows order before ts-equal left
    # rows so the >= convention holds
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lpart.unionByName(rpart)
        .withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
        .where(F.col("_is_right") == 0)
    )
    # 4. expand
    out_cols: list[Column] = [F.col(f"_left.{c}").alias(c) for c in lcols]
    out_cols.append(F.col("_m.ts").alias(f"{prefix}{ts_col}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols)
    return matched.select(*out_cols)


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("event_id", "value"),
    step_us: int = 21_600_000_000,
) -> DataFrame:
    """Resample an irregular event stream onto a fixed ``step_us``
    grid with forward fill: per key, grid points run from the first
    event's step-floor to the last event's step-floor, and each point
    carries the latest event at-or-before it (asof_join semantics —
    NULLs when the first grid point precedes the first event).

    Grid timestamps are epoch-microsecond bigints (floor = us - us %
    step, identical arithmetic in the DuckDB twin's generate_series).
    The grid explode is a cheap 3-op sequence() per key — never an
    expensive computed array, so the InferFiltersFromGenerate trap
    does not apply. The fill itself reuses asof_join's union-window
    form: ONE shuffle on the key, no join node.

    Scale: grid size = keys x (span/step) — choose the step so the
    grid stays proportional to the event count; the per-key window
    inside asof_join is the same skew surface as sessionize (bounded
    by the busiest key, documented there)."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col), us.alias("us"), *[F.col(c) for c in value_cols]
    )
    step = int(step_us)
    bounds = ev.groupBy(key_col).agg(
        F.min("us").alias("mn"), F.max("us").alias("mx")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("mn") - F.col("mn") % step,
                F.col("mx") - F.col("mx") % step,
                F.lit(step),
            )
        ).alias("us"),
    )
    return asof_join(
        grid,
        ev,
        key_col=key_col,
        ts_col="us",
        right_cols=value_cols,
        right_id_col=value_cols[0],
    )
