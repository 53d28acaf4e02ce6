"""Deterministic sampling & split assignment.

Training-data pipelines need *reproducible* subsets: the same row
lands in the same sample/split on every run, on every cluster, with
no RNG state. Both operators key on a stable hash of an id column —
``md5`` (not ``xxhash64``) so the DuckDB oracle computes the identical
assignment, and any other engine (Trino, DuckDB, pandas) can
re-derive membership.

At 10^12 rows these are pure narrow filters: the hash is computed in
whole-stage codegen, the predicate pushes into the scan's row-group
filtering when the table is bucketed by the same hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_mod(col: Column, buckets: int = 10000) -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5 as an
    integer, mod buckets. conv() returns string -> cast."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % buckets


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, buckets: int = 10000
) -> DataFrame:
    """Keep ~fraction of rows, membership a pure function of the key
    (same rows on every run/engine — unlike ``df.sample`` whose output
    depends on partitioning)."""
    cutoff = int(fraction * buckets)
    return df.where(_hash_mod(F.col(key_col), buckets) < cutoff)


def assign_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    buckets: int = 10000,
    out_col: str = "split",
) -> DataFrame:
    """Adds a train/val/test (or arbitrary) split label, deterministic
    per key. Fractions must sum to <= 1; remainder rows get the last
    label."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = _hash_mod(F.col(key_col), buckets)
    expr = None
    lo = 0
    labels = list(fractions.items())
    for name, frac in labels[:-1]:
        hi = lo + int(frac * buckets)
        cond = (b >= lo) & (b < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
) -> DataFrame:
    """EXACTLY k rows per group (fewer if the group is smaller),
    chosen by md5-hash rank of the key — a deterministic quota sample:
    the same rows on every run, every engine, every partitioning
    (unlike df.sampleBy, whose strata are approximate AND
    partitioning-dependent). The per-group selection reuses
    operators/topk.grouped_topk's class-count threshold plan, so no
    per-group window ever runs over raw rows; the hash makes score
    collisions (the boundary-ties path) vanishingly rare.

    The "pick the k lowest-hash keys per group" rule is also
    incrementally stable: adding new rows can only displace current
    members, never reshuffle survivors (bottom-k sketches merge)."""
    from .topk import grouped_topk

    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    tagged = df.withColumn("_rank", -h)  # top-k of -hash == bottom-k of hash
    return grouped_topk(tagged, group_col, "_rank", key_col, k).drop("_rank")


def weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    k: int = 50,
    id_col: str = "doc_id",
    max_weight: int = 16,
) -> DataFrame:
    """Deterministic PPSWOR (probability proportional to size,
    without replacement) bottom-k sample over INTEGER weights, by
    replica-min hashing (Cohen's bottom-k sketches): each row spawns
    ``weight`` exchangeable md5 keys — md5(id || ':' || i) — and the
    k rows holding the k smallest per-row min-keys are the sample.
    Every replica is equally likely to be the global minimum, so row
    selection probability is exactly weight/total for the first draw
    and PPSWOR for the rest. No RNG, no floats: rerun-identical, and
    the DuckDB twin recomputes the same keys from scratch.

    Weights clamp to [1, max_weight] so the replica explode is
    bounded (explode cost = sum of weights, never corpus-quadratic).
    The final top-k is orderBy(key).limit(k) — TakeOrdered heaps,
    never a global sort."""
    w = F.least(
        F.greatest(
            (weight_col if not isinstance(weight_col, str) else F.col(weight_col))
            .cast("long"),
            F.lit(1),
        ),
        F.lit(int(max_weight)),
    )
    base = df.select(F.col(id_col), w.alias("weight"))
    keyed = base.select(
        id_col,
        "weight",
        F.explode(F.sequence(F.lit(1), F.col("weight"))).alias("i"),
    ).select(
        id_col,
        "weight",
        F.md5(
            F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("i").cast("string"))
        ).alias("rk"),
    )
    mins = keyed.groupBy(id_col, "weight").agg(F.min("rk").alias("sample_key"))
    return mins.orderBy("sample_key", id_col).limit(int(k))
