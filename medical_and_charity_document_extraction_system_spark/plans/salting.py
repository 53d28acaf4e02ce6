"""Partitioning & skew control (north_rule obligation #1).

The input is url-keyed; hosts are Zipf-skewed (a handful of hosts can
dominate — sources/pages.py plants host0 at ~40% to exercise this).
Plain DataFrame code, no custom Catalyst rules (SURVEY.md section 4):

- ``repartition_by_url``      — uniform spread by ``xxhash64(url)``;
  the right choice for the extraction map stages (no key locality
  needed, perfect balance).
- ``find_heavy_hosts``        — heavy-hitter detection on a sample
  (one small agg, collected to the driver; the list is tiny).
- ``salted_host_repartition`` — host-grouped layout where heavy hosts
  are split across ``salt_buckets`` partitions via
  ``pmod(xxhash64(url), k)``.
- ``salted_host_agg``         — the canonical skew-safe two-phase
  aggregation: partial agg by (host, salt), final agg by host. Turns
  one 40%-of-data reducer into ``salt_buckets`` parallel ones.

AQE (enabled in config.spark_conf_overrides) additionally rebalances
post-shuffle partitions at runtime; explicit salting covers the
single-hot-key case AQE cannot split for aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)


def repartition_by_url(df: DataFrame, num_partitions: int) -> DataFrame:
    return df.repartition(num_partitions, F.xxhash64("url"))


def find_heavy_hosts(
    df: DataFrame,
    heavy_fraction: float = 0.05,
    sample_fraction: float | None = None,
) -> list[str]:
    """Hosts carrying more than ``heavy_fraction`` of rows. Runs on a
    seeded sample when ``sample_fraction`` is given (at 10^12 rows you
    never count exactly)."""
    hosts = df.select(host_of(F.col("url")).alias("host"))
    if sample_fraction:
        hosts = hosts.sample(fraction=sample_fraction, seed=42)
    freq = hosts.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    total = freq.agg(F.sum("n")).first()[0] or 0
    if not total:
        return []
    rows = freq.where(F.col("n") > heavy_fraction * total).collect()
    return sorted(r.host for r in rows)


def salt_column(url: Column, heavy_hosts: list[str], salt_buckets: int) -> Column:
    """0 for normal hosts; pmod(xxhash64(url), k) for heavy ones."""
    if not heavy_hosts:
        return F.lit(0)
    return F.when(
        host_of(url).isin(heavy_hosts), F.pmod(F.xxhash64(url), F.lit(salt_buckets))
    ).otherwise(F.lit(0))


def salted_host_repartition(
    df: DataFrame,
    num_partitions: int,
    heavy_hosts: list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    salt = salt_column(F.col("url"), heavy_hosts, salt_buckets)
    return df.repartition(num_partitions, host_of(F.col("url")), salt)


def skew_safe_bucket_self_join(
    buckets: DataFrame,
    bucket_cols: list[str],
    id_col: str,
    out_a: str,
    out_b: str,
    hot_bucket_size: int = 100_000,
    salt_buckets: int = 16,
    sample_fraction: float | None = None,
    total_rows: int | None = None,
) -> DataFrame:
    """All intra-bucket id pairs (``out_a`` < ``out_b``) from an
    exploded (bucket-key..., id) table — the LSH candidate join —
    with DEGENERATE buckets split across ``salt_buckets`` reduce keys.

    The hazard (r4): a pathological corpus (mass-duplicated pages,
    near-identical embeddings) can put a large fraction of all docs
    into ONE (band, key) bucket. The plain self-join then hangs a
    single reducer with the whole bucket on both sides. The guard:

    1. bucket sizes are counted (one partial-agg shuffle on the same
       key — tiny rows); buckets above ``hot_bucket_size`` form the
       hot set, which is tiny BY CONSTRUCTION (at most
       corpus_rows / hot_bucket_size keys) and is broadcast.
    2. cold buckets take the normal equi-join.
    3. hot buckets are salted: the left side gets
       ``pmod(xxhash64(id), k)``, the right side is replicated once
       per salt value, and the join key grows by the salt — each hot
       bucket's work spreads over ``k`` reducers, each holding 1/k of
       the left rows. Every pair still appears exactly once (a pair
       joins only at the left row's own salt), so results are
       IDENTICAL to the plain join — only the shuffle shape changes
       (the same contract as salted_host_agg).

    Quadratic OUTPUT within a hot bucket is inherent to LSH candidate
    semantics and is not changed here — callers that want to drop
    degenerate buckets entirely should filter on the same size agg.

    The hot set is detected EAGERLY (one partial-agg job, optionally
    over a seeded ``sample_fraction`` — at 10^12 docs you never count
    the exploded bucket table exactly) and collected: it is bounded by
    rows/hot_bucket_size keys BY CONSTRUCTION. When it is empty — the
    overwhelmingly common case — the function returns the PLAIN
    self-join, paying zero extra joins in the pair plan (an always-on
    in-plan split measured +70% on the minhash bench; the eager probe
    measured ~+10%).
    """
    spark = buckets.sparkSession
    if total_rows is not None and total_rows <= hot_bucket_size:
        # no bucket can exceed the corpus row count: skip the probe
        # job entirely (callers pass a cheap upper bound — a parquet
        # footer count — so small/medium inputs pay NOTHING for the
        # guard)
        a, b = buckets.alias("a"), buckets.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        for c in bucket_cols:
            cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
        return a.join(b, cond).select(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
        )

    def pair_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
        a, b = left.alias("a"), right.alias("b")
        cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
        for c in keys:
            cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
        return a.join(b, cond).select(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
        )

    probe = buckets
    threshold = float(hot_bucket_size)
    if sample_fraction:
        probe = buckets.sample(fraction=sample_fraction, seed=42)
        threshold *= sample_fraction
    hot_rows = (
        probe.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > threshold)
        .select(*bucket_cols)
        .collect()
    )
    if not hot_rows:
        return pair_join(buckets, buckets, bucket_cols)
    hot_keys = spark.createDataFrame(hot_rows, probe.select(*bucket_cols).schema)
    cold = buckets.join(F.broadcast(hot_keys), bucket_cols, "left_anti")
    hot = buckets.join(F.broadcast(hot_keys), bucket_cols, "left_semi")
    cold_pairs = pair_join(cold, cold, bucket_cols)
    a_salted = hot.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets)).cast("int")
    )
    b_salted = hot.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    hot_pairs = pair_join(a_salted, b_salted, bucket_cols + ["_salt"])
    return cold_pairs.unionByName(hot_pairs)


def salted_host_agg(
    df: DataFrame,
    heavy_hosts: list[str],
    salt_buckets: int = 8,
) -> DataFrame:
    """Per-host row counts + byte totals, skew-safe: partial agg on
    (host, salt), final agg on host. Result is identical to a direct
    groupBy(host) — only the shuffle shape changes."""
    salted = df.select(
        host_of(F.col("url")).alias("host"),
        salt_column(F.col("url"), heavy_hosts, salt_buckets).alias("_salt"),
        F.length("text").alias("_chars"),
    )
    partial = salted.groupBy("host", "_salt").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_chars").alias("chars")
    )
    return partial.groupBy("host").agg(
        F.sum("n").alias("n_docs"), F.sum("chars").alias("total_chars")
    )
