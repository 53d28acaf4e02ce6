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
