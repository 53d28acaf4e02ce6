"""Partition-granular checkpoint & resume (north_rule obligation #2).

The reference's vestigial TaskService (task_service.py:17-87, all
NotImplementedError) and its glob-based sequential task counter
(json_utils.py:13-32 — a global serialization bottleneck and race) are
replaced by deterministic work partitioning:

- every url maps to a stable ``part_id = pmod(xxhash64(url), n_buckets)``
- a **manifest** table records (run_id, part_id, completed_ts) per
  completed bucket
- resume = input anti-joined against the manifest on part_id — the one
  join this engine introduces (SURVEY.md section 2.8); the manifest is
  tiny (n_buckets rows) and always broadcast.

Output is written partitioned by part_id so a re-run of bucket B
replaces exactly bucket B's files (dynamic partition overwrite), making
per-bucket completion atomic-enough without Iceberg in this sandbox;
on a real cluster the same layout maps 1:1 onto Iceberg partition
commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, ExtractionConfig
from .pipeline import run_extraction


def with_part_id(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("part_id", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int"))


def read_manifest(spark: SparkSession, manifest_dir: str, run_id: str) -> DataFrame:
    try:
        m = spark.read.parquet(manifest_dir)
    except Exception:
        return spark.createDataFrame([], "run_id string, part_id int, completed_ts timestamp")
    return m.where(F.col("run_id") == run_id)


def remaining_parts(
    pages_with_part: DataFrame, manifest: DataFrame
) -> DataFrame:
    done = manifest.select("part_id").distinct()
    return pages_with_part.join(F.broadcast(done), "part_id", "left_anti")


def run_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    manifest_dir: str,
    run_id: str,
    n_buckets: int = 64,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    only_parts: list[int] | None = None,
) -> list[int]:
    """Process all not-yet-completed buckets (optionally restricted to
    ``only_parts`` — the test hook that simulates a mid-run kill).
    Returns the list of part_ids completed in this invocation."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tagged = with_part_id(pages, n_buckets)
    manifest = read_manifest(spark, manifest_dir, run_id)
    todo = remaining_parts(tagged, manifest)
    if only_parts is not None:
        todo = todo.where(F.col("part_id").isin(only_parts))

    part_ids = [r.part_id for r in todo.select("part_id").distinct().collect()]
    if not part_ids:
        return []

    out = run_extraction(todo.drop("part_id"), cfg)
    out = with_part_id(out, n_buckets)
    (
        out.write.mode("overwrite")
        .partitionBy("part_id")
        .parquet(out_dir)
    )
    rows = [(run_id, int(p)) for p in sorted(part_ids)]
    (
        spark.createDataFrame(rows, "run_id string, part_id int")
        .withColumn("completed_ts", F.current_timestamp())
        .write.mode("append")
        .parquet(manifest_dir)
    )
    return sorted(part_ids)
