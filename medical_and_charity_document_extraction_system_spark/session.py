"""SparkSession builder with the engine's standard physical knobs."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_CONFIG, ExtractionConfig, spark_conf_overrides


def get_spark(
    app_name: str = "extraction-engine",
    master: str | None = None,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # local mode: the driver IS the executor — size the heap for the
    # task width, not for a thin coordinator. 8g with 32 task threads
    # left every post-warmup query GC-bound (measured 3-5x slowdowns
    # on the bench catalog; 57s -> 22s total at 32g+). ~1g per task
    # thread, floor 8g, so smaller hosts don't over-commit.
    try:
        default_mem = f"{max(8, int(cpus))}g"
    except ValueError:  # local[*] etc.
        default_mem = "8g"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", default_mem))
        .config("spark.ui.enabled", "false")
    )
    for k, v in spark_conf_overrides(cfg).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
