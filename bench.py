"""Headline benchmark. Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

Env:
    SPARK_GRAFT_SF_DIR  input scale dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    local[] width (default 32)
    BENCH_REPEAT        corpus amplification for the extraction query
                        (default 40 -> 200k pages at sf0.1)
    BENCH_CORPUS_DIR    where the amplified pages parquet lives
                        (default /tmp/bench_pages_<sf>_<repeat>; reused
                        across runs so local[8] vs local[32] time the
                        same bytes)

The headline metric is end-to-end extraction documents/sec
(BASELINE.json). The pages corpus is materialized to parquet first
(untimed — it is test scaffolding, not the engine) and read back
through the normal scan path.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from medical_and_charity_document_extraction_system_spark.plans import run_extraction
from medical_and_charity_document_extraction_system_spark.session import get_spark
from medical_and_charity_document_extraction_system_spark.sources import synthesize_pages

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "40"))
SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
CORPUS = os.environ.get(
    "BENCH_CORPUS_DIR", f"/tmp/bench_pages_sf{SF}_x{REPEAT}"
)

# the non-extraction headline queries, run straight from the catalog
CATALOG_QUERIES = [
    "rollup_source",
    "token_count",
    "quality_score",
    "exact_dedup",
    "minhash_near_dup",
    "topk_cosine",
    "embedding_near_dup",
    "events_tumbling",
]


def ensure_corpus(spark) -> None:
    marker = os.path.join(CORPUS, "_SUCCESS")
    if not os.path.exists(marker):
        synthesize_pages(spark, SF_DIR, repeat=REPEAT, partitions=4 * CPUS).write.mode(
            "overwrite"
        ).parquet(CORPUS)


def main() -> None:
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=2 * CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_corpus(spark)

    # warm the JVM/Python workers (untimed)
    spark.read.parquet(CORPUS).limit(256).count()

    timings: dict[str, float] = {}

    pages = spark.read.parquet(CORPUS)
    t0 = time.time()
    n_docs = run_extraction(pages).count()
    timings["extraction_e2e"] = round(time.time() - t0, 3)
    docs_per_sec = round(n_docs / timings["extraction_e2e"], 1)

    qs = entry_mod.queries()
    for name in CATALOG_QUERIES:
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(SF),
                "docs_per_sec": docs_per_sec,
                "extraction_docs": n_docs,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
