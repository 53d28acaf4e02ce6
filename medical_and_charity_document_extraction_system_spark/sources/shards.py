"""Training-shard sink: deterministic sharded jsonl.gz export.

The file layout trainers actually consume: ``shard-00000.jsonl.gz``
.. ``shard-{n-1}``, one JSON object per line, members ordered by
their md5 rank. Everything is a pure function of the data
(operators/mixing.shard_assignments), so re-running the export over
the same corpus produces byte-identical files — the property that
makes shard-level caching and resume safe.

Write path follows the executor-side WARC writer contract
(sources/warc.py): each partition writes its own file(s) from the
executor — temp file + ``os.replace`` for atomicity, gzip
``mtime=0`` for byte stability — and yields only (shard, path,
n_docs) to the driver. The collect is bounded by SHARD count, never
corpus size. ``repartition(n_shards, "shard")`` hashes the shard id
to a partition, so one partition may carry several shards (and some
none); the writer groups by shard id inside the partition and emits
one file per shard present.
"""

from __future__ import annotations

import gzip
import json
import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mixing import shard_assignments

_SCHEMA = "shard long, path string, n_docs long"


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[tuple[int, str, int]]:
    """Export (id, text) rows as deterministic jsonl.gz shards.
    Returns [(shard, path, n_docs)] sorted by shard."""
    os.makedirs(out_dir, exist_ok=True)
    assigned = shard_assignments(
        df.select(F.col(id_col), F.col(text_col)), id_col, n_shards
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        out = []
        for sid, grp in pdf.groupby("shard", sort=True):
            grp = grp.sort_values("position", kind="mergesort")
            path = os.path.join(out_dir, f"shard-{int(sid):05d}.jsonl.gz")
            tmp = f"{path}.inprogress-{os.getpid()}"
            buf = b"".join(
                json.dumps(
                    {id_col: int(r[0]), text_col: r[1]},
                    sort_keys=True,
                    ensure_ascii=True,
                ).encode("ascii")
                + b"\n"
                for r in zip(grp[id_col], grp[text_col])
            )
            with open(tmp, "wb") as f:
                f.write(gzip.compress(buf, 6, mtime=0))
            os.replace(tmp, path)
            out.append((int(sid), path, len(grp)))
        yield pd.DataFrame(out, columns=["shard", "path", "n_docs"])

    rows = (
        assigned.repartition(n_shards, "shard")
        .mapInPandas(run, _SCHEMA)
        .collect()
    )
    return sorted((r.shard, r.path, r.n_docs) for r in rows)


def read_training_shards(
    spark: SparkSession,
    shard_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Round-trip read: shard files back to (id, text, shard) rows,
    the shard id parsed from the file name. Spark's text source
    decompresses .gz transparently; one gzip file = one task (same
    one-archive-per-task granularity as the WARC reader)."""
    raw = spark.read.text(os.path.join(shard_dir, "*.jsonl.gz")).withColumn(
        "_f", F.input_file_name()
    )
    j = F.from_json(F.col("value"), f"{id_col} long, {text_col} string")
    return raw.select(
        j[id_col].alias(id_col),
        j[text_col].alias(text_col),
        F.regexp_extract("_f", r"shard-(\d+)\.jsonl\.gz", 1)
        .cast("long")
        .alias("shard"),
    )
