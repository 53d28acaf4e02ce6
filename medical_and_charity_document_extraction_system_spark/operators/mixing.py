"""Data-mixing operators: temperature-weighted source sampling and
deterministic shard assignment.

The last mile of a pretraining pipeline: given a cleaned corpus,
(a) choose HOW MUCH of each source to keep — high-resource sources
downweighted, low-resource ones upweighted (the alpha = 1/2
"temperature" rule used by multilingual pretraining mixes a la
mBERT/XLM-R) — and (b) assign every surviving document a stable
shard + position so the training file layout is a pure function of
the data.

Everything is reproducible-by-construction, following the repo's
determinism rules (CLAUDE.md):

- selection keys on md5 of the id (same trick as
  operators/sampling.py) — no RNG, engine-portable;
- the only float op is sqrt, which IEEE 754 requires to be CORRECTLY
  ROUNDED (unlike ln/exp, which the BM25 oracle had to literal-
  inject) — so ``floor(sqrt(c) * scale)`` lands on the same bigint
  in Spark, DuckDB, and numpy, and everything downstream is integer
  arithmetic;
- per-source quotas use integer cross-multiplication
  ``(target * w) DIV W`` — no ratio ever materializes as a float.

Scale shape (10^12 docs): the per-source count/weight table is tiny
(thousands of rows — driver-safe by construction); the rank-within-
source window is the one real shuffle. For sources big enough that a
full sort-per-source hurts, the standard relaxation is to cut on the
hash value directly (quantile threshold) instead of row_number —
``deterministic_sample`` in operators/sampling.py is exactly that
form; this operator keeps the exact-quota form because quotas, not
rates, are what mixing recipes specify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _hash_mod


def _order_hash(col):
    """Stable per-row ordering key: full md5 hex of the id string."""
    return F.md5(col.cast("string"))


def temperature_mix(
    df: DataFrame,
    target_total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    weight_scale: int = 1000,
) -> DataFrame:
    """Select ~target_total docs with per-source quotas proportional
    to sqrt(source_count) (temperature alpha = 1/2). Returns the
    selected (id, source, rank) rows; each source contributes
    ``(target_total * floor(sqrt(c) * scale)) DIV sum_of_weights``
    docs, its lowest-md5 ones."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("c"))
    weights = counts.select(
        source_col,
        F.floor(F.sqrt(F.col("c")) * weight_scale).cast("long").alias("w"),
    )
    # sum over the (tiny) per-source table: a global window keeps the
    # whole computation one plan, no driver round-trip
    tot = weights.withColumn("tw", F.sum("w").over(Window.partitionBy()))
    quota = tot.select(
        source_col, F.expr(f"({target_total} * w) DIV tw").alias("quota")
    )
    ranked = df.select(id_col, source_col).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(source_col).orderBy(
                _order_hash(F.col(id_col)), F.col(id_col)
            )
        ),
    )
    return (
        ranked.join(quota, source_col)
        .where(F.col("rank") <= F.col("quota"))
        .select(id_col, source_col, F.col("rank").cast("long").alias("rank"))
    )


def shard_assignments(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """Adds (shard, position): shard = md5-bucket of the id mod
    n_shards; position = rank of the id's md5 within the shard. The
    training file layout this induces is a pure function of the ids —
    rebuild the corpus, get byte-identical shards."""
    out = df.withColumn("shard", _hash_mod(F.col(id_col), 10000) % n_shards)
    return out.withColumn(
        "position",
        F.row_number()
        .over(
            Window.partitionBy("shard").orderBy(
                _order_hash(F.col(id_col)), F.col(id_col)
            )
        )
        .cast("long"),
    )


def shard_manifest(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
) -> DataFrame:
    """Per-shard integrity manifest: doc count, token mass, and an
    order-independent integer checksum (sum of each member's md5
    bucket) plus the min/max member hash. Everything integer or
    string min/max — exact in any engine, any aggregation order."""
    from ..functions.textstats import token_count

    h = _order_hash(F.col(id_col))
    out = df.select(
        (_hash_mod(F.col(id_col), 10000) % n_shards).alias("shard"),
        _hash_mod(F.col(id_col), 10000).alias("bucket"),
        h.alias("oh"),
        token_count(F.col(text_col)).alias("ntok"),
    )
    return (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
            F.sum("bucket").alias("checksum"),
            F.min("oh").alias("first_hash"),
            F.max("oh").alias("last_hash"),
        )
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test assignment by identity hash —
    bucket = first 4 md5 hex digits of the id, mod 100. The property
    that matters vs a random split: a document's split NEVER changes
    as the corpus grows or repartitions (hash of the id alone), so
    eval contamination can't creep in across corpus versions.
    Pure projection — no shuffle, no state."""
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct < 100):
        raise ValueError("percentages must partition [0, 100)")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % 100
    )
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def split_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Per-split doc and token totals with the doc share in integer
    basis points (ONE exact division against the corpus total) — the
    sanity report every training run starts with. One scan, one
    3-group agg, the total joined back as a broadcast."""
    from ..functions.textstats import token_count

    assigned = assign_split(docs, id_col, train_pct, val_pct).select(
        "split", token_count(F.col(text_col)).alias("n_tok")
    )
    per = assigned.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_docs").alias("n_total"))
    return per.crossJoin(F.broadcast(total)).select(
        "split",
        "n_docs",
        "n_tokens",
        F.expr("n_docs * 10000 div n_total").cast("long").alias("share_bp"),
    )
