"""Corpus health report — the per-source ops summary a 100 TB
pipeline publishes after every build (docs, tokens, bytes, language
spread, exact-duplicate rate, mean length).

The reference system reports per-request metrics only
(reference backend/app/api/routes/ocr_routes.py handles one document
per call); a corpus-scale engine needs the table-level rollup.

Float discipline: there are NO floats. Every rate is an exact
integer — duplicate rate in basis points and mean tokens x100 are
single integer divisions ((a * 10000) DIV b), reproducible in any
engine, the temperature_mix/hist_quantiles rule.

Scale shape: ONE map-side-combinable aggregation keyed by source
(count / sum / count-distinct over md5 and lang). The two
count-distincts expand to Spark's standard two-phase partial
aggregate (Expand + partial agg before the shuffle), so no key ever
concentrates more than its source's row share; there is no window,
no join, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """Per-source corpus summary: doc/token/char totals, distinct
    languages, exact-duplicate count (by text md5) and its
    basis-point rate, and mean tokens x100 — all exact integers."""
    base = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("_lang"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_ntok"),
        F.length(F.col(text_col)).cast("long").alias("_nchr"),
        F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_fp"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_ntok").cast("long").alias("n_tokens"),
        F.sum("_nchr").cast("long").alias("n_chars"),
        F.countDistinct("_lang").cast("long").alias("n_langs"),
        F.countDistinct("_fp").cast("long").alias("n_unique_texts"),
    )
    dup = F.col("n_docs") - F.col("n_unique_texts")
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "n_unique_texts",
        dup.alias("dup_docs"),
        F.expr("(n_docs - n_unique_texts) * 10000 DIV n_docs").alias("dup_bp"),
        F.expr("n_tokens * 100 DIV n_docs").alias("mean_tokens_x100"),
    )
