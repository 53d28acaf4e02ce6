"""Privacy audits over document corpora.

Training-data releases carry re-identification risk when a
quasi-identifier combination is rare: a (language, source,
length-bucket) cell holding fewer than k rows singles those documents
out. ``k_anonymity_report`` measures that exposure per language —
the k-anonymity audit of Sweeney 2002 expressed as two hash
aggregations.

Reference parity: the reference redacts PII per document
(mirrored by functions/redact.py) but has no corpus-level exposure
measure; this adds the aggregate audit a release pipeline runs after
redaction.

Scale shape: groupBy over the quasi-identifier tuple (map-side
combinable — the cell count is bounded by the QI domain, not the
corpus), then a per-language rollup over the cell table. No windows,
no joins, no floats: the risk rate is ONE integer basis-point floor
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    docs: DataFrame, k: int = 5, len_bucket: int = 100
) -> DataFrame:
    """Per-language k-anonymity audit of the quasi-identifier tuple
    (lang, source, n_chars div ``len_bucket``): how many QI cells
    exist, how many hold fewer than ``k`` documents, how many
    documents sit in those small cells, and the at-risk rate in
    integer basis points."""
    cells = (
        docs.groupBy(
            "lang",
            "source",
            F.expr(f"n_chars div {int(len_bucket)}").alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    small = F.col("cnt") < k
    return (
        cells.groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.when(small, 1).otherwise(0)).cast("long").alias("n_small_cells"),
            F.sum(F.when(small, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_docs_at_risk"),
        )
        .select(
            "lang",
            F.lit(int(k)).cast("long").alias("k"),
            "n_docs",
            "n_cells",
            "n_small_cells",
            "n_docs_at_risk",
            F.expr("n_docs_at_risk * 10000 div greatest(n_docs, 1)")
            .cast("long")
            .alias("risk_bp"),
        )
    )
