"""Table maintenance operators.

- ``merge_sources`` — the reference's ``merge_pdfs``
  (/root/reference/backend/app/services/pdf_service.py:23-85) is its
  one union-like operator: concatenate N documents, skipping
  encrypted/broken inputs (:44-49), counting total pages (:34-66,
  SURVEY.md A4). The table analog is ``unionByName`` over N inputs,
  skipping inputs whose schema doesn't match (the "encrypted" degrade
  path), with the page count recovered by a trivial agg downstream.

- ``retention_filter`` — the reference's ``cleanup_files`` deletes
  files older than N days (file_utils.py:75-126, SURVEY.md S7). On a
  table this is ``DELETE FROM t WHERE ts < cutoff`` (Iceberg) /
  an age predicate on rewrite; expressed here as the complementary
  keep-filter so it composes with any sink. Pure Catalyst predicate —
  at scale it partition-prunes when the table is partitioned by day.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_sources(*dfs: DataFrame) -> DataFrame:
    """unionByName over compatible inputs; incompatible ones are
    skipped (degrade-don't-fail, pdf_service.py:44-49). Raises only if
    no input is usable (:51-53 parity — empty merge is an error)."""
    usable: list[DataFrame] = []
    base_cols: set[str] | None = None
    for df in dfs:
        cols = set(df.columns)
        if base_cols is None:
            base_cols = cols
            usable.append(df)
        elif cols == base_cols:
            usable.append(df)
        # else: skip, like an encrypted pdf in the reference merge
    if not usable:
        raise ValueError("no valid inputs to merge")
    out = usable[0]
    for df in usable[1:]:
        out = out.unionByName(df)
    return out


def merge_pdfs_by_key(
    df: DataFrame,
    key_col: str = "source",
    payload_col: str = "pdf",
    order_col: str = "doc_id",
) -> DataFrame:
    """The reference's merge_pdfs *output document*
    (pdf_service.py:23-85) as a distributed operator: per key, merge
    the group's PDF binaries (ordered by ``order_col``) into ONE
    merged ``%PDF`` artifact, skipping unparseable members
    (pdf_service.py:44-49 degrade path). Grouped applyInPandas — each
    key's merge runs where its group lands after the hash shuffle; at
    scale keys are independent and the merge is embarrassingly
    parallel across groups. Returns (key, merged_pdf, page_count,
    n_inputs, n_skipped)."""
    import pandas as pd

    from ..functions.minipdf import build_pdf, merge_pages

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        pages, skipped = merge_pages(list(pdf[payload_col]), skip_errors=True)
        if not pages:  # pdf_service.py:51-53 — empty merge is an error
            merged = None
        else:
            merged = build_pdf(pages)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "merged_pdf": [merged],
                "page_count": [len(pages)],
                "n_inputs": [len(pdf)],
                "n_skipped": [skipped],
            }
        )

    return df.select(key_col, order_col, payload_col).groupBy(key_col).applyInPandas(
        merge,
        schema=(
            f"{key_col} string, merged_pdf binary, page_count int, "
            "n_inputs int, n_skipped int"
        ),
    )


def retention_filter(
    df: DataFrame, ts_col: str, cutoff: datetime.datetime
) -> DataFrame:
    """Rows that SURVIVE retention (ts >= cutoff). The delete set is
    the complement; at scale this is the predicate handed to
    ``DELETE FROM`` / `expire_snapshots` (SURVEY.md S7)."""
    return df.where(F.col(ts_col) >= F.lit(cutoff))
