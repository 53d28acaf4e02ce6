"""Training-data chunking: documents -> fixed-size token windows.

The standard pre-tokenization step of an LLM data pipeline: each
document's token stream is cut into ``chunk_size``-token windows that
overlap by ``overlap`` tokens (so no training sample loses context at
a cut). Pure JVM expressions — sequence/transform/slice/array_join
over the shared parity tokenizer (functions/textstats.tokens) — so the
whole flatMap is codegen-planned, shuffles nothing, and has an exact
SQL twin (oracles.chunk_documents_sql).

Window arithmetic (integer-only, oracle-identical): with
``step = chunk_size - overlap`` and n tokens,
``k = 1`` chunk when ``n <= chunk_size`` else
``k = (n - chunk_size + step - 1) // step + 1``; chunk i covers
tokens [i*step, i*step + chunk_size). The final chunk may be shorter
but always contains at least one token past the previous chunk's end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """(doc) -> one row per chunk: (id, chunk_id, n_chunk_tokens,
    chunk_text). Empty/whitespace-only documents produce no rows."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    k = F.when(n <= chunk_size, F.lit(1)).otherwise(
        F.floor((n - chunk_size + (step - 1)) / step).cast("int") + 1
    )
    tagged = df.select(F.col(id_col), toks.alias("_toks"), k.alias("_k")).where(
        F.size("_toks") > 0
    )
    chunks = tagged.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("_k") - 1),
                lambda i: F.slice(F.col("_toks"), i * step + 1, chunk_size),
            )
        ).alias("chunk_id", "_chunk"),
    )
    return chunks.select(
        id_col,
        "chunk_id",
        F.size("_chunk").alias("n_chunk_tokens"),
        F.array_join("_chunk", " ").alias("chunk_text"),
    )
