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


def frequent_lines(
    df: DataFrame,
    text_col: str = "text",
    min_docs: int = 10,
) -> DataFrame:
    """Corpus-wide boilerplate detection (the C4/RefinedWeb cleanup):
    a LINE is boilerplate when it appears in >= ``min_docs`` distinct
    documents. One explode + one hash-agg; returns (line, n_docs).
    At 10^12 docs the agg runs on line-hash keys with map-side
    combine — the shuffle carries one row per distinct line, not per
    occurrence."""
    # array_distinct per document first, so a line repeated inside ONE
    # doc counts that doc once
    per_doc = df.select(
        F.explode(F.array_distinct(F.split(F.col(text_col), "\n"))).alias("line")
    )
    return (
        per_doc.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where((F.col("n_docs") >= min_docs) & (F.trim("line") != ""))
    )


def remove_frequent_lines(
    df: DataFrame,
    boilerplate: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_broadcast_rows: int = 1_000_000,
) -> DataFrame:
    """Strip corpus-boilerplate lines from every document: lines
    exploded WITH their position, anti-joined against the boilerplate
    set, and reassembled in order. Returns (id, clean_text, n_removed).

    The broadcast is GUARDED (the ``max_broadcast_rows`` pattern from
    operators/similarity.embedding_near_dup_exact): at C4 scale the
    "lines in >= min_docs distinct docs" set runs to millions of rows,
    and a forced ``F.broadcast`` would OOM — so the set is counted
    first (one cached agg, reused by both joins) and above the bound
    the hint is dropped, leaving a shuffle hash join on the line key
    (which AQE may still downgrade if runtime stats allow). The count
    itself is bounded: it reduces the already-aggregated distinct-line
    set, not the corpus."""
    pos = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("ln", "line"),
    )
    # materialize once (the count guard + both joins reuse it) via an
    # eager localCheckpoint, NOT persist(): a cache entry would pin
    # CacheManager storage for the session lifetime with no unpersist
    # point (the returned plan is lazy), while checkpoint blocks free
    # with the RDD (review finding r4)
    lines = boilerplate.select("line").localCheckpoint(eager=True)
    small = lines.count() <= max_broadcast_rows
    side = F.broadcast(lines) if small else lines
    kept = pos.join(side, "line", "left_anti")
    removed = pos.join(side, "line", "left_semi")
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("ln"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    n_rm = removed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_removed"))
    # anchor on the INPUT's ids: a document whose every line was
    # boilerplate must surface as ('', n_removed), not vanish
    return (
        df.select(id_col)
        .join(clean, id_col, "left")
        .join(n_rm, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


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
