"""Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) run
and a vector (cosine) run.

The serving-side composite every modern retrieval stack runs
(Cormack, Clarke & Buettcher, SIGIR 2009 — RRF; the default fusion in
Elasticsearch/OpenSearch hybrid search): each ranker contributes
``1 / (k + rank)`` for the documents it retrieved, and documents are
re-ranked by the sum. RRF needs only RANKS, which makes it the
float-discipline sweet spot: every contribution is ONE correctly-
rounded division of exact integers, a document appears in at most two
runs so the fused score is ONE addition — nothing folds, both engines
land on bit-identical doubles.

Plan shape: each run is already a bounded top-N table (TakeOrdered,
never a global sort), so the rank windows run over <= N rows — the
hist_quantiles shape, not a raw-row window. The fusion itself is one
full-outer join of two N-row tables. At serving scale with Q queries,
everything gains a query-id key and the windows partition by it;
per-query row counts stay N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.operators.sessions import (
    bm25_scores,
)
from medical_and_charity_document_extraction_system_spark.operators.similarity import (
    cosine,
)


def _ranked(run: DataFrame, id_col: str, score_col: str, n: int) -> DataFrame:
    """Top-n of a (id, score) run with 1-based rank by (score DESC,
    id ASC). The limit makes the subsequent single-partition window
    bounded by n, not the corpus."""
    top = run.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.select(
        F.col(id_col).alias("id"),
        F.row_number().over(w).cast("long").alias("r"),
    )


def rrf_fuse(
    run_a: DataFrame,
    run_b: DataFrame,
    id_col: str = "id",
    rank_col: str = "r",
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Fuse two (id, rank) runs: rrf = sum over runs of 1/(k + r),
    absent runs contribute exactly 0.0. Returns
    (doc_id, r_a, r_b, rrf) — the top_k by (rrf DESC, doc_id)."""
    a = run_a.select(F.col(id_col).alias("id_a"), F.col(rank_col).alias("r_a"))
    b = run_b.select(F.col(id_col).alias("id_b"), F.col(rank_col).alias("r_b"))
    j = a.join(b, a["id_a"] == b["id_b"], "full")

    def contrib(r):
        return F.when(
            r.isNotNull(),
            F.lit(1.0) / (F.lit(k) + r).cast("double"),
        ).otherwise(F.lit(0.0))

    return (
        j.select(
            F.coalesce("id_a", "id_b").alias("doc_id"),
            F.col("r_a").cast("long").alias("r_a"),
            F.col("r_b").cast("long").alias("r_b"),
            (contrib(F.col("r_a")) + contrib(F.col("r_b"))).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(top_k)
    )


def hybrid_retrieval(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    n_per_run: int = 20,
    k: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """BM25(query_terms) top-N + cosine(query_vec) top-N, RRF-fused.
    Requires doc_id and vec_id to share the id space (this repo's
    embeddings are per-document). The query vector's own row is
    excluded from the vector run (self-match)."""
    lex = _ranked(bm25_scores(docs, query_terms), "doc_id", "bm25", n_per_run)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = F.broadcast(
        e.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    )
    vec_run = (
        e.where(F.col("vec_id") != query_vec_id)
        .crossJoin(q)
        .select("vec_id", cosine(F.col("v"), F.col("qv")).alias("cos_sim"))
    )
    vec = _ranked(vec_run, "vec_id", "cos_sim", n_per_run)
    return rrf_fuse(lex, vec, k=k, top_k=top_k)
