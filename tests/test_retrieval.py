"""Hybrid retrieval / RRF fusion (operators/retrieval.py)."""

from medical_and_charity_document_extraction_system_spark.operators.retrieval import (
    hybrid_retrieval,
    rrf_fuse,
)


def _runs(spark, a, b):
    ra = spark.createDataFrame(a, "id long, r long")
    rb = spark.createDataFrame(b, "id long, r long")
    return ra, rb


def test_rrf_arithmetic(spark):
    # doc 1: rank 1 in both; doc 2: rank 2 lex only; doc 3: rank 2 vec only
    ra, rb = _runs(spark, [(1, 1), (2, 2)], [(1, 1), (3, 2)])
    out = {r.doc_id: r for r in rrf_fuse(ra, rb, k=60).collect()}
    assert out[1].rrf == 1.0 / 61 + 1.0 / 61
    assert out[2].rrf == 1.0 / 62 and out[2].r_b is None
    assert out[3].rrf == 1.0 / 62 and out[3].r_a is None


def test_rrf_tie_broken_by_doc_id(spark):
    ra, rb = _runs(spark, [(5, 1), (4, 2)], [(4, 1), (5, 2)])
    rows = rrf_fuse(ra, rb, k=60, top_k=2).collect()
    # both docs score 1/61 + 1/62; order must be doc_id ASC
    assert [r.doc_id for r in rows] == [4, 5]


def test_rrf_top_k_limits(spark):
    ra, rb = _runs(spark, [(i, i) for i in range(1, 9)], [])
    rb = rb if rb.count() else spark.createDataFrame([], "id long, r long")
    assert rrf_fuse(ra, rb, top_k=3).count() == 3


def test_hybrid_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            (0, "table scan index table"),   # strong lexical match
            (1, "table scan"),
            (2, "nothing relevant here"),
            (3, "index"),
        ],
        "doc_id long, text string",
    )
    # embeddings: vec 0 is the query; vec 1 nearly parallel, vec 3
    # orthogonal, vec 2 anti-parallel
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [-1.0, 0.0]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_retrieval(
        docs, emb, ["table", "scan", "index"], query_vec_id=0, top_k=4
    )
    rows = out.collect()
    ids = [r.doc_id for r in rows]
    # doc 1 appears high in BOTH runs; doc 2 is last in both
    assert ids[0] == 1 or rows[0].rrf >= rows[-1].rrf
    assert {r.doc_id for r in rows} <= {0, 1, 2, 3}
    d1 = next(r for r in rows if r.doc_id == 1)
    assert d1.r_a is not None and d1.r_b is not None
