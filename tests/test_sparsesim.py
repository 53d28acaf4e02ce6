"""Exact sparse (shingle-posting) similarity join."""

from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.operators.sparsesim import (
    shingle_jaccard_pairs,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_known_pairs_exact_jaccard(spark):
    # a/b share 2 of their shingles; c is disjoint; d is an exact dup of a
    rows = [
        (1, "w1 w2 w3 w4 w5"),          # shingles: 123 234 345 (sz 3)
        (2, "w1 w2 w3 w4 zz"),          # shingles: 123 234 34z (sz 3)
        (3, "a1 a2 a3 a4"),             # disjoint
        (4, "w1 w2 w3 w4 w5"),          # dup of 1
    ]
    out = shingle_jaccard_pairs(_df(spark, rows), t_num=1, t_den=3)
    got = {(r.id_a, r.id_b): (r.overlap, r.jaccard) for r in out.collect()}
    # 1-2: overlap 2, union 4 -> 0.5 ; 1-4 and 2-4 analogous; 3 pairs total
    assert got[(1, 2)] == (2, 0.5)
    assert got[(1, 4)] == (3, 1.0)
    assert got[(2, 4)] == (2, 0.5)
    assert set(got) == {(1, 2), (1, 4), (2, 4)}


def test_threshold_is_integer_gated(spark):
    rows = [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 zz")]
    # jaccard is exactly 0.5: >= 1/2 keeps, >= 2/3 drops — no float fuzz
    assert shingle_jaccard_pairs(_df(spark, rows), t_num=1, t_den=2).count() == 1
    assert shingle_jaccard_pairs(_df(spark, rows), t_num=2, t_den=3).count() == 0


def test_short_docs_emit_no_pairs(spark):
    rows = [(1, "w1 w2"), (2, "w1 w2"), (3, "")]  # < k tokens: empty sets
    assert shingle_jaccard_pairs(_df(spark, rows), t_num=0, t_den=1).count() == 0


def test_max_df_cap_is_lower_bound_and_renames(spark):
    # one boilerplate shingle shared by all four docs; pairwise extras
    rows = [
        (1, "b1 b2 b3 x1 x2 x3"),
        (2, "b1 b2 b3 x1 x2 x3"),
        (3, "b1 b2 b3 y1 y2 y3"),
        (4, "b1 b2 b3 z1 z2 z3"),
    ]
    exact = shingle_jaccard_pairs(_df(spark, rows), t_num=0, t_den=1)
    capped = shingle_jaccard_pairs(_df(spark, rows), t_num=0, t_den=1, max_df=3)
    assert {"overlap_lb", "jaccard_lb"} <= set(capped.columns)
    ex = {(r.id_a, r.id_b): r.overlap for r in exact.collect()}
    lb = {(r.id_a, r.id_b): r.overlap_lb for r in capped.collect()}
    # the df=4 boilerplate gram is excluded from the capped join:
    # every surviving pair undercounts by exactly that gram
    for pair, ov in lb.items():
        assert ov <= ex[pair]
    # pairs linked ONLY by over-cap grams vanish from the capped join
    assert set(lb) < set(ex)


def test_plan_has_no_cartesian_and_rerun_identical(spark):
    rows = [(i, f"w{i % 3} common tail w{i % 3} common tail x{i}") for i in range(20)]
    out = shingle_jaccard_pairs(_df(spark, rows), t_num=1, t_den=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b and len(a) > 0


def test_matches_bruteforce_on_corpus_sample(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in shingle_jaccard_pairs(docs, t_num=3, t_den=10).collect()
    }
    # brute force over the same shingle sets
    from medical_and_charity_document_extraction_system_spark.functions.textstats import (
        word_shingles_fast,
    )

    sets = {
        r.doc_id: frozenset(r.sh)
        for r in docs.select("doc_id", word_shingles_fast(3)(F.col("text")).alias("sh"))
        .collect()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            ov = len(sa & sb)
            un = len(sa | sb)
            if ov * 10 >= 3 * un:
                want[(a, b)] = ov / un
    assert out == want and len(want) > 0
