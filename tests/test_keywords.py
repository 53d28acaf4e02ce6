"""Class-distinctive terms (operators/keywords.py)."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.keywords import (
    distinctive_terms,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_overrepresented_term_wins(spark):
    rows = [
        ("a", "zebra zebra zebra common common"),
        ("a", "zebra common common"),
        ("b", "common common common stone stone"),
        ("b", "stone common"),
    ]
    out = distinctive_terms(_df(spark, rows), top_k=1, min_count=2)
    got = {(r.source, r.term) for r in out.collect()}
    assert got == {("a", "zebra"), ("b", "stone")}


def test_lift_is_exact_cross_product_division(spark):
    rows = [("a", "x x y"), ("b", "y y y")]
    out = {
        (r.source, r.term): (r.n_tc, r.lift)
        for r in distinctive_terms(_df(spark, rows), top_k=5, min_count=1).collect()
    }
    # N=6; x: n_t=2 n_c(a)=3 -> lift = 2*6/(2*3) = 2.0
    assert out[("a", "x")] == (2, 2.0)
    # y in b: n_tc=3, n_t=4, n_c=3 -> 3*6/(4*3) = 1.5
    assert out[("b", "y")] == (3, 1.5)


def test_min_count_filters(spark):
    rows = [("a", "rare common common"), ("b", "common common")]
    out = distinctive_terms(_df(spark, rows), top_k=5, min_count=2)
    assert "rare" not in {r.term for r in out.collect()}


def test_tie_broken_by_term_asc(spark):
    # two terms with identical counts everywhere -> identical lift;
    # top_k=1 must keep the lexicographically smaller one
    rows = [("a", "beta alpha"), ("b", "other other")]
    out = distinctive_terms(_df(spark, rows), top_k=1, min_count=1)
    got = {r.source: r.term for r in out.collect()}
    assert got["a"] == "alpha"


def test_rejects_bad_params(spark):
    df = _df(spark, [("a", "x")])
    with pytest.raises(ValueError):
        distinctive_terms(df, top_k=0)
    with pytest.raises(ValueError):
        distinctive_terms(df, min_count=0)


def test_term_cooccurrence_lift(spark):
    from medical_and_charity_document_extraction_system_spark.operators.keywords import (
        term_cooccurrence,
    )

    rows = [
        (1, "a", "apple banana"),
        (2, "a", "apple banana"),
        (3, "a", "apple cherry"),
        (4, "a", "banana cherry date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        (r.x, r.y): (r.n_xy, r.lift)
        for r in term_cooccurrence(df, min_support=1, top_k=50).collect()
    }
    # N=4; apple-banana: n_xy=2, df_apple=3, df_banana=3 -> 8/9
    assert out[("apple", "banana")] == (2, 2 * 4 / (3 * 3))
    # duplicate tokens inside a doc count once (distinct terms)
    assert out[("banana", "cherry")][0] == 1


def test_term_cooccurrence_caps_fanout(spark):
    from medical_and_charity_document_extraction_system_spark.operators.keywords import (
        term_cooccurrence,
    )

    rows = [
        (1, "x", "a b c d e f"),   # 6 distinct terms > cap -> excluded
        (2, "x", "a b"),
        (3, "x", "a b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = term_cooccurrence(df, min_support=1, max_terms_per_doc=5).collect()
    # pair stats come only from docs 2,3: df_a = df_b = N = 2
    assert [(r.x, r.y, r.n_xy, r.lift) for r in out] == [("a", "b", 2, 1.0)]
