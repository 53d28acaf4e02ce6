"""Keyword-taxonomy topic tagging (operators/tagging.py)."""

from medical_and_charity_document_extraction_system_spark.operators.tagging import (
    TAXONOMY,
    topic_tags,
)

TAX = (
    ("alpha", ("a", "b")),
    ("beta", ("c", "d")),
    ("gamma", ("e",)),
)


def _run(spark, rows, tax=TAX):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in topic_tags(df, tax).collect()}


def test_counts_and_argmax(spark):
    out = _run(spark, [(1, "a a b c e"), (2, "c d d"), (3, "e e e a")])
    assert (out[1]["n_alpha"], out[1]["n_beta"], out[1]["n_gamma"]) == (3, 1, 1)
    assert out[1]["n_tagged"] == 5 and out[1]["top_topic"] == "alpha"
    assert out[2]["top_topic"] == "beta" and out[2]["n_tagged"] == 3
    assert out[3]["top_topic"] == "gamma" and out[3]["n_gamma"] == 3


def test_tie_resolves_to_earliest_category(spark):
    # alpha == beta == 2 -> alpha (declaration order); beta == gamma -> beta
    out = _run(spark, [(1, "a b c d"), (2, "c e")])
    assert out[1]["top_topic"] == "alpha"
    assert out[2]["top_topic"] == "beta"


def test_zero_hits_is_none_and_empty_doc(spark):
    out = _run(spark, [(1, "x y z"), (2, "")])
    assert out[1]["top_topic"] == "none" and out[1]["n_tagged"] == 0
    assert out[2]["top_topic"] == "none" and out[2]["n_tagged"] == 0


def test_untagged_tokens_do_not_count(spark):
    out = _run(spark, [(1, "a xx a yy zz")])
    assert out[1]["n_alpha"] == 2 and out[1]["n_tagged"] == 2


def test_default_taxonomy_keywords_disjoint():
    seen = set()
    for _, ks in TAXONOMY:
        for k in ks:
            assert k not in seen
            seen.add(k)
    # categories are declared in alphabetical order (the documented
    # tie-break order)
    names = [c for c, _ in TAXONOMY]
    assert names == sorted(names)


def test_plan_is_jvm_side_and_staged(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    qe = topic_tags(df, TAX)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # zero-shuffle projection
    # staged projections: each keyword's interpreted HOF once + tokenizer
    n_filters = qe.optimizedPlan().toString().count("filter(")
    assert n_filters <= 5 + 1
