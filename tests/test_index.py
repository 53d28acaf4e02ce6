"""Inverted-index semantics (operators/index.py)."""

from medical_and_charity_document_extraction_system_spark.operators.index import (
    inverted_index,
)


def _idx(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r["term"], r["doc_id"]): (r["df"], r["tf"], r["positions"])
        for r in inverted_index(df, **kw).collect()
    }


def test_postings_tf_df_positions(spark):
    out = _idx(
        spark,
        [(1, "a b a c"), (2, "b b d")],
    )
    assert out[("a", 1)] == (1, 2, "0,2")
    assert out[("b", 1)] == (2, 1, "1")
    assert out[("b", 2)] == (2, 2, "0,1")
    assert out[("c", 1)] == (1, 1, "3")
    assert out[("d", 2)] == (1, 1, "2")


def test_min_df_prunes_rare_terms(spark):
    out = _idx(spark, [(1, "a b"), (2, "b c")], min_df=2)
    assert set(t for t, _ in out) == {"b"}


def test_whitespace_runs_and_empties(spark):
    out = _idx(spark, [(1, "  x   y  ")])
    assert out[("x", 1)] == (1, 1, "0")
    assert out[("y", 1)] == (1, 1, "1")


def test_index_plan_is_jvm_side(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = inverted_index(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_index_df_has_no_window_node(spark):
    # df must come from an agg+join, never Window.partitionBy("term"):
    # a stopword term's postings would all land in ONE window partition
    # at corpus scale — a single-task hotspot AQE cannot split.
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    qe = inverted_index(df)._jdf.queryExecution()
    assert "Window" not in qe.optimizedPlan().toString()
    plan = qe.executedPlan().toString()
    assert "Join" in plan
    # Catalyst prunes the df side to a plain distinct+count: the
    # expensive collect_list agg appears on the postings branch only
    # (one final + one partial), never on the df branch. The second
    # tokenize pass is linear and parallel, unlike the window hotspot
    # it replaces.
    assert plan.count("collect_list") == 2
