"""KWIC concordance + mirrored-content report
(operators/concordance.py)."""

from medical_and_charity_document_extraction_system_spark.operators.concordance import (
    concordance,
    mirror_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_concordance_positions_and_window_clamping(spark):
    df = _docs(
        spark,
        [
            (0, "hit a b c d"),            # term at position 0: left-clamped
            (1, "a b c hit d e f g"),       # full window both sides
            (2, "a b hit c hit"),           # two occurrences, right-clamped
            (3, "no match here"),
            (4, None),                      # null text contributes nothing
        ],
    )
    out = {
        (r.doc_id, r.pos): r.snippet
        for r in concordance(df, term="hit", window=2).collect()
    }
    assert out == {
        (0, 0): "hit a b",
        (1, 3): "b c hit d e",
        (2, 2): "a b hit c hit",
        (2, 4): "hit c hit",
    }


def test_concordance_filters_stay_hof_free(spark):
    # the winnow lesson: plain explode would let
    # InferFiltersFromGenerate clone the tokenizer into a Filter
    df = _docs(spark, [(0, "a hit b")])
    plan = (
        concordance(df, term="hit")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in plan.split("\n+-"):
        if node.strip().startswith(("Filter", "* Filter")):
            assert "filter(" not in node and "split(" not in node


def test_mirror_report_counts_hosts_and_examples(spark):
    rows = [
        (1, "same text", "a.com"),
        (2, "same text", "b.com"),
        (3, "same text", "a.com"),   # third copy, old host
        (4, "unique", "a.com"),
        (5, "solo dup", "c.com"),
        (6, "solo dup", "c.com"),    # duplicated but single-host: excluded
    ]
    df = spark.createDataFrame(rows, "id long, text string, host string")
    out = mirror_report(df, id_col="id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_copies, r.n_hosts, r.first_host, r.first_id) == (
        3,
        2,
        "a.com",
        1,
    )
