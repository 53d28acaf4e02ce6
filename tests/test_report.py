"""Corpus health report (operators/report.py)."""

from medical_and_charity_document_extraction_system_spark.operators.report import (
    corpus_report,
)

SCHEMA = "doc_id long, text string, lang string, source string"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["source"]: r.asDict() for r in corpus_report(df).collect()}


def test_exact_hand_computed_report(spark):
    rows = [
        (1, "a b c", "en", "web"),
        (2, "a b c", "en", "web"),  # exact dup of 1
        (3, "d e", "de", "web"),
        (4, "x", "en", "pdf"),
    ]
    out = _run(spark, rows)
    web = out["web"]
    assert web["n_docs"] == 3 and web["n_tokens"] == 8 and web["n_chars"] == 13
    assert web["n_langs"] == 2 and web["n_unique_texts"] == 2
    assert web["dup_docs"] == 1
    # (1 * 10000) DIV 3 = 3333 (floor); (8 * 100) DIV 3 = 266
    assert web["dup_bp"] == 3333 and web["mean_tokens_x100"] == 266
    pdf = out["pdf"]
    assert pdf["n_docs"] == 1 and pdf["dup_docs"] == 0 and pdf["dup_bp"] == 0


def test_duplicates_counted_within_source_only(spark):
    rows = [(1, "same", "en", "a"), (2, "same", "en", "b")]
    out = _run(spark, rows)
    assert out["a"]["dup_docs"] == 0 and out["b"]["dup_docs"] == 0


def test_empty_text_counts_zero_tokens(spark):
    out = _run(spark, [(1, "", "en", "s"), (2, "w", "en", "s")])
    s = out["s"]
    assert s["n_tokens"] == 1 and s["n_chars"] == 1
    # empty and "w" are distinct texts
    assert s["n_unique_texts"] == 2 and s["dup_docs"] == 0


def test_plan_is_one_aggregation(spark):
    df = spark.createDataFrame([(1, "a", "en", "s")], SCHEMA)
    plan = (
        corpus_report(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "Join" not in plan


def test_partitioning_invariant(spark):
    rows = [(i, f"t {i % 3}", "en", f"s{i % 2}") for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(tuple(r) for r in corpus_report(df).collect())
    b = sorted(tuple(r) for r in corpus_report(df.repartition(7)).collect())
    assert a == b


def test_dimensional_rollup_cube_exact(spark):
    from medical_and_charity_document_extraction_system_spark.operators.report import (
        dimensional_rollup,
    )

    df = spark.createDataFrame(
        [("a", "en", 10), ("a", "fr", 20), ("b", "en", 1)],
        "source string, lang string, n_chars long",
    )
    out = {
        (r.source, r.lang, r.gid): (r.n_docs, r.sum_chars)
        for r in dimensional_rollup(
            df, ["source", "lang"], sum_col="n_chars", sum_alias="sum_chars"
        ).collect()
    }
    assert out[("a", "en", 0)] == (1, 10)
    assert out[("a", None, 1)] == (2, 30)      # lang rolled up -> bit 0
    assert out[(None, "en", 2)] == (2, 11)     # source rolled up -> bit 1
    assert out[(None, None, 3)] == (3, 31)
    assert len(out) == 3 + 2 + 2 + 1


def test_dimensional_rollup_mode_rollup_is_prefix_hierarchy(spark):
    from medical_and_charity_document_extraction_system_spark.operators.report import (
        dimensional_rollup,
    )

    df = spark.createDataFrame(
        [("a", "en", 1), ("b", "fr", 2)],
        "source string, lang string, n_chars long",
    )
    out = dimensional_rollup(df, ["source", "lang"], mode="rollup").collect()
    gids = sorted(r.gid for r in out)
    # rollup emits only (source, lang), (source), () — never (lang)
    assert gids == [0, 0, 1, 1, 3] and 2 not in gids


def test_dimensional_rollup_single_expand_plan(spark):
    from medical_and_charity_document_extraction_system_spark.operators.report import (
        dimensional_rollup,
    )

    df = spark.createDataFrame(
        [("a", "en", 1)], "source string, lang string, n_chars long"
    )
    plan = dimensional_rollup(
        df, ["source", "lang"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1  # one fan-out, not 4 scans
    assert "Union" not in plan
