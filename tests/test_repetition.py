"""Gopher repetition signals (operators/repetition.py)."""

from medical_and_charity_document_extraction_system_spark.operators.repetition import (
    gopher_repetition,
)


def _rep(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_repetition(df).collect()}


def test_duplicate_line_fractions_hand_computed(spark):
    out = _rep(
        spark,
        [
            (1, "alpha beta\nalpha beta\ngamma"),  # 3 lines, 1 dup
            (2, "one\ntwo\nthree"),                # no dups
            (3, ""),                               # no lines
        ],
    )
    r1 = out[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == (3 - 2) / 3
    # chars: lines 10+10+5=25, distinct 10+5=15 -> dup chars 10/25
    assert r1["dup_line_char_frac"] == 10 / 25
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["n_lines"] == 0
    assert out[3]["dup_line_frac"] is None
    assert out[3]["dup_line_char_frac"] is None


def test_top_ngram_char_fraction_hand_computed(spark):
    # "a b a b a b": 2-grams = a b (x3), b a (x2); top "a b" len 3
    # joined len = 11 -> 3*3/11
    out = _rep(spark, [(1, "a b a b a b")])
    r = out[1]
    assert r["top2gram_char_frac"] == (3 * 3) / 11
    # 3-grams: "a b a" x2, "b a b" x2 -> tie broken to "a b a", len 5
    assert r["top3gram_char_frac"] == (2 * 5) / 11
    # 4-grams: "a b a b" x2 wins over others at 1 -> 2*7/11
    assert r["top4gram_char_frac"] == (2 * 7) / 11


def test_short_docs_yield_null_ngram_fracs(spark):
    out = _rep(spark, [(1, "solo"), (2, "two words now"), (3, "")])
    assert out[1]["top2gram_char_frac"] is None       # <2 tokens
    assert out[2]["top2gram_char_frac"] is not None
    assert out[2]["top4gram_char_frac"] is None       # <4 tokens
    assert out[3]["top2gram_char_frac"] is None       # empty


def test_repeated_boilerplate_scores_above_natural(spark):
    natural = "\n".join(f"sentence number {i} about topic {i * 7}" for i in range(10))
    spammy = "\n".join("click here to win a prize today" for _ in range(10))
    out = _rep(spark, [(1, natural), (2, spammy)])
    assert out[2]["dup_line_frac"] > 0.8 > out[1]["dup_line_frac"]
    assert out[2]["top4gram_char_frac"] > out[1]["top4gram_char_frac"]
    # Gopher cuts would drop doc 2, keep doc 1
    assert out[1]["dup_line_frac"] <= 0.30 and out[2]["dup_line_frac"] > 0.30


def test_plan_is_jvm_side_single_explode(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    qe = gopher_repetition(df)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # all three n-gram sizes ride ONE explode (Spark does not share
    # scans between union branches) and df is never window-computed
    assert plan.count("Generate explode") == 1
    assert "Window" not in qe.optimizedPlan().toString()
