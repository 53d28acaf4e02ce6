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


# -------------------------------------------- dup n-gram coverage
def _dup(spark, rows, sizes=(5, 10)):
    from medical_and_charity_document_extraction_system_spark.operators.repetition import (
        dup_ngram_coverage,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict() for r in dup_ngram_coverage(df, sizes=sizes).collect()
    }


def test_dup_ngram_union_of_positions_hand_computed(spark):
    # 12 tokens: "a b c d e" appears at pos 1 and pos 6 (non-overlapping),
    # tail "x y" unique. Covered positions 1..10 of 12; all tokens 1 char.
    text = "a b c d e a b c d e x y"
    out = _dup(spark, [(1, text)], sizes=(5,))
    r = out[1]
    assert r["n_tokens"] == 12
    assert r["dup5gram_char_frac"] == 10 / 12


def test_dup_ngram_overlap_not_double_counted(spark):
    # "a a a a a a": every 5-gram is "a a a a a" (x2, overlapping at
    # positions 1 and 2) -> union covers ALL 6 positions, frac 1.0
    out = _dup(spark, [(1, "a a a a a a")], sizes=(5,))
    assert out[1]["dup5gram_char_frac"] == 1.0


def test_dup_ngram_no_duplicates_and_short_docs(spark):
    out = _dup(spark, [(1, "one two three four five six"), (2, "tiny doc")])
    assert out[1]["dup5gram_char_frac"] == 0.0
    assert out[1]["dup10gram_char_frac"] == 0.0
    # doc 2 has < 5 tokens: no grams at all -> coverage 0
    assert out[2]["dup5gram_char_frac"] == 0.0


def test_dup_ngram_char_weighting(spark):
    # duplicated 5-gram of LONG tokens vs unique short tail: fraction
    # weights characters, not positions
    text = "alpha beta gamma delta epsilon alpha beta gamma delta epsilon x"
    out = _dup(spark, [(1, text)], sizes=(5,))
    long_chars = 2 * (5 + 4 + 5 + 5 + 7)
    assert out[1]["dup5gram_char_frac"] == long_chars / (long_chars + 1)


# ------------------------------------------------ composed filter
def test_quality_filter_reasons_and_precedence(spark):
    from medical_and_charity_document_extraction_system_spark.operators.repetition import (
        quality_filter,
    )

    words = [
        "quick", "brown", "foxes", "jumped", "lazily", "over", "seven",
        "green", "hills", "while", "birds", "sang", "about", "distant",
        "rivers", "carrying", "boats", "toward", "harbors", "filled",
        "with", "lanterns", "morning", "traders", "counted", "copper",
        "coins", "under", "awnings", "children", "chased", "kites",
        "along", "dusty", "roads", "past", "orchards", "heavy", "fruit",
        "autumn", "winds", "turned", "pages", "unread", "letters",
    ]
    good = "the a of to and in " + " ".join(words)  # 50+ varied words
    # passes gopher word-shape (>=50 words, stopwords...) but repeats
    # one line 20x -> rejected by the first repetition cut
    spam_line = "the spam of the day is to win and in " * 2
    spammy = "\n".join(spam_line.strip() for _ in range(20))
    tiny = "too short"
    rows = [(1, good), (2, spammy), (3, tiny)]
    out = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in quality_filter(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1] == (True, "none")
    assert out[3] == (False, "gopher")          # word-shape fails first
    keep2, reason2 = out[2]
    assert keep2 is False
    # gopher's own dup_line rule fires before the repetition cuts
    assert reason2 == "gopher"


def test_quality_filter_repetition_cut_fires_when_gopher_passes(spark):
    from medical_and_charity_document_extraction_system_spark.operators.repetition import (
        quality_filter,
    )

    # >=50 words, healthy shape, DISTINCT lines (gopher line rule ok),
    # but one 4-gram covers most characters
    phrase = "click here to win"
    filler = [f"the offer number{i} of day{i} ends in a moment{i}" for i in range(6)]
    text = "\n".join(filler + [(phrase + " ") * 12])
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = quality_filter(df).collect()[0]
    assert out["keep"] is False
    assert out["reject_reason"] in (
        "top2gram_char_frac", "top3gram_char_frac", "top4gram_char_frac",
        "dup5gram_char_frac",
    )
