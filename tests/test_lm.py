"""Unigram-LM quality scoring (operators/lm.py)."""

import math

import pyspark.sql.functions as F

from medical_and_charity_document_extraction_system_spark.operators.lm import (
    train_unigram_lm,
    unigram_lm_scores,
)


def _train_and_score(spark, rows, vocab_size=3):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab, oov = train_unigram_lm(df, vocab_size=vocab_size)
    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_lm_scores(df, vocab, oov).collect()
    }
    return vocab, oov, out


def test_training_is_deterministic_and_ranked(spark):
    rows = [(1, "a a a b b c"), (2, "a b x")]
    vocab, oov, _ = _train_and_score(spark, rows)
    # counts: a=4 b=3 c=1 x=1; top-3 with tie broken by term text
    assert [t for t, _ in vocab] == ["a", "b", "c"]
    n, v = 9, 4
    denom = n + v + 1
    assert vocab[0][1] == math.log(5 / denom)
    assert oov == math.log(1 / denom)


def test_in_domain_scores_above_gibberish(spark):
    rows = [(i, "the cat sat on the mat") for i in range(5)] + [
        (99, "zzq qqz xqx jjj vvv www")
    ]
    _, _, out = _train_and_score(spark, rows, vocab_size=6)
    in_domain = out[0][1]
    gibberish = out[99][1]
    assert in_domain > gibberish


def test_exact_hand_computed_score(spark):
    rows = [(1, "a a b"), (2, "a c")]
    vocab, oov, out = _train_and_score(spark, rows, vocab_size=2)
    # corpus: a=3 b=1 c=1 -> n=5 v=3 denom=9; vocab=[a(4/9), b(2/9)]
    lp_a, lp_b = math.log(4 / 9), math.log(2 / 9)
    assert oov == math.log(1 / 9)
    want1 = (2 * lp_a + 1 * lp_b + 0 * oov) / 3
    want2 = (1 * lp_a + 0 * lp_b + 1 * oov) / 2
    assert out[1] == (3, want1)
    assert out[2] == (2, want2)


def test_empty_doc_scores_null(spark):
    rows = [(1, "a b"), (2, "")]
    _, _, out = _train_and_score(spark, rows)
    assert out[2] == (0, None)


def test_scoring_plan_is_jvm_side(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    vocab, oov = train_unigram_lm(df, vocab_size=2)
    plan = (
        unigram_lm_scores(df, vocab, oov)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
