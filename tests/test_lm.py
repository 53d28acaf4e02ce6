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


# ------------------------------------------------------ bigram LM
def _train_and_score_bigram(spark, rows, vocab_size=6, bigram_size=6):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        bigram_lm_scores,
        train_bigram_lm,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_lm(df, vocab_size=vocab_size, bigram_size=bigram_size)
    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in bigram_lm_scores(df, *model).collect()
    }
    return model, out


def test_bigram_training_deterministic_and_ranked(spark):
    rows = [(1, "a b a b c"), (2, "a b x")]
    (vocab, oov, bigrams, log_backoff), _ = _train_and_score_bigram(spark, rows)
    # bigram counts: "a b"=3, "b a"=1, "b c"=1, "b x"=1 -> count desc, pair
    assert [p for p, _ in bigrams] == ["a b", "b a", "b c", "b x"]
    assert log_backoff == math.log(0.4)
    # delta for "a b": log(3/3) - log(0.4) - lp_b  (a occurs 3x)
    lp = dict(vocab)
    assert bigrams[0][1] == math.log(3 / 3) - log_backoff - lp["b"]


def test_bigram_exact_hand_computed_score(spark):
    rows = [(1, "a b a b"), (2, "b a")]
    (vocab, oov, bigrams, log04), out = _train_and_score_bigram(
        spark, rows, vocab_size=2, bigram_size=1
    )
    # corpus: a=3 b=3, bigrams: "a b"=2, "b a"=2 -> top-1 = "a b" (tie by text)
    lp = dict(vocab)
    lb_ab = math.log(2 / 3)
    # doc 2 "b a": uni(b) + [backoff] log04 + uni(a) — no "a b" pair
    want2 = (lp["b"] + lp["a"] + 1 * log04) / 2
    # doc 1 "a b a b": unigram fold + 3*log04 + 2*delta_ab
    delta = lb_ab - log04 - lp["b"]
    want1 = (2 * lp["a"] + 2 * lp["b"] + 3 * log04 + 2 * delta) / 4
    got1, got2 = out[1][1], out[2][1]
    assert abs(got1 - want1) < 1e-12 and out[1][0] == 4
    assert abs(got2 - want2) < 1e-12 and out[2][0] == 2


def test_bigram_separates_word_order_unigram_cannot(spark):
    """The value-add over the unigram model: a shuffled-word document
    has the SAME unigram score as its natural original but a LOWER
    bigram score; and gibberish scores below both."""
    natural = "the cat sat on the mat " * 3
    shuffled = "mat the on sat cat the " * 3
    rows = [(i, natural.strip()) for i in range(8)] + [
        (90, shuffled.strip()),
        (99, "zzq qqz xqx jjj vvv www"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab, oov = train_unigram_lm(df, vocab_size=8)
    uni = {
        r["doc_id"]: r["avg_logprob"]
        for r in unigram_lm_scores(df, vocab, oov).collect()
    }
    _, big = _train_and_score_bigram(spark, rows, vocab_size=8, bigram_size=8)
    # unigram is word-order blind
    assert uni[0] == uni[90]
    # bigram: natural > shuffled > gibberish
    assert big[0][1] > big[90][1] > big[99][1]
    # monotonic with unigram on the gibberish end
    assert uni[0] > uni[99] and big[0][1] > big[99][1]


def test_bigram_empty_doc_and_single_token(spark):
    rows = [(1, "a a a"), (2, ""), (3, "a")]
    _, out = _train_and_score_bigram(spark, rows, vocab_size=2, bigram_size=2)
    assert out[2] == (0, None)
    # single token: no pairs, no backoff term (n-1 = 0)
    assert out[3][0] == 1 and out[3][1] is not None


def test_bigram_scoring_plan_is_jvm_side_and_staged(spark):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        bigram_lm_scores,
        train_bigram_lm,
    )

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    model = train_bigram_lm(df, vocab_size=2, bigram_size=2)
    qe = bigram_lm_scores(df, *model)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # staged projections: each interpreted HOF count evaluated once —
    # filter() sites = vocab terms + bigrams + 1 tokenizer
    n_filters = qe.optimizedPlan().toString().count("filter(")
    assert n_filters <= 2 + 2 + 1


# ------------------------------------------------------ trigram LM
def _train_and_score_trigram(spark, rows, V=6, B=6, T=6):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        train_trigram_lm,
        trigram_lm_scores,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_trigram_lm(
        df, vocab_size=V, bigram_size=B, trigram_size=T
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in trigram_lm_scores(df, *model).collect()
    }
    return model, out


def _brute_trigram_score(text, vocab, oov, bigrams, log04, trigrams):
    """Position-by-position reference scorer (the textbook stupid
    backoff, no count-factoring) — validates the factored fold."""
    uni, lbd, ltd = dict(vocab), dict(bigrams), dict(trigrams)

    def u(t):
        return uni.get(t, oov)

    def b(t1, t2):
        p = f"{t1} {t2}"
        # reconstruct the raw bigram score from the stored delta
        return (lbd[p] + log04 + u(t2)) if p in lbd else log04 + u(t2)

    toks = text.split()
    total = 0.0
    for i, t in enumerate(toks):
        if i == 0:
            total += u(t)
        elif i == 1:
            total += b(toks[0], t)
        else:
            g = f"{toks[i-2]} {toks[i-1]} {t}"
            if g in ltd:
                total += ltd[g] + log04 + b(toks[i - 1], t)
            else:
                total += log04 + b(toks[i - 1], t)
    return total / len(toks) if toks else None


def test_trigram_training_deterministic_and_ranked(spark):
    rows = [(1, "a b c a b c"), (2, "a b x")]
    (vocab, oov, bigrams, log04, trigrams), _ = _train_and_score_trigram(
        spark, rows
    )
    # trigram counts: "a b c"=2, "b c a"=1, "c a b"=1, "a b x"=1
    assert [g for g, _ in trigrams] == ["a b c", "a b x", "b c a", "c a b"]
    # delta for "a b c": lt - log04 - bscore("b c");
    # c("a b")=3, c3=2 -> lt = log(2/3); "b c" in table: lb = log(2/3)
    lp = dict(vocab)
    lb_bc = math.log(2 / 3)
    delta_bc = lb_bc - log04 - lp["c"]  # the stored bigram delta
    got = dict(trigrams)["a b c"]
    want = math.log(2 / 3) - log04 - lb_bc
    assert got == want
    # the bigram table carries the matching delta for "b c"
    assert abs(dict(bigrams)["b c"] - delta_bc) < 1e-15


def test_trigram_matches_brute_force_scorer(spark):
    rows = [
        (1, "a b c a b c a b"),
        (2, "b a c b a"),
        (3, "a a a a"),  # overlapping trigram occurrences
        (4, "x y z"),
        (5, "a"),
        (6, ""),
    ]
    model, out = _train_and_score_trigram(spark, rows, V=4, B=4, T=3)
    texts = dict(rows)
    for doc_id, (n, got) in out.items():
        want = _brute_trigram_score(texts[doc_id], *model)
        if want is None:
            assert got is None
        else:
            assert abs(got - want) < 1e-9, (doc_id, got, want)


def test_trigram_reduces_to_bigram_below_three_tokens(spark):
    """n <= 2 has no trigram positions: the trigram and bigram models
    must produce the IDENTICAL score for such docs."""
    rows = [(1, "a b a b a"), (2, "a b"), (3, "b")]
    (vocab, oov, bigrams, log04, trigrams), tri = _train_and_score_trigram(
        spark, rows
    )
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        bigram_lm_scores,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    big = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_lm_scores(df, vocab, oov, bigrams, log04).collect()
    }
    assert tri[2][1] == big[2] and tri[3][1] == big[3]


def test_trigram_separates_word_order_deeper_than_bigram(spark):
    """A document preserving bigrams but breaking trigrams scores
    lower under the trigram model, same under the bigram model is NOT
    generally constructible — so pin the weaker, still-diagnostic
    ordering: natural > shuffled > gibberish, and natural-vs-shuffled
    separation is at least the bigram model's."""
    natural = ("the cat sat on the mat " * 3).strip()
    shuffled = ("mat the on sat cat the " * 3).strip()
    rows = [(i, natural) for i in range(8)] + [
        (90, shuffled),
        (99, "zzq qqz xqx jjj vvv www"),
    ]
    (vocab, oov, bigrams, log04, trigrams), tri = _train_and_score_trigram(
        spark, rows, V=8, B=8, T=8
    )
    assert tri[0][1] > tri[90][1] > tri[99][1]
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        bigram_lm_scores,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    big = {
        r["doc_id"]: r["avg_logprob"]
        for r in bigram_lm_scores(df, vocab, oov, bigrams, log04).collect()
    }
    assert (tri[0][1] - tri[90][1]) >= (big[0] - big[90]) - 1e-12


def test_trigram_scoring_plan_is_jvm_side_and_staged(spark):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        train_trigram_lm,
        trigram_lm_scores,
    )

    df = spark.createDataFrame([(1, "a b c a b c")], "doc_id long, text string")
    model = train_trigram_lm(df, vocab_size=2, bigram_size=2, trigram_size=2)
    qe = trigram_lm_scores(df, *model)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # staged projections: each interpreted HOF count evaluated once —
    # filter() sites = vocab terms + bigrams + trigrams + 1 tokenizer
    n_filters = qe.optimizedPlan().toString().count("filter(")
    assert n_filters <= 2 + 2 + 2 + 1


# ---------------------------------------------------------- collocations


def test_collocation_lift_ranks_fixed_phrases_first(spark):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        collocation_lift,
    )

    # "new york" always adjacent; "the" everywhere (high-frequency,
    # low association); lift must rank the fixed phrase on top
    rows = [(i, "the city of new york has the people the cars") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocation_lift(df, top_k=10, min_count=5).collect()
    pairs = [r["pair"] for r in out]
    assert pairs[0] in ("city of", "new york", "of new")  # all perfect 1:1 pairs
    assert "new york" in pairs
    ny = next(r for r in out if r["pair"] == "new york")
    # n_xy=5, n_x=n_y=5, N=50 -> lift = 5*50/25 = 10.0 exactly
    assert ny["lift"] == 10.0 and ny["n_xy"] == 5
    the = [r for r in out if r["pair"].startswith("the ")]
    assert all(r["lift"] < 10.0 for r in the)  # "the" pairs are diluted


def test_collocation_min_count_filters(spark):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        collocation_lift,
    )

    df = spark.createDataFrame(
        [(0, "rare pair common common common common common common")],
        "doc_id long, text string",
    )
    out = collocation_lift(df, top_k=10, min_count=2).collect()
    assert all(r["n_xy"] >= 2 for r in out)
    assert not any(r["pair"] == "rare pair" for r in out)


def test_collocation_partitioning_invariant(spark):
    from medical_and_charity_document_extraction_system_spark.operators.lm import (
        collocation_lift,
    )

    rows = [(i, "alpha beta gamma alpha beta") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in collocation_lift(df, 10, 2).collect()]
    b = [tuple(r) for r in collocation_lift(df.repartition(8), 10, 2).collect()]
    assert a == b
