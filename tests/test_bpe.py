"""Distributed BPE training (operators/bpe.py): the Spark loop must
equal the Python twin exactly — same tie-break, same greedy scan."""

from medical_and_charity_document_extraction_system_spark.operators.bpe import (
    bpe_train,
    bpe_train_python,
    merge_table_df,
    segment_counts,
    word_counts,
)


def _train_both(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, wt = bpe_train(df, n)
    wc = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    pm, psyms = bpe_train_python(wc, n)
    return df, merges, wt, pm, psyms


def test_spark_equals_python_twin(spark):
    df, merges, wt, pm, psyms = _train_both(
        spark,
        [
            "low lower lowest new newer newest wide wider widest",
            "low low lower new new newer",
        ],
        10,
    )
    assert merges == pm
    assert {r["word"]: list(r["syms"]) for r in wt.collect()} == psyms


def test_overlapping_pair_merges_greedy_leftmost(spark):
    # "aaaa" under one round of (a,a): leftmost-first pairing
    df, merges, wt, pm, psyms = _train_both(spark, ["aaaa aaaa aaa"], 1)
    assert merges == pm
    assert merges[0][:2] == ("a", "a")
    segs = {r["word"]: list(r["syms"]) for r in wt.collect()}
    assert segs["aaa"] == ["aa", "a"]  # never [a, aa]
    assert segs["aaaa"] == ["aa", "aa"]
    # further rounds collapse everything — and still match the twin
    _, merges3, wt3, pm3, psyms3 = _train_both(spark, ["aaaa aaaa aaa"], 3)
    assert merges3 == pm3
    assert {r["word"]: list(r["syms"]) for r in wt3.collect()} == psyms3


def test_tie_break_is_lexicographic(spark):
    # "xy" and "xz" both appear twice: counts tie at 2, (x,y) < (x,z)
    _, merges, _, pm, _ = _train_both(spark, ["xy xz xy xz"], 1)
    assert merges == pm
    assert merges[0] == ("x", "y", 2)


def test_merges_never_cross_word_boundaries(spark):
    # one doc "ab ab ab": a crossing counter would see (b, a) twice
    _, merges, _, pm, _ = _train_both(spark, ["ab ab ab"], 5)
    assert merges == pm
    assert merges == [("a", "b", 3)]  # and then no pairs remain


def test_single_char_vocab_stops_early(spark):
    _, merges, _, pm, _ = _train_both(spark, ["a b c a b"], 4)
    assert merges == [] and pm == []


def test_segment_counts_cover_empty_docs(spark):
    df, _, wt, _, _ = _train_both(spark, ["hello hello world", ""], 4)
    out = {r["doc_id"]: r for r in segment_counts(df, wt).collect()}
    assert out[1]["n_words"] == 0 and out[1]["n_subtokens"] == 0
    assert out[0]["n_words"] == 3
    # subtokens <= characters, >= words
    assert 3 <= out[0]["n_subtokens"] <= len("hellohelloworld")


def test_training_is_partitioning_invariant(spark):
    texts = ["spark table scan merge join"] * 3 + ["merge join batch window"]
    df1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m1, _ = bpe_train(df1, 6)
    m8, _ = bpe_train(df1.repartition(8), 6)
    assert m1 == m8


def test_merge_table_schema(spark):
    df = spark.createDataFrame([(0, "aa aa")], "doc_id long, text string")
    merges, _ = bpe_train(df, 1)
    mt = merge_table_df(spark, merges)
    assert mt.columns == ["rank", "left_sym", "right_sym", "pair_count"]
    assert mt.collect()[0]["pair_count"] == 2


def test_fertility_by_group_hand_computed(spark):
    from medical_and_charity_document_extraction_system_spark.operators.bpe import (
        bpe_train,
        fertility_by_group,
    )

    rows = [
        (1, "aaaa aaaa", "s1"),   # frequent word: merged, few pieces
        (2, "aaaa bcde", "s1"),
        (3, "bcde fghi", "s2"),   # rare words: stay near char-level
        (4, "", "s2"),            # empty doc still counts for its group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    _, wt = bpe_train(df, n_merges=6)
    out = {r.source: r for r in fertility_by_group(df, wt).collect()}
    assert set(out) == {"s1", "s2"}
    # exact accounting: fertility = total subtokens / total words
    for r in out.values():
        assert r.fertility == r.n_subtokens / r.n_words
    # 'aaaa' is the most frequent word -> fully merged before the rare
    # words, so s1 (three 'aaaa' of four words) beats s2 on fertility
    assert out["s1"].fertility < out["s2"].fertility
    assert out["s1"].n_words == 4 and out["s2"].n_words == 2
