"""C4 cleanup (functions/c4.py), CCNet buckets (operators/ccnet.py),
sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.functions.c4 import c4_clean
from medical_and_charity_document_extraction_system_spark.operators.ccnet import ccnet_buckets
from medical_and_charity_document_extraction_system_spark.operators.lm import (
    train_unigram_lm,
)
from medical_and_charity_document_extraction_system_spark.operators.packing import (
    pack_sequences,
)

GOOD = "\n".join(
    f"this line number {i} has plenty of words in it." for i in range(6)
)


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in c4_clean(df, **kw).collect()}


def test_c4_line_rules(spark):
    out = _c4(
        spark,
        [
            (1, GOOD),
            (2, "short line\n" + GOOD),  # 2-word line dropped, doc keeps
            (3, "enable javascript to view this page please\n" + GOOD),
        ],
    )
    assert out[1]["keep"] and out[1]["n_kept_lines"] == 6
    assert out[2]["n_lines"] == 7 and out[2]["n_kept_lines"] == 6
    assert "short line" not in out[2]["kept_text"]
    # the javascript line is dropped regardless of word count
    assert out[3]["n_kept_lines"] == 6 and "javascript" not in out[3]["kept_text"]


def test_c4_terminal_punctuation_rule(spark):
    rows = [(1, "a sentence that ends properly.\nno terminal punct here\n" + GOOD)]
    loose = _c4(spark, rows, require_terminal=False)[1]
    strict = _c4(spark, rows, require_terminal=True)[1]
    assert loose["n_kept_lines"] == 8
    # strict drops the unterminated line; GOOD lines all end in '.'
    assert strict["n_kept_lines"] == 7
    assert "no terminal punct" not in strict["kept_text"]


def test_c4_page_rules_precedence(spark):
    out = _c4(
        spark,
        [
            (1, "Lorem Ipsum dolor sit amet\n" + GOOD),
            (2, "some code { in here\n" + GOOD),
            (3, "one good line with five words."),
            (4, GOOD),
            (5, "bad word here today now\n" + GOOD),
        ],
        blocklist=("BAD",),
    )
    assert out[1]["reject_reason"] == "lorem_ipsum"  # case-insensitive
    assert out[2]["reject_reason"] == "brace"
    assert out[3]["reject_reason"] == "too_few_lines"
    assert out[4]["reject_reason"] == "none" and out[4]["keep"]
    assert out[5]["reject_reason"] == "blocklist"  # blocklist ci too
    assert not out[5]["keep"]


def test_c4_empty_doc(spark):
    out = _c4(spark, [(1, "")])
    assert out[1]["n_lines"] == 0 and out[1]["kept_text"] == ""
    assert out[1]["reject_reason"] == "too_few_lines"


def test_c4_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = c4_clean(df)._sc._jvm.PythonSQLUtils.explainString(
        c4_clean(df)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan


def test_ccnet_terciles_rank_by_lm_score(spark):
    # language 'xx': in-vocab docs score high, gibberish scores low.
    # sample (doc_id % 10 == 7) covers ids 7..97 -> thresholds real.
    rows = []
    for i in range(100):
        text = "common words here" if i % 3 else "zzqx vvkk jjww"
        rows.append((i, "xx", text))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    vocab, oov = train_unigram_lm(df)
    out = {r["doc_id"]: r for r in ccnet_buckets(df, vocab, oov).collect()}
    # gibberish docs (i % 3 == 0: 34 of 100) are the bottom third
    assert out[3]["bucket"] == "tail" and out[6]["bucket"] == "tail"
    assert out[1]["bucket"] in ("head", "middle")
    buckets = {b: sum(1 for r in out.values() if r["bucket"] == b) for b in ("head", "middle", "tail")}
    assert buckets["tail"] >= 30  # all gibberish lands in tail


def test_ccnet_explicit_edge_arms(spark):
    # empty doc -> NULL score -> 'tail'; a language with no sample
    # member (no doc_id % 10 == 7) -> 'head'
    rows = [(7, "aa", "some words here"), (1, "zz", "other words"), (2, "aa", "")]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    vocab, oov = train_unigram_lm(df)
    out = {r["doc_id"]: r for r in ccnet_buckets(df, vocab, oov).collect()}
    assert out[2]["bucket"] == "tail"  # empty doc
    assert out[1]["bucket"] == "head"  # lang zz absent from sample
    assert out[7]["bucket"] == "head"  # sole sample member: s1 == own score


def test_packing_hand_computed(spark):
    # one shard: force it by hashing — instead pin invariants that
    # hold per shard regardless of assignment
    rows = [(i, "w " * (i % 7) * 3) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_len=16, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 4
    for shard, members in by_shard.items():
        members.sort(key=lambda r: r["tok_start"])
        run = 0
        for r in members:
            assert r["tok_start"] == run  # contiguous stream, no gaps
            assert r["seq_first"] == r["tok_start"] // 16
            assert r["seq_offset"] == r["tok_start"] % 16
            if r["n_tokens"] == 0:
                assert r["n_seqs"] == 0
            else:
                last = (r["tok_start"] + r["n_tokens"] - 1) // 16
                assert r["n_seqs"] == last - r["seq_first"] + 1
            run += r["n_tokens"]


def test_packing_stable_across_partitionings(spark):
    rows = [(i, "word " * (i % 11)) for i in range(150)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df2 = spark.createDataFrame(rows, "doc_id long, text string").repartition(13)
    a = sorted(map(tuple, pack_sequences(df1, seq_len=32).collect()))
    b = sorted(map(tuple, pack_sequences(df2, seq_len=32).collect()))
    assert a == b


def test_packing_single_window_plan(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1  # exactly one window pass


def test_ccnet_window_only_on_sample_plan(spark):
    rows = [(i, "xx", "a b c d") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    vocab, oov = train_unigram_lm(df)
    plan = (
        ccnet_buckets(df, vocab, oov)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # thresholds broadcast back onto the corpus; the only windows are
    # the row_number/count pair over the bounded SAMPLE (a corpus-wide
    # per-language window would be one task per language at scale)
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert plan.count("Window") == 2


def test_pretraining_corpus_composite_funnel(spark):
    # the composed selection recipe over the real sf0.001 extraction:
    # survivors shrink monotonically vs the raw corpus, every shard
    # reports, and the packing summary is internally consistent
    import __spark_entry__ as e

    rows = e.queries()["pretraining_corpus"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 1 <= len(rows) <= 8
    total_docs = sum(r["n_docs"] for r in rows)
    assert 0 < total_docs < 500  # C4/Gopher/dedup/decontam all bite
    for r in rows:
        # n_seqs = ceil(shard token stream / 256) when tokens exist
        if r["n_tokens"] > 0:
            assert r["n_seqs"] == (r["n_tokens"] + 255) // 256
