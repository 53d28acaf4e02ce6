"""Benchmark decontamination (operators/decontam.py): planted
contamination, distinct-gram counting, too-short docs, determinism."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.decontam import (
    benchmark_ngrams,
    decontaminate,
    word_ngrams,
)

from pyspark.sql import functions as F


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def planted(spark):
    bench = spark.createDataFrame(
        [(0, _words("b", 13)), (1, _words("c", 20))], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # contains bench doc 0's full 13-gram, surrounded by noise
            (10, "x0 x1 " + _words("b", 13) + " x2"),
            # repeats the SAME contaminated 13-gram twice: distinct
            # grams count once on both sides of the join
            (11, _words("b", 13) + " z0 " + _words("b", 13)),
            # clean doc, no overlap
            (12, _words("q", 30)),
            # too short for any 13-gram
            (13, "a b c"),
        ],
        ["doc_id", "text"],
    )
    return bench, corpus


def test_contamination_flags(spark, planted):
    bench, corpus = planted
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, benchmark_ngrams(bench)).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    assert out[10]["contaminated"] and out[10]["n_hits"] == 1
    assert out[12]["n_hits"] == 0 and not out[12]["contaminated"]
    # 16 tokens -> 4 distinct 13-grams
    assert out[10]["n_grams"] == 4


def test_repeated_gram_counts_once(spark, planted):
    bench, corpus = planted
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, benchmark_ngrams(bench)).collect()
    }
    # doc 11 contains the planted 13-gram twice -> still one hit
    assert out[11]["n_hits"] == 1 and out[11]["contaminated"]


def test_short_doc_emits_zero_row(spark, planted):
    bench, corpus = planted
    out = {
        r["doc_id"]: r
        for r in decontaminate(corpus, benchmark_ngrams(bench)).collect()
    }
    assert out[13]["n_grams"] == 0
    assert out[13]["n_hits"] == 0 and not out[13]["contaminated"]


def test_word_ngrams_clamp(spark):
    # sequence(1, stop) descends for stop < 1: the clamp must yield []
    df = spark.createDataFrame([("a b",), ("a b c",)], ["text"])
    toks = F.split("text", " ")
    rows = df.select(word_ngrams(toks, 3).alias("g")).collect()
    assert rows[0]["g"] == []
    assert rows[1]["g"] == ["a b c"]


def test_no_broadcast_variant_same_result(spark, planted):
    bench, corpus = planted
    bg = benchmark_ngrams(bench)
    a = sorted(map(tuple, decontaminate(corpus, bg).collect()))
    b = sorted(
        map(tuple, decontaminate(corpus, bg, broadcast_bench=False).collect())
    )
    assert a == b


# ---------------------------------------------------------------- fuzzy


def test_fuzzy_decontamination_planted(spark):
    base = _words("w", 40)
    bench = spark.createDataFrame(
        [(3, base), (20, _words("q", 30))], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, base),                       # identical to bench doc 3
            (2, base + " extra tail here"),  # near-dup of bench doc 3
            (4, _words("z", 40)),            # clean
            (5, "too short"),                # < shingle_k tokens
        ],
        ["doc_id", "text"],
    )
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        fuzzy_decontaminate,
    )

    out = {
        r["doc_id"]: r.asDict()
        for r in fuzzy_decontaminate(corpus, bench, threshold=0.9).collect()
    }
    assert len(out) == 4  # every corpus doc reports, hit or not
    assert out[1]["contaminated"] and out[1]["max_jaccard"] == 1.0
    assert out[1]["n_bench_hits"] == 1
    # 38 shared shingles / 41 union = 0.9268... >= 0.9
    assert out[2]["contaminated"] and 0.9 <= out[2]["max_jaccard"] < 1.0
    assert not out[4]["contaminated"] and out[4]["max_jaccard"] is None
    assert out[5]["n_bench_hits"] == 0  # signature-less doc still rows


def test_fuzzy_decontamination_broadcast_only_plan(spark):
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        fuzzy_decontaminate,
    )

    bench = spark.createDataFrame([(3, _words("w", 30))], ["doc_id", "text"])
    corpus = spark.createDataFrame([(1, _words("w", 30))], ["doc_id", "text"])
    plan = (
        fuzzy_decontaminate(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bounded benchmark side broadcasts through BOTH the band
    # join and the verification join (explicit hints — a hot band key
    # cannot concentrate on one reducer); the remaining id-keyed
    # corpus joins are plain equi-joins, AQE-splittable
    assert plan.count("BroadcastHashJoin") >= 2


# ------------------------------------------------------------ Bloom pass


def test_bloom_planted_contamination_and_superset(spark, planted):
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        bloom_decontaminate,
    )

    bench, corpus = planted
    out = {
        r["doc_id"]: r
        for r in bloom_decontaminate(corpus, benchmark_ngrams(bench)).collect()
    }
    assert set(out) == {10, 11, 12, 13}
    # exact hits are always bloom hits (one-sided error)
    for r in out.values():
        assert r["n_hits_bloom"] >= r["n_hits_exact"]
        assert (not r["contaminated_exact"]) or r["contaminated_bloom"]
    assert out[10]["contaminated_exact"] and out[10]["contaminated_bloom"]
    assert out[11]["n_hits_exact"] == 1  # repeated gram counts once
    assert out[13]["n_grams"] == 0 and not out[13]["contaminated_bloom"]
    # 18 clean grams of doc 12 against ~8 bench grams in 2^16 bits:
    # a false positive needs a 4-position collision — impossible here
    assert not out[12]["contaminated_bloom"]


def test_bloom_build_is_bounded_and_mergeable(spark):
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        BLOOM_M,
        bloom_build,
    )

    a = spark.createDataFrame([(f"g{i}",) for i in range(50)], ["g"])
    b = spark.createDataFrame([(f"h{i}",) for i in range(50)], ["g"])
    both = a.unionByName(b)
    one_shot = {r["p"] for r in bloom_build(both).collect()}
    merged = {r["p"] for r in bloom_build(a).collect()} | {
        r["p"] for r in bloom_build(b).collect()
    }
    assert one_shot == merged  # set-bit tables OR by plain union
    assert len(one_shot) <= BLOOM_M


def test_bloom_plan_is_jvm_side_with_broadcast_probe(spark, planted):
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        bloom_decontaminate,
    )

    bench, corpus = planted
    out = bloom_decontaminate(corpus, benchmark_ngrams(bench))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan

# --------------------------------------------------------- containment


@pytest.fixture(scope="module")
def containment_planted(spark):
    # bench doc 0: 7 tokens -> 5 distinct 3-shingles
    bench = spark.createDataFrame([(0, _words("b", 7))], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            # quotes the FULL bench doc inside 30 tokens of noise:
            # containment 5/5 = 1.0, Jaccard ~ 5/33 -> far below 0.9
            (1, _words("n", 15) + " " + _words("b", 7) + " " + _words("m", 15)),
            # 6 of bench's 7 tokens -> 4 of 5 shingles = 0.8, boundary hit
            (2, _words("b", 6) + " " + _words("t", 10)),
            # 5 of 7 tokens -> 3 of 5 shingles = 0.6, below threshold
            (3, _words("b", 5) + " " + _words("u", 10)),
            # clean
            (4, _words("q", 12)),
            # too short for any shingle
            (5, "a b"),
        ],
        ["doc_id", "text"],
    )
    return bench, corpus


def test_containment_planted(spark, containment_planted):
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        containment_decontaminate,
    )

    bench, corpus = containment_planted
    out = {
        r["doc_id"]: r.asDict()
        for r in containment_decontaminate(corpus, bench).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}  # every corpus doc reports
    assert out[1]["contaminated"] and out[1]["max_containment"] == 1.0
    assert out[1]["n_bench_hits"] == 1
    # 4/5 = 0.8 sits exactly ON the >= threshold
    assert out[2]["contaminated"] and out[2]["max_containment"] == 0.8
    assert not out[3]["contaminated"] and out[3]["max_containment"] is None
    assert not out[4]["contaminated"] and out[4]["n_bench_hits"] == 0
    assert out[5]["max_containment"] is None  # shingle-less doc still rows


def test_containment_catches_what_jaccard_misses(spark, containment_planted):
    """The reason this operator exists: a short eval item quoted inside
    a long page has near-zero Jaccard (the page's size dominates the
    union) but containment 1.0."""
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        containment_decontaminate,
        fuzzy_decontaminate,
    )

    bench, corpus = containment_planted
    quoter = corpus.where(F.col("doc_id") == 1)
    jac = fuzzy_decontaminate(quoter, bench, threshold=0.9).collect()[0]
    con = containment_decontaminate(quoter, bench).collect()[0]
    assert not jac["contaminated"]
    assert con["contaminated"] and con["max_containment"] == 1.0


def test_containment_bench_side_broadcasts(spark, containment_planted):
    from medical_and_charity_document_extraction_system_spark.operators.decontam import (
        containment_decontaminate,
    )

    bench, corpus = containment_planted
    plan = (
        containment_decontaminate(corpus, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the bounded eval suite broadcasts through BOTH the shingle join
    # and the size join; no shuffle keyed on a bench-shingle hotspot
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan
