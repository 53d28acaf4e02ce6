"""Golden-record survivorship (operators/dedup.golden_records)."""

from medical_and_charity_document_extraction_system_spark.operators.dedup import (
    golden_records,
)


def _run(spark, docs, pairs):
    ddf = spark.createDataFrame(docs, "doc_id long, n_chars long")
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {
        r.component: (r.canonical_id, r.n_members, r.max_quality)
        for r in golden_records(ddf, pdf).collect()
    }


def test_highest_quality_wins(spark):
    docs = [(1, 10), (2, 99), (3, 50), (4, 7)]
    pairs = [(1, 2), (2, 3)]  # component {1,2,3}; 4 is a singleton
    got = _run(spark, docs, pairs)
    assert got == {1: (2, 3, 99), 4: (4, 1, 7)}


def test_tie_breaks_to_smallest_id(spark):
    docs = [(5, 40), (6, 40), (7, 40)]
    pairs = [(5, 6), (6, 7)]
    got = _run(spark, docs, pairs)
    assert got == {5: (5, 3, 40)}


def test_transitive_closure_feeds_election(spark):
    # chain 1-2, 2-3, 3-4: one component even though 1,4 never pair
    docs = [(1, 1), (2, 2), (3, 3), (4, 4)]
    pairs = [(1, 2), (2, 3), (3, 4)]
    got = _run(spark, docs, pairs)
    assert got == {1: (4, 4, 4)}


def test_membership_covers_whole_table(spark):
    docs = [(i, i) for i in range(10)]
    pairs = [(0, 1), (5, 6)]
    got = _run(spark, docs, pairs)
    assert sum(m for (_, m, _) in got.values()) == 10
    assert len(got) == 8  # 2 clusters + 6 singletons
