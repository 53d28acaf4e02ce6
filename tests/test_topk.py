"""Per-group top-k via class-count thresholds (operators/topk.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.operators.topk import grouped_topk


def _brute(df, g, s, i, k):
    w = Window.partitionBy(g).orderBy(F.col(s).desc(), F.col(i).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_matches_window_with_ties_at_boundary(spark):
    rows = [
        # g1: scores 9,7,7,7,3 -> k=3 keeps 9 and the two smallest-id 7s
        ("g1", 1, 9), ("g1", 2, 7), ("g1", 3, 7), ("g1", 4, 7), ("g1", 5, 3),
        # g2: smaller than k -> keeps everything
        ("g2", 6, 1), ("g2", 7, 1),
        # g3: all-tied scores -> first k by id
        ("g3", 10, 5), ("g3", 11, 5), ("g3", 12, 5), ("g3", 13, 5),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, score long")
    got = grouped_topk(df, "grp", "score", "id", k=3)
    assert _rows(got.select("grp", "id", "score")) == _rows(
        _brute(df, "grp", "score", "id", 3).select("grp", "id", "score")
    )
    kept = {r.grp: sorted(x.id for x in got.collect() if x.grp == r.grp)
            for r in got.collect()}
    assert kept["g1"] == [1, 2, 3]
    assert kept["g2"] == [6, 7]
    assert kept["g3"] == [10, 11, 12]


def test_matches_window_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "source", "doc_id", "n_chars"
    )
    for k in (1, 5):
        got = _rows(grouped_topk(docs, "source", "n_chars", "doc_id", k))
        want = _rows(_brute(docs, "source", "n_chars", "doc_id", k))
        assert got == want and len(want) > 0


def test_null_scores_do_not_rank(spark):
    rows = [("g", 1, 5), ("g", 2, None), ("g", 3, 4)]
    df = spark.createDataFrame(rows, "grp string, id long, score long")
    got = {r.id for r in grouped_topk(df, "grp", "score", "id", k=2).collect()}
    assert got == {1, 3}


def test_k_validated_and_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [("g", i, i % 7) for i in range(50)], "grp string, id long, score long"
    )
    with pytest.raises(ValueError):
        grouped_topk(df, "grp", "score", "id", k=0)
    a = _rows(grouped_topk(df, "grp", "score", "id", 4))
    b = _rows(grouped_topk(df.repartition(9), "grp", "score", "id", 4))
    assert a == b


def test_no_raw_row_window(spark):
    """The whole point: no Window node runs over the raw row set —
    the only windows are over the class table and boundary ties."""
    df = spark.createDataFrame(
        [("g", i, i) for i in range(100)], "grp string, id long, score long"
    )
    out = grouped_topk(df, "grp", "score", "id", 5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the hazard plan is row_number() OVER (PARTITION BY grp ORDER BY
    # score, id) — a window whose SORT spec names both score and id.
    # ours never does: the class window orders by score over the
    # aggregated class table, the boundary window orders by id within
    # a (grp, score) partition.
    heads = [
        chunk.split("specifiedwindowframe")[0]
        for chunk in plan.split("windowspecdefinition(")[1:]
    ]
    assert heads, "expected window specs in the plan"
    for head in heads:
        # class window: (grp, score DESC) — no id. boundary window:
        # (grp, score, id ASC) — no DESC. The hazard spec has BOTH.
        assert not ("id#" in head and "DESC" in head), head


def test_stratified_sample_exact_quota_and_stability(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(f"g{i % 3}", i) for i in range(60)] + [("tiny", 999)]
    df = spark.createDataFrame(rows, "grp string, id long")
    out = stratified_sample(df, "grp", "id", k=4)
    got = {}
    for r in out.collect():
        got.setdefault(r.grp, set()).add(r.id)
    assert {g: len(v) for g, v in got.items()} == {
        "g0": 4, "g1": 4, "g2": 4, "tiny": 1
    }
    # incremental stability: sampling a superset never reshuffles the
    # survivors — members can only be displaced, not replaced laterally
    bigger = df.union(
        spark.createDataFrame([(f"g{i % 3}", 1000 + i) for i in range(30)],
                              "grp string, id long")
    )
    got2 = {}
    for r in stratified_sample(bigger, "grp", "id", k=4).collect():
        got2.setdefault(r.grp, set()).add(r.id)
    for g in ("g0", "g1", "g2"):
        # every member of the superset sample that comes from the
        # original rows must have been in the original sample
        assert {i for i in got2[g] if i < 1000} <= got[g]
    # rerun-identity
    again = {}
    for r in stratified_sample(df, "grp", "id", k=4).collect():
        again.setdefault(r.grp, set()).add(r.id)
    assert again == got


def test_grouped_topk_dense_keeps_all_ties(spark):
    from medical_and_charity_document_extraction_system_spark.operators.topk import (
        grouped_topk,
        grouped_topk_dense,
    )

    rows = [
        ("g", 10, 1), ("g", 10, 2), ("g", 9, 3), ("g", 8, 4),
        ("g", 8, 5), ("g", 7, 6), ("h", 1, 7), (None and "x" or "h", 1, 8),
    ]
    df = spark.createDataFrame(rows, "grp string, score int, id int")
    dense = sorted(
        r.id for r in grouped_topk_dense(df, "grp", "score", "id", 3).collect()
        if r.grp == "g"
    )
    # 3 distinct scores {10, 9, 8} -> 5 rows, both 8-ties kept
    assert dense == [1, 2, 3, 4, 5]
    rn = sorted(
        r.id for r in grouped_topk(df, "grp", "score", "id", 3).collect()
        if r.grp == "g"
    )
    # row_number semantics cap at exactly 3 rows
    assert rn == [1, 2, 3]
    # groups smaller than k keep everything, NULL scores never rank
    h = sorted(
        r.id for r in grouped_topk_dense(df, "grp", "score", "id", 3).collect()
        if r.grp == "h"
    )
    assert h == [7, 8]


def test_grouped_topk_dense_rejects_bad_k(spark):
    import pytest

    from medical_and_charity_document_extraction_system_spark.operators.topk import (
        grouped_topk_dense,
    )

    df = spark.createDataFrame([("g", 1, 1)], "grp string, score int, id int")
    with pytest.raises(ValueError):
        grouped_topk_dense(df, "grp", "score", "id", 0)
