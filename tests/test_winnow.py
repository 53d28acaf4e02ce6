"""Winnowing fingerprints (operators/winnow.py)."""

import hashlib

import pytest

from medical_and_charity_document_extraction_system_spark.operators.winnow import (
    winnow_candidates,
    winnow_fingerprints,
)

_K, _W, _MOD = 5, 4, 1 << 20


def _ref(s: str, k: int = _K, w: int = _W) -> set:
    """Independent pure-python winnowing (same combined-integer rule)."""
    n = len(s)
    if n < k:
        return set()
    hs = [
        int(hashlib.md5(s[j : j + k].encode()).hexdigest()[:10], 16)
        for j in range(n - k + 1)
    ]
    comb = [h * _MOD + (_MOD - 1 - (j + 1)) for j, h in enumerate(hs)]
    if len(comb) <= w:
        sel = {min(comb)}
    else:
        sel = {min(comb[p - w : p]) for p in range(w, len(comb) + 1)}
    return {(_MOD - 1 - (c % _MOD), c // _MOD) for c in sel}


def _run(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {}
    for r in winnow_fingerprints(df).collect():
        out.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    return out


_TEXTS = [
    "the winnowing algorithm selects one hash per window",
    "a completely different sentence with other words here",
    "aaaaaaaaaaaaaaaa",          # repeated gram: tie-break exercised
    "tiny",                      # < k: no fingerprints
    "sixchr",                    # exactly 2 grams (< w): single min
]


def test_matches_reference_implementation(spark):
    got = _run(spark, _TEXTS)
    for i, t in enumerate(_TEXTS):
        assert got.get(i, set()) == _ref(t), f"doc {i}"


def test_window_guarantee_shared_substring(spark):
    # docs sharing a substring of length >= w + k - 1 = 8 must share
    # at least one fingerprint (the winnowing guarantee)
    a = "xxxx COMMONSEGMENT yyyy"
    b = "qqqqqqq COMMONSEGMENT zzz"
    got = _run(spark, [a, b])
    fps = lambda d: {fp for (_, fp) in got[d]}
    assert fps(0) & fps(1)


def test_candidates_and_max_df_rename(spark):
    texts = [
        "shared prefix sentence that goes on for a while 1",
        "shared prefix sentence that goes on for a while 2",
        "nothing in common with anything else at all qqqq",
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    exact = winnow_candidates(df, min_shared=2)
    rows = exact.collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(0, 1)]
    assert rows[0].n_shared >= 2
    capped = winnow_candidates(df, min_shared=1, max_df=1)
    assert "shared_lb" in capped.columns and capped.count() == 0


def test_no_hof_clone_in_filter(spark):
    # plain explode lets InferFiltersFromGenerate clone the whole
    # winnowing chain into a pushed-down filter (measured 35x slower);
    # explode_outer must keep every Filter node HOF-free
    df = spark.createDataFrame(
        list(enumerate(_TEXTS)), "doc_id long, text string"
    )
    plan = (
        winnow_fingerprints(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in plan.split("\n+-"):
        if node.strip().startswith(("Filter", "* Filter")):
            assert "array_min" not in node and "transform" not in node


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=1)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=1)
