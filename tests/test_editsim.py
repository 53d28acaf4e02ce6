"""Exact edit-distance similarity join (operators/editsim.py)."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.editsim import (
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _brute(strings, d):
    out = set()
    for i, a in enumerate(strings):
        for j in range(i + 1, len(strings)):
            dist = _lev(a, strings[j])
            if dist <= d:
                out.add((i, j, dist))
    return out


def _run(spark, strings, d, q=3):
    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )
    got = edit_distance_pairs(df, "id", "s", max_dist=d, q=q)
    return {(r.id_a, r.id_b, r.dist) for r in got.collect()}


# deterministic mix: long near-dups, short strings (deletion path),
# a long/short boundary pair, empty string, repeated chars
_STRINGS = [
    "the quick brown fox jumps",   # 0
    "the quick brown fox jumped",  # 1: dist 2 from 0
    "the quick brown fox",         # 2
    "cat",                         # 3  short
    "cart",                        # 4  short, dist 1 from cat
    "ct",                          # 5  short, dist 1 from cat
    "",                            # 6  empty
    "ab",                          # 7  dist 2 from empty
    "aaaaaaaaaaaa",                # 8  12 chars (short at d=4,q=3)
    "aaaaaaaaaaaaaaa",             # 9  15 chars (long at d=4,q=3)
    "zzzzzzzzzzzzzzzz",            # 10 unrelated
    "the quick brown fax jumps",   # 11: dist 1 from 0
]


@pytest.mark.parametrize("d", [1, 2, 4])
def test_matches_brute_force(spark, d):
    assert _run(spark, _STRINGS, d) == _brute(_STRINGS, d)


def test_deletion_path_only_pair(spark):
    # both strings shorter than q*(d+1): only the FastSS path can
    # surface them — pins the short path is live, not dead code
    got = _run(spark, ["abcd", "abxd"], d=2, q=3)
    assert got == {(0, 1, 1)}


def test_long_short_boundary_pair(spark):
    # one side above, one below the q*(d+1) cut: must come through the
    # gram path (short side still emits grams since len >= q)
    a = "abcdefghijklmno"   # 15 = q*(d+1) at q=3,d=4
    b = "abcdefghijk"       # 11 chars, dist 4
    got = _run(spark, [a, b], d=4, q=3)
    assert got == {(0, 1, 4)}


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        list(enumerate(_STRINGS)), "id long, s string"
    )
    plan = edit_distance_pairs(df, "id", "s", max_dist=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "x")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", max_dist=0)
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", max_dist=2, q=1)


def test_unicode_is_character_based(spark):
    # é is one character: distance 1 from the ASCII form in both
    # Spark and DuckDB (char-based DP, not bytes)
    got = _run(spark, ["héllo", "hello"], d=1)
    assert got == {(0, 1, 1)}
