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


def _run(spark, strings, d):
    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )
    got = edit_distance_pairs(df, "id", "s", max_dist=d)
    return {(r.id_a, r.id_b, r.dist) for r in got.collect()}


# deterministic mix: long near-dups, short strings (deletion path),
# segment-boundary lengths, empty string, repeated chars
_STRINGS = [
    "the quick brown fox jumps",   # 0
    "the quick brown fox jumped",  # 1: dist 2 from 0
    "the quick brown fox",         # 2
    "cat",                         # 3
    "cart",                        # 4  dist 1 from cat
    "ct",                          # 5  dist 1 from cat
    "",                            # 6  empty (short path)
    "ab",                          # 7  dist 2 from empty
    "aaaaa",                       # 8  exactly d+1 at d=4 (smallest segmentable)
    "aaaaaaaa",                    # 9
    "zzzzzzzzzzzzzzzz",            # 10 unrelated
    "the quick brown fax jumps",   # 11: dist 1 from 0
]


@pytest.mark.parametrize("d", [1, 2, 4])
def test_matches_brute_force(spark, d):
    assert _run(spark, _STRINGS, d) == _brute(_STRINGS, d)


def test_deletion_path_only_pair(spark):
    # both strings at most d chars: only the FastSS path can surface
    # them (no d+1-way segmentation exists) — pins the short path live
    got = _run(spark, ["ab", "b"], d=2)
    assert got == {(0, 1, 1)}


def test_short_long_boundary_pair(spark):
    # one side <= d, one side >= d+1: the segment path must cover it
    # (the longer string is segmentable; the shorter one probes)
    got = _run(spark, ["abc", "a"], d=2)
    assert got == {(0, 1, 2)}


def test_uneven_segment_layout(spark):
    # lengths not divisible by d+1 exercise the base/remainder layout;
    # substitution in every-but-one segment still caught (pigeonhole)
    a = "abcdefghijk"      # 11 chars, d=2 -> segments 4/4/3
    b = "XbcdefghijZ"      # touches segments 0 and 2; segment 1 intact
    got = _run(spark, [a, b], d=2)
    assert got == {(0, 1, 2)}


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        list(enumerate(_STRINGS)), "id long, s string"
    )
    plan = (
        edit_distance_pairs(df, "id", "s", max_dist=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "x")], "id long, s string")
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "s", max_dist=0)


def test_unicode_is_character_based(spark):
    # é is one character: distance 1 from the ASCII form in both
    # Spark and DuckDB (char-based DP, not bytes)
    got = _run(spark, ["héllo", "hello"], d=1)
    assert got == {(0, 1, 1)}
