"""Deterministic HyperLogLog (operators/sketches.py)."""

import pyspark.sql.functions as F

from medical_and_charity_document_extraction_system_spark.operators.sketches import (
    ALPHA_NUM,
    M,
    hll_cardinality,
)


def _est(spark, values, key="k"):
    df = spark.createDataFrame([(key, v) for v in values], "k string, v long")
    r = hll_cardinality(df, ["k"], "v").collect()[0]
    return r["hll_estimate"], r["n_buckets"], r["n_empty"]


def test_estimate_within_hll_error_bounds(spark):
    # sigma ~ 1.04/sqrt(256) = 6.5%; allow 4 sigma on one draw
    for n in (500, 2000):
        est, nb, ne = _est(spark, range(n))
        assert abs(est - n) / n < 0.26, (n, est)
        assert nb + ne == M


def test_duplicates_do_not_move_the_estimate(spark):
    a, _, _ = _est(spark, list(range(300)))
    b, _, _ = _est(spark, list(range(300)) * 7)
    assert a == b


def test_sketch_is_partitioning_invariant(spark):
    vals = list(range(1000))
    df1 = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    df8 = df1.repartition(8)
    r1 = hll_cardinality(df1, ["k"], "v").collect()[0]
    r8 = hll_cardinality(df8, ["k"], "v").collect()[0]
    # bit-exact across partitionings: the harmonic sum is integer
    assert r1["hll_estimate"] == r8["hll_estimate"]


def test_keys_are_independent(spark):
    """A key's sketch must equal the sketch of its values alone —
    mixing keys in one table cannot bleed registers across keys."""
    df = spark.createDataFrame(
        [("a", v) for v in range(700)] + [("b", v) for v in range(1000, 2500)],
        "k string, v long",
    )
    out = {r["k"]: r["hll_estimate"] for r in hll_cardinality(df, ["k"], "v").collect()}
    alone_a, _, _ = _est(spark, range(700))
    alone_b, _, _ = _est(spark, range(1000, 2500))
    assert out["a"] == alone_a
    assert out["b"] == alone_b


def test_small_range_bias_is_visible_and_documented(spark):
    """Raw HLL (no linear-counting correction — ln is not engine-
    portable) overestimates when n << m; n_empty carries what a
    consumer needs to correct it. Pin the direction so nobody
    mistakes the bias for a bug."""
    est, _, ne = _est(spark, range(50))
    assert est > 50  # overestimate, by design of the raw formula
    assert ne > 150  # and the empty-register count exposes it


def test_alpha_literal_is_shared_with_oracle():
    from medical_and_charity_document_extraction_system_spark import oracles

    assert repr(ALPHA_NUM) in oracles.hll_host_cardinality_sql()


def test_sketch_plan_is_jvm_side(spark):
    df = spark.createDataFrame([("k", 1)], "k string, v long")
    plan = (
        hll_cardinality(df, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_register_merge_equals_one_shot(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
        merge_hll_registers,
    )

    df = spark.createDataFrame(
        [("k", v) for v in range(800)], "k string, v long"
    )
    whole = hll_cardinality(df, ["k"], "v").collect()[0]
    r1 = hll_registers(df.where("v % 3 = 0"), ["k"], "v")
    r2 = hll_registers(df.where("v % 3 != 0"), ["k"], "v")
    inc = hll_estimate_from_registers(merge_hll_registers(r1, r2), ["k"]).collect()[0]
    assert inc["hll_estimate"] == whole["hll_estimate"]  # bit-exact
    # overlapping batches also merge correctly (max absorbs repeats)
    r3 = hll_registers(df, ["k"], "v")
    inc2 = hll_estimate_from_registers(merge_hll_registers(r1, r3), ["k"]).collect()[0]
    assert inc2["hll_estimate"] == whole["hll_estimate"]
