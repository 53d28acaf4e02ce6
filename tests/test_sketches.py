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


# ------------------------------------------------------------- Count-Min


def _cms_build(spark, pairs):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        cms_registers,
    )

    df = spark.createDataFrame(pairs, "term string, cnt long")
    return cms_registers(df)


def test_cms_estimate_upper_bounds_truth(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        cms_estimate,
    )

    pairs = [(f"t{i}", (i % 7) + 1) for i in range(300)]
    truth = dict(pairs)
    regs = _cms_build(spark, pairs)
    probes = spark.createDataFrame([(t,) for t in truth], "term string")
    est = {r["term"]: r["cms_estimate"] for r in cms_estimate(regs, probes).collect()}
    assert set(est) == set(truth)
    assert all(est[t] >= c for t, c in truth.items())
    # with 300 terms in 4x1024 cells most probes should be exact
    assert sum(est[t] == c for t, c in truth.items()) > 250


def test_cms_never_seen_term_estimates_zero_or_collision(spark):
    """A probe term absent from the build must survive the left join:
    estimate is 0 unless every one of its D buckets collides."""
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        cms_estimate,
    )

    regs = _cms_build(spark, [("only", 5)])
    probes = spark.createDataFrame([("never",), ("only",)], "term string")
    est = {r["term"]: r["cms_estimate"] for r in cms_estimate(regs, probes).collect()}
    assert est["only"] == 5
    assert est["never"] == 0


def test_cms_merge_equals_one_shot_and_partitioning_invariant(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        cms_estimate,
        cms_registers,
        merge_cms_registers,
    )

    pairs = [(i, f"w{i % 40}", 1) for i in range(400)]
    df = spark.createDataFrame(pairs, "i long, term string, cnt long")
    whole = cms_registers(df)
    merged = merge_cms_registers(
        cms_registers(df.where("i % 3 = 0")),
        cms_registers(df.where("i % 3 != 0")),
    )
    probes = df.select("term").distinct()
    a = {r["term"]: r["cms_estimate"] for r in cms_estimate(whole, probes).collect()}
    b = {r["term"]: r["cms_estimate"] for r in cms_estimate(merged, probes).collect()}
    assert a == b
    c = {
        r["term"]: r["cms_estimate"]
        for r in cms_estimate(cms_registers(df.repartition(8)), probes).collect()
    }
    assert a == c


def test_cms_raw_stream_equals_preaggregated(spark):
    """Feeding per-occurrence rows (cnt 1) and pre-aggregated counts
    must build the identical sketch — addition commutes; this is what
    lets the build ride an existing map-side-combined agg."""
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        cms_estimate,
        cms_registers,
    )

    raw = [(f"x{i % 9}", 1) for i in range(90)]
    agg = [(f"x{i}", 10) for i in range(9)]
    probes = spark.createDataFrame([(f"x{i}",) for i in range(9)], "term string")
    a = {
        r["term"]: r["cms_estimate"]
        for r in cms_estimate(
            cms_registers(spark.createDataFrame(raw, "term string, cnt long")), probes
        ).collect()
    }
    b = {
        r["term"]: r["cms_estimate"]
        for r in cms_estimate(
            cms_registers(spark.createDataFrame(agg, "term string, cnt long")), probes
        ).collect()
    }
    assert a == b
    assert all(v >= 10 for v in a.values())


def test_cms_plan_is_jvm_side_and_broadcasts_probe_join(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        cms_estimate,
        cms_registers,
    )

    df = spark.createDataFrame([("a", 1)], "term string, cnt long")
    out = cms_estimate(cms_registers(df), df.select("term"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- histogram quantiles


def test_hist_quantile_brackets_exact_discrete_quantile(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        HIST_WIDTH,
        hist_quantiles,
        hist_registers,
    )

    vals = sorted([7, 15, 16, 33, 40, 100, 101, 200, 555, 1023])
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v long")
    out = hist_quantiles(hist_registers(df, ["k"], "v"), ["k"]).collect()[0]
    n = len(vals)
    for p, lo_col, up_col in ((50, "p50_bin", "p50_upper"), (95, "p95_bin", "p95_upper")):
        exact = vals[(n * p + 99) // 100 - 1]  # discrete ceil-rank rule
        lo = out[lo_col] * HIST_WIDTH
        assert lo <= exact <= out[up_col]  # one-bin-width bracket
    assert out["n_docs"] == n


def test_hist_registers_merge_and_clamp(spark):
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        HIST_BINS,
        hist_registers,
    )

    df = spark.createDataFrame(
        [("k", -5), ("k", 0), ("k", 10**9)], "k string, v long"
    )
    regs = {r["bin"]: r["cnt"] for r in hist_registers(df, ["k"], "v").collect()}
    assert regs[0] == 2  # negatives clamp into bin 0
    assert regs[HIST_BINS - 1] == 1  # overflow absorbs into last bin
    # merge = groupBy sum: two halves equal the whole
    a = hist_registers(df.where("v <= 0"), ["k"], "v")
    b = hist_registers(df.where("v > 0"), ["k"], "v")
    merged = {
        r["bin"]: r["cnt"]
        for r in a.unionByName(b)
        .groupBy("k", "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == regs


def test_hist_quantile_window_is_bounded_by_bins(spark):
    """The cumulative window runs over the AGGREGATED register table:
    partitions hold at most HIST_BINS rows however many input rows a
    key has."""
    from medical_and_charity_document_extraction_system_spark.operators.sketches import (
        HIST_BINS,
        hist_registers,
    )

    df = spark.createDataFrame(
        [("k", i % 500) for i in range(5000)], "k string, v long"
    )
    regs = hist_registers(df, ["k"], "v")
    assert regs.groupBy("k").count().collect()[0]["count"] <= HIST_BINS
