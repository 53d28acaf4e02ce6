"""Mojibake rule-table parity across the three engines
(functions/mojibake.py) and chain-safety properties."""

import duckdb
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from medical_and_charity_document_extraction_system_spark.functions import mojibake as mj


def test_rules_are_derived_round_trips():
    for bad, good in mj.MOJIBAKE_RULES:
        assert bad == good.encode("utf-8").decode("latin-1")
        assert len(good) == 1 and ord(good) > 127


def test_rule_set_closed_no_cross_triggering():
    """No rule's good char may appear in any rule's bad sequence —
    the property that makes both chains order-safe."""
    bad_chars = {c for bad, _ in mj.MOJIBAKE_RULES for c in bad}
    good_chars = {good for _, good in mj.MOJIBAKE_RULES}
    assert not (bad_chars & good_chars)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.sampled_from(list(mj.MOJIBAKE_CHARS) + list(" abcZ09.")), max_size=40))
def test_corrupt_repair_round_trip_py(s):
    assert mj.repair_py(mj.corrupt_py(s)) == s
    # idempotence: a repaired string has no artifacts left
    assert mj.repair_py(mj.repair_py(mj.corrupt_py(s))) == s


def test_three_engine_parity(spark):
    s = "café — “q” naïve… ascii tail"
    c = mj.corrupt_py(s)
    # duckdb
    got = duckdb.sql(
        f"SELECT {mj.repair_sql_expr(mj.corrupt_sql_expr('x'))} AS y "
        f"FROM (SELECT '{s}' AS x)"
    ).fetchone()[0]
    assert got == s
    # spark
    df = spark.createDataFrame([(s,)], "x string")
    r = df.select(
        mj.corrupt_mojibake(F.col("x")).alias("c"),
        mj.repair_mojibake(mj.corrupt_mojibake(F.col("x"))).alias("r"),
    ).collect()[0]
    assert r["c"] == c and r["r"] == s


def test_plain_ascii_untouched(spark):
    s = "no accents here at all 123"
    assert mj.corrupt_py(s) == s
    assert mj.repair_py(s) == s


def test_repair_plan_is_jvm_side(spark):
    df = spark.createDataFrame([("x",)], "t string")
    out = df.select(mj.repair_mojibake(F.col("t")).alias("y"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
