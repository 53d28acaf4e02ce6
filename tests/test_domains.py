"""Registrable-domain (eTLD+1) extraction (functions/domains.py)."""

import duckdb
import pyspark.sql.functions as F

from medical_and_charity_document_extraction_system_spark.functions.domains import (
    registrable_domain,
    registrable_domain_py,
    registrable_domain_sql,
)

CASES = {
    "www.example.co.uk": "example.co.uk",
    "a.b.c.example.co.uk": "example.co.uk",
    "example.co.uk": "example.co.uk",
    "user.github.io": "user.github.io",
    "deep.user.github.io": "user.github.io",
    "www.example.com": "example.com",
    "sub.a.example.com": "example.com",
    "example.org": "example.org",
    "blog.site.com.au": "site.com.au",
    "my.blogspot.com": "my.blogspot.com",
    "localhost": "localhost",
    # a host EQUAL to a suffix passes through in all three engines
    # (regression: the Spark/DuckDB equality branch once returned '')
    "co.uk": "co.uk",
    "github.io": "github.io",
}


def test_python_reference_cases():
    for host, want in CASES.items():
        assert registrable_domain_py(host) == want, host


def test_three_engine_parity(spark):
    hosts = sorted(CASES)
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got_spark = {
        r["host"]: r["site"]
        for r in df.select("host", registrable_domain(F.col("host")).alias("site")).collect()
    }
    vals = ", ".join(f"('{h}')" for h in hosts)
    got_duck = dict(
        duckdb.sql(
            f"SELECT host, {registrable_domain_sql('host')} AS site "
            f"FROM (VALUES {vals}) t(host)"
        ).fetchall()
    )
    assert got_spark == CASES
    assert got_duck == CASES


def test_plan_is_jvm_side(spark):
    df = spark.createDataFrame([("a.co.uk",)], "host string")
    out = df.select(registrable_domain(F.col("host")).alias("s"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
