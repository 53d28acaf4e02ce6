"""Deterministic dataset split and the Deequ-style constraint suite."""

import pytest

from medical_and_charity_document_extraction_system_spark.operators.mixing import (
    assign_split,
    split_report,
)
from medical_and_charity_document_extraction_system_spark.operators.report import (
    expectations_report,
)


def _docs(spark, n):
    return spark.createDataFrame(
        [(i, f"w{i} w{i} w") for i in range(n)], "doc_id long, text string"
    )


def test_split_is_superset_stable(spark):
    # THE property vs a random split: growing the corpus never moves
    # an existing document's split
    small = {
        r.doc_id: r.split for r in assign_split(_docs(spark, 200)).collect()
    }
    big = {
        r.doc_id: r.split for r in assign_split(_docs(spark, 1000)).collect()
    }
    assert all(big[k] == v for k, v in small.items())
    assert set(big.values()) == {"train", "val", "test"}


def test_split_shares_and_token_totals(spark):
    rows = split_report(_docs(spark, 2000)).collect()
    assert sum(r.n_docs for r in rows) == 2000
    assert sum(r.n_tokens for r in rows) == 2000 * 3
    by = {r.split: r for r in rows}
    # md5 buckets are near-uniform: train ~90%, each share_bp exact
    assert 8500 < by["train"].share_bp < 9500
    for r in rows:
        assert r.share_bp == r.n_docs * 10000 // 2000


def test_split_rejects_bad_percentages(spark):
    with pytest.raises(ValueError):
        assign_split(_docs(spark, 1), train_pct=95, val_pct=5)


def test_expectations_pass_fail_and_null_handling(spark):
    t = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, 99999.0)], "k long, v double"
    )
    out = {
        (r.check_type, r.target): (r.observed, r.passed)
        for r in expectations_report(
            {"t": t},
            [
                ("row_count_min", "t", "", 5, 0),  # 3 < 5: fail
                ("not_null", "t", "v", 0, 0),  # one NULL: fail
                ("unique", "t", "k", 0, 0),  # k=2 twice: fail
                ("value_range", "t", "v", 0, 100),  # 99999 out: fail
            ],
        ).collect()
    }
    assert out[("row_count_min", "t")] == (3, 0)
    assert out[("not_null", "t.v")] == (1, 0)
    assert out[("unique", "t.k")] == (1, 0)
    # NULL values are exempt from the range check (only 99999 flags)
    assert out[("value_range", "t.v")] == (1, 0)


def test_expectations_single_scan_per_table(spark):
    import contextlib
    import io

    t = spark.createDataFrame([(1, 1.0)], "k long, v double")
    df = expectations_report(
        {"t": t},
        [
            ("row_count_min", "t", "", 1, 0),
            ("not_null", "t", "v", 0, 0),
            ("unique", "t", "k", 0, 0),
        ],
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    # one source, all checks on one aggregate row
    assert buf.getvalue().count("LocalTableScan") <= 2  # agg+distinct split


def test_expectations_unknown_kind_raises(spark):
    t = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        expectations_report({"t": t}, [("median_under", "t", "k", 5, 0)])
