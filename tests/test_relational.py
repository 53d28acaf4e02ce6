"""Relational classics (operators/relational.py): decimal pricing
summary, sort-limit top-k join, EXISTS semi-join."""

from datetime import datetime

from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.operators.relational import (
    late_order_priorities,
    pricing_summary,
    segment_top_orders,
)


def _li(spark, rows):
    # (orderkey, qty, price, disc, tax, flag, status, shipdate)
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )


def test_pricing_summary_exact_decimals(spark):
    d = datetime(1998, 1, 1)
    late = datetime(1999, 1, 1)
    li = _li(
        spark,
        [
            (1, 10.0, 100.00, 0.10, 0.05, "A", "F", d),
            (2, 5.0, 50.00, 0.00, 0.10, "A", "F", d),
            (3, 1.0, 10.00, 0.50, 0.00, "N", "O", d),
            (4, 99.0, 999.0, 0.99, 0.99, "A", "F", late),  # filtered out
        ],
    )
    out = {
        (r.l_returnflag, r.l_linestatus): r
        for r in pricing_summary(li).collect()
    }
    af = out[("A", "F")]
    assert af.n_lines == 2
    assert af.sum_qty == 15.0
    assert af.sum_base == 150.0
    # 100*0.90 + 50*1.00 = 140 exactly; charge 90*1.05 + 50*1.10 = 149.5
    assert af.sum_disc_price == 140.0
    assert af.sum_charge == 149.5
    assert out[("N", "O")].sum_disc_price == 5.0
    assert ("A", "F") in out and len(out) == 2


def test_pricing_summary_filter_is_pushed(spark, tmp_path):
    d = datetime(1998, 1, 1)
    li = _li(spark, [(1, 1.0, 1.0, 0.0, 0.0, "A", "F", d)])
    p = str(tmp_path / "li")
    li.write.parquet(p)
    plan = (
        pricing_summary(spark.read.parquet(p))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_segment_top_orders_takeordered_and_tiebreak(spark):
    before = datetime(1997, 1, 1)
    after = datetime(1998, 6, 1)
    cust = spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING"), (3, "MACHINERY")],
        "c_custkey long, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, before), (11, 2, before), (12, 1, before), (13, 3, before)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = _li(
        spark,
        [
            # orders 10 and 11 tie at revenue 90.00 -> orderkey breaks it
            (10, 1.0, 100.0, 0.10, 0.0, "A", "F", after),
            (11, 1.0, 90.0, 0.00, 0.0, "A", "F", after),
            (12, 1.0, 10.0, 0.00, 0.0, "A", "F", after),
            (13, 1.0, 999.0, 0.00, 0.0, "A", "F", after),  # wrong segment
        ],
    )
    out = segment_top_orders(cust, orders, li, k=2)
    rows = out.collect()
    assert [r.o_orderkey for r in rows] == [10, 11]
    assert [r.revenue for r in rows] == [90.0, 90.0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heaps, not a global sort


def test_late_orders_semi_join_counts_each_order_once(spark):
    d0 = datetime(2000, 1, 1)
    late_ship = datetime(2000, 6, 1)  # 152 days later
    ok_ship = datetime(2000, 2, 1)  # 31 days later
    orders = spark.createDataFrame(
        [(1, "1-URGENT", d0), (2, "1-URGENT", d0), (3, "2-HIGH", d0)],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = _li(
        spark,
        [
            # order 1: TWO late lines -> still one late order
            (1, 1.0, 1.0, 0.0, 0.0, "A", "F", late_ship),
            (1, 1.0, 1.0, 0.0, 0.0, "A", "F", late_ship),
            (2, 1.0, 1.0, 0.0, 0.0, "A", "F", ok_ship),
            (3, 1.0, 1.0, 0.0, 0.0, "A", "F", late_ship),
        ],
    )
    out = late_order_priorities(orders, li)
    got = {r.o_orderpriority: r.n_late_orders for r in out.collect()}
    assert got == {"1-URGENT": 1, "2-HIGH": 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
