"""Second relational batch (operators/relational.py): Q6 pushdown
band, Q7 nation pair, Q10 top-k returns, Q12 priority classes,
Q15 max-tie survival, Q17 correlated-average cross-multiply."""

from datetime import datetime

from medical_and_charity_document_extraction_system_spark.operators.relational import (
    forecast_revenue,
    nation_trade_volume,
    returned_item_customers,
    shipping_priority_classes,
    small_quantity_revenue,
    top_revenue_suppliers,
)

_D = datetime


def _li(spark, rows):
    # (orderkey, partkey, suppkey, qty, price, disc, flag, shipdate)
    return spark.createDataFrame(
        [
            (o, p, s, q, pr, d, 0.0, fl, "O", ts)
            for (o, p, s, q, pr, d, fl, ts) in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )


def test_forecast_revenue_band_edges_are_decimal_inclusive(spark):
    t = _D(1996, 6, 1)
    li = _li(
        spark,
        [
            (1, 1, 1, 10.0, 100.0, 0.03, "N", t),  # lo edge: in
            (2, 1, 1, 10.0, 100.0, 0.05, "N", t),  # hi edge: in
            (3, 1, 1, 10.0, 100.0, 0.06, "N", t),  # above band: out
            (4, 1, 1, 24.0, 100.0, 0.04, "N", t),  # qty == cap: out
            (5, 1, 1, 10.0, 100.0, 0.04, "N", _D(1994, 1, 1)),  # date: out
        ],
    )
    r = forecast_revenue(li).collect()[0]
    assert r.n_lines == 2
    assert r.forecast_revenue == 100.0 * 0.03 + 100.0 * 0.05


def test_nation_trade_both_directions_never_same_nation(spark):
    nation = spark.createDataFrame(
        [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(10, "s10", 1, 0.0), (20, "s20", 2, 0.0), (30, "s30", 3, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    customer = spark.createDataFrame(
        [(100, "c", 2, 0.0, "BUILDING"), (200, "c", 1, 0.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(1, 100, "O", 0.0, _D(1996, 1, 1), "5-LOW"),
         (2, 200, "O", 0.0, _D(1996, 1, 1), "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            (1, 1, 10, 1.0, 100.0, 0.0, "N", _D(1996, 5, 1)),  # 1 -> 2
            (2, 1, 20, 1.0, 50.0, 0.0, "N", _D(1997, 5, 1)),  # 2 -> 1
            (1, 1, 20, 1.0, 70.0, 0.0, "N", _D(1996, 5, 1)),  # 2 -> 2: out
            (2, 1, 30, 1.0, 99.0, 0.0, "N", _D(1996, 5, 1)),  # n3: out
        ],
    )
    out = {
        (r.supp_nation, r.cust_nation, r.ship_year): r.revenue
        for r in nation_trade_volume(
            customer, orders, supplier, li, nation
        ).collect()
    }
    assert out == {
        ("NATION_1", "NATION_2", 1996): 100.0,
        ("NATION_2", "NATION_1", 1997): 50.0,
    }


def test_returned_customers_topk_ties_and_flag(spark):
    nation = spark.createDataFrame(
        [(1, "NATION_1", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    customer = spark.createDataFrame(
        [(c, f"c{c}", 1, 5.0, "AUTO") for c in (1, 2, 3)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(o, o, "O", 0.0, _D(1996, 2, 1), "5-LOW") for o in (1, 2, 3)],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 100.0, 0.0, "R", _D(1996, 3, 1)),
            (2, 1, 1, 1.0, 100.0, 0.0, "R", _D(1996, 3, 1)),  # tie with c1
            (3, 1, 1, 1.0, 500.0, 0.0, "N", _D(1996, 3, 1)),  # not returned
        ],
    )
    rows = returned_item_customers(
        customer, orders, li, nation, k=1
    ).collect()
    # ties on revenue break by custkey: customer 1 wins the k=1 edge
    assert [(r.c_custkey, r.revenue) for r in rows] == [(1, 100.0)]


def test_priority_classes_lag_is_strict(spark):
    orders = spark.createDataFrame(
        [(1, 1, "O", 0.0, _D(1996, 1, 1), "1-URGENT"),
         (2, 1, "O", 0.0, _D(1996, 1, 1), "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 1.0, 0.0, "N", _D(1996, 3, 2)),  # 61d: late
            (1, 1, 1, 1.0, 1.0, 0.0, "N", _D(1996, 3, 1)),  # 60d: NOT late
            (2, 1, 1, 1.0, 1.0, 0.0, "N", _D(1996, 6, 1)),  # late, regular
        ],
    )
    out = {
        r.l_linestatus: (r.n_critical, r.n_regular)
        for r in shipping_priority_classes(orders, li, late_days=60).collect()
    }
    assert out == {"O": (1, 1)}


def test_top_supplier_decimal_ties_all_survive(spark):
    supplier = spark.createDataFrame(
        [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    t = _D(1996, 3, 1)
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 100.0, 0.1, "N", t),  # 90.00
            (2, 1, 2, 1.0, 90.0, 0.0, "N", t),  # 90.00 — exact tie
            (3, 1, 3, 1.0, 89.0, 0.0, "N", t),
        ],
    )
    out = sorted(
        (r.s_suppkey, r.total_revenue)
        for r in top_revenue_suppliers(supplier, li).collect()
    )
    assert out == [(1, 90.0), (2, 90.0)]


def test_small_quantity_threshold_is_strict_cross_multiply(spark):
    part = spark.createDataFrame(
        [(1, "p", "Brand#1", "t", 1, 0.0), (2, "p", "Brand#2", "t", 1, 0.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    t = _D(1996, 3, 1)
    # part 1 avg qty = 10 -> threshold qty < 2 (num/den = 1/5)
    li = _li(
        spark,
        [
            (1, 1, 1, 1.0, 11.0, 0.0, "N", t),  # 1 < 2: in
            (2, 1, 1, 2.0, 13.0, 0.0, "N", t),  # 2 == 2: OUT (strict)
            (3, 1, 1, 27.0, 17.0, 0.0, "N", t),  # bulk line
            (4, 2, 1, 1.0, 99.0, 0.0, "N", t),  # other brand: out
        ],
    )
    r = small_quantity_revenue(li, part).collect()[0]
    assert (r.n_lines, r.total_revenue) == (1, 11.0)
    assert r.avg_weekly == 11.0 / 7.0


def test_market_share_conditional_share_and_semi_join(spark):
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        market_share,
    )

    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    customer = spark.createDataFrame(
        [(10, "c", 1, 0.0, "A"), (30, "c", 3, 0.0, "A")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    supplier = spark.createDataFrame(
        [(100, "s", 1, 0.0), (200, "s", 2, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    orders = spark.createDataFrame(
        [(1, 10, "O", 0.0, _D(1996, 1, 1), "5-LOW"),
         (2, 30, "O", 0.0, _D(1996, 6, 1), "5-LOW")],  # EUROPE cust: out
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            (1, 1, 100, 1.0, 100.0, 0.0, "N", _D(1996, 2, 1)),  # NATION_1
            (1, 1, 200, 1.0, 300.0, 0.0, "N", _D(1996, 2, 1)),  # NATION_2
            (2, 1, 100, 1.0, 999.0, 0.0, "N", _D(1996, 7, 1)),  # out
        ],
    )
    rows = market_share(
        region, nation, customer, orders, supplier, li
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.order_year, r.nation_revenue, r.total_revenue) == (
        1996, 100.0, 400.0,
    )
    assert r.share_bp == 2500


def test_nation_profit_exact_decimal_measure(spark):
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        nation_profit,
    )

    nation = spark.createDataFrame(
        [(1, "NATION_1", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    supplier = spark.createDataFrame(
        [(100, "s", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(1, "cold widget", "B", "t", 1, 10.0),
         (2, "cold bolt", "B", "t", 1, 10.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    orders = spark.createDataFrame(
        [(1, 10, "O", 0.0, _D(1996, 1, 1), "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = _li(
        spark,
        [
            (1, 1, 100, 3.0, 100.0, 0.1, "N", _D(1996, 2, 1)),  # widget
            (1, 2, 100, 1.0, 500.0, 0.0, "N", _D(1996, 2, 1)),  # bolt: out
        ],
    )
    rows = nation_profit(nation, supplier, part, li, orders).collect()
    assert len(rows) == 1
    r = rows[0]
    # 100*(1-0.1) - 10*3 = 60.00 exactly
    assert (r.supp_nation, r.order_year, r.profit) == ("NATION_1", 1996, 60.0)
