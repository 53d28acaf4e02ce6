"""Relational classics (operators/relational.py): decimal pricing
summary, sort-limit top-k join, EXISTS semi-join."""

from datetime import datetime

from pyspark.sql import functions as F

from medical_and_charity_document_extraction_system_spark.operators.relational import (
    large_order_customers,
    late_order_priorities,
    part_skyline,
    parts_supplier_counts,
    pricing_summary,
    promo_revenue_share,
    regional_revenue,
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

# ---------------------------------------------------------- round-5 batch


def _li_keys(spark, rows):
    # (orderkey, partkey, suppkey, qty, price, disc, shipdate)
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_shipdate timestamp",
    )


def test_regional_revenue_same_nation_only(spark):
    in_win = datetime(1996, 6, 1)
    out_win = datetime(1999, 1, 1)
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "JP", 0), (1, "CN", 0), (2, "FR", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    customer = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 2)], "c_custkey long, c_nationkey int"
    )
    supplier = spark.createDataFrame(
        [(10, 0), (11, 1), (12, 2)], "s_suppkey long, s_nationkey int"
    )
    orders = spark.createDataFrame(
        [(100, 1, in_win), (101, 2, in_win), (102, 1, out_win), (103, 3, in_win)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = _li_keys(
        spark,
        [
            (100, 1, 10, 1.0, 100.0, 0.10, in_win),  # JP/JP -> 90
            (100, 1, 11, 1.0, 50.0, 0.00, in_win),  # cust JP, supp CN: dropped
            (101, 1, 11, 1.0, 40.0, 0.00, in_win),  # CN/CN -> 40
            (102, 1, 10, 1.0, 999.0, 0.0, in_win),  # order outside window
            (103, 1, 12, 1.0, 999.0, 0.0, in_win),  # FR: wrong region
        ],
    )
    got = {
        r.n_name: r.revenue
        for r in regional_revenue(
            region, nation, customer, orders, supplier, li
        ).collect()
    }
    assert got == {"JP": 90.0, "CN": 40.0}


def test_promo_revenue_share_integer_bp(spark):
    d = datetime(1997, 9, 15)
    out = datetime(1997, 10, 15)
    li = _li_keys(
        spark,
        [
            (1, 1, 1, 1.0, 100.0, 0.25, d),  # promo: 75.0000
            (2, 2, 1, 1.0, 225.0, 0.00, d),  # plain: 225.0000
            (3, 1, 1, 1.0, 999.0, 0.00, out),  # outside month
        ],
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    r = promo_revenue_share(li, part).collect()[0]
    assert r.promo_rev == 75.0 and r.total_rev == 300.0
    # 750000 * 10000 div 3000000 = 2500 bp exactly
    assert r.promo_share_bp == 2500


def test_parts_supplier_counts_distinct_and_exclusions(spark):
    d = datetime(1997, 1, 1)
    li = _li_keys(
        spark,
        [
            (1, 1, 10, 1.0, 1.0, 0.0, d),
            (2, 1, 10, 1.0, 1.0, 0.0, d),  # duplicate pair: counts once
            (3, 1, 11, 1.0, 1.0, 0.0, d),  # negative-balance supplier
            (4, 2, 10, 1.0, 1.0, 0.0, d),  # excluded brand
        ],
    )
    part = spark.createDataFrame(
        [(1, "Brand#1", "PROMO", 5), (2, "Brand#9", "PROMO", 5)],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(10, 100.0), (11, -5.0)], "s_suppkey long, s_acctbal double"
    )
    rows = parts_supplier_counts(part, supplier, li).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p_brand, r.supplier_cnt) == ("Brand#1", 1)


def test_large_order_customers_threshold_edge(spark):
    d = datetime(1997, 1, 1)
    li = _li_keys(
        spark,
        [
            (1, 1, 1, 250.0, 1.0, 0.0, d),  # exactly 250: NOT >
            (2, 1, 1, 200.0, 1.0, 0.0, d),
            (2, 1, 1, 50.5, 1.0, 0.0, d),  # 250.5 > 250
        ],
    )
    orders = spark.createDataFrame(
        [(1, 7, d, 10.0), (2, 8, d, 20.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(7, "a"), (8, "b")], "c_custkey long, c_name string"
    )
    rows = large_order_customers(customer, orders, li).collect()
    assert len(rows) == 1
    assert rows[0].o_orderkey == 2 and rows[0].sum_qty == 250.5


def test_part_skyline_dominance_rules(spark):
    part = spark.createDataFrame(
        [
            (1, "dominated-price", 20, 6.0),  # same size, pricier than 2
            (2, "corner-a", 20, 4.0),
            (3, "corner-a-twin", 20, 4.0),  # equal twin: kept too
            (4, "dominated-size", 10, 4.0),  # smaller, same price as 2
            (5, "corner-b", 10, 3.0),  # smaller but strictly cheaper
        ],
        "p_partkey long, p_name string, p_size int, p_retailprice double",
    )
    keys = sorted(r.p_partkey for r in part_skyline(part).collect())
    assert keys == [2, 3, 5]


def test_order_count_distribution_keeps_zero_bucket(spark):
    customer = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "c_custkey long"
    )
    d = datetime(1997, 1, 1)
    orders = spark.createDataFrame(
        [
            (10, 1, d, "1-URGENT"),
            (11, 1, d, "2-HIGH"),
            (12, 2, d, "1-URGENT"),
            (13, 3, d, "4-NOT SPECIFIED"),  # excluded -> cust 3 counts 0
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        order_count_distribution,
    )

    got = {
        r.c_count: r.custdist
        for r in order_count_distribution(customer, orders).collect()
    }
    # cust1 -> 2 orders, cust2 -> 1, cust3 and cust4 -> 0
    assert got == {2: 1, 1: 1, 0: 2}


def test_disjunctive_part_revenue_clause_edges(spark):
    d = datetime(1997, 1, 1)
    li = spark.createDataFrame(
        [
            # (orderkey, partkey, qty, price, disc)
            (1, 100, 11.0, 100.0, 0.0),  # clause 1 qty upper edge: in
            (2, 100, 12.0, 100.0, 0.0),  # qty 12 > 11: out
            (3, 200, 15.0, 200.0, 0.5),  # clause 2: in, rev 100 exact
            (4, 300, 25.0, 50.0, 0.0),   # brand matches no clause: out
        ],
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, l_discount double",
    ).withColumn("l_shipdate", F.lit(d))
    part = spark.createDataFrame(
        [
            (100, "Brand#3", 10),
            (200, "Brand#12", 20),
            (300, "Brand#7", 30),
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        disjunctive_part_revenue,
    )

    row = disjunctive_part_revenue(li, part).collect()[0]
    assert row.n_lines == 2
    assert row.revenue == 200.0  # 100*1.0 + 200*0.5, both exact


def test_waiting_suppliers_sole_late_multi_supplier_rule(spark):
    od = datetime(1997, 1, 1)
    late = datetime(1997, 6, 1)   # 151 days after
    ontime = datetime(1997, 2, 1)
    orders = spark.createDataFrame(
        [(1, od), (2, od), (3, od), (4, od)],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # order 1: suppliers 7, 8; only 7 late -> blame 7
            (1, 7, late),
            (1, 8, ontime),
            # order 2: single supplier late -> no "other supplier" -> skip
            (2, 7, late),
            # order 3: two suppliers BOTH late -> ambiguous -> skip
            (3, 7, late),
            (3, 8, late),
            # order 4: supplier 8 late twice (distinct-count must be 1)
            (4, 8, late),
            (4, 8, late),
            (4, 9, ontime),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supplier = spark.createDataFrame(
        [(7, "s7"), (8, "s8"), (9, "s9")],
        "s_suppkey long, s_name string",
    )
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        waiting_suppliers,
    )

    got = {
        r.s_suppkey: r.numwait
        for r in waiting_suppliers(supplier, orders, li).collect()
    }
    assert got == {7: 1, 8: 1}


def test_prospect_balances_cross_multiplied_threshold(spark):
    customer = spark.createDataFrame(
        [
            # avg positive balance = (300 + 100 + 200) / 3 = 200
            (1, 5, 300.0),   # above avg, no recent order -> prospect
            (2, 5, 100.0),   # below avg -> out
            (3, 6, 200.0),   # equal to avg (strict >) -> out
            (4, 6, -50.0),   # negative: not in the avg, not above -> out
        ],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    recent = datetime(2001, 1, 1)
    old = datetime(1999, 1, 1)
    orders = spark.createDataFrame(
        [(10, 1, old), (11, 2, recent)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        prospect_balances,
    )

    rows = prospect_balances(customer, orders).collect()
    assert len(rows) == 1
    assert rows[0].c_nationkey == 5
    assert rows[0].n_prospects == 1
    assert rows[0].total_bal_cents == 30000


def test_prospect_balances_plan_is_anti_join(spark):
    customer = spark.createDataFrame(
        [(1, 5, 300.0)], "c_custkey long, c_nationkey int, c_acctbal double"
    )
    orders = spark.createDataFrame(
        [(10, 1, datetime(2001, 1, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    from medical_and_charity_document_extraction_system_spark.operators.relational import (
        prospect_balances,
    )

    plan = prospect_balances(customer, orders)._jdf.queryExecution().toString()
    assert "LeftAnti" in plan
