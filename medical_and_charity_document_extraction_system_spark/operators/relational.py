"""Relational analytics classics over the TPC-H-ish harness tables:
the wide decimal pricing summary, the sort-limit top-k join, and the
EXISTS semi-join — the three canonical plan shapes (scan-heavy agg,
join + TakeOrdered, semi-join) a general engine must get right,
adapted to the columns the harness actually ships (there is no
commit/receipt date pair, so "late" means shipped more than a fixed
lag after the order date).

Float discipline (the nation_revenue precedent): all money arithmetic
stays in DECIMAL until one final double cast. ``ext*(1-disc)`` and
``ext*(1-disc)*(1+tax)`` widen to scale 4 / 6 decimals — exact in
both engines, order-free under any aggregation schedule.

Scale shapes:

* ``pricing_summary``: ONE scan with the date filter pushed to the
  parquet reader, one map-side-combinable agg onto a handful of
  (returnflag, linestatus) groups. The TPC-H Q1 shape: bandwidth
  bound, no shuffle of note.
* ``segment_top_orders``: dim-filtered customer broadcast into
  orders, the surviving orders shuffled against lineitem, then
  TakeOrdered(k) — a per-partition top-k + single driver merge of
  k-row heaps, NEVER a global sort (Q3 shape). Ties on revenue break
  by orderkey so the limit edge is deterministic.
* ``late_order_priorities``: the distinct-late-lineitem side is
  aggregated to orderkeys BEFORE a left-semi join (EXISTS), so a
  many-line order contributes one probe row (Q4 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _one() -> F.Column:
    # built lazily: F.lit needs an active session, and this module
    # must be importable before one exists
    return F.lit(1).cast("decimal(18,2)")


def pricing_summary(
    lineitem: DataFrame, ship_cutoff: str = "1998-09-01"
) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) decimal totals of
    quantity, base price, discounted price, and charge over lineitems
    shipped on/before the cutoff. Count is exact; every sum is an
    exact decimal cast to double once."""
    disc_price = _dec("l_extendedprice") * (_one() - _dec("l_discount"))
    charge = disc_price * (_one() + _dec("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(ship_cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def segment_top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: revenue of lineitems shipped after the cutoff,
    for orders placed before it by customers of one market segment;
    top ``k`` orders by (revenue DESC, orderkey). The segment filter
    makes customer broadcast-sized; orderBy().limit() compiles to
    TakeOrdered — per-partition heaps, no global sort. Revenue is
    exact decimal, exported as double AFTER the ordering, so the
    top-k edge is decided on exact values."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    o = orders.where(F.col("o_orderdate") < F.lit(cutoff)).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.where(F.col("l_shipdate") > F.lit(cutoff)).select(
        "l_orderkey",
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    return (
        o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.sum("rev").alias("revenue_dec"),
            F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
                "o_orderdate_us"
            ),
        )
        .orderBy(F.col("revenue_dec").desc(), "o_orderkey")
        .limit(k)
        .select(
            "o_orderkey",
            "o_orderdate_us",
            F.col("revenue_dec").cast("double").alias("revenue"),
        )
    )


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue of one region's local trade
    (customer and supplier in the same nation) for orders placed in a
    date window. Plan: the region filter reduces nation to a handful
    of rows which broadcast into customer AND supplier first — both
    fact-side joins then carry only region-local rows; the one real
    shuffle is lineitem against the date-filtered orders. Revenue is
    the exact decimal ``ext*(1-disc)`` summed per nation, exported as
    double once."""
    nat = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == region_name)),
            nation["n_regionkey"] == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", "n_name", F.col("c_nationkey").alias("cnk"))
    supp = supplier.join(
        F.broadcast(nat.select("n_nationkey")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"])
        .join(
            supp,
            (F.col("l_suppkey") == supp["s_suppkey"])
            & (F.col("s_nationkey") == F.col("cnk")),
        )
        .groupBy("n_name")
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    month_start: str = "1997-09-01",
    month_end: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue coming from
    promo-type parts. The ratio is integer basis points: revenue has
    decimal scale 4, so ``rev * 10000`` is integral and casts to
    bigint exactly in both engines — the share is one integer floor
    division, never a float divide. The two revenue exports are exact
    decimal sums cast to double once. Part is the broadcast dim."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(month_start))
        & (F.col("l_shipdate") < F.lit(month_end))
    ).select(
        "l_partkey",
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        li["l_partkey"] == F.col("p_partkey"),
    )
    is_promo = F.col("p_type") == "PROMO"
    zero = F.lit(0).cast("decimal(18,4)")
    units = (F.col("rev") * F.lit(10000)).cast("long")
    return j.agg(
        F.sum(F.when(is_promo, F.col("rev")).otherwise(zero))
        .cast("double")
        .alias("promo_rev"),
        F.sum("rev").cast("double").alias("total_rev"),
        F.sum(F.when(is_promo, units).otherwise(F.lit(0))).alias("promo_units"),
        F.sum(units).alias("total_units"),
    ).select(
        "promo_rev",
        "total_rev",
        F.expr("promo_units * 10000 div greatest(total_units, 1)")
        .cast("long")
        .alias("promo_share_bp"),
    )


def parts_supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#9",
) -> DataFrame:
    """TPC-H Q16 shape adapted to the harness (no partsupp table —
    the part↔supplier relation is the DISTINCT (partkey, suppkey)
    pair set observed in lineitem): distinct suppliers per
    (brand, type, size), excluding one brand and every supplier with
    a negative account balance (the complaints anti-join analog).
    Plan: the pair distinct is the one heavy shuffle (map-side
    combinable); the negative-balance set and the filtered part dim
    broadcast."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pt = part.where(F.col("p_brand") != exclude_brand).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    return (
        pairs.join(
            F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti"
        )
        .join(F.broadcast(pt), pairs["l_partkey"] == pt["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


def large_order_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: int = 250,
) -> DataFrame:
    """TPC-H Q18 shape: customers whose orders exceed ``min_qty``
    total quantity. The HAVING aggregate runs FIRST (lineitem →
    per-order decimal quantity sum, map-side combinable), so only the
    rare big orders ever join orders/customer — AQE broadcasts the
    surviving key set. Quantity stays an exact decimal through the
    threshold compare; o_totalprice passes through untouched."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sum_qty_dec"))
        .where(F.col("sum_qty_dec") > F.lit(min_qty).cast("decimal(18,2)"))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "o_orderdate_us"
            ),
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
    )


def part_skyline(part: DataFrame) -> DataFrame:
    """2-D skyline (pareto frontier) of parts: cheaper is better,
    bigger is better — a part survives iff no other part is ≥ as big
    AND ≤ as cheap with one strict. Never an all-pairs dominance
    join: aggregate to the min price per size (bounded domain, ≤ a
    few hundred sizes), take a running strict-min window over sizes
    DESC on that TINY agg table (the hist_quantiles safe-window
    pattern — never over raw rows), keep sizes whose min price beats
    every larger size, and join back to parts at (size, min price).
    Equal (price, size) twins don't dominate each other, so all parts
    at a surviving corner are skyline members. Prices are compared,
    never combined — no float arithmetic."""
    from pyspark.sql import Window

    mp = part.groupBy("p_size").agg(F.min("p_retailprice").alias("mp"))
    w = (
        Window.orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    corners = (
        mp.withColumn("best_larger", F.min("mp").over(w))
        .where(F.col("best_larger").isNull() | (F.col("mp") < F.col("best_larger")))
        # renamed: corners descends from `part`, so keeping p_size
        # would make the join condition an ambiguous self-reference
        .select(F.col("p_size").alias("k_size"), F.col("mp").alias("k_price"))
    )
    return part.join(
        F.broadcast(corners),
        (part["p_size"] == corners["k_size"])
        & (part["p_retailprice"] == corners["k_price"]),
    ).select("p_partkey", "p_name", "p_size", "p_retailprice")


def order_count_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str = "4-NOT SPECIFIED",
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts
    including the zero bucket — a LEFT OUTER join (customers with no
    surviving orders still emit a row), a per-customer count of
    NON-NULL orderkeys (count(col) semantics, identical in both
    engines), then a second aggregation onto the tiny count domain.
    Integer-only output.

    Scale shape: the outer join and the first groupBy share the
    customer key, so the per-customer count reuses the join's
    partitioning (one real shuffle); the distribution agg runs on a
    domain bounded by the max orders-per-customer."""
    o = orders.where(F.col("o_orderpriority") != exclude_priority).select(
        "o_custkey", "o_orderkey"
    )
    per = (
        customer.select("c_custkey")
        .join(o, customer["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


_Q19_CLAUSES = (
    ("Brand#3", 1, 15, 1, 11),
    ("Brand#12", 10, 30, 10, 20),
    ("Brand#21", 20, 50, 20, 30),
)


def disjunctive_part_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    clauses: tuple[tuple[str, int, int, int, int], ...] = _Q19_CLAUSES,
) -> DataFrame:
    """TPC-H Q19 shape: one disjunction of (brand, size-range,
    quantity-range) conjuncts across the part/lineitem join. The
    point of the shape is predicate handling: the quantity bounds
    hit only lineitem columns and the size/brand bounds only part
    columns, so each side's scan can prune with the UNION of its own
    bounds before the join, and the exact mixed disjunction is
    re-evaluated on the joined row. Part broadcasts. One output row:
    exact decimal revenue (double once) + line count.

    Quantity is compared as an exact decimal (the harness ships it as
    a 2-dp double) so the range edges can never straddle a float
    rounding difference between engines."""
    qty = _dec("l_quantity")
    li_pre = None
    pred = None
    for brand, slo, shi, qlo, qhi in clauses:
        qpart = (qty >= F.lit(qlo).cast("decimal(18,2)")) & (
            qty <= F.lit(qhi).cast("decimal(18,2)")
        )
        li_pre = qpart if li_pre is None else (li_pre | qpart)
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & qpart
        )
        pred = c if pred is None else (pred | c)
    li = lineitem.where(li_pre).select(
        "l_partkey",
        _dec("l_quantity").alias("l_quantity_dec"),
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    # re-state the disjunction over the projected column names
    full = None
    for brand, slo, shi, qlo, qhi in clauses:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & (F.col("l_quantity_dec") >= F.lit(qlo).cast("decimal(18,2)"))
            & (F.col("l_quantity_dec") <= F.lit(qhi).cast("decimal(18,2)"))
        )
        full = c if full is None else (full | c)
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .where(full)
        .agg(
            F.sum("rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def waiting_suppliers(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), rewritten
    from the classic EXISTS + NOT EXISTS double self-join into ONE
    per-order aggregation: an order blames supplier s iff it has ≥2
    distinct suppliers and s is its ONLY late one (shipped more than
    ``late_days`` after the order date — the harness has no
    commit/receipt dates). ``count(distinct late supplier) = 1``
    plus ``min(late supplier)`` recovers the culprit without ever
    joining lineitem to itself — the self-join form touches every
    (line, line) pair of a hot order, this form touches each line
    once.

    Scale shape: one lineitem↔orders shuffle, one map-side-
    combinable per-order agg, then a broadcast join to supplier."""
    lag_us = late_days * 86_400_000_000
    o = orders.select(
        "o_orderkey",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
    )
    late = F.col("ship_us") > F.col("od_us") + F.lit(lag_us)
    per_order = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            per_order["late_supp"] == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


def prospect_balances(
    customer: DataFrame, orders: DataFrame, since: str = "2000-06-01"
) -> DataFrame:
    """TPC-H Q22 shape (adapted: no phone column — group by nation):
    customers with no orders since ``since`` (lapsed buyers) whose
    balance beats the average positive balance, counted and totalled
    per nation. The scalar "average" subquery never divides: balances
    are lifted to exact integer CENTS (decimal(18,2) * 100 → bigint,
    exact in both engines) and the comparison is cross-multiplied —
    ``cents * n_pos > total_cents`` — so the threshold edge is
    decided on integers.

    Scale shape: the positive-balance aggregate is ONE row
    broadcast-crossed into customer (a 1-row BroadcastNestedLoop is
    free at any scale); the lapsed test is a left-anti join against
    the distinct recent-buyer keys, with the date filter pushed to
    the orders scan."""
    cents = (_dec("c_acctbal") * F.lit(100)).cast("long")
    stats = (
        customer.where(_dec("c_acctbal") > F.lit(0).cast("decimal(18,2)"))
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(cents).alias("total_cents"),
        )
    )
    qual = (
        customer.select("c_custkey", "c_nationkey", cents.alias("bal_cents"))
        .crossJoin(F.broadcast(stats))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("total_cents"))
    )
    buyers = (
        orders.where(F.col("o_orderdate") >= F.lit(since))
        .select("o_custkey")
        .distinct()
    )
    return (
        qual.join(buyers, qual["c_custkey"] == buyers["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prospects"),
            F.sum("bal_cents").cast("long").alias("total_bal_cents"),
        )
    )


def late_order_priorities(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 90
) -> DataFrame:
    """TPC-H Q4 shape (adapted: "late" = any lineitem shipped more
    than ``late_days`` after the order date): order counts per
    priority among late orders, via a left-semi join against the
    aggregated late-orderkey set. The lag compares exact epoch
    microseconds — no interval/timezone arithmetic to disagree on."""
    lag_us = late_days * 86_400_000_000
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    li = lineitem.select(
        "l_orderkey",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
    )
    late_keys = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .where(F.col("ship_us") > F.col("od_us") + F.lit(lag_us))
        .select("o_orderkey")
        .distinct()
    )
    return (
        o.join(late_keys, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_late_orders"))
    )


def forecast_revenue(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: str = "0.03",
    disc_hi: str = "0.05",
    qty_max: int = 24,
) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue of eliminating a discount
    band — ``sum(ext * disc)`` over one year of shipments with the
    discount in [lo, hi] and quantity under a cap. The canonical
    pushdown probe: ALL THREE predicates reach the parquet scan
    (date min/max prune row groups, the numeric filters prune pages),
    and the agg is a single map-side-combinable global sum — zero
    shuffle beyond the one-row combine. Discounts compare as exact
    decimals (doubles like 0.05 are not exactly representable; the
    decimal cast makes the band edges identical in both engines)."""
    d_lo = F.lit(disc_lo).cast("decimal(18,2)")
    d_hi = F.lit(disc_hi).cast("decimal(18,2)")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
            & _dec("l_discount").between(d_lo, d_hi)
            & (F.col("l_quantity") < F.lit(qty_max))
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("forecast_revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


def nation_trade_volume(
    customer: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1995-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations per
    direction and year — supplier in one, customer in the other.
    Plan: nation filters to TWO rows which broadcast into supplier
    and customer (both fact dims shrink to ~2/|N| of their rows
    before any shuffle); lineitem joins date-filtered orders on
    orderkey (the one big shuffle), then the two tiny dims; the
    cross-pair predicate keeps only (a,b)/(b,a). Year comes from the
    ship date (integer extract, identical in both engines); revenue
    is the exact decimal export."""
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b)).select(
        "n_nationkey", "n_name"
    )
    supp = supplier.join(
        F.broadcast(nat), supplier["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == nat["n_nationkey"]
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    return (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == cust["c_custkey"])
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


def returned_item_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: the ``k`` customers who returned the most
    revenue (returnflag = 'R') on orders placed in one quarter. The
    orders date filter cuts the fact side before the lineitem
    shuffle; the per-customer agg keys on custkey ALONE (never the
    name/acctbal payload — those join back after, against the
    ALREADY top-k'd 20 rows, so the wide customer row is touched 20
    times, not |customers|). Top-k orders on the EXACT decimal
    revenue with custkey ties, compiling to TakeOrdered — partition
    heaps, no global sort."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    per_cust = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev_dec"))
        .orderBy(F.col("rev_dec").desc(), F.col("o_custkey"))
        .limit(k)
    )
    wide = customer.join(
        F.broadcast(nation),
        customer["c_nationkey"] == nation["n_nationkey"],
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    return (
        per_cust.join(wide, per_cust["o_custkey"] == wide["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
    )


def shipping_priority_classes(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode column, so the lines
    partition by linestatus; "late" = shipped more than ``late_days``
    after the order date): per linestatus, how many late lines belong
    to critical-priority orders (1-URGENT / 2-HIGH) vs the rest. One
    orderkey shuffle join, conditional counts as CASE sums — the
    classic pivot-by-predicate agg. The lag compares exact epoch
    micros (late_order_priorities precedent)."""
    lag_us = late_days * 86_400_000_000
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    li = lineitem.select(
        "l_orderkey",
        "l_linestatus",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_us"),
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .where(F.col("ship_us") > F.col("od_us") + F.lit(lag_us))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("n_critical"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("n_regular"),
        )
    )


def top_revenue_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-07-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose half-year revenue equals
    the maximum — ALL ties survive, which is why the comparison runs
    on the EXACT decimal (a double max could disagree with a double
    sum on which rows tie). Plan: per-supplier decimal agg, then the
    one-row global max broadcast back as an equi-filter; the wide
    supplier row joins only the surviving keys."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _dec("l_extendedprice") * (_one() - _dec("l_discount"))
            ).alias("rev_dec")
        )
    )
    mx = rev.agg(F.max("rev_dec").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx), rev["rev_dec"] == F.col("max_rev"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              rev["l_suppkey"] == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#1",
    num: int = 1,
    den: int = 5,
) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in small orders — lines of one
    brand's parts whose quantity is under ``num/den`` of that part's
    average quantity. The correlated average becomes a re-aggregation:
    the brand filter broadcasts part into lineitem ONCE, per-part
    (sum, count) re-aggregates that SAME join output (never a second
    scan), and the threshold joins back on partkey. The fraction
    compares as cross-multiplied integer cents — ``qty*den*cnt <
    sum_qty*num`` — no float division anywhere; the single
    avg-per-week export is ONE double division of identical operands
    in both engines."""
    qcents = (_dec("l_quantity") * 100).cast("long")
    li = lineitem.join(
        F.broadcast(
            part.where(F.col("p_brand") == brand).select("p_partkey")
        ),
        lineitem["l_partkey"] == F.col("p_partkey"),
    ).select(
        "l_partkey",
        qcents.alias("qcents"),
        _dec("l_extendedprice").alias("price"),
    )
    thresh = li.groupBy("l_partkey").agg(
        F.sum("qcents").alias("sum_qcents"),
        F.count(F.lit(1)).alias("n_part_lines"),
    ).withColumnRenamed("l_partkey", "t_partkey")
    small = li.join(
        thresh, li["l_partkey"] == F.col("t_partkey")
    ).where(
        F.col("qcents") * den * F.col("n_part_lines")
        < F.col("sum_qcents") * num
    )
    return small.agg(
        F.sum("price").cast("double").alias("total_revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        (F.sum("price").cast("double") / F.lit(7.0)).alias("avg_weekly"),
    )


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    supp_nation: str = "NATION_1",
) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's
    import market per order year — a conditional share-of-group.
    Numerator and denominator ride the SAME aggregate row, and the
    share is one integer floor division over per-row scale-4 units
    (``rev * 10000`` is integral and casts to bigint exactly — the
    promo_revenue_share rule; no float division). The region's
    nation keys broadcast into customer (a LEFT-SEMI probe — the
    fact row needs no customer payload); the supplier dim broadcasts
    with its nation name; one orderkey shuffle."""
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == F.col("n_nationkey")
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = lineitem.select(
        "l_orderkey",
        "l_suppkey",
        (_dec("l_extendedprice") * (_one() - _dec("l_discount"))).alias("rev"),
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, F.col("o_custkey") == cust["c_custkey"], "left_semi")
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
    )
    is_nat = F.col("supp_nation") == supp_nation
    zero = F.lit(0).cast("decimal(18,4)")
    units = (F.col("rev") * F.lit(10000)).cast("long")
    return (
        j.groupBy("order_year")
        .agg(
            F.sum(F.when(is_nat, F.col("rev")).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum("rev").cast("double").alias("total_revenue"),
            F.sum(F.when(is_nat, units).otherwise(F.lit(0))).alias("_nu"),
            F.sum(units).alias("_tu"),
        )
        .select(
            "order_year",
            "nation_revenue",
            "total_revenue",
            F.expr("_nu * 10000 div greatest(_tu, 1)")
            .cast("long")
            .alias("share_bp"),
        )
    )


def nation_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    part_token: str = "widget",
) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so unit cost is the
    part's retail price): profit = ``ext*(1-disc) - retail*qty`` per
    supplier nation per order year, over parts whose name contains a
    token. Both profit terms are exact decimals on the SAME row
    before the sum (scale 4 / scale 4 after widening), so the export
    is order-free. The name-filtered part dim and the
    supplier->nation dim broadcast; lineitem shuffles once on
    orderkey for the year."""
    p = part.where(F.col("p_name").contains(part_token)).select(
        "p_partkey", _dec("p_retailprice").alias("retail")
    )
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (
            _dec("l_extendedprice") * (_one() - _dec("l_discount"))
        ).alias("rev"),
        _dec("l_quantity").alias("qty"),
    )
    o = orders.select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("order_year")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    profit = F.col("rev") - F.col("retail") * F.col("qty")
    return (
        j.groupBy("supp_nation", "order_year")
        .agg(F.sum(profit).cast("double").alias("profit"))
    )
