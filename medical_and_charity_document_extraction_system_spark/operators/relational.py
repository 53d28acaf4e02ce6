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
