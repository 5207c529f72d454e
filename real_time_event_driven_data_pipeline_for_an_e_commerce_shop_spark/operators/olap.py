"""General OLAP operators over the TPC-H-ish testdata.

The reference's only aggregations are the two KPI group-bys (SURVEY.md
§2.4) and it has zero sorts/limits/windows/set-ops (§2.5); this module
rounds out that missing surface with the classic shapes a user of a
batch analytics engine expects, each chosen to exercise a distinct
physical plan:

* pricing_summary — wide multi-aggregate groupBy (TPC-H Q1 shape):
  map-side partial agg, one shuffle on a low-cardinality key.
* top_customers — fact⋈dim join + agg + global top-k: the orders-side
  agg shrinks the data *before* the window, so the top-k window sees
  |customers| rows, not |orders|.
* region_revenue — 4-table broadcast chain (region⋈nation⋈customer⋈
  orders): every dim broadcast, zero shuffle until the final agg.
* order_priority_counts — EXISTS-style semi-join + count (Q4 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import det_round, exact_sum, ratio


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/means over all
    shipped rows. ``disc_price = extprice*(1-discount)`` is det-rounded
    to 4 dp before the exact decimal sum (functions/core.py)."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    agg = (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            exact_sum(disc_price, 4).alias("sum_disc_price"),
            exact_sum(charge, 6).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        det_round(ratio(F.col("sum_qty"), F.col("count_order")), 4).alias("avg_qty"),
        det_round(ratio(F.col("sum_base_price"), F.col("count_order")), 4).alias(
            "avg_price"
        ),
        "count_order",
    )


def top_customers(
    orders: DataFrame, customer: DataFrame, k: int = 10
) -> DataFrame:
    """Top-k customers by lifetime order revenue. Aggregate first (shrink
    to |customers|), broadcast-join the dim after, window last."""
    per_cust = orders.groupBy("o_custkey").agg(
        exact_sum(F.col("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    joined = per_cust.join(
        F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
        per_cust.o_custkey == customer.c_custkey,
        "inner",
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        joined.withColumn("revenue_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("revenue_rank") <= k)
        .select(
            "revenue_rank", "c_custkey", "c_name", "c_mktsegment", "revenue", "n_orders"
        )
    )


def region_revenue(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Revenue per region: a broadcast-chain star join — region and
    nation are tiny, customer is broadcastable at any realistic scale
    relative to orders; only the final groupBy shuffles (5 groups)."""
    dim = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name")
        .agg(
            exact_sum(F.col("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: orders having ≥1 lineitem shipped after order
    date, counted per priority — a left-semi join feeding an agg."""
    late = lineitem.filter(F.col("l_shipdate") > F.lit("1995-01-01")).select(
        "l_orderkey"
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
