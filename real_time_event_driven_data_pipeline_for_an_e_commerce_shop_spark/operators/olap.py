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

from ..functions.core import MONEY_DECIMAL, det_round, exact_sum, ratio


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


def revenue_forecast(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.08,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape: filter-heavy single-pass revenue delta.

    All four predicates are plain column comparisons, so they push into
    the parquet scan (min/max row-group skipping at scale) and the
    whole query is one scan + one 1-row aggregate — zero joins, the
    cheapest possible plan shape.
    """
    sel = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
        & (F.col("l_discount") >= F.lit(disc_lo))
        & (F.col("l_discount") <= F.lit(disc_hi))
        & (F.col("l_quantity") < F.lit(max_qty))
    )
    return sel.agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def shipping_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top-k open orders by discounted revenue for one
    market segment. Aggregate to |orders| first, then a single global
    top-k window over the (small) aggregate — never over line items."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    open_orders = (
        orders.filter(F.col("o_orderdate") < F.lit(cutoff))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev = (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff))
        .join(open_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("o_orderkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
    )


def priority_shipment_stats(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (adapted: corpus has no shipmode, classify on
    priority): per lineitem return flag, how many items belong to
    high- vs low-priority orders — join + conditional counts."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.select("l_orderkey", "l_returnflag")
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_priority_items"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_priority_items"),
        )
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: % of discounted revenue from PROMO-type parts —
    broadcast dim join + two conditional aggregates in one pass."""
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    agg = joined.agg(
        exact_sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0)), 4).alias(
            "promo_revenue"
        ),
        exact_sum(disc, 4).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        det_round(
            F.lit(100.0) * ratio(F.col("promo_revenue"), F.col("total_revenue")), 4
        ).alias("promo_pct"),
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders of less than 20% of a
    part's average quantity. The per-part average is a separate
    aggregate joined back on the part key — at scale both sides
    shuffle on ``l_partkey``/AQE can reuse the exchange; the dim
    filter broadcasts."""
    small_parts = part.filter(F.col("p_size") == 1).select("p_partkey")
    li = lineitem.join(
        F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    ).withColumnRenamed("l_partkey", "cut_partkey")
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("cut_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            det_round(exact_sum(F.col("l_extendedprice"), 2) / F.lit(7.0), 4).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def big_orders(
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
    min_qty: float = 300.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with customer context. The HAVING filter runs on the aggregate
    (|orders| rows) before any join back — minimum data motion."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
    )


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate over a dim join. Catalyst
    extracts the common ``p_partkey = l_partkey`` conjunct into the join
    key and leaves the disjunction as a post-join filter; each branch's
    column predicates still prune row groups where possible."""
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    branch1 = (
        (F.col("p_size") <= 5) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11)
    )
    branch2 = (
        (F.col("p_size") <= 10)
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    )
    branch3 = (
        (F.col("p_size") <= 15)
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    return (
        joined.filter(branch1 | branch2 | branch3)
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def supplier_balance_by_nation(
    supplier: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Supplier-side dim rollup: account balance stats per nation —
    completes table coverage (supplier was otherwise unused)."""
    return (
        supplier.join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(F.broadcast(region.select("r_regionkey", "r_name")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            exact_sum(F.col("s_acctbal"), 2).alias("total_balance"),
            det_round(F.min("s_acctbal"), 2).alias("min_balance"),
            det_round(F.max("s_acctbal"), 2).alias("max_balance"),
        )
    )


def customer_running_total(orders: DataFrame) -> DataFrame:
    """Per-customer cumulative revenue over their order history —
    running-sum window partitioned by customer (shuffle on custkey,
    sort within partition; no global sort anywhere)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("orderdate"),
        det_round(
            F.sum(F.col("o_totalprice").cast(MONEY_DECIMAL)).over(w).cast("double"), 2
        ).alias("cumulative_revenue"),
    )


def daily_revenue_wow(orders: DataFrame) -> DataFrame:
    """Day-over-day revenue deltas: aggregate to |dates| rows first,
    then lag/delta windows over the (tiny) daily series. The
    single-partition window is safe *because* it runs post-aggregation
    — ~36k rows even at 100 years of daily grain."""
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("order_date")
    ).agg(exact_sum(F.col("o_totalprice"), 2).alias("revenue"))
    w = Window.orderBy(F.asc("order_date"))
    prev = F.lag("revenue", 1).over(w)
    return daily.select(
        F.date_format("order_date", "yyyy-MM-dd").alias("order_date"),
        "revenue",
        det_round(prev, 2).alias("prev_revenue"),
        det_round(F.col("revenue") - prev, 2).alias("revenue_delta"),
    )
