"""KPI transformation stage — the reference's Task 2, Spark-first.

Reference semantics (SURVEY.md §2.3/2.4; ``/root/reference/Task_2/
task_2.py:57-139``):

* P5 ``is_returned = returned_at IS NOT NULL`` (``task_2.py:91``).
* J2 items ⋈ orders inner equi-join on ``order_id`` (``task_2.py:94``).
  The reference keeps every overlapping column with ``_x``/``_y``
  suffixes and then only ever uses the items-side ``user_id_x``; here
  the join projects exactly the order-context columns the KPIs need
  (``order_date``, order-level ``is_returned``) so the items-side
  ``user_id`` stays unambiguous — same semantics, no suffix hazard
  (SURVEY.md §7 trap 3) and less shuffle width.
* J3 product category lookup (``task_2.py:87-97``): the reference's
  driver-side dict-map is a hand-rolled broadcast join; here it is an
  explicit ``F.broadcast`` **left** join preserving the NaN-category
  behavior for dangling ``product_id``.
* A1–A9 aggregations (``task_2.py:106-139``), including the
  deliberately item-weighted return rates and the pandas null-group
  drop (A9): pandas ``groupby`` silently drops null keys, Spark keeps
  them, so :func:`category_kpi` filters null categories explicitly.
* P8/P9 rounding: round(2) on money, round(4)·100 on rates, derived
  *before* rounding (``task_2.py:115-121``) — preserved exactly, via
  the engine-deterministic helpers in ``functions.core``.

At scale: one shuffle for J2 (or none if both facts are bucketed by
``order_id``), zero shuffles for J3 (broadcast), one shuffle per
group-by with map-side partial aggregation. ``countDistinct`` is exact
as in the reference; swap to ``approx_count_distinct`` only as an
explicitly different operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import det_round, ratio


def with_return_flag(orders: DataFrame) -> DataFrame:
    """P5: order-level boolean return flag."""
    return orders.withColumn("is_returned", F.col("returned_at").isNotNull())


def build_item_fact(
    items: DataFrame,
    orders: DataFrame,
    products: DataFrame,
    extra_order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """J2 + J3: item-grain fact with order context and product category.

    ``orders`` must carry ``order_id`` + ``order_date`` (+ order-level
    ``is_returned`` unless ``items`` already has an item-level flag, as
    in the TPC-H mapping where ``l_returnflag`` is per item).
    ``products`` must carry ``id`` + ``category``. ``extra_order_cols``
    rides additional order attributes through the same join — one
    shuffle, however many context columns.
    """
    order_cols = ["order_id", "order_date", *extra_order_cols]
    if "is_returned" in orders.columns and "is_returned" not in items.columns:
        order_cols.append("is_returned")
    fact = items.join(orders.select(*order_cols), "order_id", "inner")
    dim = products.select(F.col("id").alias("product_id"), "category")
    return fact.join(F.broadcast(dim), "product_id", "left")


def category_kpi(fact: DataFrame) -> DataFrame:
    """A1–A4 + A8 + A9 + P7–P9: daily per-category KPIs.

    Output grain ``(category, order_date)`` with ``daily_revenue``
    (round 2), ``avg_order_value = revenue / distinct orders`` (round
    2), ``avg_return_rate = returned items / distinct orders`` (round
    4, ×100 — the reference's item-weighted numerator over a
    distinct-order denominator, which can exceed 100; SURVEY.md §7
    trap 2).
    """
    # Pre-aggregate to (category, date, order) grain, then count rows
    # instead of countDistinct: the shuffle carries order-grain rows
    # (~|orders| per category) rather than item rows, and the
    # single-distinct rewrite's extra aggregate phases disappear.
    # Decimal partial sums re-sum exactly (associative), so results are
    # bit-identical to the direct formulation. Measured ~15% at sf0.1;
    # the shuffle-volume saving grows with items-per-order at scale.
    per_order = (
        fact.filter(F.col("category").isNotNull())  # A9 pandas null-group parity
        .groupBy("category", "order_date", "order_id")
        .agg(
            F.sum(det_round(F.col("sale_price"), 2).cast("decimal(18,2)")).alias(
                "_rev_d"
            ),
            F.sum(F.col("is_returned").cast("long")).alias("_returns"),
        )
    )
    agg = per_order.groupBy("category", "order_date").agg(
        F.sum("_rev_d").cast("double").alias("_rev"),
        F.count(F.lit(1)).alias("_orders"),
        F.sum("_returns").alias("_returns"),
    )
    return agg.select(
        "category",
        "order_date",
        det_round(F.col("_rev"), 2).alias("daily_revenue"),
        det_round(ratio(F.col("_rev"), F.col("_orders")), 2).alias("avg_order_value"),
        (det_round(ratio(F.col("_returns"), F.col("_orders")), 4) * 100).alias(
            "avg_return_rate"
        ),
    )


def order_kpi(fact: DataFrame) -> DataFrame:
    """A5–A7 + P8/P9: daily order-level KPIs.

    ``unique_customers`` counts the items-side ``user_id`` — the
    reference's ``user_id_x`` choice (``task_2.py:131``); ``return_rate``
    is the item-weighted mean of ``is_returned`` (A6).
    """
    # Two distinct aggregates (order_id, user_id) would make Spark
    # Expand every item row ×3; pre-aggregating to (date, order, user)
    # grain first shrinks the Expand input to ~|orders| rows. Decimal
    # sums re-sum exactly (associative), so results are bit-identical.
    per_order = fact.groupBy("order_date", "order_id", "user_id").agg(
        F.sum(det_round(F.col("sale_price"), 2).cast("decimal(18,2)")).alias("_rev_d"),
        F.count("id").alias("_items_sold"),
        F.sum(F.col("is_returned").cast("long")).alias("_returns"),
        F.count(F.lit(1)).alias("_items"),
    )
    agg = per_order.groupBy("order_date").agg(
        F.countDistinct("order_id").alias("total_orders"),
        F.sum("_rev_d").cast("double").alias("_rev"),
        F.sum("_items_sold").alias("total_items_sold"),
        F.sum("_returns").alias("_returns"),
        F.sum("_items").alias("_items"),
        F.countDistinct("user_id").alias("unique_customers"),
    )
    return agg.select(
        "order_date",
        "total_orders",
        det_round(F.col("_rev"), 2).alias("total_revenue"),
        "total_items_sold",
        (det_round(ratio(F.col("_returns"), F.col("_items")), 4) * 100).alias(
            "return_rate"
        ),
        "unique_customers",
    )


def category_rank_daily(cat_kpi: DataFrame, top_k: int | None = None) -> DataFrame:
    """Ranking extension (SURVEY.md §2.5): revenue rank of each category
    within its day. Window shuffle partitions by ``order_date`` only."""
    w = Window.partitionBy("order_date").orderBy(
        F.desc("daily_revenue"), F.asc("category")
    )
    ranked = cat_kpi.withColumn("revenue_rank", F.row_number().over(w).cast("long"))
    if top_k is not None:
        ranked = ranked.filter(F.col("revenue_rank") <= top_k)
    return ranked


def run_transformation(
    products: DataFrame, orders: DataFrame, order_items: DataFrame
) -> dict[str, DataFrame]:
    """Full Task-2 stage on a validated e-commerce star schema."""
    orders_ctx = with_return_flag(orders)
    fact = build_item_fact(order_items, orders_ctx, products)
    return {"category_kpi": category_kpi(fact), "order_kpi": order_kpi(fact)}
