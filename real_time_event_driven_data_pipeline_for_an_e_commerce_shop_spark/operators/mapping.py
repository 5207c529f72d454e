"""Adapter: driver TPC-H-ish testdata → the engine's e-commerce star schema.

The driver's correctness corpus (``TESTDATA.md``/``FIXTURES.md §B``)
ships TPC-H-shaped parquet; the mapping fixed by ``FIXTURES.md`` is:

* ``orders`` → ``orders`` (``o_orderkey``→order_id, ``o_custkey``→user_id,
  ``o_orderdate``→created_at),
* ``lineitem`` → ``order_items`` (item grain; ``l_extendedprice``~
  sale_price, ``l_returnflag = 'R'``~is_returned — note the return flag
  is **item-level** here, vs order-level in the reference),
* ``part`` → ``products`` (``p_brand``~category).

The synthetic item id is ``l_orderkey * 10 + l_linenumber`` (linenumber
≤ 7 in the corpus), mirrored verbatim in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kpi import build_item_fact


def orders_from_tpch(orders: DataFrame) -> DataFrame:
    return orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("created_at"),
    )


def order_items_from_tpch(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("product_id"),
        F.col("l_extendedprice").alias("sale_price"),
        (F.col("l_returnflag") == "R").alias("is_returned"),
    )


def products_from_tpch(part: DataFrame) -> DataFrame:
    return part.select(
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("category"),
        F.col("p_retailprice").alias("retail_price"),
    )


def item_fact_from_tpch(
    lineitem: DataFrame, orders: DataFrame, part: DataFrame
) -> DataFrame:
    """Item-grain fact over the testdata, ready for the KPI operators.

    ``user_id`` rides through the single order-context join (lineitem
    has no customer column), so the reference's "items-side user_id"
    (``task_2.py:131``) degenerates to the ordering customer — the only
    faithful choice here.
    """
    items = order_items_from_tpch(lineitem)
    orders_ctx = orders_from_tpch(orders).withColumn(
        "order_date", F.to_date("created_at")
    )
    return build_item_fact(
        items, orders_ctx, products_from_tpch(part), extra_order_cols=("user_id",)
    )
