"""Declared query registry: name → (spark, sf_dir) → DataFrame, plus the
DuckDB oracle SQL mirror for each hash-checked query.

Conventions that make the driver's order-insensitive value-hash match:

* every computed column is aliased identically on both sides;
* money sums go through DECIMAL (exact, order-independent) and all
  rounding uses the floor-based half-up formula — see
  ``functions/core.py`` for why native ``round`` cannot be used;
* ties in any top-k / rank are broken by a unique key column.

The TPC-H-ish testdata → e-commerce mapping is ``operators/mapping.py``
(fixed by FIXTURES.md §B): lineitem=order_items, orders=orders,
part=products (p_brand=category), l_returnflag='R'=is_returned.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import kpi, mapping, validate
from .sources.readers import load_testdata

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Date columns cross the contract boundary as ISO 'yyyy-MM-dd' strings —
# the reference's P10 sink behavior (task_2.py:166,186 .isoformat()) and
# the only representation DuckDB's and Spark's pandas conversions agree
# on byte-for-byte (DuckDB returns DATE as midnight datetime64).
from pyspark.sql import functions as F


def iso_date(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.date_format(c, "yyyy-MM-dd"))
    return df


def query(name: str, oracle: str | None = None):
    def register(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return register


def _t(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    return load_testdata(spark, sf_dir, tables)


# --- shared SQL fragments (DuckDB oracle side) -------------------------

# mirror of operators/mapping.py — canonical item-grain fact
SQL_FACT = """
    SELECT l.l_orderkey * 10 + l.l_linenumber AS id,
           l.l_orderkey AS order_id,
           l.l_partkey AS product_id,
           l.l_extendedprice AS sale_price,
           (l.l_returnflag = 'R') AS is_returned,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_date,
           o.o_custkey AS user_id,
           p.p_brand AS category
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN part p ON l.l_partkey = p.p_partkey
"""

VALID_ORDERS_SQL = """
    SELECT o_orderkey AS order_id, o_custkey AS user_id,
           o_orderstatus AS status, o_orderdate AS created_at,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
    FROM orders
    WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
      AND o_orderdate IS NOT NULL
"""


def round_sql(expr: str, digits: int = 2) -> str:
    scale = float(10**digits)
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


def moneysum_sql(expr: str, digits: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({round_sql(expr, digits)} AS DECIMAL(18,{digits})))"
        " AS DOUBLE)"
    )


# --- reference-parity core (SURVEY.md §2.2–2.4) ------------------------


@query("validate_orders", oracle=VALID_ORDERS_SQL)
def q_validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 + P4: mandatory-null drop and date derivation on orders."""
    t = _t(spark, sf_dir, "orders")
    return iso_date(
        validate.validate_orders(mapping.orders_from_tpch(t["orders"])), "order_date"
    )


@query(
    "validate_order_items",
    oracle="""
    SELECT l_orderkey * 10 + l_linenumber AS id,
           l_orderkey AS order_id,
           l_partkey AS product_id,
           l_extendedprice AS sale_price,
           (l_returnflag = 'R') AS is_returned
    FROM lineitem
    WHERE l_partkey IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_extendedprice > 0
      AND l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
              AND o_orderdate IS NOT NULL)
    """,
)
def q_validate_order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 + P3 + J1: null-drop, positive price, order-existence semi-join."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    v_orders = validate.validate_orders(mapping.orders_from_tpch(t["orders"]))
    return validate.validate_order_items(
        mapping.order_items_from_tpch(t["lineitem"]), v_orders
    )


@query(
    "category_kpi",
    oracle=f"""
    WITH fact AS ({SQL_FACT})
    SELECT category, order_date,
           {round_sql(moneysum_sql("sale_price"))} AS daily_revenue,
           {round_sql(moneysum_sql("sale_price") + " / COUNT(DISTINCT order_id)")}
               AS avg_order_value,
           {round_sql(
               "CAST(SUM(CASE WHEN is_returned THEN 1 ELSE 0 END) AS DOUBLE)"
               " / COUNT(DISTINCT order_id)", 4)} * 100 AS avg_return_rate
    FROM fact
    WHERE category IS NOT NULL
    GROUP BY category, order_date
    """,
)
def q_category_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: J2+J3 star join → A1–A4+A8 per-(category, day) KPIs."""
    t = _t(spark, sf_dir, "orders", "lineitem", "part")
    fact = mapping.item_fact_from_tpch(t["lineitem"], t["orders"], t["part"])
    return iso_date(kpi.category_kpi(fact), "order_date")


@query(
    "order_kpi",
    oracle=f"""
    WITH fact AS ({SQL_FACT})
    SELECT order_date,
           COUNT(DISTINCT order_id) AS total_orders,
           {round_sql(moneysum_sql("sale_price"))} AS total_revenue,
           COUNT(id) AS total_items_sold,
           {round_sql(
               "CAST(SUM(CASE WHEN is_returned THEN 1 ELSE 0 END) AS DOUBLE)"
               " / COUNT(*)", 4)} * 100 AS return_rate,
           COUNT(DISTINCT user_id) AS unique_customers
    FROM fact
    GROUP BY order_date
    """,
)
def q_order_kpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5–A7: daily order KPIs over the item-grain fact."""
    t = _t(spark, sf_dir, "orders", "lineitem", "part")
    fact = mapping.item_fact_from_tpch(t["lineitem"], t["orders"], t["part"])
    return iso_date(kpi.order_kpi(fact), "order_date")


@query(
    "category_rank_daily",
    oracle=f"""
    WITH fact AS ({SQL_FACT}),
    cat AS (
        SELECT category, order_date,
               {round_sql(moneysum_sql("sale_price"))} AS daily_revenue,
               {round_sql(moneysum_sql("sale_price")
                          + " / COUNT(DISTINCT order_id)")} AS avg_order_value,
               {round_sql(
                   "CAST(SUM(CASE WHEN is_returned THEN 1 ELSE 0 END) AS DOUBLE)"
                   " / COUNT(DISTINCT order_id)", 4)} * 100 AS avg_return_rate
        FROM fact WHERE category IS NOT NULL
        GROUP BY category, order_date
    )
    SELECT category, order_date, daily_revenue, avg_order_value,
           avg_return_rate,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY order_date
               ORDER BY daily_revenue DESC, category ASC) AS BIGINT)
               AS revenue_rank
    FROM cat
    QUALIFY revenue_rank <= 5
    """,
)
def q_category_rank_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 extension: top-5 categories by revenue within each day."""
    t = _t(spark, sf_dir, "orders", "lineitem", "part")
    fact = mapping.item_fact_from_tpch(t["lineitem"], t["orders"], t["part"])
    return iso_date(
        kpi.category_rank_daily(kpi.category_kpi(fact), top_k=5), "order_date"
    )
