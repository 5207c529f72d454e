"""Validation stage — the reference's Task 1, as lazy DataFrame ops.

Reference semantics (SURVEY.md §2.2/2.3; ``/root/reference/Task_1/
task_1.py:106-141``):

* P1 orders: drop rows with null ``order_id``/``user_id``/``created_at``
  (``task_1.py:125``).
* P2/P3 order_items: drop null ``id``/``product_id``/``sale_price``;
  keep ``sale_price > 0`` (``task_1.py:126-127``).
* J1 referential integrity: keep items whose ``order_id`` exists in the
  validated orders — a **left-semi join**, replacing the reference's
  driver-side ``isin(set(...))`` (``task_1.py:129-131``) which would
  need the whole orders key-set in one process; the semi-join shuffles
  (or broadcasts) instead and scales to any cardinality.
* P4 date derivation: ``order_date``/``return_date`` from timestamps
  (``task_1.py:133-136``); ``to_date`` is null-preserving exactly like
  ``pd.to_datetime(...).dt.date``.

Everything is built-in Catalyst expressions: predicates push into the
scan, and because validation is a DataFrame→DataFrame function the
optimizer can see through it into the KPI stage when the intermediate
materialization is skipped.

The README documents two extra rules the reference never implemented
(``README.md:33-34`` — products.price > 0, quantity > 0); they are
available behind ``strict=True`` so golden-parity runs default to the
shipped code behavior (SURVEY.md §2.2 divergence note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ORDERS_REQUIRED = ("order_id", "user_id", "created_at")
ORDER_ITEMS_REQUIRED = ("id", "product_id", "sale_price")


def validate_orders(orders: DataFrame) -> DataFrame:
    """P1 + P4: mandatory-column null-drop, then date projections.

    ``return_date`` is derived only when the source carries
    ``returned_at`` (the TPC-H-mapped corpus has no order-level return
    timestamp; FIXTURES.md §B)."""
    out = orders.na.drop(subset=list(ORDERS_REQUIRED)).withColumn(
        "order_date", F.to_date("created_at")
    )
    if "returned_at" in orders.columns:
        out = out.withColumn("return_date", F.to_date("returned_at"))
    return out


def validate_order_items(
    order_items: DataFrame,
    valid_orders: DataFrame,
    strict: bool = False,
) -> DataFrame:
    """P2 + P3 + J1: null-drop, positive price, order-existence semi-join."""
    items = order_items.na.drop(subset=list(ORDER_ITEMS_REQUIRED)).filter(
        F.col("sale_price") > 0
    )
    if strict and "quantity" in items.columns:
        items = items.filter(F.col("quantity") > 0)
    return items.join(valid_orders.select("order_id"), "order_id", "left_semi")


def validate_products(products: DataFrame, strict: bool = False) -> DataFrame:
    """Products pass through unvalidated in the reference
    (``task_1.py:120,141``); ``strict`` applies the README-documented
    positive-price rule."""
    if strict:
        return products.filter(F.col("retail_price") > 0)
    return products


def run_validation(
    products: DataFrame,
    orders: DataFrame,
    order_items: DataFrame,
    strict: bool = False,
) -> dict[str, DataFrame]:
    """Full Task-1 stage: returns the validated star schema, lazily."""
    v_orders = validate_orders(orders)
    return {
        "products": validate_products(products, strict=strict),
        "orders": v_orders,
        "order_items": validate_order_items(order_items, v_orders, strict=strict),
    }
