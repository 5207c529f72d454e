"""Explicit schemas for every table the engine touches.

The reference relies on ``pd.read_csv`` dtype inference
(``/root/reference/Task_1/task_1.py:86``, ``Task_2/task_2.py:51``); at
100 TB schema inference means an extra full scan and nondeterministic
types, so every source here declares a ``StructType`` (SURVEY.md §1.3).

Two schema families:

* the reference's e-commerce star schema (products dim + orders /
  order_items facts), read from CSV directories;
* the driver's TPC-H-ish parquet testdata (``TESTDATA.md``), for which
  parquet footers carry the authoritative schema — declared here so the
  engine can validate what it reads.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# --- reference e-commerce schema (CSV; /root/reference/Data headers) ---

PRODUCTS_SCHEMA = _struct(
    ("id", LongType()),
    ("sku", StringType()),
    ("cost", DoubleType()),
    ("category", StringType()),
    ("name", StringType()),
    ("brand", StringType()),
    ("retail_price", DoubleType()),
    ("department", StringType()),
)

ORDERS_SCHEMA = _struct(
    ("order_id", LongType()),
    ("user_id", LongType()),
    ("status", StringType()),
    ("created_at", TimestampType()),
    ("returned_at", TimestampType()),
    ("shipped_at", TimestampType()),
    ("delivered_at", TimestampType()),
    ("num_of_item", LongType()),
)

ORDER_ITEMS_SCHEMA = _struct(
    ("id", LongType()),
    ("order_id", LongType()),
    ("user_id", LongType()),
    ("product_id", LongType()),
    ("status", StringType()),
    ("created_at", TimestampType()),
    ("shipped_at", TimestampType()),
    ("delivered_at", TimestampType()),
    ("returned_at", TimestampType()),
    ("sale_price", DoubleType()),
)

ECOMMERCE_SCHEMAS: dict[str, StructType] = {
    "products": PRODUCTS_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "order_items": ORDER_ITEMS_SCHEMA,
}

# --- driver testdata schema (parquet; FIXTURES.md §B) ---

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _struct(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _struct(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _struct(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _struct(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
