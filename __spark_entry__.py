"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query is implemented in
``real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark``
(see SURVEY.md §2 for the operator inventory each entry covers); this
module only wires (spark, sf_dir) → DataFrame and carries the ANSI-SQL
mirror for DuckDB. Cross-engine numeric determinism (decimal-exact
money sums + floor-based round-half-up) is documented in
``functions/core.py``.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_event_driven_data_pipeline_for_an_e_commerce_shop_spark.queries import (
    QUERIES,
    ORACLES,
)


def _utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Pin the session timezone before building any plan: timestamp →
    date/string derivations must agree with DuckDB's naive (UTC) view
    of the parquet instants regardless of the harness session's TZ."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (CategoryKPI over the item-grain star join) on
    /root/testdata/sf0.001; driver checks rows>0."""
    sf_dir = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
    return _utc(QUERIES["category_kpi"])(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _utc(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each hash-checked query."""
    return dict(ORACLES)
