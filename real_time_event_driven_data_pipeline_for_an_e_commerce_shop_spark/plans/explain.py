"""Physical-plan introspection helpers.

The reference has no optimizer to inspect (SURVEY.md §4); on Spark the
plan IS the performance contract, so tests assert plan shape — filters
reached the scan, small dims broadcast, narrow ops stayed
exchange-free — rather than trusting that the DataFrame code "looks
declarative". Used by ``tests/test_plans.py`` and for ad-hoc
``.explain`` iteration during development.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` output as a string."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (BroadcastExchange excluded).

    Counts the formatted plan's operator detail blocks ``(N) Exchange``,
    one per physical shuffle."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a scan."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
