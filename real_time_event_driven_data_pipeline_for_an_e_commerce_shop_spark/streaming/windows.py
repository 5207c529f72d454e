"""Watermarked event-time operators — the streaming surface the
reference lacks entirely (SURVEY.md §2.7 "absent" row), built on the
``events`` stream shape (event_id, ts, user_id, event_type, value).

* :func:`watermarked_daily_rollup` — tumbling 1-day windows with a
  late-data watermark; append mode emits a day once the watermark
  passes its end. The streaming twin of ``operators.events.
  daily_event_rollup`` (same aggregates, same column names).
* :func:`sessionized_stream` — native ``session_window`` with
  watermark: state is bounded by (users × open sessions), merged by
  Spark's session-merge state store operator. The streaming twin of
  ``operators.events.sessionize``.

Exact ``countDistinct`` is not incrementally mergeable in append mode
(SURVEY.md §7 trap 8), so the rollup uses ``approx_count_distinct``
(HLL) for ``unique_users`` — the deliberate, documented divergence
from the batch twin; at 100 TB/day the exact count would need a
shuffle per update anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import exact_sum


def watermarked_daily_rollup(
    events_stream: DataFrame,
    watermark: str = "1 day",
    window: str = "1 day",
) -> DataFrame:
    """Per-(day, type) counts/sums over an event stream, late data
    tolerated up to ``watermark``."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), 2).alias("total_value"),
            F.approx_count_distinct("user_id").alias("approx_unique_users"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd").alias("event_date"),
            "event_type",
            "n_events",
            "total_value",
            "approx_unique_users",
        )
    )


def sessionized_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via the native session-merge operator."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum(F.col("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
            "session_value",
        )
    )
