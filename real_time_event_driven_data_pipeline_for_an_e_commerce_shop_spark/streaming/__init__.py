from .pipeline import run_bucketed_ingest, run_event_driven_pipeline
from .windows import (
    category_kpi_streaming_update,
    dedup_events_stream,
    funnel_firsts_streaming,
    interval_joined_events_stream,
    order_kpi_streaming_update,
    sessionized_stream,
    watermarked_daily_rollup,
)

__all__ = [
    "category_kpi_streaming_update",
    "dedup_events_stream",
    "funnel_firsts_streaming",
    "interval_joined_events_stream",
    "run_bucketed_ingest",
    "run_event_driven_pipeline",
    "order_kpi_streaming_update",
    "sessionized_stream",
    "watermarked_daily_rollup",
]
