from .pipeline import (
    read_manifest_zone,
    run_bucketed_ingest,
    run_bucketed_ingest_manifest,
    run_event_driven_pipeline,
)
from .windows import (
    category_kpi_streaming_update,
    cohort_retention_from_activity,
    daily_value_rollup_streaming,
    dedup_events_stream,
    doc_term_counts_streaming,
    incremental_dedup_stream,
    funnel_firsts_streaming,
    interval_joined_events_stream,
    order_kpi_streaming_update,
    sessionized_stream,
    user_day_activity_streaming,
    watermarked_daily_rollup,
)

__all__ = [
    "category_kpi_streaming_update",
    "cohort_retention_from_activity",
    "daily_value_rollup_streaming",
    "dedup_events_stream",
    "doc_term_counts_streaming",
    "incremental_dedup_stream",
    "funnel_firsts_streaming",
    "interval_joined_events_stream",
    "read_manifest_zone",
    "run_bucketed_ingest",
    "run_bucketed_ingest_manifest",
    "run_event_driven_pipeline",
    "order_kpi_streaming_update",
    "sessionized_stream",
    "user_day_activity_streaming",
    "watermarked_daily_rollup",
]
