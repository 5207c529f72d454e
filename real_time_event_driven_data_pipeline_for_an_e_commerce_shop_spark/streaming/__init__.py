from .pipeline import run_event_driven_pipeline
from .windows import (
    order_kpi_streaming_update,
    sessionized_stream,
    watermarked_daily_rollup,
)

__all__ = [
    "run_event_driven_pipeline",
    "order_kpi_streaming_update",
    "sessionized_stream",
    "watermarked_daily_rollup",
]
