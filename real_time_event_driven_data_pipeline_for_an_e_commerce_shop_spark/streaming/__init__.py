from .pipeline import run_event_driven_pipeline
from .windows import sessionized_stream, watermarked_daily_rollup

__all__ = [
    "run_event_driven_pipeline",
    "sessionized_stream",
    "watermarked_daily_rollup",
]
