from .explain import count_exchanges, formatted_plan, has_broadcast_join, pushed_filters
from .statemachine import (
    Stage,
    StageResult,
    StateMachineFailed,
    run_state_machine,
)

__all__ = [
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "Stage",
    "StageResult",
    "StateMachineFailed",
    "run_state_machine",
]
