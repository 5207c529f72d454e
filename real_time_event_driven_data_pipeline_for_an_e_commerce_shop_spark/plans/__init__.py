from .explain import count_exchanges, formatted_plan, has_broadcast_join, pushed_filters

__all__ = [
    "count_exchanges",
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
]
