from .windows import (
    first_event_per_key,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = [
    "first_event_per_key",
    "session_agg",
    "sliding_agg",
    "stream_events",
    "tumbling_agg",
]
