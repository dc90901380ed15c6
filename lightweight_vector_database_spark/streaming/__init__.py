from .ingest import VectorIngest
from .windows import (
    first_event_per_key,
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = [
    "VectorIngest",
    "first_event_per_key",
    "session_agg",
    "sliding_agg",
    "stream_events",
    "tumbling_agg",
]
