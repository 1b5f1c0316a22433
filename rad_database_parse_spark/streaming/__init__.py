from .events import (
    read_events_stream,
    sessionized_stream,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "tumbling_counts",
    "sessionized_stream",
    "streaming_dedup",
]
