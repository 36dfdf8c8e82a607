from .cdc import changes_cursor, consume_changes
from .windows import (
    foreach_batch_idempotent_sink,
    read_events_stream,
    run_to_memory,
    session_agg,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

__all__ = [
    "changes_cursor",
    "consume_changes",
    "foreach_batch_idempotent_sink",
    "read_events_stream",
    "run_to_memory",
    "session_agg",
    "sliding_counts",
    "streaming_dedup",
    "tumbling_counts",
]
