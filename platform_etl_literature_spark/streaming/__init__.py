from platform_etl_literature_spark.streaming.events import (
    hourly_counts,
    read_events_stream,
    run_to_memory,
    session_windows,
)

__all__ = [
    "read_events_stream",
    "hourly_counts",
    "session_windows",
    "run_to_memory",
]
