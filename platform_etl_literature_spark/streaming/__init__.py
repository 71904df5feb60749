from platform_etl_literature_spark.streaming.events import (
    dedup_within_watermark,
    hourly_counts,
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_counts,
    view_click_interval_join,
)
from platform_etl_literature_spark.streaming.documents import (
    curated_documents,
    read_documents_stream,
)
from platform_etl_literature_spark.streaming.stateful import running_user_totals

__all__ = [
    "read_documents_stream",
    "curated_documents",
    "read_events_stream",
    "hourly_counts",
    "session_windows",
    "sliding_counts",
    "view_click_interval_join",
    "dedup_within_watermark",
    "running_user_totals",
    "run_to_memory",
]
