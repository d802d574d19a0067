from spectraplex_spark.streaming.pipeline import (
    read_bronze_stream,
    slot_filter,
    stream_normalize_to_silver,
    windowed_event_counts,
)

__all__ = [
    "read_bronze_stream",
    "slot_filter",
    "stream_normalize_to_silver",
    "windowed_event_counts",
]
