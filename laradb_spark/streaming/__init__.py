from .windows import (
    session_window_agg,
    sliding_window_agg,
    stream_from_parquet_dir,
    tumbling_window_agg,
)

__all__ = [
    "stream_from_parquet_dir",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
]
