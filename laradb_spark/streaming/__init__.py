from .dedup import dedup_stream, fuzzy_ingest_stream, line_ingest_stream, span_ingest_stream
from .ingest import curate_ingest_stream, shard_ingest_stream, url_ingest_stream
from .joins import interval_join
from .serve import ann_serve_stream
from .sources import kafka_source_options, kafka_stream_source, kafka_value_json
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
    "dedup_stream",
    "span_ingest_stream",
    "line_ingest_stream",
    "curate_ingest_stream",
    "url_ingest_stream",
    "ann_serve_stream",
    "shard_ingest_stream",
    "fuzzy_ingest_stream",
    "interval_join",
    "kafka_source_options",
    "kafka_stream_source",
    "kafka_value_json",
]
