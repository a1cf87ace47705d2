"""Streaming deduplication — exactly-once event delivery over at-least-once
transports. Green-field relative to the reference (SURVEY.md §2.4: no
streaming); the batch twin is pipelines/dedup.exact semantics on ids.

``dropDuplicatesWithinWatermark`` keeps one state entry per id only until
event time passes the watermark horizon, so state is bounded by
(arrival rate × watermark) regardless of stream length — the only dedup
shape that survives an unbounded 100 TB/day stream. Plain
``dropDuplicates`` on a stream would grow state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .windows import _with_event_time


def dedup_stream(
    df: DataFrame,
    id_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence of each id wins; re-deliveries within the watermark
    horizon are dropped. Unified batch/streaming: a batch frame takes the
    plain dropDuplicates path (same visible result for on-time data)."""
    out = _with_event_time(df, ts_col)
    if out.isStreaming:
        out = out.withWatermark("_etime", watermark).dropDuplicatesWithinWatermark(
            list(id_cols)
        )
    else:
        out = out.dropDuplicates(list(id_cols))
    return out.drop("_etime")
