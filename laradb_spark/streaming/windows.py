"""Structured Streaming surface — green-field relative to the reference
(SURVEY.md §2.4: the reference has no streaming; its only time op is batch
binning, reference: sensor/SensorCalc.kt:361-394 BinRowApply).

Design: every window aggregation here is defined once and runs in BOTH
batch and streaming mode (pass a batch DataFrame or a readStream one) —
Spark's unified Dataset semantics. Watermarks bound state for late data;
at 100 TB-scale streams the state store is RocksDB-backed per-partition
(config knob, not code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_from_parquet_dir(
    spark: SparkSession, path: str, schema: T.StructType, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream (for tests/local runs; production swaps in Kafka —
    same downstream plan)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _exact_sum2(col: str = "value"):
    """Order-independent 2dp sum over exact 2-decimal data: sum scaled longs
    (exact regardless of partition/addend order), divide once. A double SUM
    is addend-order-dependent and flips the round on .xx5 boundaries across
    runs — fatal for the batch/streaming parity these ops promise."""
    return F.sum(F.round(F.col(col) * 100).cast("long")) / F.lit(100.0)


def _with_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the event-time column to TimestampType named ``_etime``.
    Accepts epoch-millis longs, epoch-nanos longs, or native timestamps."""
    dt = dict(df.dtypes)[ts_col]
    c = F.col(ts_col)
    if dt in ("bigint", "long"):
        # Heuristic: epoch-nanos (driver events table) vs epoch-millis.
        c = F.when(c > F.lit(10_000_000_000_000_000), (c / 1_000_000).cast("long")).otherwise(c)
        c = F.timestamp_millis(c.cast("long"))
    return df.withColumn("_etime", c)


def tumbling_window_agg(
    df: DataFrame,
    window: str = "60 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling-window count/sum per key. In streaming mode the watermark
    lets Spark emit+drop window state once event time passes window end +
    watermark (late rows beyond it are dropped)."""
    keys = keys if keys is not None else ["event_type"]
    src = _with_event_time(df, ts_col)
    if df.isStreaming and watermark:
        src = src.withWatermark("_etime", watermark)
    return (
        src.groupBy(F.window("_etime", window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), _exact_sum2("value").alias("sum_value"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), *keys, "n", "sum_value")
    )


def sliding_window_agg(
    df: DataFrame,
    window: str = "60 minutes",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Sliding (hopping) window — each event lands in window/slide windows."""
    keys = keys if keys is not None else ["event_type"]
    src = _with_event_time(df, ts_col)
    if df.isStreaming and watermark:
        src = src.withWatermark("_etime", watermark)
    return (
        src.groupBy(F.window("_etime", window, slide).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), _exact_sum2("value").alias("sum_value"))
        .select(F.unix_millis(F.col("w.start")).alias("window_start_ms"), *keys, "n", "sum_value")
    )


def session_window_agg(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per key (Spark's native session_window; equivalent batch
    formulation via lag+cumsum in workloads/windows_q.py sessionize)."""
    keys = keys if keys is not None else ["user_id"]
    src = _with_event_time(df, ts_col)
    if df.isStreaming and watermark:
        src = src.withWatermark("_etime", watermark)
    return (
        src.groupBy(F.session_window("_etime", gap).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"), _exact_sum2("value").alias("session_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            *keys,
            "n_events",
            "session_value",
        )
    )


def run_stream_to_memory(agg: DataFrame, name: str, output_mode: str = "complete"):
    """Drive a streaming aggregation to completion against a bounded file
    source and return the query handle (test/local harness)."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
