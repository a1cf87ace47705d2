"""Kafka source surface. The kafka connector jars
(spark-sql-kafka-0-10) are NOT in this image, so ``kafka_stream_source``
raises a clear, actionable error at load() time; the option-building and
the value-decoding plan (the parts that are ours) are plain DataFrame
logic and fully tested against kafka-shaped batch frames.

Production shape: readStream.format("kafka") → ``kafka_value_json`` →
any window/dedup op in this package (unified Dataset semantics — the
downstream plan is identical to the file-source tests').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_source_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """The exact option map passed to the kafka reader. Kept as a pure
    function so the config surface is testable without the connector jars.
    ``maxOffsetsPerTrigger`` is the backpressure knob — at high-volume
    topics, bound each micro-batch so state/shuffle sizing stays planned
    rather than arrival-driven."""
    if not brokers or not topic:
        raise ValueError("brokers and topic are required")
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream_source(spark: SparkSession, brokers: str, topic: str, **kw) -> DataFrame:
    """readStream from Kafka. Raises RuntimeError with install guidance if
    the connector is absent (it is not bundled in this environment)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topic, **kw).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:  # DATA_SOURCE_NOT_FOUND / ClassNotFound
        if "kafka" in str(e).lower() or "DATA_SOURCE" in str(e):
            raise RuntimeError(
                "kafka connector not on the classpath — submit with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"
            ) from e
        raise


def kafka_value_json(
    df: DataFrame, schema: T.StructType | str, ts_from_kafka: bool = True
) -> DataFrame:
    """Decode a kafka-shaped frame (binary ``value`` + topic/partition/
    offset/timestamp metadata) into typed columns: cast value to string,
    parse JSON against ``schema``, unpack. Works identically on a real
    kafka stream and on a batch frame with the same columns (how it is
    tested here). ``ts_from_kafka`` keeps the broker append time as
    ``kafka_ts`` for watermarking when the payload carries no event time."""
    cols: list[Column] = [F.from_json(F.col("value").cast("string"), schema).alias("_v")]
    if ts_from_kafka:
        cols.append(F.col("timestamp").alias("kafka_ts"))
    return df.select(*cols).select("_v.*", *(["kafka_ts"] if ts_from_kafka else []))
