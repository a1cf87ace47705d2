"""Streaming state/sink hardening: RocksDB state store provider (the
large-key-cardinality config) and a foreachBatch idempotent sink
(exactly-once semantics via epoch-keyed overwrite)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from laradb_spark.streaming import stream_from_parquet_dir, tumbling_window_agg

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

H = 3_600_000
BASE = 1_700_000_000_000 - (1_700_000_000_000 % H)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    rows = [(i, BASE + i * 600_000, i % 3, "click", float(i)) for i in range(20)]
    d = str(tmp_path / "ev")
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.parquet(d)
    return d


def test_rocksdb_state_store(spark, stream_dir, tmp_path):
    """The same stateful aggregation runs on the RocksDB state store —
    the provider used at high key cardinality (bounded executor memory)."""
    agg = tumbling_window_agg(stream_from_parquet_dir(spark, stream_dir, EV_SCHEMA))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rocks_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT sum(n) AS n FROM rocks_out").collect()[0].n
        assert got == 20
    finally:
        q.stop()


def test_foreach_batch_idempotent_sink(spark, stream_dir, tmp_path):
    """foreachBatch + epoch-keyed partition overwrite = the standard
    exactly-once file sink: replaying a batch rewrites the same partition
    instead of duplicating rows."""
    out = str(tmp_path / "sink")

    def write_epoch(df, epoch_id: int):
        (
            df.withColumn("_epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"epoch={epoch_id}"))
        )

    agg = tumbling_window_agg(stream_from_parquet_dir(spark, stream_dir, EV_SCHEMA))
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_epoch)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    result = spark.read.option("basePath", out).parquet(out + "/epoch=*")
    # the final epoch holds the complete aggregation; per-epoch dirs are
    # self-consistent (overwrite => no dupes within an epoch)
    last = result.agg(F.max("_epoch")).collect()[0][0]
    final = result.filter(F.col("_epoch") == last)
    assert final.agg(F.sum("n")).collect()[0][0] == 20
    assert final.count() == final.dropDuplicates(["window_start_ms", "event_type"]).count()
