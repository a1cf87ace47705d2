"""Stream-stream interval join: batch ≡ streaming output on the same
data, range predicate enforced, state bounded by watermarks."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from laradb_spark.streaming import interval_join, stream_from_parquet_dir
from laradb_spark.streaming.windows import run_stream_to_memory

IMP_SCHEMA = T.StructType([
    T.StructField("imp_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
])
CLK_SCHEMA = T.StructType([
    T.StructField("clk_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
])

M = 60_000
BASE = 1_700_000_000_000 - (1_700_000_000_000 % 3_600_000)

IMPRESSIONS = [
    (1, BASE + 0 * M, 1),
    (2, BASE + 10 * M, 2),
    (3, BASE + 60 * M, 1),
]
CLICKS = [
    (10, BASE + 5 * M, 1),    # joins imp 1 (within 15m)
    (11, BASE + 40 * M, 1),   # joins nothing (25m..40m gap: imp1 +40m > 15m, imp3 is later)
    (12, BASE + 70 * M, 1),   # joins imp 3 (+10m)
    (13, BASE + 12 * M, 2),   # joins imp 2 (+2m; arrives in an earlier file → out-of-order)
    (14, BASE + 5 * M, 3),    # no matching impression user
]
EXPECTED = {(1, 10), (2, 13), (3, 12)}


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    di = str(tmp_path_factory.mktemp("imps"))
    dc = str(tmp_path_factory.mktemp("clks"))
    spark.createDataFrame(IMPRESSIONS, IMP_SCHEMA).coalesce(1).write.mode("overwrite").parquet(di)
    # clicks split across two files so the join spans micro-batches
    spark.createDataFrame(CLICKS[:2], CLK_SCHEMA).coalesce(1).write.parquet(f"{dc}/f=1")
    spark.createDataFrame(CLICKS[2:], CLK_SCHEMA).coalesce(1).write.parquet(f"{dc}/f=2")
    return di, dc


def _pairs(rows):
    return {(r.l_imp_id, r.r_clk_id) for r in rows}


def test_interval_join_batch(spark, dirs):
    di, dc = dirs
    imp = spark.read.parquet(di)
    clk = spark.read.option("recursiveFileLookup", "true").schema(CLK_SCHEMA).parquet(dc)
    out = interval_join(imp, clk, on="user_id", within="15 minutes")
    assert _pairs(out.collect()) == EXPECTED
    # joined payload columns carried from both sides
    assert {"user_id", "l_imp_id", "l_ts", "r_clk_id", "r_ts"} <= set(out.columns)


def test_interval_join_stream_matches_batch(spark, dirs):
    di, dc = dirs
    imp = stream_from_parquet_dir(spark, di, IMP_SCHEMA)
    clk = (
        spark.readStream.schema(CLK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(dc)
    )
    out = interval_join(imp, clk, on="user_id", within="15 minutes")
    assert out.isStreaming
    q = run_stream_to_memory(out, "ssjoin_out", "append")
    try:
        got = spark.sql("SELECT l_imp_id, r_clk_id FROM ssjoin_out").collect()
        assert {(r.l_imp_id, r.r_clk_id) for r in got} == EXPECTED
    finally:
        q.stop()
