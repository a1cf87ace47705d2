"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (sensor covariance pipeline, the
reference's first-party benchmark, reference: sensor/SensorCalc.kt:119-143)
on sf0.001. ``queries()`` / ``oracle_sql()`` — every implemented operator
from SURVEY.md §2, each as (Spark plan, DuckDB ANSI-SQL oracle) — see
laradb_spark/workloads/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    # Oracle comparability + sane local defaults (idempotent, runtime-safe).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # Spark 3.x: TIMESTAMP(NANOS) parquet → epoch-nanos long. Spark 4.x
    # ignores this conf (ts arrives timestamp_ntz); load_events handles both.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from laradb_spark.workloads.lara_demos import sensor_covariance_events

    return sensor_covariance_events(_configure(spark), "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from laradb_spark.workloads import all_specs

    return {
        name: (lambda spark, sf_dir, fn=fn: fn(_configure(spark), sf_dir))
        for name, (fn, _sql) in all_specs().items()
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted keys get a rows-only check."""
    from laradb_spark.workloads import all_specs

    return {name: sql for name, (_fn, sql) in all_specs().items() if sql is not None}
