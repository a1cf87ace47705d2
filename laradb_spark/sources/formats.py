"""JSON-lines and ORC sources/sinks — format breadth beyond the
reference's CSV/Accumulo connectors (green-field; the reference's only
file format is CSV, opt/Operators.kt:26-155). Contracts match csv_io:
schema mandatory (never infer on a 100 TB lake — inference is a full
extra pass), malformed rows dropped, directory-of-part-files writes with
``single_file`` as a small-export convenience.

Delta/Iceberg are deliberately absent: their jars are not in this image.
The natural extension point is the same ``spark.read.format(...)`` call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import LaraSchema


def _struct(schema: T.StructType | LaraSchema | str) -> T.StructType | str:
    return schema.to_struct() if isinstance(schema, LaraSchema) else schema


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | LaraSchema | str,
) -> DataFrame:
    """JSON-lines scan. DROPMALFORMED mirrors the CSV skip-bad-rows
    contract (a corrupt line vanishes rather than nulling a column set).
    Note Spark still requires touching every field of a malformed row to
    drop it — keep the schema to the fields you need; pruning happens on
    the parsed columns."""
    return (
        spark.read.schema(_struct(schema))
        .option("mode", "DROPMALFORMED")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """JSON-lines sink; ``single_file`` coalesces to one part (small
    exports only — it serializes the write through one task)."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | LaraSchema | str | None = None,
) -> DataFrame:
    """ORC scan — columnar like parquet: predicate pushdown, column
    pruning, and partition pruning all apply (same FileScan machinery the
    plan-audit tests assert for parquet). Schema optional: ORC files are
    self-describing; pass one to pin column order/types."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_struct(schema))
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink with optional hive-style ``partition_by`` layout (same
    partition-pruning contract as the parquet Store path)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake scan. The delta-spark jars are not in this image; the
    call surface exists so a cluster with the connector gets the right
    plan, and a cluster without it gets an actionable error instead of a
    ClassNotFound stack (same contract as the Kafka surface)."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as e:  # noqa: BLE001 — rewrap with remedy
        raise RuntimeError(
            "Delta connector not available in this Spark session. Add the "
            "io.delta:delta-spark package (spark.jars.packages) and the "
            "DeltaSparkSessionExtension, then retry."
        ) from e


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg table scan via catalog name (``catalog.db.table``); jars
    absent here — clear error, see read_delta."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # noqa: BLE001 — rewrap with remedy
        raise RuntimeError(
            "Iceberg connector not available in this Spark session. Add the "
            "org.apache.iceberg:iceberg-spark-runtime package and a catalog "
            "config (spark.sql.catalog.<name>), then retry."
        ) from e
