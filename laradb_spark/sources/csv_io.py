"""CSV scan/store mirroring the reference's file connectors.

Reference: ``FileScan``/``OpCSVScan`` — CSV source with explicit scheme,
``skip`` option (header rows), delimiter/quote/escape, bad rows skipped
with a warning (reference: opt/raco/RacoOperators.kt:271-276,
opt/Operators.kt:26-155). ``FileStore``/``FileStoreIterator`` — CSV sink
with optional header (reference: opt/raco/RacoOperators.kt:233-238,
opt/Operators.kt:397-477).

Spark mapping: ``spark.read.csv`` with DROPMALFORMED (same skip-bad-rows
contract), schema mandatory (the reference never infers). The reference's
single-file writer is a client-side convenience; at scale we write a
directory of part files — ``single_file=True`` coalesces to 1 task for
small exports only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import LaraSchema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | LaraSchema | str,
    skip: int = 0,
    delimiter: str = ",",
    quote: str = '"',
    escape: str = "\\",
) -> DataFrame:
    """CSV scan with the reference's FileScan options. ``skip=1`` maps to
    header=True (the common case); larger skips are applied per-file.
    Malformed rows are dropped (reference drops them with a warning,
    opt/Operators.kt:118-131)."""
    if isinstance(schema, LaraSchema):
        schema = schema.to_struct()
    reader = (
        spark.read.schema(schema)
        .option("delimiter", delimiter)
        .option("quote", quote)
        .option("escape", escape)
        .option("mode", "DROPMALFORMED")
    )
    if skip == 1:
        reader = reader.option("header", "true")
    elif skip > 1:
        # No native N-row skip: read raw, drop by per-file line index, re-parse.
        from pyspark.sql import functions as F

        raw = (
            spark.read.text(path)
            .withColumn("_f", F.input_file_name())
            .withColumn("_i", F.monotonically_increasing_id())
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("_f").orderBy("_i")
        body = raw.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") > skip
        )
        # from_csv needs a DDL string; 'struct<a:bigint,...>' stripped to
        # colon syntax is NOT valid DDL (DataType.fromDDL rejects it) —
        # build 'name type' pairs from the StructType fields instead.
        if isinstance(schema, str):
            ddl = schema
        else:
            ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        return (
            body.select(
                F.from_csv(
                    F.col("value"),
                    ddl,
                    {"delimiter": delimiter, "quote": quote, "escape": escape},
                ).alias("_r")
            ).select("_r.*")
        )
    return reader.csv(path)


def write_csv(
    df: DataFrame,
    path: str,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "overwrite",
    single_file: bool = False,
) -> None:
    """CSV sink (reference: FileStoreIterator writes one file; we write a
    part-file directory unless ``single_file`` for small exports)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
