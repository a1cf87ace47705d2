"""Graph500/D4M triple-file ingestion: row/column index files → edge,
transpose, and degree tables.

Reference: ``util/TripleFileWriter.kt:21-45`` reads a row file and a
column file (single delimiter-separated token streams — the Graph500
``10Ar.txt``/``10Ac.txt`` fixtures are ONE line of comma-separated
indices) plus an optional value file (defaults to 1), and writes through
``util/D4MTableWriter.kt:26-55`` into:

  * the adjacency table (duplicate edges SUM — SummingCombiner),
  * its transpose,
  * a shared degree table with columns ``out`` (from rows) and ``in``
    (from cols), one +1 per ingested triple (``degreeUseValue=false``
    default, D4MTableWriter.kt:57) — so multi-edges count multiply.

Spark mapping: the token streams are read with ``lineSep=<delimiter>`` (so
a one-line file still splits into distributed records), indexed with
``zipWithIndex`` (order-preserving), and paired positionally with a join
on the index. Everything downstream is plain DataFrame ops; dup-sum is a
groupBy. NB the file format itself is the scale ceiling here — one
undelimited line cannot be split by offset, so production data should be
sharded files; the operator accepts globs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _indexed_tokens(spark: SparkSession, path: str, delimiter: str, col: str) -> DataFrame:
    """(i, token) for each delimiter-separated token of the file, in file
    order. lineSep turns the delimiter into the record separator, so the
    scan streams instead of loading the line; zipWithIndex preserves
    partition order."""
    toks = (
        spark.read.option("lineSep", delimiter)
        .text(path)
        .select(F.trim(F.col("value")).alias(col))
        .filter(F.col(col) != "")
    )
    indexed = toks.rdd.map(lambda r: r[0]).zipWithIndex().map(lambda t: (t[1], t[0]))
    return spark.createDataFrame(indexed, f"i long, {col} string")


def read_triple_files(
    spark: SparkSession,
    row_file: str,
    col_file: str,
    val_file: str | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Positional (row, col[, val]) triples from component files
    (reference: util/TripleFileWriter.kt:33-45; val defaults to 1 —
    D4MTableWriter.VALONE)."""
    rows = _indexed_tokens(spark, row_file, delimiter, "row")
    cols = _indexed_tokens(spark, col_file, delimiter, "col")
    triples = rows.join(cols, on="i")
    if val_file is not None:
        vals = _indexed_tokens(spark, val_file, delimiter, "v")
        triples = triples.join(vals, on="i").select(
            "row", "col", F.col("v").cast("double").alias("v")
        )
    else:
        triples = triples.select("row", "col", F.lit(1.0).alias("v"))
    return triples


def graph_tables(triples: DataFrame) -> dict[str, DataFrame]:
    """Triples → the reference's three-table D4M layout
    (reference: util/TripleFileWriter.kt:58-76, util/D4MTableWriter.kt):

      * ``edge``  — adjacency, duplicate (row, col) SUMMED on ingest;
      * ``edge_t`` — transpose of the dup-summed adjacency;
      * ``degree`` — per node: ``out_deg`` = #triples with that row,
        ``in_deg`` = #triples with that col (one +1 per ingested triple,
        multi-edges counted — degreeUseValue=false default).
    """
    edge = triples.groupBy("row", "col").agg(F.sum("v").alias("v"))
    edge_t = edge.select(
        F.col("col").alias("row"), F.col("row").alias("col"), F.col("v")
    )
    out_deg = triples.groupBy(F.col("row").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_deg = triples.groupBy(F.col("col").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    degree = (
        out_deg.join(in_deg, on="node", how="full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
    return {"edge": edge, "edge_t": edge_t, "degree": degree}


def ingest_graph_files(
    spark: SparkSession,
    row_file: str,
    col_file: str,
    val_file: str | None = None,
    delimiter: str = ",",
) -> dict[str, DataFrame]:
    """One-call mirror of TripleFileWriter.writeTripleFile_Adjacency."""
    return graph_tables(read_triple_files(spark, row_file, col_file, val_file, delimiter))
