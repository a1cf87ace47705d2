"""Table maintenance: small-file compaction.

The 100 TB failure mode this addresses: streaming/incremental writers
produce thousands of KB-scale parquet files per partition; every
downstream scan then pays per-file open/footer/scheduling costs that
dwarf the read itself (and the driver pays listing memory). Compaction
rewrites a table at a target file size in one distributed pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _tree_bytes(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_files) under ``path`` via the Hadoop FS API —
    driver-side, bounded by file COUNT (the thing compaction shrinks),
    never file contents."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    total = n = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue  # _SUCCESS, checksums
        total += st.getLen()
        n += 1
    return total, n


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    partition_by: list[str] | None = None,
    salt_col: str | None = None,
) -> dict:
    """Rewrite the parquet tree at ``src`` into ``dst`` with files sized
    toward ``target_file_mb``. Returns {"files_before", "files_after",
    "bytes"} so pipelines can log the win.

    File count = ceil(input_bytes / target): compressed input size is the
    best cheap proxy for output size (same codec, same data). One
    round-robin repartition — a single full shuffle, the unavoidable cost
    of re-packing. With ``partition_by``, repartitioning on the partition
    columns ALONE would hash every row of one partition value into a
    single task → one oversized file per big partition value regardless of
    target (and n_files beyond the distinct-combo count would be empty).
    Instead the shuffle keys on (partition cols, salt) where salt splits
    each partition value into ≈ ceil(n_files / n_combos) slices, sized
    from one cheap distinct-count over the pruned partition columns — so
    large partition values split toward the target file size while each
    output directory still compacts internally.

    Pass ``salt_col`` (any roughly-unique, hash-safe column — a row id,
    a digest) to derive the salt DETERMINISTICALLY as
    ``pmod(xxhash64(salt_col), slices)``: under a shuffle-fetch-failure
    stage retry a repartition keyed on a nondeterministic expression is
    the SPARK-38388 class of risk (rows lost or duplicated when only
    some map tasks re-run). Without ``salt_col`` the salt falls back to
    the row position (``monotonically_increasing_id``), which
    round-robins any content (MapType columns hash-error; duplicate-
    heavy data would collapse into one slice) but ASSUMES no mid-write
    stage retry — acceptable for an offline maintenance rewrite that is
    re-run on failure, and the reason ``salt_col`` is preferred when a
    stable identity column exists.
    """
    total, n_before = _tree_bytes(spark, src)
    target = max(1, target_file_mb) * 1024 * 1024
    n_files = max(1, -(-total // target))  # ceil
    df: DataFrame = spark.read.parquet(src)
    if partition_by:
        from pyspark.sql import functions as F

        n_combos = max(1, df.select(*partition_by).distinct().count())
        per_part = max(1, -(-n_files // n_combos))  # files per partition value
        if salt_col is not None:
            # deterministic: retry-safe repartition key (see docstring)
            salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(per_part))
        else:
            # salt from the row POSITION, not row content: content hashing
            # breaks on MapType columns (hash unsupported) and collapses
            # duplicate-heavy data into one slice; position round-robins
            # every row regardless of content — but is NONDETERMINISTIC
            # under stage retry (docstring caveat).
            salt = F.pmod(F.monotonically_increasing_id(), F.lit(per_part))
        out = df.repartition(
            n_files, *[F.col(c) for c in partition_by], salt
        )
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(dst)
    else:
        out = df.repartition(n_files)
        out.write.mode("overwrite").parquet(dst)
    _, n_after = _tree_bytes(spark, dst)
    return {"files_before": n_before, "files_after": n_after, "bytes": total}
