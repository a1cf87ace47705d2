"""Mergeable distinct-count sketch sidecars — Apache DataSketches HLL
through Spark's native ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate`` (public SQL functions since Spark 3.5).

The 100 TB pattern: corpus-level distinct-count reporting (unique URLs
per source, unique doc digests per shard, vocabulary reach per snapshot)
normally pays a full corpus scan per question. A sketch SIDECAR inverts
that: each ingest batch appends one kilobyte-sized sketch row per group,
and every later question reads ONLY the sidecar — sketches merge
losslessly across batches (the DataSketches HLL union), so the estimate
over N appended batches equals a single-pass sketch over their union
(pinned within the sketch's documented relative error by
``tests/test_sketches.py``). The corpus is scanned exactly once, by the
batch that ingested it.

Store layout: ``{path}/`` flat parquet of
``(*group_cols, hll BINARY, batch_id BIGINT)`` — append-only, no
rewrite, so the only maintenance is the same small-files compaction
story as every sidecar (``similarity.compact_flat_layout`` applies
as-is). Appends hold the store's single-writer ``_WRITER_LOCK``.

Accuracy: DataSketches HLL at the default ``lg_k=12`` carries ~1.6 %
relative standard error. The estimate is NOT bit-deterministic across
partition layouts — single-pass sketches use the order-dependent HIP
estimator, so re-partitioning the same multiset moves the estimate by
~the error bound (pinned in tests/test_sketches.py) — which is why the
census queries hash-certify the EXACT count (from the corpus, once)
plus an in-plan within-BOUND boolean for the sketch, never the raw
estimate: the approx_stats discipline."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # DataSketches default: ~1.6% relative standard error


def hll_sketch_batch(
    df: DataFrame,
    group_cols: "Sequence[str]",
    value_col: str,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch row per group over this frame — the map-side
    reduction an ingest batch runs once. Output:
    ``(*group_cols, hll BINARY)``; kilobytes per group regardless of
    cardinality (2^lg_k registers)."""
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias("hll")
    )


def hll_store_append(
    df: DataFrame,
    path: str,
    group_cols: "Sequence[str]",
    value_col: str,
    batch_id: int,
    lg_k: int = DEFAULT_LG_K,
) -> None:
    """Append one batch's per-group sketches to the sidecar store.

    ``lg_k`` must match across appends (DataSketches unions sketches of
    mixed lg_k by degrading to the smallest — legal, but then the
    store's error bound is the worst batch's; keeping it fixed keeps the
    documented bound). Holds the store's single-writer lock like every
    index mutator."""
    from ..streaming.txn import writer_lock

    sk = hll_sketch_batch(df, group_cols, value_col, lg_k).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("long")
    )
    with writer_lock(path, "hll_store_append"):
        sk.write.mode("append").parquet(path)


def hll_store_estimates(
    spark: SparkSession, path: str, group_cols: "Sequence[str]"
) -> DataFrame:
    """Per-group distinct estimates from the sidecar ALONE — no corpus
    scan. Sketches union across batches (and across any grouping finer
    than ``group_cols``: estimating by source from a (source, shard)
    store is the same union). Output: ``(*group_cols, distinct_est
    BIGINT)``."""
    return (
        spark.read.parquet(path)
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(F.hll_union_agg(F.col("hll")).alias("_u"))
        .select(
            *group_cols,
            F.hll_sketch_estimate(F.col("_u")).cast("long").alias("distinct_est"),
        )
    )


def hll_store_total(spark: SparkSession, path: str) -> int:
    """Whole-store distinct estimate (all groups, all batches unioned) —
    a driver-side int, one sidecar scan. Distinct across groups is NOT
    the sum of per-group estimates when values repeat across groups;
    the union computes it right."""
    row = (
        spark.read.parquet(path)
        .agg(F.hll_union_agg(F.col("hll")).alias("_u"))
        .select(F.hll_sketch_estimate(F.col("_u")).cast("long").alias("est"))
        .collect()[0]
    )
    return int(row["est"])
