"""Time-series gap fill — the dense-grid counterpart of the reference's
binned sensor tables (sensor/SensorCalc.kt binning produces a SPARSE
(t', c) table; analyses like the covariance pipeline tolerate sparsity,
but downstream consumers of a regular series need explicit rows for the
missing bins, carried forward from the last observation).

Scale shape: the fill operates on the AGGREGATED series (one row per
key × bin), never the raw events — series length is bounded by the time
range, not data volume. Bin bounds come from a broadcast scalar subquery
(action-free builder); the grid is sequence+explode per key (map-side);
the carry is one window per key over the bounded series. For series too
long for one partition, the two-phase range-partition pattern
(curation.global_exclusive_cumsum) applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_gaps_forward(
    series: DataFrame,
    key_col: str,
    bin_col: str,
    value_col: str,
) -> DataFrame:
    """Densify an integer-binned series per key and forward-fill.

    ``series``: one row per (key, bin) — bins are integers (epoch-hours,
    bin indexes…). Output: one row per key × every bin in the GLOBAL
    [min, max] range, with ``value_col`` carried forward from the last
    present bin (leading gaps stay NULL — no value to carry), plus
    ``was_gap`` = 1 for synthesized rows.
    """
    bounds = series.agg(
        F.min(bin_col).alias("_lo"), F.max(bin_col).alias("_hi")
    )
    grid = (
        series.select(key_col).distinct()
        .crossJoin(F.broadcast(bounds))
        .select(key_col, F.explode(F.sequence("_lo", "_hi")).alias(bin_col))
    )
    joined = grid.join(series, on=[key_col, bin_col], how="left").select(
        key_col,
        bin_col,
        F.col(value_col),
        F.when(F.col(value_col).isNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_gap"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(bin_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        bin_col,
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        "was_gap",
    )
