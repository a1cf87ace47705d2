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


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key time-weighted average over an irregular series: each
    observation's value is held until the NEXT observation, so
    twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_last − t_first) — the standard TWAP /
    sensor-reading integral, where a plain AVG over-weights bursty
    periods. Keys with < 2 observations (zero duration) are dropped.

    Engine-exact contract: inputs are integer (scaled cents × epoch-ms),
    Σ v·Δt stays in BIGINT (~1e14 for 1e4-cent values × 1e8 ms gaps ×
    1e2 rows; callers at larger magnitudes should pre-scale), and the
    final division is integral floor — no float summation order anywhere.

    Scale shape: one window per key over (ts) — key cardinality here is
    (user × type)-grade (high), so per-key windows parallelize; this is
    the windows-are-fine regime, not the 5-group collapse grouped_rank
    exists for.
    """
    # Equal timestamps make Σ v·Δt ORDER-DEPENDENT (the zero-duration row
    # contributes 0, its twin inherits the gap) — a deterministic tiebreak
    # is a correctness requirement, not cosmetics.
    order = [F.asc(ts_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    seg = df.select(
        *key_cols,
        F.col(ts_col).alias("_t"),
        F.col(val_col).alias("_v"),
        (F.lead(ts_col).over(w) - F.col(ts_col)).alias("_dt"),
    )
    return (
        seg.groupBy(*key_cols)
        .agg(
            F.sum(F.col("_v") * F.col("_dt")).alias("_wsum"),
            (F.max("_t") - F.min("_t")).alias("_dur"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .filter(F.col("_dur") > 0)
        .select(
            *key_cols,
            F.expr("_wsum div _dur").alias("twap_scaled"),
            "n_obs",
        )
    )
