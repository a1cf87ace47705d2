"""Multi-dimensional data layout: Z-order (Morton) clustered writes.

Sorting a table by ONE column gives parquet min/max row-group pruning on
that column only; a 100 TB table queried by BOTH (user, time) or
(lat, lon) needs a layout where rows close in EITHER dimension are close
on disk. Z-ordering interleaves the bits of the (rank-normalized)
dimension keys into one Morton key and range-sorts the write by it —
each file then covers a small hyper-rectangle of the key space, so a
selective filter on any participating column skips most files/row-groups.
This is the same technique table formats expose as ``OPTIMIZE ZORDER BY``,
implemented engine-side with plain expressions + repartitionByRange so it
works on vanilla parquet.

Rank normalization (percentile bucketing to 2^bits levels via
``ntile``-style range ranking) rather than raw-value bit-slicing: raw
values are skew-sensitive (a hot key range collapses most rows into a few
Z-cells); ranks give uniform cell occupancy by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # levels per dimension; 2 dims × 16 bits = 32-bit Morton key


def _interleave_bits(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two ``bits``-wide nonneg integer columns:
    result bit 2i = a's bit i, bit 2i+1 = b's bit i. Pure shift/mask
    expressions — whole-stage-codegen friendly, no UDF."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


def zorder_key(c1: Column, c2: Column, bits: int = ZBITS) -> Column:
    """Morton key of two numeric columns after percentile-rank bucketing
    each into [0, 2^bits). The percent_rank runs over a GLOBAL window —
    use :func:`write_zordered`, which replaces it with the scalable
    min/max affine bucketing when ranks aren't required."""
    from pyspark.sql import Window

    w1 = Window.orderBy(c1)
    w2 = Window.orderBy(c2)
    lv = (1 << bits) - 1
    b1 = F.floor(F.percent_rank().over(w1) * lv).cast("long")
    b2 = F.floor(F.percent_rank().over(w2) * lv).cast("long")
    return _interleave_bits(b1, b2, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int = 32,
    bits: int = ZBITS,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet Z-ordered on (col1, col2).

    Scalable bucketing: each dimension is affinely mapped to [0, 2^bits)
    from its (min, max) — two scalar aggregates broadcast via crossJoin,
    no global rank window. Skewed dimensions get uneven cell occupancy
    (acceptable: pruning still works, cells are just unequal); for heavy
    skew, pre-transform the column (log, rank-sample) before calling.
    The Morton-keyed rows are range-repartitioned into ``n_files`` so
    each output file covers a contiguous Z-range = a small
    hyper-rectangle of (col1 × col2)."""
    bounds = df.agg(
        F.min(col1).cast("double").alias("_lo1"),
        F.max(col1).cast("double").alias("_hi1"),
        F.min(col2).cast("double").alias("_lo2"),
        F.max(col2).cast("double").alias("_hi2"),
    )
    lv = (1 << bits) - 1

    def bucket(c: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        frac = F.when(span > 0, (F.col(c).cast("double") - F.col(lo)) / span).otherwise(
            F.lit(0.0)
        )
        return F.least(F.floor(frac * lv).cast("long"), F.lit(lv))

    keyed = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "_zkey",
            _interleave_bits(bucket(col1, "_lo1", "_hi1"), bucket(col2, "_lo2", "_hi2"), bits),
        )
        .drop("_lo1", "_hi1", "_lo2", "_hi2")
    )
    (
        keyed.repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
