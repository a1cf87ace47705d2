"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (on by default in get_spark) handles most cases
at runtime; these helpers cover the two places AQE can't: (a) aggregations
with one giant key, (b) joins where the skewed side must pre-salt because
the build side is replicated.

Salting = two-phase aggregation (reference analogue: Accumulo pre-split
points on the class list, reference: sensor/SensorCalc.kt:159-173,940-952
``PropagatePartition`` — the same idea, chosen at runtime instead of
hand-listed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 aggregates on (keys, salt) spreading a
    hot key over ``salt_buckets`` reducers; phase 2 folds the partials.
    Supported aggs: sum, count, min, max (the decomposable monoids — the
    same restriction the reference's combiners have,
    reference: sensor/SensorCalc.kt:445-503 CombineSumCnt).
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for col, how in aggs.items():
        if how == "sum":
            phase1_aggs.append(F.sum(col).alias(col))
            phase2_aggs.append(F.sum(col).alias(col))
        elif how == "count":
            phase1_aggs.append(F.count(col).alias(col))
            phase2_aggs.append(F.sum(col).cast("long").alias(col))
        elif how == "min":
            phase1_aggs.append(F.min(col).alias(col))
            phase2_aggs.append(F.min(col).alias(col))
        elif how == "max":
            phase1_aggs.append(F.max(col).alias(col))
            phase2_aggs.append(F.max(col).alias(col))
        else:
            raise ValueError(f"non-decomposable aggregate {how!r}; use sum/count/min/max")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join_hot_keys(
    big: DataFrame,
    small: DataFrame,
    on: str,
    hot_keys: list,
    salt_buckets: int = 16,
) -> DataFrame:
    """Join where ``big`` is skewed on ``hot_keys``: salt the big side's hot
    rows, replicate the small side's hot rows across all salts, union with
    the plain join of the cold keys. Semantically identical to
    ``big.join(small, on)``; physically the hot key fans out over
    ``salt_buckets`` tasks."""
    is_hot = F.col(on).isin(hot_keys)

    big_hot = big.filter(is_hot).withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    small_hot = small.filter(is_hot).select("*", salts)
    hot = big_hot.join(small_hot, on=[on, "_salt"]).drop("_salt")

    cold = big.filter(~is_hot).join(small.filter(~is_hot), on=on)
    return hot.unionByName(cold)
