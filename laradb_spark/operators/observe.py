"""Pipeline observability without extra passes: ``df.observe`` attaches
named aggregate metrics that are computed DURING the action that already
runs — at 100 TB a separate ``count()`` for monitoring doubles the scan;
an observation is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_filter(
    df: DataFrame, cond, name: str = "filter"
) -> tuple[DataFrame, Observation]:
    """Filter with free in/out accounting: returns (filtered_df, obs);
    after ANY action on the result, ``obs.get`` yields
    {'<name>_in': rows seen, '<name>_kept': rows passing} from the same
    pass — no second scan. The standard way to monitor drop rates of
    curation stages (quality filters, dedup keeps) in production."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias(f"{name}_in"),
        F.sum(F.when(cond, 1).otherwise(0)).alias(f"{name}_kept"),
    )
    return observed.filter(cond), obs
