"""Stream-stream joins — the last core Structured Streaming surface
(green-field relative to the reference, SURVEY.md §2.4: no streaming).

An inner stream-stream join must bound BOTH sides' state or it grows
forever: each side watermarks its event time, and the join condition
carries an explicit time-range predicate so Spark can evict state once
the watermark passes the range. Unified semantics: the same definition
runs on batch frames (where it is a plain range join) — how the tests
establish the expected output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _with_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "15 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "30 minutes",
    prefix: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Inner join of two event streams on ``on`` where the right event
    falls in ``[left_time, left_time + within]`` — the ad-click /
    impression-conversion shape.

    State bound: both sides watermark at ``watermark``; the range
    predicate lets Spark drop left state ``within`` past the watermark
    and right state immediately past it. Output columns are prefixed
    (left keeps ``on``).
    """
    lp, rp = prefix
    lcols = [F.col(c).alias(c if c == on else f"{lp}{c}") for c in left.columns]
    rcols = [F.col(c).alias(f"{rp}{c}") for c in right.columns]
    l = _with_event_time(left, left_ts).select(*lcols, F.col("_etime").alias("_lt"))
    r = _with_event_time(right, right_ts).select(*rcols, F.col("_etime").alias("_rt"))
    if left.isStreaming or right.isStreaming:
        l = l.withWatermark("_lt", watermark)
        r = r.withWatermark("_rt", watermark)
    cond = (
        (F.col(on) == F.col(f"{rp}{on}"))
        & (F.col("_rt") >= F.col("_lt"))
        & (F.col("_rt") <= F.col("_lt") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop("_lt", "_rt", f"{rp}{on}")
