"""Custom join operators the reference and vanilla Spark both lack
(SURVEY.md §2.4: the reference has only natural inner equi-join on key
prefix) — implemented as compositions of built-in ops chosen for scale.

asof_join: the union-sort trick — O(n log n) via ONE shuffle on
(key, time), no fat intermediate. The naive formulation (join all earlier
rows then rank) explodes to |L|×|matching R| rows; this one never
materializes more than |L|+|R|.

range_join_pairs: bucketed range self-join — equi-join on (key, bucket ±1)
then exact filter, the standard rewrite that turns a non-equi predicate
into a shuffle-friendly equi-join with bounded fanout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_time <= left_time`` (direction='backward'; 'forward' takes the
    earliest right row ≥).

    Implementation: tag and union both sides, sort within key by time (one
    shuffle), carry the most recent right payload forward with
    ``last(ignorenulls)`` — the merge-scan an ASOF JOIN does natively in
    engines that have one (e.g. DuckDB), expressed as a window.
    Equal timestamps: the right row sorts before the left row, so a
    same-instant right row IS visible to the left row (inclusive bound);
    among same-time right rows the largest ``tiebreak`` wins (both
    directions).

    The whole right payload rides in ONE struct, carried atomically with
    ``last(ignorenulls)`` — per-column carry would stitch together fields
    from different right rows whenever a payload field is legitimately
    NULL (an older row's value would leak into the newer row's slot).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = [c for c in left.columns]
    tb = tiebreak or payload[0]
    tb_type = dict(right.dtypes)[tb]
    if tb_type not in ("tinyint", "smallint", "int", "bigint", "float", "double") and not (
        tb_type.startswith("decimal") or tb_type in ("date", "timestamp")
    ):
        raise ValueError(
            f"asof_join tiebreak column {tb!r} must be numeric/temporal, got {tb_type}"
        )

    pay_struct = F.struct(*[F.col(p) for p in payload])
    pay_type = right.select(pay_struct).schema[0].dataType
    lrow_type = left.select(F.struct(*lcols)).schema[0].dataType

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col(tb).alias("_tb"),
        F.lit(None).cast(lrow_type).alias("_lrow"),
        pay_struct.alias("_pay"),
    )
    both = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at equal _t (inclusive bound); among
    # same-time right rows, ascending _tb puts the largest tiebreak LAST so
    # last() picks it — in both directions.
    t_order = F.asc("_t") if direction == "backward" else F.desc("_t")
    w = (
        Window.partitionBy("_k")
        .orderBy(t_order, F.asc("_is_left"), F.asc_nulls_first("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_pay", ignorenulls=True).over(w).alias("_pay")

    out = both.select("_is_left", "_lrow", carried).filter(F.col("_is_left") == 1)
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_pay.{p}").alias(p) for p in payload],
    )


def range_self_join(
    df: DataFrame,
    key: str,
    order_col: str,
    id_col: str,
    max_gap: int,
) -> DataFrame:
    """Pairs (a, b) within the same ``key`` whose ``order_col`` values lie
    within ``max_gap`` of each other (a.id < b.id).

    Rewrite: bucket = order_col div max_gap; the probe side explodes to
    {b−1, b, b+1} (pair order is by id, not time, so the partner may sit in
    either neighbor bucket); equi-join on (key, bucket), exact |Δ| ≤ max_gap
    filter + distinct afterwards. One shuffle on (key, bucket), fanout
    bounded by bucket occupancy (AQE splits skewed buckets).
    """
    b = (F.col(order_col) - (F.col(order_col) % max_gap)) / max_gap
    a = df.select(
        F.col(key).alias("_k"),
        F.col(order_col).alias("_ta"),
        F.col(id_col).alias("id_a"),
        F.explode(
            F.array((b - 1).cast("long"), b.cast("long"), (b + 1).cast("long"))
        ).alias("_bkt"),
    )
    bb = df.select(
        F.col(key).alias("_k"),
        F.col(order_col).alias("_tb"),
        F.col(id_col).alias("id_b"),
        b.cast("long").alias("_bkt"),
    )
    return (
        a.join(bb, on=["_k", "_bkt"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("_ta") - F.col("_tb")) <= max_gap)
        )
        .select(F.col("_k").alias(key), "id_a", "id_b")
        .distinct()
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Join each fact row to the dimension version that was VALID at the
    fact's timestamp — the lookup every SCD2 history (operators/scd.py)
    exists to serve: ``dim.valid_from <= fact.ts < dim.valid_to``, with an
    open interval (``valid_to IS NULL``) meaning "still current".

    Physical shape: an EQUI-join on the key plus an interval filter — the
    interval predicate rides on the hash join, so this is one shuffle on
    the key (or a broadcast when the dimension is small), never a range
    join. Sound because SCD2 versions per key are few and non-overlapping;
    each fact row matches at most one version.
    """
    cond = (
        (facts[fact_key] == dim[dim_key])
        & (dim[valid_from] <= facts[ts_col])
        & (dim[valid_to].isNull() | (facts[ts_col] < dim[valid_to]))
    )
    return facts.join(dim, cond)
