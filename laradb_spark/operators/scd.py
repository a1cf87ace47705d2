"""Slowly-changing-dimension type-2 merge — dimension history maintenance.

A 100 TB warehouse keeps dimensions (customers, suppliers, documents'
source metadata) as SCD2 history: one row per (key, version) with
[valid_from, valid_to) validity, ``valid_to`` NULL while open. Each new
snapshot closes changed rows and opens new versions. Engines usually do
this with MERGE; here it is the equivalent join/union plan, so it runs
on plain parquet with no table-format dependency.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    key: str,
    attrs: list[str],
    day: int,
) -> DataFrame:
    """Fold a ``day``-stamped snapshot into an SCD2 ``history``.

    ``history``: (key, *attrs, valid_from: long, valid_to: long|null).
    ``snapshot``: (key, *attrs) — the dimension's full state at ``day``.

    Row fate (one full-outer join of open rows vs snapshot decides all):
      * open row, key in snapshot, attrs unchanged → stays open;
      * open row, key gone or attrs changed       → closed (valid_to=day);
      * snapshot key new or changed               → new open row
        (valid_from=day);
      * already-closed rows pass through untouched.

    Shape: one shuffle on the key for the full-outer join (dimension-
    sized, not fact-sized), unions are free. Null-safe attr comparison —
    a NULL→value change is a change.
    """
    open_rows = history.filter(F.col("valid_to").isNull())
    closed_rows = history.filter(F.col("valid_to").isNotNull())
    o = open_rows.select(
        F.col(key).alias("_k"),
        *[F.col(a).alias(f"_o_{a}") for a in attrs],
        F.col("valid_from").alias("_o_from"),
        F.lit(1).alias("_o_present"),  # NOT derived from attrs: they may be NULL
    )
    s = snapshot.select(
        F.col(key).alias("_k"),
        *[F.col(a).alias(f"_s_{a}") for a in attrs],
        F.lit(1).alias("_s_present"),
    )
    j = o.join(s, on="_k", how="full_outer")

    in_open = F.col("_o_present").isNotNull()
    in_snap = F.col("_s_present").isNotNull()
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"_o_{a}").eqNullSafe(F.col(f"_s_{a}")) for a in attrs],
    )

    kept_open = j.filter(in_open & in_snap & same).select(
        F.col("_k").alias(key),
        *[F.col(f"_o_{a}").alias(a) for a in attrs],
        F.col("_o_from").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    newly_closed = j.filter(in_open & (~in_snap | ~same)).select(
        F.col("_k").alias(key),
        *[F.col(f"_o_{a}").alias(a) for a in attrs],
        F.col("_o_from").alias("valid_from"),
        F.lit(day).cast("long").alias("valid_to"),
    )
    newly_open = j.filter(in_snap & (~in_open | ~same)).select(
        F.col("_k").alias(key),
        *[F.col(f"_s_{a}").alias(a) for a in attrs],
        F.lit(day).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    return (
        closed_rows.select(key, *attrs, "valid_from", "valid_to")
        .unionByName(kept_open)
        .unionByName(newly_closed)
        .unionByName(newly_open)
    )


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str | None = None,
    delete_op: str = "D",
    seq_col: str | None = None,
) -> DataFrame:
    """SCD1 / CDC batch apply — the MERGE INTO shape on plain parquet:
    every change row REPLACES the target row with its key (upsert); rows
    whose ``op_col`` equals ``delete_op`` delete that key instead. Keys
    absent from the target insert.

    ``changes`` must be KEY-UNIQUE, exactly like MERGE INTO (which errors
    when multiple source rows match one target row — a duplicate-key
    batch would otherwise union in BOTH upsert rows, and a mixed
    upsert+delete key would silently resolve to the upsert regardless of
    CDC order). Either pre-collapse upstream, or pass ``seq_col`` — a CDC
    sequence/LSN column, strictly increasing per key — and the batch is
    collapsed last-wins here first (one hash aggregate; the winning row's
    op decides: trailing delete deletes, trailing upsert upserts; the
    sequence column is consumed and not emitted). Without ``seq_col`` a
    duplicate key raises ``ValueError`` — the check is one bounded
    aggregate job over the CDC-sized batch, never over the target.

    Physical shape: the change batch is CDC-sized (small side) — its
    distinct-key set broadcasts into one LEFT-ANTI join against the
    target, so the 100 TB target never shuffles and the whole apply is
    one scan + union. Formats with native MERGE (Delta/Iceberg) do the
    same thing with file-level pruning; this is the format-agnostic plan.
    """
    if seq_col is not None:
        others = [c for c in changes.columns if c != key]
        changes = (
            changes.groupBy(key)
            .agg(F.max_by(F.struct(*others), F.col(seq_col)).alias("_last"))
            .select(key, "_last.*")
            .drop(seq_col)
        )
    else:
        # Pin the batch BEFORE the eager uniqueness check: the returned
        # plan re-reads `changes`, and a nondeterministic lineage (sample,
        # position salt, concurrently-rewritten path) could pass the check
        # yet materialize duplicates later. localCheckpoint (not persist):
        # it snapshots the CDC-sized batch once — check and merge see the
        # SAME rows even if a cached block would have been evicted — and
        # its blocks are released when the returned frame is dropped
        # (ContextCleaner), so per-micro-batch callers in a long-lived
        # session don't accumulate CacheManager entries the way an
        # unreleased persist() per batch would (each batch is a new plan,
        # so persist_once can't dedupe them). NOTE the API is EAGER on
        # this path: the snapshot + uniqueness-check jobs run at call
        # time, sized by the change batch, never by the target.
        # Fault-tolerance trade: localCheckpoint blocks are neither
        # replicated nor recomputable — losing an executor between this
        # call and the caller's merge action fails the returned plan
        # (persist would have recomputed from lineage). Acceptable for a
        # CDC-sized batch (re-call merge_upsert to retry); callers on
        # flaky clusters can pre-collapse to key-unique and pass seq_col,
        # which skips the snapshot entirely.
        changes = changes.localCheckpoint(eager=True)
        if changes.groupBy(key).count().filter(F.col("count") > 1).limit(1).count() > 0:
            raise ValueError(
                f"merge_upsert: changes has multiple rows for some {key!r} "
                "(MERGE INTO semantics require a key-unique source); "
                "pass seq_col to collapse last-wins"
            )
    if op_col is not None:
        # NULL-op rows are UPSERTS: `op != delete_op` alone would filter
        # them out of the upsert set (three-valued logic) while their keys
        # still left-anti away the target row — a malformed change row
        # must not become a silent delete.
        ups = changes.filter(
            (F.col(op_col) != delete_op) | F.col(op_col).isNull()
        ).drop(op_col)
        touched = changes.select(key).distinct()
    else:
        ups = changes
        touched = changes.select(key).distinct()
    kept = target.join(F.broadcast(touched), on=key, how="left_anti")
    return kept.unionByName(ups)
