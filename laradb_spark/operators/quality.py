"""Data-contract validation: one-pass constraint checking over a table.

The data-quality gate a pipeline runs before promoting a load: each rule
is a boolean expression evaluated per row; the report is ONE aggregate
pass (conditional sums — map-side combine, no per-rule scans). Referential
rules (foreign-key presence) are expressed as a broadcast/left-anti join
feeding a count, still a single extra scan of the fact side.

Why expressions and not a Python validator: rules stay inside whole-stage
codegen, the pass parallelizes like any aggregate, and the same rule text
can be replayed by an external SQL engine for audit (the driver-contract
query does exactly that).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_counts(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """The ONE-row aggregate every rule report derives from:
    ``(_n, _v_0, _v_1, …)`` — total rows plus per-rule violation counts,
    all conditional sums in a single pass over ``df``. Callers that also
    need the total row count (e.g. to rate a separately-computed FK rule)
    should collect THIS row once instead of running a second ``count()``
    scan."""
    # internal columns are INDEX-named (_v_0, _v_1…), never rule-named:
    # rule names are arbitrary strings ("price > 0", "fk-check") and would
    # break identifier parsing if interpolated into column refs/exprs.
    aggs = []
    for i, name in enumerate(rules):
        cond = rules[name]
        # coalesce: SUM over an EMPTY table is NULL, and an empty load must
        # report 0 violations, not NULL (empty batches are routine)
        viol = F.coalesce(
            F.sum(F.when(cond.isNull() | ~cond, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias(f"_v_{i}")
        aggs.append(viol)
    return df.agg(F.count(F.lit(1)).alias("_n"), *aggs)


def validate_constraints(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named boolean rules over ``df`` in ONE aggregate pass
    (``constraint_counts``). Returns one row per rule:
    (rule, n_rows, n_violations, violation_ppm) where a violation is a
    row for which the rule is FALSE or NULL (a NULL check result is a
    failure, not a pass — contracts are three-valued-logic-hostile by
    design)."""
    names = list(rules)
    row = constraint_counts(df, rules)
    parts = [
        row.select(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{i}").cast("long").alias("n_violations"),
            F.coalesce(
                F.expr(f"1000000 * _v_{i} div nullif(_n, 0)"), F.lit(0).cast("long")
            ).alias("violation_ppm"),
        )
        for i, name in enumerate(names)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fk_violations(
    facts: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Referential-integrity count: fact rows whose key has no match in
    the dimension (NULL keys count as violations — an unattributable fact
    row is a violation either way). The dimension ships only its key
    column; Spark broadcasts it when small."""
    missing = facts.select(F.col(fact_key)).join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_anti",
    )
    return missing.agg(F.count(F.lit(1)).alias("n_orphans"))
