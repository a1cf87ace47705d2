"""General-path PlusFun (binary-fold over collect_list — the escape hatch
for monoids with no built-in aggregate) and n-way union."""

from pyspark.sql import functions as F

from laradb_spark import LaraSchema, LaraTable, PlusFun


def test_custom_combine_monoid(spark):
    # "longest string wins" — no built-in aggregate; general fold path.
    longest = PlusFun(
        "longest",
        identity="",
        combine=lambda acc, x: F.when(F.length(x) > F.length(acc), x).otherwise(acc),
        result_type="STRING",
    )
    t = LaraTable.from_rows(
        spark,
        [(1, 0, "aa"), (1, 1, "bbbb"), (1, 2, "c"), (2, 0, "xy")],
        LaraSchema.of([("k", "LONG"), ("j", "LONG")], [("s", "STRING", "")]),
    )
    out = t.agg(["k"], {"s": longest})
    assert dict((r[0], r[1]) for r in out.collect_sorted()) == {1: "bbbb", 2: "xy"}


def test_union_many_three_way(spark):
    schema = LaraSchema.of([("k", "STRING")], [("v", "DOUBLE", 0.0)])
    ts = [
        LaraTable.from_rows(spark, rows, schema)
        for rows in ([("a", 1.0), ("b", 2.0)], [("a", 10.0)], [("b", 5.0), ("c", 7.0)])
    ]
    u = LaraTable.union_many(ts, {"v": "sum"})
    assert u.collect_sorted() == [("a", 11.0), ("b", 7.0), ("c", 7.0)]
    # Catalyst flattens: exactly one aggregate pair, unions fused
    plan = u.df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") <= 2
