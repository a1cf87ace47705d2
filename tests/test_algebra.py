"""Union/Join/Agg semantics tests — the schema calculus and default/
identity/annihilator rules (reference: api/TupleOp.kt:313-319, 374-400,
625-658)."""

import pytest
from pyspark.sql import functions as F

from laradb_spark import LaraSchema, LaraTable


def _t(spark, rows, keys, vals):
    return LaraTable.from_rows(spark, rows, LaraSchema.of(keys, vals))


def test_union_common_prefix_and_plus(spark):
    # A keyed (i, j), B keyed (i, k): common prefix = (i); vals union.
    a = _t(spark, [(1, 10, 2.0), (1, 11, 3.0), (2, 10, 5.0)],
           [("i", "LONG"), ("j", "LONG")], [("x", "DOUBLE", 0.0)])
    b = _t(spark, [(1, 7, 10.0), (3, 8, 1.0)],
           [("i", "LONG"), ("k", "LONG")], [("y", "DOUBLE", 0.0)])
    u = a.union(b, {"x": "sum", "y": "sum"})
    assert u.schema.key_names == ["i"]
    assert u.schema.val_names == ["x", "y"]
    rows = u.collect_sorted()
    assert rows == [(1, 5.0, 10.0), (2, 5.0, 0.0), (3, 0.0, 1.0)]


def test_union_identity_must_match_default(spark):
    a = _t(spark, [(1, 2.0)], [("i", "LONG")], [("x", "DOUBLE", 1.0)])
    b = _t(spark, [(1, 3.0)], [("i", "LONG")], [("x", "DOUBLE", 1.0)])
    with pytest.raises(ValueError, match="identity"):
        a.union(b, {"x": "sum"})  # sum identity 0.0 != default 1.0


def test_union_rejects_non_prefix_shared_keys(spark):
    a = _t(spark, [(1, 2, 0.0)], [("i", "LONG"), ("j", "LONG")], [("x", "DOUBLE", 0.0)])
    b = _t(spark, [(2, 1, 0.0)], [("j", "LONG"), ("i", "LONG")], [("x", "DOUBLE", 0.0)])
    with pytest.raises(ValueError, match="common prefix"):
        a.union(b, {"x": "sum"})
    # After Sort (access-path change) it works.
    u = a.union(b.sort(["i", "j"]), {"x": "sum"})
    assert u.schema.key_names == ["i", "j"]


def test_join_key_union_val_intersection_times(spark):
    # Matrix multiply shape: A(i,j)→v ⋈ B(j,k? no — shared prefix) —
    # here the Lara join: A keyed (j, i), B keyed (j, k), shared prefix (j).
    a = _t(spark, [(1, 1, 2.0), (1, 2, 3.0), (2, 1, 4.0)],
           [("j", "LONG"), ("i", "LONG")], [("v", "DOUBLE", 0.0)])
    b = _t(spark, [(1, 5, 10.0), (2, 5, 100.0), (3, 6, 7.0)],
           [("j", "LONG"), ("k", "LONG")], [("v", "DOUBLE", 0.0)])
    j = a.join(b, {"v": "multiply"})
    assert j.schema.key_names == ["j", "i", "k"]
    assert j.schema.val_names == ["v"]
    assert j.collect_sorted() == [(1, 1, 5, 20.0), (1, 2, 5, 30.0), (2, 1, 5, 400.0)]
    # TableMult = join + agg over the shared key (reference:
    # sensor/SensorCalc.kt:324-330): sum over j.
    mm = j.sort(["i", "k", "j"]).agg(["i", "k"], {"v": "sum"})
    assert mm.collect_sorted() == [(1, 5, 420.0), (2, 5, 30.0)]


def test_join_annihilator_check(spark):
    a = _t(spark, [(1, 2.0)], [("i", "LONG")], [("v", "DOUBLE", None)])
    b = _t(spark, [(1, 3.0)], [("i", "LONG")], [("v", "DOUBLE", None)])
    with pytest.raises(ValueError, match="annihilator"):
        a.join(b, {"v": "multiply"})  # multiply annihilates at 0.0, defaults are null
    ok = a.join(b, {"v": "multiply_null"})
    assert ok.collect_sorted() == [(1, 6.0)]


def test_join_zero_discard(spark):
    a = _t(spark, [(1, 0.0), (2, 2.0)], [("i", "LONG")], [("v", "DOUBLE", 0.0)])
    b = _t(spark, [(1, 5.0), (2, 3.0)], [("i", "LONG")], [("v", "DOUBLE", 0.0)])
    j = a.join(b, {"v": "multiply"}, discard_zero=True)
    assert j.collect_sorted() == [(2, 6.0)]


def test_agg_subset_keys(spark):
    t = _t(spark, [(1, 1, 2.0), (1, 2, 3.0), (2, 1, 4.0)],
           [("i", "LONG"), ("j", "LONG")], [("v", "DOUBLE", 0.0)])
    assert t.agg(["i"], {"v": "sum"}).collect_sorted() == [(1, 5.0), (2, 4.0)]
    # agg to no keys = grand total
    assert t.agg([], {"v": "sum"}).df.collect()[0][0] == 9.0


def test_rename_and_filter(spark):
    t = _t(spark, [(1, 2.0), (5, 3.0)], [("i", "LONG")], [("v", "DOUBLE", 0.0)])
    r = t.rename({"i": "row", "v": "val"})
    assert r.schema.key_names == ["row"] and r.schema.val_names == ["val"]
    f = r.filter(F.col("row") > 1)
    assert f.collect_sorted() == [(5, 3.0)]


def test_union_error_plusfun(spark):
    from py4j.protocol import Py4JJavaError

    a = _t(spark, [(1, "x")], [("i", "LONG")], [("s", "STRING", None)])
    b = _t(spark, [(1, "y")], [("i", "LONG")], [("s", "STRING", None)])
    u = a.union(b, {"s": "error"})
    with pytest.raises(Exception):
        u.df.collect()


def test_auto_persist_shared_subplan(spark):
    """O2: a derived table consumed by TWO operators is persisted
    automatically (the reference's common-subexpression temp tables,
    Lower.kt:107); base loads are exempt."""
    from laradb_spark.schema import LaraSchema
    from laradb_spark.table import LaraTable

    sch = LaraSchema.of([("k", "LONG")], [("v", "DOUBLE", 0.0)])
    base = LaraTable.from_rows(spark, [(1, 1.0), (2, 2.0), (1, 3.0)], sch)
    derived = base.map_vals(v=F.col("v") * 2)
    a = derived.agg(["k"], {"v": "sum"})          # first consumer
    assert not derived.df.is_cached
    b = derived.filter(F.col("v") > 2.0)          # second consumer → persist
    assert derived.df.is_cached
    # the cache substitutes into the FIRST consumer's plan too
    assert "InMemoryTableScan" in a.df._jdf.queryExecution().executedPlan().toString()
    assert {tuple(r) for r in a.df.collect()} == {(1, 8.0), (2, 4.0)}
    assert {tuple(r) for r in b.df.collect()} == {(1, 6.0), (2, 4.0)}
    # base sources are never auto-persisted, however often they're consumed
    base.map_vals(v=F.col("v"))
    base.map_vals(v=F.col("v"))
    assert not base.df.is_cached
    derived.df.unpersist()
