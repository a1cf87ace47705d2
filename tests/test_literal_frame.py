"""Focused tests for the r16 dispatch optimizations: literal_frame
(LocalRelation-backed driver literals) and the trainer's driver-side
mean assembly — both must be value- and schema-identical to the
createDataFrame / aggregate formulations they replace."""

import math

import pytest
from pyspark.sql import functions as F

from laradb_spark.util import literal_frame


def _norm(rows):
    return sorted(str(tuple(r)) for r in rows)


CASES = [
    ([(1, "a'b\\c", 3.14), (2, "", float("nan")), (None, "x`y€", float("-inf"))],
     "id int, s string, d double"),
    ([(10**12, [1.5e-300, None, 0.1 + 0.2], True)],
     "id long, v array<double>, f boolean"),
    ([], "q int, vec array<double>"),
    ([(1, None), (2, [])], "i int, v array<double>"),
    ([(0, "t0", 1000), (1, "t1", 500)], "query_id int, term string, w_milli int"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_literal_frame_matches_createdataframe(spark, rows, schema):
    a = literal_frame(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert a.schema.simpleString() == b.schema.simpleString()
    assert _norm(a.collect()) == _norm(b.collect())


def test_literal_frame_is_local_relation(spark):
    df = literal_frame(spark, [(1, "x")], "i int, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan


def test_literal_frame_double_exactness(spark):
    vals = [0.1 + 0.2, 1.5e-300, -0.0, float("inf"), float("nan")]
    got = [r[0] for r in literal_frame(
        spark, [(v,) for v in vals], "x double").collect()]
    assert got[0] == vals[0]
    assert got[1] == vals[1]
    assert got[2] == 0.0
    assert got[3] == float("inf")
    assert math.isnan(got[4])


def test_literal_frame_falls_back_on_unsupported(spark):
    # struct-typed rows are outside the rendered types — must still work
    rows = [((1, "a"),)]
    schema = "s struct<i:int,t:string>"
    a = literal_frame(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert _norm(a.collect()) == _norm(b.collect())


def test_train_centroids_vectorized_matches_expression(spark):
    """The r16 driver-side mean assembly (vectorized path) must emit the
    same centroid table as the expression-path aggregate, including NULL
    vectors and NULL components."""
    from laradb_spark.pipelines.similarity import _train_centroids

    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [0.5, -1.0, 2.5, 0.0]),
        (2, None),
        (3, [4.0, 4.0, 4.0, 4.0]),
        (4, [1e-3, 2e-3, 3e-3, 4e-3]),
        (5, [-1.0, -2.0, -3.0, -4.0]),
    ]
    c = spark.createDataFrame(rows, "neighbor_id long, cvec array<double>")
    a = _train_centroids(c, 2, 2, vectorized=True).collect()
    b = _train_centroids(c, 2, 2, vectorized=False).collect()
    ka = sorted((r["cid"], tuple(r["cent"])) for r in a)
    kb = sorted((r["cid"], tuple(r["cent"])) for r in b)
    assert ka == kb
