"""Two-phase order statistics vs the naive window on randomized fixtures
(ties, NULL groups, skewed group sizes) — the machinery behind
median_value_by_type / trim_length_outliers / value_quantiles_by_type /
bm25 ranking."""

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from laradb_spark.operators.ranking import grouped_median, grouped_quantiles


def _fixture(spark, seed=3):
    rng = random.Random(seed)
    rows = []
    i = 0
    for g, size in [("a", 317), ("b", 40), (None, 7), ("d", 1), ("e", 1000)]:
        for _ in range(size):
            rows.append((g, i, rng.randrange(0, 50)))  # heavy ties
            i += 1
    return spark.createDataFrame(rows, "g string, id long, v long")


def test_grouped_median_matches_naive(spark):
    df = _fixture(spark)
    got = {
        (r.g): (r.median, r.n)
        for r in grouped_median(df, ["g"], "v", tiebreak_cols=["id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    wg = Window.partitionBy("g")
    naive = (
        df.withColumn("_r", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wg))
        .filter(F.expr("_r = (_n + 1) div 2"))
    )
    want = {r.g: (r.v, r._n) for r in naive.collect()}
    assert got == want


def test_grouped_quantiles_matches_naive(spark):
    df = _fixture(spark, seed=9)
    qs = (10, 50, 90)
    got = {
        (r.g, r.q_pct): (r.value, r.n)
        for r in grouped_quantiles(df, ["g"], "v", qs, tiebreak_cols=["id"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    wg = Window.partitionBy("g")
    ranked = df.withColumn("_r", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wg)
    )
    want = {}
    for q in qs:
        for r in ranked.filter(F.expr(f"_r = ((_n - 1) * {q}) div 100 + 1")).collect():
            want[(r.g, q)] = (r.v, r._n)
    assert got == want
    # every group contributes every quantile (including the size-1 groups)
    groups = {r.g for r in df.select("g").distinct().collect()}
    assert {(g, q) for g in groups for q in qs} == set(got)
