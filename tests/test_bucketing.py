"""Bucketed-table co-located join: writing both sides bucketed on the join
key eliminates the shuffle (zero Exchange on the join path) — the engine's
answer to the reference's partition propagation / pre-split optimization
(reference: sensor/SensorCalc.kt:159-173 PropagatePartition)."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    # spark-warehouse location is fixed per session; use unique table names
    return spark


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
    (orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (cust.withColumnRenamed("c_custkey", "o_custkey")
     .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").saveAsTable("b_cust"))

    bo = spark.table("b_orders")
    bc = spark.table("b_cust")
    joined = bo.join(bc, on="o_custkey").groupBy("c_mktsegment").agg(
        F.sum("o_totalprice").alias("t")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan
    # the join inputs come straight from the bucketed scans — no shuffle
    assert "Exchange hashpartitioning(o_custkey" not in plan

    # and the result matches the plain (shuffling) join
    plain = orders.join(
        cust.withColumnRenamed("c_custkey", "o_custkey"), on="o_custkey"
    ).groupBy("c_mktsegment").agg(F.sum("o_totalprice").alias("t"))
    got = {(r.c_mktsegment): round(r.t, 2) for r in joined.collect()}
    want = {(r.c_mktsegment): round(r.t, 2) for r in plain.collect()}
    assert got == want

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
