"""Store paths: partitioned parquet write (partition pruning on read-back)
and LaraTable store/load round-trip (reference Store:
api/TupleOp.kt:595-605 via RemoteWriteIterator)."""

import os

from pyspark.sql import functions as F

from laradb_spark import LaraSchema, LaraTable


def test_partitioned_store_prunes_on_read(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("year").parquet(out)

    back = spark.read.parquet(out).filter(F.col("year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the scan carries a partition filter on year
    assert "PartitionFilters" in plan and "year" in plan.split("PartitionFilters")[1][:200]
    want = orders.filter(F.col("year") == 1997).count()
    assert back.count() == want
    # physical layout: one directory per year
    years = [d for d in os.listdir(out) if d.startswith("year=")]
    assert len(years) >= 5


def test_lara_store_load_roundtrip(spark, tmp_path):
    schema = LaraSchema.of([("k", "STRING")], [("v", "DOUBLE", 0.0)])
    t = LaraTable.from_rows(spark, [("a", 1.5), ("b", 2.5)], schema)
    path = str(tmp_path / "lara_t.parquet")
    t.store(path)
    back = LaraTable.load(spark, path, schema)
    assert back.collect_sorted() == [("a", 1.5), ("b", 2.5)]
