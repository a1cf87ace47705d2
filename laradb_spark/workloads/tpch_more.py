"""Extended TPC-H-shaped pack (adapted to the driver's synthetic schema —
no partsupp table, p_type is a plain category): correlated min-per-group,
nation-pair volume, market share, returned-item ranking, conditional
buckets, promo share, disjunctive predicates, nested semi-join.

All money SUMs use the scaled-integer pattern (see relational.py) so the
oracle hash can't flip on summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load
from .relational import _iscale, money2


def _rev(scale: int = 10_000) -> Column:
    return _iscale(F.col("l_extendedprice") * (1 - F.col("l_discount")), scale)


# --- Q2 shape: correlated min per group -------------------------------------

def q2_cheapest_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    mins = part.groupBy("p_type").agg(F.min("p_retailprice").alias("min_price"))
    mins = mins.select(F.col("p_type").alias("mt"), "min_price")
    return (
        part.join(
            F.broadcast(mins),
            (part.p_type == mins.mt) & (part.p_retailprice == mins.min_price),
        )
        .select("p_type", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"))
    )


Q2_SQL = """
SELECT p_type, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice
FROM part p
WHERE p_retailprice = (SELECT MIN(p_retailprice) FROM part WHERE p_type = p.p_type)
"""


# --- Q7 shape: nation-pair trade volume --------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cnk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(money2(F.sum(_rev()), 4).alias("revenue"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(YEAR(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
       ((2 * SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 100) // 200) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND n1.n_name < n2.n_name
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q8 shape: market share (ratio of exact integer sums) ---------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
    )
    target = F.when(F.col("n_name") == "NATION_3", _rev()).otherwise(F.lit(0))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(target) / F.sum(_rev()), 6).alias("mkt_share"),
        )
    )


Q8_SQL = """
SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
       ROUND(SUM(CASE WHEN n_name = 'NATION_3'
                      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                      ELSE 0 END)
             / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY o_year
"""


# --- Q10 shape: returned-item revenue ranking ----------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(money2(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       ((2 * SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 100) // 200) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q12 shape: conditional priority buckets -----------------------------------

def q12_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""


# --- Q14 shape: promo revenue share ----------------------------------------------

def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))
    return joined.agg(
        F.round(F.lit(100.0) * F.sum(promo) / F.sum(_rev()), 6).alias("promo_share")
    )


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                              ELSE 0 END)
             / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)), 6) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- Q19 shape: disjunctive brand/size/quantity predicates ------------------------

def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 30))
    )
    return joined.filter(cond).agg(money2(F.sum(_rev()), 4).alias("revenue"))


Q19_SQL = """
SELECT ((2 * SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 100) // 200) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity >= 20)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity >= 30)
"""


# --- Q20 shape: nested semi-join (suppliers of high-volume promo parts) -----------

def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 500)
        .select("l_suppkey")
    )
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 500
)
"""


QUERIES = {
    "q2_cheapest_part_per_type": (q2_cheapest_part_per_type, Q2_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q12_priority_buckets": (q12_priority_buckets, Q12_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q20_promo_suppliers": (q20_promo_suppliers, Q20_SQL),
}
