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


# --- Q9 shape: profit by nation and year (no partsupp table in the synthetic
# schema — supply cost proxied as p_retailprice·l_quantity/10, keeping the
# 5-table join + 2-key rollup shape) ------------------------------------------

def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(money2(F.sum(_iscale(amount, 10_000)), 4).alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
       ((2 * SUM(CAST(ROUND((l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1) * 10000) AS BIGINT)) + 100) // 200) / 100.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
"""


# --- Q11 shape: group value vs fraction-of-global-total scalar subquery
# (partsupp value → supplier account balance per nation; the exact-integer
# comparison s·20 > total makes the HAVING boundary engine-stable) -----------

def q11_nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    per = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_iscale(F.col("s_acctbal"), 100)).alias("_s"))
    )
    total = per.agg(F.sum("_s").alias("_t"))
    return (
        per.crossJoin(F.broadcast(total))
        .filter(F.col("_s") * 20 > F.col("_t"))
        .select(F.col("n_name").alias("nation"),
                (F.col("_s") / F.lit(100.0)).alias("value"))
    )


Q11_SQL = """
WITH per AS (
  SELECT n_name, SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS s
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name AS nation, s / 100.0 AS value
FROM per WHERE s * 20 > (SELECT SUM(s) FROM per)
"""


# --- Q13 shape: customer order-count distribution (left join + double agg;
# the comment NOT LIKE filter becomes an order-priority exclusion) -----------

def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- Q15 shape: top supplier by quarterly revenue (view + MAX scalar
# subquery; revenue kept as a scaled BIGINT so the = comparison is exact) -----

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("_r"))
    mx = rev.agg(F.max("_r").alias("_m"))
    top = rev.crossJoin(F.broadcast(mx)).filter(F.col("_r") == F.col("_m"))
    return top.join(F.broadcast(supp), top.l_suppkey == supp.s_suppkey).select(
        "s_suppkey", "s_name", money2(F.col("_r"), 4).alias("total_revenue")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, ((2 * r + 100) // 200) / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


# --- Q16 shape: distinct-supplier count per part group, excluding flagged
# suppliers (partsupp → the lineitem part-supplier relation; 'complaints'
# exclusion → negative account balance) --------------------------------------

def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
              ps.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q18 shape: large-volume customers (HAVING SUM over the fact, then
# enrich; quantities are integral doubles so the long cast is exact) ---------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 350)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate").cast("date").alias("o_orderdate"),
                "o_totalprice", "sum_qty")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       o_totalprice, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 350
"""


# --- Q21 shape: EXISTS + NOT EXISTS against the same fact (waiting-supplier
# receipt/commit predicate → sole-'R'-returnflag-in-a-multi-supplier-order) ---

def q21_sole_fault_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("_o2"), F.col("l_suppkey").alias("_s2"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("_o3"), F.col("l_suppkey").alias("_s3")
    )
    cand = (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey, "left_semi")
        .join(l2, (F.col("l_orderkey") == F.col("_o2")) & (F.col("l_suppkey") != F.col("_s2")),
              "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("_o3")) & (F.col("l_suppkey") != F.col("_s3")),
              "left_anti")
    )
    return (
        cand.join(F.broadcast(supp), cand.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
"""


# --- Q22 shape: above-average balances with no orders (country-code
# substring → nation-key bucket; the avg threshold is compared as
# balance·count > sum so the boundary is engine-exact) ------------------------

def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    # "no orders" → "no RECENT orders": the synthetic fixture gives every
    # customer at least one order, so the classic predicate is vacuous
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    sel = cust.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    pos = sel.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_iscale(F.col("c_acctbal"), 100)).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    rich = sel.crossJoin(F.broadcast(pos)).filter(
        _iscale(F.col("c_acctbal"), 100) * F.col("_n") > F.col("_s")
    )
    idle = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             (F.sum(_iscale(F.col("c_acctbal"), 100)) / F.lit(100.0)).alias("totacctbal"))
    )


Q22_SQL = """
WITH sel AS (SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
pos AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM sel WHERE c_acctbal > 0
)
SELECT c_nationkey AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
       SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
FROM sel, pos
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n > s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


QUERIES = {
    "q2_cheapest_part_per_type": (q2_cheapest_part_per_type, Q2_SQL),
    "q9_profit_by_nation_year": (q9_profit_by_nation_year, Q9_SQL),
    "q11_nation_balance_share": (q11_nation_balance_share, Q11_SQL),
    "q13_order_count_distribution": (q13_order_count_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_count_by_part": (q16_supplier_count_by_part, Q16_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q21_sole_fault_suppliers": (q21_sole_fault_suppliers, Q21_SQL),
    "q22_idle_rich_customers": (q22_idle_rich_customers, Q22_SQL),
    "q7_nation_volume": (q7_nation_volume, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q12_priority_buckets": (q12_priority_buckets, Q12_SQL),
    "q14_promo_share": (q14_promo_share, Q14_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "q20_promo_suppliers": (q20_promo_suppliers, Q20_SQL),
}
