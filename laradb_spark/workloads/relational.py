"""Relational surface queries (SURVEY.md §2.2): scan, filter-pushdown,
projection-with-expressions, joins, aggregation, set ops — the layer the
reference reaches through Raco plans (reference: opt/raco/RacoOperators.kt),
here expressed directly as DataFrame plans + matching DuckDB oracle SQL.

Scale notes: every query below is a scan→(broadcast|shuffle)join→hash-agg
shape; dimension tables broadcast (region/nation/supplier/part are tiny at
any SF); fact-table filters sit directly on the scan so parquet row-group
stats prune.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


# --- TPC-H Q1 shape: big scan + 8-agg rollup ------------------------------

# Money columns are exact decimals (2dp; products 4-6dp). A double SUM's
# result depends on addend order, and when the TRUE sum lands exactly on a
# rounding boundary (.xx5) the order-dependent ulp decides the round — a
# cross-run/cross-engine coin flip. Fix: sum SCALED INTEGERS (exact,
# order-independent), divide once at the end (single correctly-rounded op).

def _iscale(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def _round_int(a: Column, b: Column | int) -> Column:
    """Half-up integer rounding of a/b for nonnegative exact-integer
    columns: (2a+b) div 2b — computed with %-and-subtract so every double
    step is an exact multiple (requires 2a+b < 2^53, true for all uses
    here). Why not ROUND(double): Spark rounds the shortest decimal string
    of the double, DuckDB rounds the binary value — at an exact half
    boundary (which scaled-decimal data hits routinely) they disagree."""
    t = 2 * a + b
    den = 2 * b if isinstance(b, int) else b * 2
    return ((t - t % den) / den).cast("long")


def money2(scaled: Column, m: int) -> Column:
    """Exact round-to-2dp of an integer sum in 10^-m units (m ≥ 2)."""
    return _round_int(scaled, 10 ** (m - 2)) / F.lit(100.0)


def ratio_k(scaled: Column, m: int, n: Column, k: int) -> Column:
    """Exact round-to-k of (scaled/10^m)/n for k ≥ m: integer-round
    (scaled·10^(k-m))/n, then one exact division."""
    return _round_int(scaled * 10 ** (k - m), n) / F.lit(float(10 ** k))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),  # integral: exact
            (F.sum(_iscale("l_extendedprice", 100)) / F.lit(100.0)).alias("sum_base_price"),
            money2(F.sum(_iscale(disc_price, 10_000)), 4).alias("sum_disc_price"),
            money2(F.sum(_iscale(charge, 10_000)), 4).alias("sum_charge"),
            ratio_k(F.sum("l_quantity").cast("long"), 0, n, 4).alias("avg_qty"),
            ratio_k(F.sum(_iscale("l_extendedprice", 100)), 2, n, 4).alias("avg_price"),
            ratio_k(F.sum(_iscale("l_discount", 100)), 2, n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# SQL twin of _round_int: (2a+b)//(2b), exact in DuckDB HUGEINT.
def _sql_round_int(a: str, b: str) -> str:
    return f"((2 * ({a}) + ({b})) // (2 * ({b})))"


def _sql_money2(sum_expr: str, m: int) -> str:
    return f"{_sql_round_int(sum_expr, str(10 ** (m - 2)))} / 100.0"


def _sql_ratio_k(sum_expr: str, m: int, n_expr: str, k: int) -> str:
    return f"{_sql_round_int(f'({sum_expr}) * {10 ** (k - m)}', n_expr)} / {float(10 ** k)}"


_S_PRICE = "SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
_S_DISC_PRICE = "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))"
_S_CHARGE = "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT))"

Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       {_S_PRICE} / 100.0 AS sum_base_price,
       {_sql_money2(_S_DISC_PRICE, 4)} AS sum_disc_price,
       {_sql_money2(_S_CHARGE, 4)} AS sum_charge,
       {_sql_ratio_k('SUM(CAST(l_quantity AS BIGINT))', 0, 'COUNT(*)', 4)} AS avg_qty,
       {_sql_ratio_k(_S_PRICE, 2, 'COUNT(*)', 4)} AS avg_price,
       {_sql_ratio_k("SUM(CAST(ROUND(l_discount * 100) AS BIGINT))", 2, 'COUNT(*)', 6)} AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3 shape: 3-way join + top-k -----------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            money2(
                F.sum(_iscale(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)), 4
            ).alias("revenue")
        )
        .select("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "revenue")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       ((2 * SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 100) // 200) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate  > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q5 shape: 6-way join, dims broadcast ---------------------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            money2(
                F.sum(_iscale(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10_000)), 4
            ).alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name,
       ((2 * SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 100) // 200) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# --- TPC-H Q4 shape: EXISTS semi-join --------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    late = load(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


# --- window top-k per group -------------------------------------------------

def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand. Per-brand window is deliberate:
    the part table is DIMENSION-sized (≈25 brands over a catalog, not a
    fact stream), so each brand's partition is bounded by catalog size —
    the corpus-sized-input collapse grouped_rank exists for doesn't
    arise. Swap to grouped_rank only if ranking fact-sized input."""
    from pyspark.sql.window import Window

    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", F.round("p_retailprice", 2).alias("p_retailprice"), "rn")
    )


TOPK_SQL = """
SELECT p_brand, p_partkey, ROUND(p_retailprice, 2) AS p_retailprice,
       CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS INT) AS rn
FROM part
QUALIFY rn <= 3
"""


# --- rollup ------------------------------------------------------------------

def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- set ops -----------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    ordered = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.subtract(ordered)  # EXCEPT DISTINCT


EXCEPT_SQL = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
"""


# --- pivot (conditional aggregation) ----------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events

    ev = load_events(spark, sf_dir)
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}") for t in EVENT_TYPES
    ] + [(F.sum(_iscale("value", 100)) / F.lit(100.0)).alias("sum_value")]
    return ev.groupBy(F.to_date(F.timestamp_millis(F.col("ts_ms"))).alias("day")).agg(*aggs)


PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day,
       {counts},
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY day
""".format(
    counts=",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
)


# --- distinct counting --------------------------------------------------------

def events_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events

    ev = load_events(spark, sf_dir)
    return ev.groupBy(F.to_date(F.timestamp_millis(F.col("ts_ms"))).alias("day")).agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


DAILY_USERS_SQL = """
SELECT CAST(ts AS DATE) AS day,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY day
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "topk_parts_per_brand": (topk_parts_per_brand, TOPK_SQL),
    "rollup_returns": (rollup_returns, ROLLUP_SQL),
    "customers_without_orders": (customers_without_orders, EXCEPT_SQL),
    "events_daily_pivot": (events_daily_pivot, PIVOT_SQL),
    "events_daily_users": (events_daily_users, DAILY_USERS_SQL),
}
