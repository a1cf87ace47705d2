"""Advanced operator coverage: as-of join, range join, exact percentiles,
cube/grouping sets, intersect, anti join, scalar subquery, and the F5
graph workload (degree + sparse Gram matrix) — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import asof_join, range_self_join
from . import load
from .relational import _iscale, ratio_k


# --- as-of join -----------------------------------------------------------
# For each event (mapped into the order-date era to be non-degenerate),
# attach the customer's most recent order at/before that date.

def _events_in_order_era(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "user_id")
    # deterministic synthetic event date inside the orders range
    return ev.withColumn(
        "event_date",
        F.date_add(F.lit("1995-01-01").cast("date"), (F.col("event_id") % 2000).cast("int")),
    )


def asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_in_order_era(spark, sf_dir)
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("o_date"), "o_orderkey"
    )
    ev = ev.withColumnRenamed("user_id", "o_custkey")
    out = asof_join(
        ev,
        orders,
        on="o_custkey",
        left_time="event_date",
        right_time="o_date",
        payload=["o_orderkey"],
        tiebreak="o_orderkey",
    )
    return out.select(
        "event_id", F.col("o_custkey").alias("user_id"), "event_date", "o_orderkey"
    )


ASOF_SQL = """
WITH ev AS (
  SELECT event_id, user_id,
         CAST(DATE '1995-01-01' + (event_id % 2000) * INTERVAL 1 DAY AS DATE) AS event_date
  FROM events
),
ranked AS (
  SELECT e.event_id, e.user_id, CAST(e.event_date AS DATE) AS event_date, o.o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM ev e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS DATE) <= e.event_date
)
SELECT event_id, user_id, event_date, o_orderkey
FROM ranked WHERE rn = 1 OR rn IS NULL
"""


# --- range self-join --------------------------------------------------------
# Order pairs of the same customer within 30 days of each other.

RANGE_GAP_DAYS = 30


def orders_within_30_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_date(F.to_date("o_orderdate")).alias("od"),
        "o_orderkey",
    )
    pairs = range_self_join(
        orders, key="o_custkey", order_col="od", id_col="o_orderkey", max_gap=RANGE_GAP_DAYS
    )
    return pairs.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_pairs"))


RANGE_SQL = f"""
WITH o AS (
  SELECT o_custkey, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS od,
         o_orderkey
  FROM orders
)
SELECT a.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND ABS(a.od - b.od) <= {RANGE_GAP_DAYS}
GROUP BY a.o_custkey
"""


# --- exact percentiles -------------------------------------------------------

def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


PERCENTILE_SQL = """
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
       ROUND(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderstatus
"""


# --- cube + grouping id --------------------------------------------------------

def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        # scaled-integer sum: order-independent (see relational._iscale)
        (F.sum(_iscale("o_totalprice", 100)) / F.lit(100.0)).alias("total"),
        F.grouping_id().alias("gid"),
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- intersect ------------------------------------------------------------------

def repeat_customers_96_97(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97)


INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE YEAR(CAST(o_orderdate AS DATE)) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE YEAR(CAST(o_orderdate AS DATE)) = 1997
"""


# --- anti join --------------------------------------------------------------------

def suppliers_without_recent_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    recent = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("l_suppkey")
    return supp.join(
        recent, supp.s_suppkey == recent.l_suppkey, "left_anti"
    ).select("s_suppkey", "s_name")


ANTI_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_suppkey = s_suppkey AND l_shipdate >= TIMESTAMP '2000-01-01'
)
"""


# --- scalar subquery (TPC-H Q17 shape) ----------------------------------------------

def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    avg_q = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.5).alias("half_avg"))
    return (
        li.join(F.broadcast(avg_q), on="l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            # exact: round_int(100·s/7)/1e4 where s = cents sum (see
            # relational._round_int for why ROUND(double) is unsafe here)
            ratio_k(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")), 2, F.lit(7), 4).alias(
                "avg_yearly"
            )
        )
    )


Q17_SQL = """
SELECT ((2 * SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) * 100 + 7) // 14) / 10000.0 AS avg_yearly
FROM lineitem l
WHERE l_quantity < (
  SELECT 0.5 * AVG(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey
)
"""


# --- F5 graph workload: degree + sparse Gram (brand-supplier graph) -------------------

def graph_brand_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree table of the brand–supplier bipartite graph (edge weight =
    lineitem count) — the reference's D4M degree-table ingest pattern
    (reference: util/D4MTableWriter.kt:26-55, sum-combined on ingest)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    edges = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return edges.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("degree"), F.sum("w").alias("strength")
    )


DEGREE_SQL = """
WITH edges AS (
  SELECT p_brand, l_suppkey, CAST(COUNT(*) AS BIGINT) AS w
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, l_suppkey
)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS degree, CAST(SUM(w) AS BIGINT) AS strength
FROM edges GROUP BY p_brand
"""


def graph_brand_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse Gram matrix G = AᵀA of the brand–supplier matrix — the
    TableMult pattern (reference: sensor/SensorCalc.kt:324-330): join on
    the shared supplier dimension, multiply, sum; upper triangle only
    (reference: SensorCalc.kt:326,733 SymmetricCovariance)."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    a = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "p_brand")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    b = a.select(
        F.col("l_suppkey"), F.col("p_brand").alias("brand2"), F.col("w").alias("w2")
    )
    return (
        a.join(b, on="l_suppkey")
        .filter(F.col("p_brand") <= F.col("brand2"))
        .groupBy(F.col("p_brand").alias("brand1"), "brand2")
        .agg(F.round(F.sum(F.col("w") * F.col("w2")), 2).alias("g"))
    )


GRAM_SQL = """
WITH a AS (
  SELECT l_suppkey, p_brand, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY l_suppkey, p_brand
)
SELECT x.p_brand AS brand1, y.p_brand AS brand2, ROUND(SUM(x.w * y.w), 2) AS g
FROM a x JOIN a y ON x.l_suppkey = y.l_suppkey
WHERE x.p_brand <= y.p_brand
GROUP BY brand1, brand2
"""


# --- fixed-point PageRank on the supplier↔part graph ---------------------

_PR_ITERS = 2
_PR_DAMP = 85


def pagerank_supplier_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (integer rank units — bit-exact across
    engines; operators/graph.py) on the undirected supplier↔part graph
    (each lineitem relation yields both directed edges; string-prefixed
    ids keep the two key spaces disjoint)."""
    from ..operators.graph import pagerank_fixed_point

    li = load(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
        F.concat(F.lit("p"), F.col("l_partkey")).alias("p"),
    )
    edges = li.select(F.col("s").alias("src"), F.col("p").alias("dst")).union(
        li.select(F.col("p").alias("src"), F.col("s").alias("dst"))
    )
    return pagerank_fixed_point(edges, iters=_PR_ITERS, damping_pct=_PR_DAMP)


def _pagerank_sql() -> str:
    from ..operators.graph import SCALE

    d = _PR_DAMP
    ctes = [
        """le AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS s,
                       'p' || CAST(l_partkey AS VARCHAR) AS p FROM lineitem)""",
        "edges AS (SELECT s AS src, p AS dst FROM le UNION SELECT p, s FROM le)",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src)",
        f"base AS (SELECT id, {SCALE} // (SELECT COUNT(*) FROM nodes) AS base FROM nodes)",
        "pr0 AS (SELECT id, base AS pr FROM base)",
    ]
    for k in range(_PR_ITERS):
        ctes.append(
            f"""c{k + 1} AS (
  SELECT e.dst AS id, SUM(p.pr // d.outdeg) AS c
  FROM edges e JOIN pr{k} p ON p.id = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst)"""
        )
        ctes.append(
            f"""pr{k + 1} AS (
  SELECT b.id, ({100 - d} * b.base) // 100 + ({d} * COALESCE(c.c, 0)) // 100 AS pr
  FROM base b LEFT JOIN c{k + 1} c ON c.id = b.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, CAST(pr AS BIGINT) AS pr FROM pr{_PR_ITERS}"
    )


def supplier_copart_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the supplier co-part graph (suppliers adjacent
    iff some part ships from both): bipartite projection → oriented
    two-join triangle kernel (operators/graph.py triangle_count, the
    Graphulo L·U∘A pattern). The projection's per-part pair fan-out is
    bounded by suppliers-per-part (a catalog constant, ~4 in TPC-H data);
    for unbounded fan-out data the LSH bucket-cap pattern applies."""
    from ..operators.graph import triangle_count

    ps = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    a = ps.select(F.col("l_partkey").alias("k"), F.col("l_suppkey").alias("src"))
    b = ps.select(F.col("l_partkey").alias("k"), F.col("l_suppkey").alias("dst"))
    copart = (
        a.join(b, on="k")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return triangle_count(copart)


TRIANGLE_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_suppkey AS s1, b.l_suppkey AS s2
  FROM ps a JOIN ps b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.s1 = e1.s2
JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2
"""


QUERIES = {
    "asof_last_order": (asof_last_order, ASOF_SQL),
    "orders_within_30_days": (orders_within_30_days, RANGE_SQL),
    "order_price_percentiles": (order_price_percentiles, PERCENTILE_SQL),
    "cube_order_stats": (cube_order_stats, CUBE_SQL),
    "repeat_customers_96_97": (repeat_customers_96_97, INTERSECT_SQL),
    "suppliers_without_recent_sales": (suppliers_without_recent_sales, ANTI_SQL),
    "small_quantity_revenue": (small_quantity_revenue, Q17_SQL),
    "graph_brand_degree": (graph_brand_degree, DEGREE_SQL),
    "graph_brand_gram": (graph_brand_gram, GRAM_SQL),
    "pagerank_supplier_part": (pagerank_supplier_part, _pagerank_sql()),
    "supplier_copart_triangles": (supplier_copart_triangles, TRIANGLE_SQL),
}
