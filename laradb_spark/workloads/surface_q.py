"""Surface-completion queries: outer joins (the reference reaches these
only via Merger.emitNoMatches, reference: opt/TupleImpl.kt:35,74), native
pivot, SQL-front-door passthrough, union-all, and approximate aggregates
(rows-only checks — HLL/KLL sketches differ across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load
from .relational import ratio_k


# --- outer joins ------------------------------------------------------------

def customer_order_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: every customer, order count possibly 0 — emitNoMatches
    on the left input."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            # scaled-integer sum: order-independent (see relational._iscale)
            (
                F.coalesce(
                    F.sum(F.round(F.col("o_totalprice") * 100).cast("long")), F.lit(0)
                )
                / F.lit(100.0)
            ).alias("total"),
        )
    )


LEFT_SQL = """
SELECT c_custkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0) / 100.0 AS total
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def nation_region_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with a deliberately partial dimension (regions > 2) —
    emitNoMatches on both inputs."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_regionkey") <= 2)
    region = load(spark, sf_dir, "region")
    return nation.join(region, nation.n_regionkey == region.r_regionkey, "full").select(
        "n_name", "r_name"
    )


FULL_SQL = """
SELECT n_name, r_name
FROM (SELECT * FROM nation WHERE n_regionkey <= 2) n
FULL OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
"""


def nation_presence_trio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way FULL OUTER chain (the reference's Merger is n-ary with
    emitNoMatches per input, opt/TupleImpl.kt:24-140): per-nation supplier
    and customer counts, nations present even when a side is empty."""
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    sup = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    cus = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        nation.join(sup, on="nk", how="full")
        .join(cus, on="nk", how="full")
        .select(
            F.col("nk").alias("n_nationkey"),
            "n_name",
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


TRIO_SQL = """
SELECT n.n_nationkey,
       n.n_name,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_suppliers,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_customers
FROM nation n
FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n FROM supplier GROUP BY s_nationkey) s
  ON n.n_nationkey = s.s_nationkey
FULL OUTER JOIN (SELECT c_nationkey, COUNT(*) AS n FROM customer GROUP BY c_nationkey) c
  ON n.n_nationkey = c.c_nationkey
"""


# --- native pivot -------------------------------------------------------------

def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        # scaled-integer sum: order-independent (see relational._iscale)
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / F.lit(100.0))
        .withColumnsRenamed({"F": "total_F", "O": "total_O", "P": "total_P"})
    )


PIVOT_NATIVE_SQL = """
SELECT o_orderpriority,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') / 100.0 AS total_F,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') / 100.0 AS total_O,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') / 100.0 AS total_P
FROM orders
GROUP BY o_orderpriority
"""


# --- union all ----------------------------------------------------------------

def all_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_acctbal").alias("acctbal")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        cust.unionAll(supp)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # integer-exact rounding (see relational._round_int)
            ratio_k(
                F.sum(F.round(F.col("acctbal") * 100).cast("long")), 2, F.count(F.lit(1)), 4
            ).alias("avg_bal"),
        )
    )


UNION_ALL_SQL = """
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
       ((2 * SUM(CAST(ROUND(acctbal * 100) AS BIGINT)) * 100 + COUNT(*)) // (2 * COUNT(*))) / 10000.0 AS avg_bal
FROM (
  SELECT 'customer' AS kind, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_acctbal AS acctbal FROM supplier
)
GROUP BY kind
"""


# --- SQL front door (spark.sql is itself part of the engine surface) ----------

def sql_front_door_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import LaraContext

    ctx = LaraContext(spark)
    ctx.register_dir(sf_dir, ["orders", "customer"])
    return ctx.sql(
        """
        SELECT c_mktsegment,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0
                    AS DOUBLE) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY c_mktsegment
        """
    )


SQL_FRONT_SQL = """
SELECT c_mktsegment,
       CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) / 100.0
            AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY c_mktsegment
"""


# --- D4M range/set filter: column-set semi-join (reference:
#     opt/D4mRangeFilter.kt:18-94 keeps entries whose column falls in a
#     D4M range set; here the set is a table → left-semi join, and a small
#     literal set → pushed-down IN filter) -------------------------------------

def d4m_set_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # range set = brands 'Brand#1'..'Brand#3' parts (semi-join) plus an
    # explicit leading-key range (l_orderkey < 5000) — the reference's
    # RangeSet intersection (opt/RangeSet.kt:10-101).
    parts = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey")
    return (
        li.filter(F.col("l_orderkey") < 5000)
        .join(parts, li.l_partkey == parts.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


D4M_SQL = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(l_quantity), 2) AS qty
FROM lineitem
WHERE l_orderkey < 5000
  AND l_partkey IN (SELECT p_partkey FROM part WHERE p_brand IN ('Brand#1','Brand#2','Brand#3'))
GROUP BY l_returnflag
"""


# --- map transform (reference: examples/rainysunny/MapRainToSunIterator.kt —
#     string-replace apply op over the value column) ---------------------------

def text_replace_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit("data"), F.lit("DATA")).alias("text2"),
    )


REPLACE_SQL = """
SELECT doc_id, REPLACE(text, 'data', 'DATA') AS text2 FROM documents
"""


# --- Raco front-door through the correctness gate: a Raco logical plan
#     (Scan → Select(GT) → Apply with DIVIDE/PLUS) compiled and executed,
#     hash-checked against plain SQL ---------------------------------------

RACO_PLAN = """
Dump(Apply([
    ('o_custkey', NamedAttributeRef('o_custkey')),
    ('o_totalprice', NamedAttributeRef('o_totalprice')),
    ('price_k', DIVIDE(NamedAttributeRef('o_totalprice'), NumericLiteral(1000.0))),
    ('tag', PLUS(NamedAttributeRef('o_orderstatus'), StringLiteral('-BIG')))
  ],
  Select(GT(NamedAttributeRef('o_totalprice'), NumericLiteral(400000.0)),
    Scan(RelationKey('public','adhoc','orders'),
         Scheme([('o_orderkey', 'LONG_TYPE'), ('o_custkey', 'LONG_TYPE'),
                 ('o_orderstatus', 'STRING_TYPE'), ('o_totalprice', 'DOUBLE_TYPE')]),
         10000, RepresentationProperties(frozenset([]), None, None)))))
"""


def raco_front_door_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.raco import RacoCompiler

    orders = load(spark, sf_dir, "orders")
    out = RacoCompiler(spark, {"orders": orders}).compile(RACO_PLAN).run()
    return out.select(
        "o_custkey", "o_totalprice", F.round("price_k", 6).alias("price_k"), "tag"
    )


RACO_Q_SQL = """
SELECT o_custkey, o_totalprice,
       ROUND(o_totalprice / 1000.0, 6) AS price_k,
       o_orderstatus || '-BIG' AS tag
FROM orders
WHERE o_totalprice > 400000.0
"""


# --- JSON column surface: extract typed fields from the events props sidecar --

def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events

    ev = load_events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(k).alias("n_with_k"),
        F.max(k).alias("max_k"),
    )


JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


# --- approximate aggregates, driver-certifiable ---------------------------------

def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with the error-bound check computed IN-PLAN, so
    the oracle can certify them by hash instead of recording `no_oracle`
    forever: the raw sketch values (engine-specific) never leave the
    plan — what comes out is the exact counts (oracle-computable) plus
    booleans stating the sketches landed inside their published bounds.

    * ``ndv_within_5pct`` — approx_count_distinct at rsd=0.01 (NOT the
      0.05 default: ±5% is ~5σ at rsd=0.01 vs the ~1σ coin-flip that
      flaked 6.4% at sf0.001) within ±5% of the exact distinct count.
    * ``p50_within_rank_eps`` — percentile_approx(accuracy=10000,
      rank error ≤ n/10⁴) checked by re-ranking the returned value
      against the data. The returned value occupies the whole rank
      INTERVAL [count(x < med)+1, count(x ≤ med)] when it has ties, and
      the guarantee only promises SOME rank in that interval is close to
      n/2 — so the check is interval intersection, not a point test:
      ``lo_rank ≤ n/2 + ε`` AND ``hi_rank ≥ n/2 − ε`` with
      ε = 0.01·n + 1, a 100× slack over the guarantee (the +1 absorbs
      tiny-n discreteness). A point test on count(x ≤ med) alone would
      flake on tie-heavy columns where the median value's multiplicity
      exceeds ε.

    Shape: the sketches and the exacts run as SEPARATE 1-row aggregates
    crossJoined after — putting count_distinct in the same Aggregate as
    the object sketches makes Catalyst plan an Expand (one row-group per
    distinct aggregate) and drops the whole thing to sort-based
    fallback: measured 21 s for the fused aggregate vs 2.5 s for the
    split pair at sf0.1 (each side alone is sub-second; the fusion is
    the cliff). The 1-row product then broadcasts back over a second
    scan for the rank count — three one-column scans total, no shuffle
    beyond the scalar aggregates."""
    li = load(spark, sf_dir, "lineitem")
    sketches = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_andv"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "_amed"
        ),
        F.count("l_extendedprice").alias("n_prices"),
    )
    exact = li.agg(F.count_distinct("l_orderkey").alias("exact_orders"))
    one = sketches.crossJoin(F.broadcast(exact))
    ranked = (
        li.select("l_extendedprice")
        .crossJoin(F.broadcast(one))
        .agg(
            F.first("exact_orders").alias("exact_orders"),
            F.first("n_prices").alias("n_prices"),
            F.first("_andv").alias("_andv"),
            F.first("_amed").alias("_amed"),
            (F.count_if(F.col("l_extendedprice") < F.col("_amed")) + 1).alias(
                "_lo_rank"
            ),
            F.count_if(F.col("l_extendedprice") <= F.col("_amed")).alias("_hi_rank"),
        )
    )
    eps = 0.01 * F.col("n_prices") + 1
    return ranked.select(
        F.col("exact_orders").cast("long").alias("exact_orders"),
        F.col("n_prices").cast("long").alias("n_prices"),
        (
            F.abs(F.col("_andv") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("ndv_within_5pct"),
        (
            (F.col("_lo_rank") <= 0.5 * F.col("n_prices") + eps)
            & (F.col("_hi_rank") >= 0.5 * F.col("n_prices") - eps)
        ).alias("p50_within_rank_eps"),
    )


APPROX_STATS_SQL = """
SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(l_extendedprice) AS BIGINT) AS n_prices,
       TRUE AS ndv_within_5pct,
       TRUE AS p50_within_rank_eps
FROM lineitem
"""


# --- multimodal features (fake codec is digest-derived → SQL-expressible) ------

def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.multimodal import extract_features, synthesize_media_from_documents

    docs = load(spark, sf_dir, "documents")
    media = synthesize_media_from_documents(docs)
    feats = extract_features(media, fake_codec=True)
    return feats.select("doc_id", "media_type", "n_bytes", "digest", "width", "height")


MULTIMODAL_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest,
       CAST(16 + ('0x' || substr(md5(text), 1, 2))::INT % 64 AS INT) AS width,
       CAST(16 + ('0x' || substr(md5(text), 3, 2))::INT % 64 AS INT) AS height
FROM documents
"""


QUERIES = {
    "customer_order_counts_left": (customer_order_counts_left, LEFT_SQL),
    "nation_region_full_outer": (nation_region_full_outer, FULL_SQL),
    "nation_presence_trio": (nation_presence_trio, TRIO_SQL),
    "order_status_pivot": (order_status_pivot, PIVOT_NATIVE_SQL),
    "all_account_balances": (all_account_balances, UNION_ALL_SQL),
    "sql_front_door_q": (sql_front_door_q, SQL_FRONT_SQL),
    "d4m_set_filter": (d4m_set_filter, D4M_SQL),
    "events_json_stats": (events_json_stats, JSON_SQL),
    "raco_front_door_q": (raco_front_door_q, RACO_Q_SQL),
    "text_replace_map": (text_replace_map, REPLACE_SQL),
    "approx_stats": (approx_stats, APPROX_STATS_SQL),
    "multimodal_features": (multimodal_features, MULTIMODAL_SQL),
}
