"""Lara-algebra queries run through the LaraTable operator surface
(SURVEY.md §2.1), each with a DuckDB oracle: Ext (flatMap), MergeUnion
(⊕ fold on common key prefix), MergeJoin (⊗ on shared prefix) + MergeAgg
— i.e. the reference's three-operator algebra exercised end-to-end on the
driver's synthetic tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.semiring import ExtFun
from ..schema import LaraSchema
from ..sensor import sensor_covariance_pipeline
from ..table import LaraTable
from . import load


# --- Ext + Agg: WordCount on documents (reference:
#     examples/wordcount/WordCountQuery.kt:33-44) ---------------------------

def lara_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = LaraTable(
        load(spark, sf_dir, "documents"),
        LaraSchema.of([("doc_id", "LONG")], [("text", "STRING", None)]),
    )
    tokenize = ExtFun(
        "tokenize",
        LaraSchema.of([("word", "STRING")], [("cnt", "LONG", 0)]),
        expr=lambda text: F.transform(
            F.filter(F.split(text, " "), lambda w: w != F.lit("")),
            lambda w: F.struct(w.alias("word"), F.lit(1).cast("long").alias("cnt")),
        ),
        expr_cols=("text",),
    )
    out = docs.ext(tokenize).agg(["word"], {"cnt": "sum_long"})
    return out.df


WORDCOUNT_SQL = """
SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
"""


# --- MergeUnion with ⊕=sum: half-year revenue tables folded together
#     (reference: api/TupleOp.kt:295-521) -----------------------------------

def lara_union_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    half1 = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    half2 = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    # Money kept in exact cents (LONG) through the ⊕=sum fold so the result
    # is summation-order-independent; one division at the end (see
    # relational._iscale for why double sums flip on .xx5 boundaries).
    schema = LaraSchema.of([("o_custkey", "LONG")], [("rev", "LONG", 0)])

    def to_lara(df: DataFrame) -> LaraTable:
        return LaraTable(
            df.groupBy("o_custkey").agg(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
            ),
            schema,
        )

    u = to_lara(half1).union(to_lara(half2), {"rev": "sum"})
    return u.df.select("o_custkey", (F.col("rev") / F.lit(100.0)).alias("rev"))


UNION_SQL = """
SELECT o_custkey, SUM(rev) / 100.0 AS rev FROM (
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev FROM orders
  WHERE o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey
  UNION ALL
  SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev FROM orders
  WHERE o_orderdate >= TIMESTAMP '1998-01-01' GROUP BY o_custkey
) GROUP BY o_custkey
"""


# --- MergeJoin + MergeAgg = TableMult: event-type co-occurrence Gram matrix
#     M(u,e)→v; G = MᵀM (reference: sensor/SensorCalc.kt:324-330) ------------

def lara_matmul_event_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
    # Integer-exact intermediate: m in ten-thousandths as BIGINT. Decimal
    # addends can sum to EXACTLY a .xx5 boundary, where the summation-order
    # ulp decides the final round — a cross-run coin flip (observed). With
    # integer products (≤2.5e16, no overflow) the Gram sum is exact and
    # order-independent; one final division is correctly rounded identically
    # on both engines.
    m = ev.groupBy("user_id", "event_type").agg(
        F.round(F.sum("value") * 10000).cast("long").alias("v")
    )
    a = LaraTable(
        m.select("user_id", F.col("event_type").alias("e1"), "v"),
        LaraSchema.of([("user_id", "LONG"), ("e1", "STRING")], [("v", "LONG", 0)]),
    )
    b = LaraTable(
        m.select("user_id", F.col("event_type").alias("e2"), "v"),
        LaraSchema.of([("user_id", "LONG"), ("e2", "STRING")], [("v", "LONG", 0)]),
    )
    # join on shared key prefix (user_id), ⊗ = multiply; then agg out user_id
    # with ⊕ = sum — the TableMult fusion. Upper triangle (O10).
    g = (
        a.join(b, {"v": "multiply"})
        .filter(F.col("e1") <= F.col("e2"))
        .sort(["e1", "e2", "user_id"])
        .agg(["e1", "e2"], {"v": "sum"})
    )
    return g.df.select(
        "e1", "e2", F.round(F.col("v").cast("double") / 1e8, 2).alias("v")
    )


MATMUL_SQL = """
WITH m AS (
  SELECT user_id, event_type, CAST(ROUND(SUM(value) * 10000) AS BIGINT) AS v
  FROM events GROUP BY user_id, event_type
)
SELECT a.event_type AS e1, b.event_type AS e2,
       ROUND(CAST(CAST(SUM(a.v * b.v) AS BIGINT) AS DOUBLE) / 1e8, 2) AS v
FROM m a JOIN m b ON a.user_id = b.user_id
WHERE a.event_type <= b.event_type
GROUP BY e1, e2
"""


# --- Flagship: sensor covariance pipeline on events -------------------------
# A = even event_id rows, B = odd — two overlapping sensor tables
# (t = epoch-millis(ts), c = event_type, v = value), 1-hour bins.

SENSOR_BIN_MS = 3_600_000


def _events_as_sensor(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    from . import load_events

    ev = load_events(spark, sf_dir).select(
        F.col("ts_ms").alias("t"),
        F.col("event_type").alias("c"),
        F.col("value").alias("v"),
        "event_id",
    )
    a = ev.filter(F.col("event_id") % 2 == 0).drop("event_id")
    b = ev.filter(F.col("event_id") % 2 == 1).drop("event_id")
    return a, b


def sensor_covariance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _events_as_sensor(spark, sf_dir)
    c = sensor_covariance_pipeline(a, b, bin_ms=SENSOR_BIN_MS)
    return c.select("c1", "c2", F.round("cov", 6).alias("cov"))


SENSOR_SQL = f"""
WITH ev AS (
  SELECT epoch_ms(CAST(ts AS TIMESTAMP)) AS t, event_type AS c, value AS v, event_id
  FROM events
),
binned AS (
  SELECT CASE WHEN t % {SENSOR_BIN_MS} >= {SENSOR_BIN_MS // 2}
              THEN t - t % {SENSOR_BIN_MS} + {SENSOR_BIN_MS}
              ELSE t - t % {SENSOR_BIN_MS} END AS tp,
         c, v, event_id % 2 AS side
  FROM ev
),
mean_a AS (SELECT tp, c, AVG(v) AS v FROM binned WHERE side = 0 GROUP BY tp, c),
mean_b AS (SELECT tp, c, AVG(v) AS v FROM binned WHERE side = 1 GROUP BY tp, c),
x AS (
  SELECT a.tp, a.c, a.v - b.v AS v
  FROM mean_a a JOIN mean_b b ON a.tp = b.tp AND a.c = b.c
),
n AS (SELECT COUNT(DISTINCT tp) AS n FROM x),
cmean AS (SELECT c, AVG(v) AS m FROM x GROUP BY c),
u AS (SELECT x.tp, x.c, x.v - cmean.m AS v FROM x JOIN cmean ON x.c = cmean.c)
SELECT u1.c AS c1, u2.c AS c2,
       ROUND(SUM(u1.v * u2.v) / (MAX(n.n) - 1), 6) AS cov
FROM u u1 JOIN u u2 ON u1.tp = u2.tp, n
WHERE u1.c <= u2.c
GROUP BY c1, c2
"""


def lara_wordcount_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same WordCount through the general (arbitrary-Python) ExtFun path —
    mapInPandas, Arrow-batched — proving the general path is still correct
    against the identical oracle. Uses the vectorized batch contract
    (pandas split+explode per Arrow batch, ~5× the per-record-dict shim
    at sf0.1); the per-tuple py_fn shim is golden-tested in
    tests/test_lara_goldens.py."""

    def tokenize_batch(pdf):
        out = pdf[["doc_id"]].assign(word=pdf["text"].fillna("").str.split(" "))
        out = out.explode("word")
        out = out[out["word"].notna() & (out["word"] != "")]
        return out.assign(cnt=1)

    docs = LaraTable(
        load(spark, sf_dir, "documents"),
        LaraSchema.of([("doc_id", "LONG")], [("text", "STRING", None)]),
    )
    tokenize = ExtFun(
        "tokenize_py",
        LaraSchema.of([("word", "STRING")], [("cnt", "LONG", 0)]),
        batch_fn=tokenize_batch,
    )
    return docs.ext(tokenize).agg(["word"], {"cnt": "sum_long"}).df


# --- MergeUnion with ⊕=max: per-customer peak order across two periods -------

def lara_union_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    h1 = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    h2 = orders.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    schema = LaraSchema.of([("o_custkey", "LONG")], [("peak", "DOUBLE", None)])

    def to_lara(df: DataFrame) -> LaraTable:
        return LaraTable(
            df.groupBy("o_custkey").agg(F.max("o_totalprice").alias("peak")), schema
        )

    u = to_lara(h1).union(to_lara(h2), {"peak": "max"})
    return u.df.select("o_custkey", F.round("peak", 2).alias("peak"))


UNION_MAX_SQL = """
SELECT o_custkey, ROUND(MAX(o_totalprice), 2) AS peak
FROM orders GROUP BY o_custkey
"""


# --- n-way MergeUnion (the reference's Merger aligns n inputs in one pass,
#     reference: opt/TupleImpl.kt:24-140) -------------------------------------

def lara_union_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way union_many with ⊕=sum: per-customer revenue folded across the
    four calendar quarters — Catalyst flattens to one n-child Union + one
    aggregate (no per-step shuffles). Money rides as exact cents (LONG)."""
    orders = load(spark, sf_dir, "orders")
    schema = LaraSchema.of([("o_custkey", "LONG")], [("rev", "LONG", 0)])
    quarters = [
        LaraTable(
            orders.filter(F.quarter("o_orderdate") == q)
            .groupBy("o_custkey")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")),
            schema,
        )
        for q in (1, 2, 3, 4)
    ]
    u = LaraTable.union_many(quarters, {"rev": "sum"})
    return u.df.select("o_custkey", (F.col("rev") / F.lit(100.0)).alias("rev"))


UNION_QUARTERS_SQL = """
SELECT o_custkey, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS rev
FROM orders GROUP BY o_custkey
"""


# --- CartesianIterator: join with NO shared keys → cross product
#     (reference: opt/CartesianIterator.kt:5-14; MergeJoin key-union rule
#     api/TupleOp.kt:625-640 with empty intersection) -------------------------

def lara_cross_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority × market-segment grid with ⊗=multiply on the two
    group counts — a Lara join of tables sharing no key attrs, which
    lowers to crossJoin (both sides are tiny pre-aggregates; the cross of
    5×5 rows is trivially safe at any corpus scale)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    a = LaraTable(
        orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).cast("double").alias("n")),
        LaraSchema.of([("o_orderpriority", "STRING")], [("n", "DOUBLE", 0.0)]),
    )
    b = LaraTable(
        cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).cast("double").alias("n")),
        LaraSchema.of([("c_mktsegment", "STRING")], [("n", "DOUBLE", 0.0)]),
    )
    g = a.join(b, {"n": "multiply"})
    return g.df.select("o_orderpriority", "c_mktsegment", F.col("n").alias("pairs"))


CROSS_GRID_SQL = """
SELECT o_orderpriority, c_mktsegment, CAST(po.n * cs.n AS DOUBLE) AS pairs
FROM (SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority) po
CROSS JOIN (SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment) cs
"""


QUERIES = {
    "lara_wordcount": (lara_wordcount, WORDCOUNT_SQL),
    "lara_wordcount_py": (lara_wordcount_py, WORDCOUNT_SQL),
    "lara_union_max": (lara_union_max, UNION_MAX_SQL),
    "lara_union_revenue": (lara_union_revenue, UNION_SQL),
    "lara_union_quarters": (lara_union_quarters, UNION_QUARTERS_SQL),
    "lara_cross_grid": (lara_cross_grid, CROSS_GRID_SQL),
    "lara_matmul_event_gram": (lara_matmul_event_gram, MATMUL_SQL),
    "sensor_covariance_events": (sensor_covariance_events, SENSOR_SQL),
}
