"""Window/analytic + time-window queries — the surface the reference lacks
entirely (SURVEY.md §2.4: no window/ranking functions, no streaming; its
only time op is batch binning, reference: sensor/SensorCalc.kt:361-394).
All are single-shuffle window plans or binned hash aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import load
from .relational import _iscale


def _exact_sum2(col: str = "value") -> Column:
    """Order-independent 2dp sum (DEVNOTES gotcha #4): events.value is exact
    2-decimal data, so sum scaled longs (exact, order-independent) and divide
    once — a double SUM's last ulp is addend-order-dependent and flips the
    round on .xx5 boundaries between Spark and DuckDB runs."""
    return F.sum(_iscale(col, 100)) / F.lit(100.0)


# SQL twin of _exact_sum2 for the DuckDB oracle.
_EXACT_SUM2_SQL = "SUM(CAST(ROUND({c} * 100) AS BIGINT)) / 100.0"


# --- cumulative sum per key --------------------------------------------------

def running_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        # Scaled-integer running sum: a double cumulative sum is summation-
        # order-dependent inside the engine's frame evaluation (DuckDB uses
        # segment-tree combines, Spark sequential adds) — exact longs aren't.
        (F.sum(_iscale("o_totalprice", 100)).over(w) / F.lit(100.0)).alias("cum_spend"),
    )


RUNNING_SQL = """
SELECT o_orderkey, o_custkey,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS cum_spend
FROM orders
"""


# --- lag: inter-order gap ------------------------------------------------------

def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("gap_days"),
    )


GAPS_SQL = """
SELECT o_orderkey, o_custkey,
       DATE_DIFF('day',
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap_days
FROM orders
"""


# --- sessionization: gap > 30 min starts a new session -------------------------
# (SURVEY pattern: lag + cumulative boundary count; streaming variant uses
# session_window — see laradb_spark/streaming/.)

SESSION_GAP_MIN = 30


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events

    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts_ms").alias("tms"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("tms", "event_id")
    gap_ms = SESSION_GAP_MIN * 60_000
    boundary = (
        (F.col("tms") - F.lag("tms").over(w) > gap_ms)
        | F.lag("tms").over(w).isNull()
    ).cast("long")
    sess = ev.withColumn("session_id", F.sum(boundary).over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        _exact_sum2("value").alias("session_value"),
        F.min("tms").alias("session_start_ms"),
    )


SESSIONIZE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms, value FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN tms - LAG(tms) OVER w > {SESSION_GAP_MIN * 60_000}
                OR LAG(tms) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)
),
sess AS (
  -- CAST: DuckDB SUM(INTEGER) yields HUGEINT, which survives to the output
  -- column and hash-diverges under the driver's serialization (DEVNOTES #1b)
  SELECT *, CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_EXACT_SUM2_SQL.format(c="value")} AS session_value,
       MIN(tms) AS session_start_ms
FROM sess
GROUP BY user_id, session_id
"""


# --- tumbling time window (batch form; streaming twin in streaming/) -----------

TUMBLE_MIN = 60


def tumbling_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events

    ev = load_events(spark, sf_dir)
    win = F.window(F.timestamp_millis(F.col("ts_ms")), f"{TUMBLE_MIN} minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), _exact_sum2("value").alias("sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "sum_value",
        )
    )


TUMBLE_SQL = f"""
SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // {TUMBLE_MIN * 60_000}) * {TUMBLE_MIN * 60_000} AS window_start_ms,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       {_EXACT_SUM2_SQL.format(c="value")} AS sum_value
FROM events
GROUP BY window_start_ms, event_type
"""


# --- native session_window (batch mode; same op runs streaming) ---------------

def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events
    from ..streaming import session_window_agg

    ev = load_events(spark, sf_dir).select(
        F.col("ts_ms").alias("ts"), "user_id", "value"
    )
    return session_window_agg(ev, gap=f"{SESSION_GAP_MIN} minutes")


SESSION_WINDOW_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms, value FROM events
),
flagged AS (
  SELECT *,
         CASE WHEN tms - LAG(tms) OVER w >= {SESSION_GAP_MIN * 60_000}
                OR LAG(tms) OVER w IS NULL THEN 1 ELSE 0 END AS boundary
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)
),
sess AS (
  SELECT *, SUM(boundary) OVER (PARTITION BY user_id ORDER BY tms, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT MIN(tms) AS session_start_ms, user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {_EXACT_SUM2_SQL.format(c="value")} AS session_value
FROM sess
GROUP BY user_id, sid
"""


# --- sliding window (batch twin of the streaming op) ---------------------------

def sliding_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import load_events
    from ..streaming import sliding_window_agg

    ev = load_events(spark, sf_dir).select(
        F.col("ts_ms").alias("ts"), "event_type", "value"
    )
    return sliding_window_agg(ev, window="60 minutes", slide="30 minutes")


SLIDING_SQL = """
WITH ev AS (
  SELECT event_type, value, epoch_ms(CAST(ts AS TIMESTAMP)) AS tms FROM events
),
expanded AS (
  -- each event belongs to 2 windows (60 min window, 30 min slide)
  SELECT event_type, value,
         (tms // 1800000) * 1800000 - s.off AS window_start_ms
  FROM ev, (SELECT UNNEST([0, 1800000]) AS off) s
  WHERE (tms // 1800000) * 1800000 - s.off > tms - 3600000
)
SELECT window_start_ms, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM expanded
GROUP BY window_start_ms, event_type
"""


# --- time-series gap fill (dense hourly grid + forward carry) ------------------

def forward_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type hourly value series densified over the global hour
    range and forward-filled (operators/timeseries.py). The carried
    metric is an integer cent sum — exact, so the carry is bit-identical
    across engines; was_gap marks synthesized rows."""
    from . import load_events
    from ..operators.timeseries import fill_gaps_forward

    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type", F.expr("ts_ms div 3600000").alias("hour")
    ).agg(F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("cents"))
    return fill_gaps_forward(hourly, "event_type", "hour", "cents")


FFILL_SQL = """
WITH hourly AS (
  SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000 AS hour,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY event_type, hour
),
grid AS (
  SELECT t.event_type, g.hour
  FROM (SELECT DISTINCT event_type FROM hourly) t,
       (SELECT UNNEST(generate_series((SELECT MIN(hour) FROM hourly),
                                      (SELECT MAX(hour) FROM hourly))) AS hour) g
),
joined AS (
  SELECT g.event_type, g.hour, h.cents,
         CASE WHEN h.cents IS NULL THEN 1 ELSE 0 END AS was_gap
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour
)
SELECT event_type, hour,
       CAST(LAST_VALUE(cents IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cents,
       CAST(was_gap AS INT) AS was_gap
FROM joined
"""


QUERIES = {
    "running_customer_totals": (running_customer_totals, RUNNING_SQL),
    "session_window_stats": (session_window_stats, SESSION_WINDOW_SQL),
    "sliding_event_stats": (sliding_event_stats, SLIDING_SQL),
    "customer_order_gaps": (customer_order_gaps, GAPS_SQL),
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    "tumbling_event_stats": (tumbling_event_stats, TUMBLE_SQL),
    "forward_fill_hourly": (forward_fill_hourly, FFILL_SQL),
}
