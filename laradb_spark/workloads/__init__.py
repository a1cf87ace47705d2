"""Workload registry: every implemented query/operator from SURVEY.md §2
as a (spark_fn, oracle_sql) pair.

``spark_fn(spark, sf_dir) -> DataFrame`` builds the engine's plan;
``oracle_sql`` is the ANSI-SQL equivalent DuckDB runs on the same parquet
(views: region nation customer supplier part orders lineitem events
documents embeddings). ``oracle_sql=None`` marks genuinely
non-SQL-expressible ops (driver records a rows-only check).

Column-name and value discipline (driver hashes sorted columns):
  * alias every computed column identically on both sides;
  * round doubles (sums→2dp, avgs/ratios→4-6dp) identically on both sides;
  * emit BIGINT counts on both sides (DuckDB: CAST(count/sum AS BIGINT));
  * prefer DATE / epoch-ms BIGINT over raw timestamps (events.ts precision
    and surfaced dtype vary by engine/Spark version — see load_events).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], "str | None"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events plus a derived ``ts_ms`` epoch-millis BIGINT column.

    events.parquet stores ``ts`` as TIMESTAMP(NANOS). How Spark surfaces that
    depends on version: Spark 3.x with ``spark.sql.legacy.parquet.nanosAsLong``
    reads it as epoch-nanos BIGINT; Spark 4.x *silently ignores* that conf and
    reads TIMESTAMP_NTZ (micros, truncated from nanos). Branch on the dtype we
    actually got so both environments yield the same ``ts_ms``:

      * ``bigint``            → ``ts div 1000000`` (floor division — exact for
        the positive epoch range);
      * ``timestamp[_ntz]``   → ``unix_millis(cast(ts as timestamp))``; the
        session timezone is pinned to UTC (``__spark_entry__._configure``), so
        the ntz→ltz cast is the identity and matches DuckDB
        ``epoch_ms(CAST(ts AS TIMESTAMP))``.
    """
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":
        ts_ms = F.expr("ts div 1000000")
    elif ts_type in ("timestamp", "timestamp_ntz"):
        ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    else:  # pragma: no cover - fail loudly on a new surprise, not downstream
        raise TypeError(f"events.ts has unexpected dtype {ts_type!r}")
    return ev.withColumn("ts_ms", ts_ms)


# The driver oracles only the FIRST 50 registered queries per round, in
# registration order. Rotate so every query earns a green driver row across
# rounds: queries with no driver row yet (r01 capped them out) and queries
# whose plan/SQL changed this round come first; long-green unchanged queries
# fill the tail and fall out of the window harmlessly.
_PRIORITY = [
    # --- r9 window head (the driver oracles the FIRST 50) -------------------
    # (a) NEW in r9 (no driver row yet): byte-level BPE family + auto route,
    # URL/domain web curation, PQ / IVF-PQ ANN + recall eval, MinHash fuzzy
    # decontamination, BPE fertility.
    "bpe_token_count_auto",
    "bpe_byte_token_count",
    "bpe_byte_token_count_fast",
    "bpe_fertility",
    "url_canonicalize",
    "url_dedup",
    "domain_caps",
    "ann_pq_topk",
    "ann_pq_recall",
    "ann_ivfpq_topk",
    "decon_fuzzy",
    "token_shard_stats",
    "mixture_materialize",
    "html_extract",
    "fuzzy_cross_batch",
    "ann_hamming_topk",
    # (b) CHANGED in r9: the badword line-boundary fix altered both the
    # Spark plan and the oracle of these two (whitespace-class split +
    # genuinely-firing drop path).
    "c4_line_clean",
    "curation_funnel",
    # (c) the 26 r5-era stale rows VERDICT r8 #5 queued (code unchanged
    # since r5; after r9 no driver row predates r6).
    "order_status_pivot",
    "orders_within_30_days",
    "q10_returned_items",
    "q11_nation_balance_share",
    "q12_priority_buckets",
    "q13_order_count_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q21_sole_fault_suppliers",
    "q22_idle_rich_customers",
    "q2_cheapest_part_per_type",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_profit_by_nation_year",
    "raco_front_door_q",
    "repeat_customers_96_97",
    "small_quantity_revenue",
    "status_except_all",
    "suppliers_without_recent_sales",
    "text_replace_map",
    "unpivot_order_measures",
    # (d) fill: the 6 alphabetically-first r6-era rows.
    "ann_brute_force_fast",
    "ann_sq8_fast",
    "bm25_topk",
    "cap_docs_per_source",
    "chunk_documents_q",
    "corpus_clean",
    # --- front of the r10 window: the remaining 41 r6-era rows ------------
    "corpus_frequent_ngrams",
    "cross_source_dup_matrix",
    "customer_merge_upsert",
    "customer_order_gaps",
    "customers_without_orders",
    "dedup_components",
    "dedup_exact",
    "dedup_keep_representatives",
    "dedup_lsh_jaccard",
    "dedup_ngram_jaccard",
    "dedup_prefix_jaccard",
    "dedup_rate_by_source",
    "doc_boilerplate_ppm",
    "embedding_gram",
    "event_funnel",
    "events_daily_pivot",
    "events_daily_users",
    "events_dow_hour_heatmap",
    "events_json_stats",
    "forward_fill_hourly",
    "fuzzy_part_pairs",
    "lara_matmul_event_gram",
    "lara_union_max",
    "lara_union_revenue",
    "lara_wordcount",
    "lara_wordcount_py",
    "orders_quality_report",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "revenue_share_by_nation",
    "rollup_returns",
    "running_customer_totals",
    "scd2_customer_segments",
    "sensor_covariance_events",
    "session_window_stats",
    "sessionize_events",
    "sliding_event_stats",
    "sql_front_door_q",
    "tfidf_top_terms",
]


def all_specs() -> dict[str, QuerySpec]:
    from . import (
        advanced_q,
        lara_demos,
        misc_q,
        pipelines_q,
        relational,
        surface_q,
        tpch_more,
        windows_q,
    )

    specs: dict[str, QuerySpec] = {}
    for mod in (relational, lara_demos, windows_q, pipelines_q, advanced_q, surface_q,
                tpch_more, misc_q):
        overlap = specs.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        specs.update(mod.QUERIES)
    missing = [n for n in _PRIORITY if n not in specs]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = {name: specs.pop(name) for name in _PRIORITY}
    ordered.update(specs)
    return ordered
