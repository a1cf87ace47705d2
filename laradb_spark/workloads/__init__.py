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
    # --- r5 window head (the driver oracles the FIRST 50) -------------------
    # (a) the 7 ANN/hard-negatives queries whose ranking moved from
    # Window.partitionBy(query_id) to the two-phase grouped_rank this
    # round — changed plans must re-earn their driver rows;
    "ann_brute_force",
    "ann_brute_force_fast",
    "ann_sq8_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    "hard_negatives",
    # (b) the 43 queries whose latest driver row was r1/r2-era (driver
    # window rotation, VERDICT r4 item 1): code untouched since then and
    # green in the builder's checker every round, but each needs a driver
    # row earned on the post-Spark-4 environment. 7 + 43 = exactly 50.
    "asof_last_order",
    "orders_within_30_days",
    "order_price_percentiles",
    "cube_order_stats",
    "repeat_customers_96_97",
    "suppliers_without_recent_sales",
    "small_quantity_revenue",
    "graph_brand_degree",
    "graph_brand_gram",
    "customer_order_counts_left",
    "nation_region_full_outer",
    "order_status_pivot",
    "all_account_balances",
    "sql_front_door_q",
    "d4m_set_filter",
    "lara_union_quarters",
    "lara_cross_grid",
    "nation_presence_trio",
    "customer_spend_quartiles",
    "monthly_revenue",
    "multimodal_features",
    "order_price_histogram",
    "q2_cheapest_part_per_type",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q12_priority_buckets",
    "q14_promo_share",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q9_profit_by_nation_year",
    "q11_nation_balance_share",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_count_by_part",
    "q18_large_volume_customers",
    "q21_sole_fault_suppliers",
    "q22_idle_rich_customers",
    "raco_front_door_q",
    "status_except_all",
    "text_replace_map",
    "unpivot_order_measures",
    # --- front of the r6 window: also changed in r5 (grouped_rank tfidf,
    # merge_upsert seq-collapse, one-pass quality report, shared BM25
    # tokenizer, ROUND()-mirrored Jaccard oracles) — all green in the
    # builder's checker this round; rotate in next.
    "tfidf_top_terms",
    "customer_merge_upsert",
    "orders_quality_report",
    "bm25_topk",
    "dedup_ngram_jaccard",
    "dedup_components",
    "dedup_keep_representatives",
    "dedup_lsh_jaccard",
    "dedup_prefix_jaccard",
    "cross_source_dup_matrix",
    "cap_docs_per_source",
    "ann_sq8_fast",
    # --- tail: green driver rows on unchanged code ---------------------------
    "semantic_dedup",
    "semantic_dedup_fast",
    "median_value_by_type",
    "trim_length_outliers",
    "grouping_sets_revenue",
    "value_variance_by_type",
    "dedup_embedding",
    "twap_value_by_user_type",
    "embedding_gram",
    "orders_segment_at_day",
    "value_spikes_by_type",
    "event_transitions",
    "monthly_revenue_mom",
    "purchase_attribution",
    "vocab_coverage",
    "mad_outliers_by_type",
    "value_quantiles_by_type",
    "top_prices_with_ties",
    "source_drift_tv",
    "moments_by_type",
    "salted_lineitem_stats",
    "event_trigram_paths",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_simhash",
    "dedup_simhash_fast",
    "approx_stats",
    "decontaminate_docs",
    "train_val_split_stats",
    "mix_sources_counts",
    "redact_pii_stats",
    "pack_sequences_q",
    "shuffle_shards_q",
    "pagerank_supplier_part",
    "sessionize_events",
    "tumbling_event_stats",
    "events_json_stats",
    "events_daily_pivot",
    "events_daily_users",
    "session_window_stats",
    "sliding_event_stats",
    "sensor_covariance_events",
    "text_repetition",
    "corpus_clean",
    "text_normalize",
    "supplier_copart_triangles",
    "events_dow_hour_heatmap",
    "corpus_frequent_ngrams",
    "doc_boilerplate_ppm",
    "forward_fill_hourly",
    "event_funnel",
    "user_retention_cohorts",
    "revenue_share_by_nation",
    "scd2_customer_segments",
    "chunk_documents_q",
    "fuzzy_part_pairs",
    "dedup_rate_by_source",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "topk_parts_per_brand",
    "rollup_returns",
    "customers_without_orders",
    "lara_wordcount",
    "lara_wordcount_py",
    "lara_union_max",
    "lara_union_revenue",
    "lara_matmul_event_gram",
    "running_customer_totals",
    "customer_order_gaps",
    "text_quality",
    "text_token_counts",
    "text_langid",
    "text_fingerprint",
    "dedup_exact",
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
