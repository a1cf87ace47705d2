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
    # --- r6 window head (the driver oracles the FIRST 50) -------------------
    # (a) sql_front_door_q — the r5 round's ONE red (decimal-vs-double
    # stringification; values identical). r6 casts revenue to DOUBLE on
    # the Spark side; must re-earn its driver row first.
    "sql_front_door_q",
    # (b) the 12 queries changed in r5 (grouped_rank tfidf, merge_upsert
    # seq-collapse, one-pass quality report, shared BM25 tokenizer,
    # ROUND()-mirrored Jaccard oracles, two-phase cap_per_group, the
    # vectorized SQ8 twin) — pinned to this window by r5's test_registry.
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
    # (c) changed in r6: the exact-ANN batch-local top-k pre-prune
    # (scorer-fused in the vectorized twins, _batch_topk_prune in the
    # expression twins + hard_negatives) and the embedding-gram NULL
    # validation — changed plans re-earn driver rows.
    "ann_brute_force",
    "ann_brute_force_fast",
    "ann_sq8_topk",
    "hard_negatives",
    "embedding_gram",
    # (d) fill: rotate driver evidence onto the oldest (r3-era) rows.
    # 32 of the 42 r3-latest queries fit; the other 10 lead the r7 window.
    "chunk_documents_q",
    "corpus_clean",
    "corpus_frequent_ngrams",
    "customer_order_gaps",
    "customers_without_orders",
    "dedup_exact",
    "dedup_rate_by_source",
    "doc_boilerplate_ppm",
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
    # --- front of the r7 window ---------------------------------------------
    # (0) NEW in r6 (no driver row yet): Gopher quality rules, bigram
    # count-ratio LM score, graded contamination report.
    "gopher_quality",
    "bigram_lm",
    "contamination_report",
    # (a) plan-changed in r6 but value-identical: the fan_out small-scan
    # parallelism fix repartitions these queries' heavy text/Arrow map
    # stages (corpus_frequent_ngrams + doc_boilerplate_ppm are also
    # affected but already sit in the r6 head's r3-era fill). Checker-
    # verified this round; driver re-certifies next.
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_simhash",
    "dedup_simhash_fast",
    "decontaminate_docs",
    "semantic_dedup",
    "semantic_dedup_fast",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_ivf_topk",
    # (b) the 10 r3-era stale-evidence rotations the r6 window couldn't fit.
    "supplier_copart_triangles",
    "text_fingerprint",
    "text_langid",
    "text_normalize",
    "text_quality",
    "text_repetition",
    "text_token_counts",
    "topk_parts_per_brand",
    "tumbling_event_stats",
    "user_retention_cohorts",
    # --- tail: green driver rows on current code (r4/r5-certified) ----------
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
    "median_value_by_type",
    "trim_length_outliers",
    "grouping_sets_revenue",
    "value_variance_by_type",
    "dedup_embedding",
    "twap_value_by_user_type",
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
    "approx_stats",
    "train_val_split_stats",
    "mix_sources_counts",
    "redact_pii_stats",
    "pack_sequences_q",
    "shuffle_shards_q",
    "pagerank_supplier_part",
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
