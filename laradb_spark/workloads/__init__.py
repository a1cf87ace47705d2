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
    # --- r12 window head (the driver oracles the FIRST 50) ------------------
    # (a) queries with NO driver row ever: the seven late-r11 additions
    # (checker-certified --only at all 3 SFs in-round, re-verified by the
    # r11 judge) plus the two NEW r12 queries — the sqrt(N) production
    # route of the kNN audit (VERDICT r11 #3) and the index-maintenance
    # cycle build -> recenter -> compact -> occupancy (VERDICT r11 #4).
    "ann_ivf_list_skew",
    "hybrid_rrf_topk",
    "kn_lm_score",
    "ann_ivf_filtered",
    "dedup_lsh_recall",
    "wordpiece_stats",
    "unigram_stats",
    "knn_label_noise_ivf_auto",
    "ivf_maintenance_cycle",
    # (b) queries whose SQL or compiled plan text changed in r11 with
    # results certified identical in-round (full 192/192 checker at HEAD):
    # the byte-BPE family (donation-fix SQL/plan) and the bind_once
    # plan-changed group — driver re-certification per the window policy.
    "bpe_byte_token_count_fast",
    "bpe_fertility",
    "token_shard_stats",
    "shard_decode_roundtrip",
    "approx_stats",
    "c4_line_clean",
    "corpus_frequent_ngrams",
    "cross_source_dup_matrix",
    "decon_fuzzy",
    "dedup_ngram_jaccard",
    "doc_boilerplate_ppm",
    "fuzzy_cross_batch",
    "heavy_hitters",
    "ngram_diversity",
    "q19_disjunctive_revenue",
    "quality_classifier",
    "quality_classifier_eval",
    # (c) the 24 stalest r8-era rows (fills the window to exactly 50);
    # with the four r8 rows inside (b), 28 of the 47 r8 rows refresh in
    # r12 — the remaining 19 are pinned to the r13 front in (d).
    "all_account_balances",
    "alpha_mixture",
    "asof_last_order",
    "bm25_topk_fast",
    "bpe_token_apportionment",
    "bpe_token_count",
    "ccnet_lm_buckets",
    "corpus_integrity",
    "corpus_line_dedup",
    "cube_order_stats",
    "customer_order_counts_left",
    "customer_spend_quartiles",
    "d4m_set_filter",
    "graph_brand_degree",
    "graph_brand_gram",
    "knn_label_noise",
    "lang_classifier",
    "lang_confusion",
    "lara_cross_grid",
    "lara_union_quarters",
    "line_profile",
    "monthly_revenue",
    "multimodal_features",
    "nation_presence_trio",
    # --- front of the r13 window: the 19 r8-era rows the 50-slot budget
    # could not fit this round (test_registry pins this allocation) -------
    "nation_region_full_outer",
    "order_price_histogram",
    "order_price_percentiles",
    "pagerank_supplier_part",
    "purchase_attribution",
    "redact_pii_stats",
    "salted_lineitem_stats",
    "shuffle_shards_q",
    "source_datacard",
    "source_drift_tv",
    "top_prices_with_ties",
    "train_val_split_stats",
    "trim_length_outliers",
    "twap_value_by_user_type",
    "unimax_allocation",
    "value_quantiles_by_type",
    "value_spikes_by_type",
    "value_variance_by_type",
    "vocab_coverage",
    # --- tail: fresher rows in their prior order (fall out harmlessly) ---
    "bpe_contraction_parity",
    "knn_label_noise_ivf",
    "bpe_byte_token_count",
    "ann_brute_force",
    "ann_ivf_topk",
    "ann_lsh_multiprobe",
    "ann_lsh_topk",
    "ann_sq8_topk",
    "bigram_lm",
    "contamination_report",
    "decontaminate_docs",
    "dedup_embedding",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_fast",
    "dedup_simhash",
    "dedup_simhash_fast",
    "dsir_importance",
    "dup_span_census",
    "event_transitions",
    "event_trigram_paths",
    "gopher_funnel",
    "gopher_quality",
    "grouping_sets_revenue",
    "hard_negatives",
    "label_centroid_outliers",
    "mad_outliers_by_type",
    "median_value_by_type",
    "mix_sources_counts",
    "moments_by_type",
    "monthly_revenue_mom",
    "orders_segment_at_day",
    "pack_sequences_q",
    "semantic_decon",
    "semantic_decon_fast",
    "semantic_dedup",
    "semantic_dedup_fast",
    "span_source_matrix",
    "split_leakage",
    "strip_dup_spans",
    "supplier_copart_triangles",
    "text_fingerprint",
    "text_langid",
    "text_normalize",
    "text_quality",
    "text_repetition",
    "text_token_counts",
    "token_apportionment",
    "topk_parts_per_brand",
    "tumbling_event_stats",
    "user_retention_cohorts",
    "ann_ivfpq_res_topk",
    "ann_ivfpq_res_recall",
    "customer_merge_upsert",
    "customer_order_gaps",
    "customers_without_orders",
    "dedup_components",
    "dedup_exact",
    "dedup_keep_representatives",
    "dedup_lsh_jaccard",
    "dedup_prefix_jaccard",
    "dedup_rate_by_source",
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
    "ann_probe_sweep",
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
