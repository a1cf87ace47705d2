"""Workload-registry invariants the driver contract depends on."""

from laradb_spark.workloads import _PRIORITY, all_specs

DRIVER_ORACLE_WINDOW = 50  # the driver oracles only the first N registered


def test_priority_order_is_registration_order():
    # _PRIORITY is the FULL registration ordering (r3+): the first
    # DRIVER_ORACLE_WINDOW entries are exactly the queries the driver
    # oracles this round, so registration must follow it verbatim.
    names = list(all_specs())
    assert names[: len(_PRIORITY)] == _PRIORITY


def test_changed_queries_inside_oracle_window():
    # Window policy: the driver oracles 50 queries/round, so changed
    # queries are budgeted against stale-evidence rotations. Priority
    # order: (1) plan-changed queries whose BEHAVIOR could differ →
    # this round's window; (2) queries with no driver row on current-era
    # code → fill the window; (3) remaining changed queries (value-
    # identical refactors and oracle-text edits, each verified against
    # DuckDB at all three SFs by tools/check_correctness.py this round)
    # → pinned to the FRONT of the next window so the driver certifies
    # them next. This test pins the current allocation so a registry
    # edit can't silently drop a changed query out of both windows.
    changed_in_window = {
        # NEW in r8 (no driver row yet): the learned quality classifier,
        # BPE merge application, the Arrow sparse-tf BM25 twin
        "quality_classifier", "bpe_token_count", "bm25_topk_fast",
        "bpe_token_apportionment", "quality_classifier_eval",
        # NEW late-r8: CCNet per-language LM bucketing, per-source data
        # card, (documents, embeddings) integrity audit, learned
        # multiclass language-ID + its held-out confusion eval
        "ccnet_lm_buckets", "source_datacard", "corpus_integrity",
        "lang_classifier", "lang_confusion",
        # NEW late-r8: the line-structure family (C4 line cleaning,
        # RefinedWeb corpus-level line dedup, Gopher line profile) and
        # the α-temperature mixture planner
        "c4_line_clean", "corpus_line_dedup", "line_profile",
        "alpha_mixture", "heavy_hitters", "unimax_allocation",
        "curation_funnel",
        # CHANGED in r8: approx_stats gained a real oracle (bounds-boolean
        # reshape — the formerly perpetual no_oracle row); ngram_diversity
        # folds NULL text and its oracle COALESCEs; knn_label_noise got the
        # ANSI-safe string-label tie-break and the persisted rank branch
        "approx_stats", "ngram_diversity", "knn_label_noise",
        # the 14 r4-era stale-evidence rotations VERDICT r7 #7 queued
        "pagerank_supplier_part", "purchase_attribution",
        "redact_pii_stats", "salted_lineitem_stats",
        "shuffle_shards_q", "source_drift_tv",
        "top_prices_with_ties", "train_val_split_stats",
        "trim_length_outliers", "twap_value_by_user_type",
        "value_quantiles_by_type", "value_spikes_by_type",
        "value_variance_by_type", "vocab_coverage",
    }
    # r9 window front: the r5-era rows the 50-slot r8 window could not
    # fit (code unchanged since r5; after r9 no driver row predates r6).
    # order_status_pivot, orders_within_30_days and q10-q20 were pushed
    # out of the r8 window by the late-r8 queries.
    next_window = {
        "order_status_pivot",
        "orders_within_30_days",
        "q10_returned_items",
        "q11_nation_balance_share",
        "q12_priority_buckets", "q13_order_count_distribution",
        "q14_promo_share",
        "q15_top_supplier", "q16_supplier_count_by_part",
        "q18_large_volume_customers",
        "q19_disjunctive_revenue", "q20_promo_suppliers",
        "q21_sole_fault_suppliers", "q22_idle_rich_customers",
        "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
        "q9_profit_by_nation_year", "raco_front_door_q",
        "repeat_customers_96_97", "small_quantity_revenue",
        "status_except_all", "suppliers_without_recent_sales",
        "text_replace_map", "unpivot_order_measures",
        "q2_cheapest_part_per_type",
    }
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = changed_in_window - head
    assert not missing, f"changed queries outside the driver window: {missing}"
    next_slots = set(
        names[DRIVER_ORACLE_WINDOW : DRIVER_ORACLE_WINDOW + len(next_window)]
    )
    assert next_window == next_slots, (
        "r5-era stale rows must lead the r9 window: "
        f"{next_window ^ next_slots}"
    )


def test_spec_shapes():
    specs = all_specs()
    assert len(specs) == len(set(specs)) >= 70
    for name, (fn, sql) in specs.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_rows_only_queries_are_the_documented_ones():
    # every oracle-less query is a deliberate rows-only check, not an
    # accidentally-dropped oracle. As of r8 there are NONE: approx_stats
    # (the last one) now emits in-plan bound booleans + exact counts the
    # oracle states literally, so even the sketches hash-certify.
    no_oracle = {n for n, (_f, sql) in all_specs().items() if sql is None}
    assert no_oracle == set()
