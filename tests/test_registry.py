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
    # order: (1) queries with no driver row yet and queries whose
    # BEHAVIOR changed this round -> this round's window; (2) the stalest
    # green rows -> fill the window; (3) the next-stalest rows -> pinned to
    # the FRONT of the next window. This test pins the current allocation
    # so a registry edit can't silently drop a changed query out of both
    # windows.
    changed_in_window = {
        # r13: NO registry query's SQL or plan changed (the round's code
        # changes are serving-path and trainer-path only), so the whole
        # window is stale-evidence rotation: the 19 r8-era rows r12 pinned
        # to this window's front (VERDICT r12 #1)...
        "nation_region_full_outer", "order_price_histogram",
        "order_price_percentiles", "pagerank_supplier_part",
        "purchase_attribution", "redact_pii_stats", "salted_lineitem_stats",
        "shuffle_shards_q", "source_datacard", "source_drift_tv",
        "top_prices_with_ties", "train_val_split_stats",
        "trim_length_outliers", "twap_value_by_user_type",
        "unimax_allocation", "value_quantiles_by_type",
        "value_spikes_by_type", "value_variance_by_type", "vocab_coverage",
        # ...plus 31 of the 42 rows whose freshest green row is r9-era
        # (alphabetical; the remaining 11 lead the r14 window below)
        "ann_brute_force_fast", "ann_hamming_topk", "ann_ivfpq_topk",
        "ann_pq_recall", "ann_pq_topk", "ann_sq8_fast", "bm25_topk",
        "bpe_token_count_auto", "cap_docs_per_source", "chunk_documents_q",
        "corpus_clean", "curation_funnel", "domain_caps", "html_extract",
        "mixture_materialize", "order_status_pivot", "orders_within_30_days",
        "q10_returned_items", "q11_nation_balance_share",
        "q12_priority_buckets", "q13_order_count_distribution",
        "q14_promo_share", "q15_top_supplier", "q16_supplier_count_by_part",
        "q18_large_volume_customers", "q20_promo_suppliers",
        "q21_sole_fault_suppliers", "q22_idle_rich_customers",
        "q2_cheapest_part_per_type", "q6_forecast_revenue",
        "q7_nation_volume",
    }
    # r14 window front: the 11 r9-era rows the r13 budget could not fit
    # (after r13, every other row is r10+; these rotate first next round).
    next_window = {
        "q8_market_share", "q9_profit_by_nation_year", "raco_front_door_q",
        "repeat_customers_96_97", "small_quantity_revenue",
        "status_except_all", "suppliers_without_recent_sales",
        "text_replace_map", "unpivot_order_measures", "url_canonicalize",
        "url_dedup",
    }
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = changed_in_window - head
    assert not missing, f"changed queries outside the driver window: {missing}"
    next_slots = set(
        names[DRIVER_ORACLE_WINDOW : DRIVER_ORACLE_WINDOW + len(next_window)]
    )
    assert next_window == next_slots, (
        "the leftover r9-era rows must lead the r14 window: "
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
