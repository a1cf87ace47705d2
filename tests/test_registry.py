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
        # r14: the 11 r9-era rows r13 pinned to this window's front...
        "q8_market_share", "q9_profit_by_nation_year", "raco_front_door_q",
        "repeat_customers_96_97", "small_quantity_revenue",
        "status_except_all", "suppliers_without_recent_sales",
        "text_replace_map", "unpivot_order_measures", "url_canonicalize",
        "url_dedup",
        # ...the two r13-new queries with no driver row yet (ADVICE r13 #2)...
        "bm25_maintenance_cycle", "bm25_prf_topk",
        # ...plus 37 of the 40 rows whose freshest green row is r10-era
        # (alphabetical; the remaining 3 lead the r15 window below)
        "ann_ivfpq_res_recall", "ann_ivfpq_res_topk", "ann_probe_sweep",
        "customer_merge_upsert", "customer_order_gaps",
        "customers_without_orders", "dedup_components", "dedup_exact",
        "dedup_keep_representatives", "dedup_lsh_jaccard",
        "dedup_prefix_jaccard", "dedup_rate_by_source", "embedding_gram",
        "event_funnel", "events_daily_pivot", "events_daily_users",
        "events_dow_hour_heatmap", "events_json_stats", "forward_fill_hourly",
        "fuzzy_part_pairs", "lara_matmul_event_gram", "lara_union_max",
        "lara_union_revenue", "lara_wordcount", "lara_wordcount_py",
        "orders_quality_report", "q1_pricing_summary", "q3_shipping_priority",
        "q4_order_priority", "q5_local_supplier_volume",
        "revenue_share_by_nation", "rollup_returns",
        "running_customer_totals", "scd2_customer_segments",
        "sensor_covariance_events", "session_window_stats",
        "sessionize_events",
    }
    # r15 window front: the 3 r10-era rows the r14 budget could not fit
    # (after r14, every other row is r11+; these rotate first next round).
    next_window = {
        "sliding_event_stats", "sql_front_door_q", "tfidf_top_terms",
    }
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = changed_in_window - head
    assert not missing, f"changed queries outside the driver window: {missing}"
    next_slots = set(
        names[DRIVER_ORACLE_WINDOW : DRIVER_ORACLE_WINDOW + len(next_window)]
    )
    assert next_window == next_slots, (
        "the leftover r10-era rows must lead the r15 window: "
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
