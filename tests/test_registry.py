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
    # Queries whose plan/SQL changed this round MUST re-earn a driver row —
    # keep this list in sync with the round's edits.
    changed = {
        "sessionize_events", "tumbling_event_stats", "events_json_stats",
        "events_daily_pivot", "events_daily_users", "session_window_stats",
        "sliding_event_stats", "sensor_covariance_events",
        "text_repetition", "corpus_clean",
        # new in r3
        "semantic_dedup", "text_normalize", "supplier_copart_triangles",
        "grouping_sets_revenue", "events_dow_hour_heatmap",
        "corpus_frequent_ngrams", "doc_boilerplate_ppm", "tfidf_top_terms",
        "forward_fill_hourly", "semantic_dedup_fast", "trim_length_outliers",
        "event_funnel", "user_retention_cohorts",
        "value_variance_by_type", "revenue_share_by_nation",
        "scd2_customer_segments", "chunk_documents_q", "fuzzy_part_pairs",
        "dedup_rate_by_source", "median_value_by_type",
    }
    head = set(list(all_specs())[:DRIVER_ORACLE_WINDOW])
    missing = changed - head
    assert not missing, f"changed queries outside the driver window: {missing}"


def test_spec_shapes():
    specs = all_specs()
    assert len(specs) == len(set(specs)) >= 70
    for name, (fn, sql) in specs.items():
        assert callable(fn), name
        assert sql is None or isinstance(sql, str), name


def test_rows_only_queries_are_the_documented_ones():
    # every oracle-less query is a deliberate rows-only check, not an
    # accidentally-dropped oracle
    no_oracle = {n for n, (_f, sql) in all_specs().items() if sql is None}
    # approx_stats is the ONLY rows-only query (engine-specific sketches);
    # ann_ivf_topk gained a real oracle (unrolled Lloyd rounds in SQL)
    assert no_oracle == {"approx_stats"}
