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
        # r4: zero-norm-safe cosine() + pair guard + auto-k touch the whole
        # similarity stack; median/trim moved to two-phase grouped_rank;
        # grouping sets 3.x fallback; variance NULLIF guard.
        "semantic_dedup", "semantic_dedup_fast",
        "median_value_by_type", "trim_length_outliers",
        "grouping_sets_revenue", "value_variance_by_type",
        "ann_brute_force", "ann_lsh_topk", "ann_lsh_multiprobe",
        "ann_ivf_topk", "dedup_embedding",
        # new in r4
        "dedup_prefix_jaccard", "bm25_topk", "twap_value_by_user_type",
        "embedding_gram", "orders_segment_at_day", "value_spikes_by_type",
        "customer_merge_upsert", "event_transitions", "monthly_revenue_mom",
        "purchase_attribution", "vocab_coverage", "mad_outliers_by_type",
        "value_quantiles_by_type", "orders_quality_report",
        "top_prices_with_ties", "source_drift_tv", "hard_negatives",
        "moments_by_type", "salted_lineitem_stats",
        "event_trigram_paths", "cross_source_dup_matrix",
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
