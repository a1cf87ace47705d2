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
        # r15: the one registry query with no driver row yet (new in r14;
        # VERDICT r14 #1)...
        "bm25_prf_serve",
        # ...the 3 r10-era rows r14 pinned to this window's front...
        "sliding_event_stats", "sql_front_door_q", "tfidf_top_terms",
        # ...plus 46 of the 50 rows whose freshest green row is r11-era
        # (alphabetical; the remaining 4 lead the r16 window below)
        "ann_brute_force", "ann_ivf_topk", "ann_lsh_multiprobe",
        "ann_lsh_topk", "ann_sq8_topk", "bigram_lm", "bpe_byte_token_count",
        "bpe_contraction_parity", "contamination_report",
        "decontaminate_docs", "dedup_embedding", "dedup_minhash_lsh",
        "dedup_minhash_lsh_fast", "dedup_simhash", "dedup_simhash_fast",
        "dsir_importance", "dup_span_census", "event_transitions",
        "event_trigram_paths", "gopher_funnel", "gopher_quality",
        "grouping_sets_revenue", "hard_negatives", "knn_label_noise_ivf",
        "label_centroid_outliers", "mad_outliers_by_type",
        "median_value_by_type", "mix_sources_counts", "moments_by_type",
        "monthly_revenue_mom", "orders_segment_at_day", "pack_sequences_q",
        "semantic_decon", "semantic_decon_fast", "semantic_dedup",
        "semantic_dedup_fast", "span_source_matrix", "split_leakage",
        "strip_dup_spans", "supplier_copart_triangles", "text_fingerprint",
        "text_langid", "text_normalize", "text_quality", "text_repetition",
        "text_token_counts",
    }
    # r16 window front: the 4 r11-era rows the r15 budget could not fit
    # (after r15, every other row is r12+), the two pre-existing queries
    # whose behavior changed in r15 (doc_tf mirror in the bm25 lifecycle;
    # broadcast PRF expansion anti-join), and the two r15-new queries
    # with no driver row yet — all checker-certified on landing.
    next_window = {
        "token_apportionment", "topk_parts_per_brand",
        "tumbling_event_stats", "user_retention_cohorts",
        "bm25_maintenance_cycle", "bm25_prf_topk",
        "decon_hashscreen", "sketch_source_census",
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
