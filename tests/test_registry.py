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
        # changed in r7: the NaN-score fold (cosine/_assign nanvl,
        # quantize_sq8 non-finite guard, semantic-dedup pair filter)
        # touches every expression ANN path and both semantic-dedup
        # twins; bigram_lm gets the DECIMAL(38,0) ppm numerator
        "ann_brute_force", "ann_sq8_topk", "ann_lsh_topk",
        "ann_lsh_multiprobe", "ann_ivf_topk", "hard_negatives",
        "semantic_dedup", "semantic_dedup_fast", "dedup_embedding",
        "bigram_lm",
        # new in r7 — no driver row yet
        "dup_span_census", "strip_dup_spans", "dsir_importance",
        "token_apportionment", "gopher_funnel", "span_source_matrix",
        "ngram_diversity", "split_leakage", "knn_label_noise",
        "semantic_decon", "semantic_decon_fast", "label_centroid_outliers",
        # the r7-front promised by r6: r6-new queries, the
        # fan_out-plan-changed dedup family, r3-era rotations
        "gopher_quality", "contamination_report", "dedup_minhash_lsh",
        "dedup_minhash_lsh_fast", "dedup_simhash", "dedup_simhash_fast",
        "decontaminate_docs", "supplier_copart_triangles",
        "text_fingerprint", "text_langid", "text_normalize",
        "text_quality", "text_repetition", "text_token_counts",
        "topk_parts_per_brand", "tumbling_event_stats",
        "user_retention_cohorts",
    }
    # r8 window front: the 14 stale-evidence rotations the 50-slot r7
    # window could not fit (code unchanged since r4) — four fills were
    # displaced by the late-r7 label-audit family.
    next_window = {
        "pagerank_supplier_part", "purchase_attribution",
        "redact_pii_stats", "salted_lineitem_stats",
        "shuffle_shards_q", "source_drift_tv",
        "top_prices_with_ties", "train_val_split_stats", "trim_length_outliers",
        "twap_value_by_user_type", "value_quantiles_by_type",
        "value_spikes_by_type", "value_variance_by_type", "vocab_coverage",
    }
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = changed_in_window - head
    assert not missing, f"changed queries outside the driver window: {missing}"
    next_slots = set(
        names[DRIVER_ORACLE_WINDOW : DRIVER_ORACLE_WINDOW + len(next_window)]
    )
    assert next_window == next_slots, (
        "stale-evidence r4-era queries must lead the r8 window: "
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
