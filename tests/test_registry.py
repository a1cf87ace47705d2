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
        # r5's one driver red (decimal-vs-double) — r6 casts to DOUBLE
        "sql_front_door_q",
        # changed in r5 (grouped_rank tfidf, merge_upsert seq-collapse,
        # one-pass quality report, shared BM25 tokenizer, ROUND-mirrored
        # Jaccard oracles, two-phase cap_per_group, vectorized SQ8 twin)
        "tfidf_top_terms", "customer_merge_upsert", "orders_quality_report",
        "bm25_topk", "dedup_ngram_jaccard", "dedup_components",
        "dedup_keep_representatives", "dedup_lsh_jaccard",
        "dedup_prefix_jaccard", "cross_source_dup_matrix",
        "cap_docs_per_source", "ann_sq8_fast",
        # changed in r6: exact-ANN batch-local top-k pre-prune; gram NULL
        # validation
        "ann_brute_force", "ann_brute_force_fast", "ann_sq8_topk",
        "hard_negatives", "embedding_gram",
    }
    # r7 window front, in two tiers: (a) queries whose PLANS changed in r6
    # via the fan_out small-scan parallelism fix but whose values are
    # identical (checker-verified at sf0.01 this round) — the other
    # fan_out-affected queries already sit in the r6 head; then (b) the 10
    # r3-era queries the 50-slot r6 window could not fit (code unchanged
    # since r3; rotating for driver-row freshness).
    next_window = {
        # new in r6 — no driver row yet
        "gopher_quality", "bigram_lm", "contamination_report",
        "dedup_minhash_lsh", "dedup_minhash_lsh_fast", "dedup_simhash",
        "dedup_simhash_fast", "decontaminate_docs", "semantic_dedup",
        "semantic_dedup_fast", "ann_lsh_topk", "ann_lsh_multiprobe",
        "ann_ivf_topk",
        "supplier_copart_triangles", "text_fingerprint", "text_langid",
        "text_normalize", "text_quality", "text_repetition",
        "text_token_counts", "topk_parts_per_brand", "tumbling_event_stats",
        "user_retention_cohorts",
    }
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = changed_in_window - head
    assert not missing, f"changed queries outside the driver window: {missing}"
    next_slots = set(
        names[DRIVER_ORACLE_WINDOW : DRIVER_ORACLE_WINDOW + len(next_window)]
    )
    assert next_window == next_slots, (
        "stale-evidence r3-era queries must lead the r7 window: "
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
    # accidentally-dropped oracle
    no_oracle = {n for n, (_f, sql) in all_specs().items() if sql is None}
    # approx_stats is the ONLY rows-only query (engine-specific sketches);
    # ann_ivf_topk gained a real oracle (unrolled Lloyd rounds in SQL)
    assert no_oracle == {"approx_stats"}
