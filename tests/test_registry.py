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
    # BEHAVIOR changed this round → this round's window; (2) the stalest
    # green rows → fill the window; (3) the next-stalest rows → pinned to
    # the FRONT of the next window. This test pins the current allocation
    # so a registry edit can't silently drop a changed query out of both
    # windows.
    changed_in_window = {
        # NEW in r11: the contraction-decorated corpus hash-certifying the
        # donation-into-contraction fix (ADVICE r10 high) at the driver gate
        "bpe_contraction_parity",
        # the one query with no driver row ever (VERDICT r10 next-round #1)
        "knn_label_noise_ivf",
        # CHANGED in r11: expression-path pretokenizer branches (compiled
        # plan change; punct-corpus results identical — the fix's limb
        # never fires there)
        "bpe_byte_token_count",
        # the 47 r7-era stale-evidence rotations VERDICT r10 #1 queued —
        # after r11 no driver row predates r8
        "ann_brute_force", "ann_ivf_topk", "ann_lsh_multiprobe", "ann_lsh_topk",
        "ann_sq8_topk", "bigram_lm", "contamination_report",
        "decontaminate_docs", "dedup_embedding", "dedup_minhash_lsh",
        "dedup_minhash_lsh_fast", "dedup_simhash", "dedup_simhash_fast",
        "dsir_importance", "dup_span_census", "event_transitions",
        "event_trigram_paths", "gopher_funnel", "gopher_quality",
        "grouping_sets_revenue", "hard_negatives",
        "label_centroid_outliers", "mad_outliers_by_type",
        "median_value_by_type", "mix_sources_counts", "moments_by_type",
        "monthly_revenue_mom", "orders_segment_at_day",
        "pack_sequences_q", "semantic_decon", "semantic_decon_fast",
        "semantic_dedup", "semantic_dedup_fast", "span_source_matrix",
        "split_leakage", "strip_dup_spans", "supplier_copart_triangles",
        "text_fingerprint", "text_langid", "text_normalize",
        "text_quality", "text_repetition", "text_token_counts",
        "token_apportionment", "topk_parts_per_brand",
        "tumbling_event_stats", "user_retention_cohorts",
    }
    # r12 window front: queries whose SQL or compiled plan text changed in
    # r11 with results certified identical in-round (full 192/192 checker
    # at HEAD): the byte-BPE four (SQL change) plus the queries with STABLE
    # canonical-plan-hash diffs vs r10 from the bind_once sweep.
    next_window = {
        # NEW late-r11, checker-certified --only at all 3 SFs in-round
        "ann_ivf_list_skew", "hybrid_rrf_topk", "kn_lm_score",
        "ann_ivf_filtered", "dedup_lsh_recall", "wordpiece_stats",
        "unigram_stats",
        "bpe_byte_token_count_fast", "bpe_fertility", "token_shard_stats",
        "shard_decode_roundtrip",
        "approx_stats", "c4_line_clean", "corpus_frequent_ngrams",
        "cross_source_dup_matrix", "decon_fuzzy", "dedup_ngram_jaccard",
        "doc_boilerplate_ppm", "fuzzy_cross_batch", "heavy_hitters",
        "ngram_diversity", "q19_disjunctive_revenue", "quality_classifier",
        "quality_classifier_eval",
    }
    names = list(all_specs())
    head = set(names[:DRIVER_ORACLE_WINDOW])
    missing = changed_in_window - head
    assert not missing, f"changed queries outside the driver window: {missing}"
    next_slots = set(
        names[DRIVER_ORACLE_WINDOW : DRIVER_ORACLE_WINDOW + len(next_window)]
    )
    assert next_window == next_slots, (
        "SQL-text-changed byte-BPE rows must lead the r12 window: "
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
