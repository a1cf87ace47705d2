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
        # no driver row EVER: the seven late-r11 additions plus the two
        # NEW r12 queries (sqrt(N) kNN-audit route, VERDICT r11 #3; the
        # index-maintenance cycle, VERDICT r11 #4)
        "ann_ivf_list_skew", "hybrid_rrf_topk", "kn_lm_score",
        "ann_ivf_filtered", "dedup_lsh_recall", "wordpiece_stats",
        "unigram_stats", "knn_label_noise_ivf_auto", "ivf_maintenance_cycle",
        # SQL/plan text changed in r11, certified identical in-round:
        # the byte-BPE family + the bind_once plan-changed group
        "bpe_byte_token_count_fast", "bpe_fertility", "token_shard_stats",
        "shard_decode_roundtrip", "approx_stats", "c4_line_clean",
        "corpus_frequent_ngrams", "cross_source_dup_matrix", "decon_fuzzy",
        "dedup_ngram_jaccard", "doc_boilerplate_ppm", "fuzzy_cross_batch",
        "heavy_hitters", "ngram_diversity", "q19_disjunctive_revenue",
        "quality_classifier", "quality_classifier_eval",
    }
    # r13 window front: the 19 r8-era rows the r12 budget could not fit
    # (after r12, every other row is r9+; these rotate first next round).
    next_window = {
        "nation_region_full_outer", "order_price_histogram",
        "order_price_percentiles", "pagerank_supplier_part",
        "purchase_attribution", "redact_pii_stats", "salted_lineitem_stats",
        "shuffle_shards_q", "source_datacard", "source_drift_tv",
        "top_prices_with_ties", "train_val_split_stats",
        "trim_length_outliers", "twap_value_by_user_type",
        "unimax_allocation", "value_quantiles_by_type",
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
        "the leftover r8-era rows must lead the r13 window: "
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
