"""Empty-input robustness: every pipeline operator must return an empty
(or well-defined degenerate) result on an empty table — not throw. At
100 TB, empty partitions, empty sources after a filter, and empty
incremental batches are routine, and a driver-side `max()` or `[0]` on
an empty collect is the classic way pipelines die at 3am."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture()
def empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<double>")


def test_text_ops_empty(spark, empty_docs):
    from laradb_spark.pipelines import text as tx

    assert tx.quality_features(empty_docs).count() == 0
    assert tx.repetition_stats(empty_docs).count() == 0
    assert tx.normalize_text(empty_docs).count() == 0
    assert tx.frequent_ngrams(empty_docs, n=2, k=5).count() == 0
    assert tx.boilerplate_ppm(empty_docs).count() == 0
    assert tx.tfidf_top_terms(empty_docs).count() == 0
    assert tx.fingerprint(empty_docs).count() == 0


def test_dedup_ops_empty(spark, empty_docs, tmp_path):
    from laradb_spark.pipelines import dedup as dd

    assert dd.exact_duplicates(empty_docs).count() == 0
    assert dd.drop_exact_duplicates(empty_docs).count() == 0
    assert dd.minhash_lsh_pairs(empty_docs).count() == 0
    assert dd.ngram_jaccard_pairs(empty_docs).count() == 0
    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dd.near_dup_components(empty_pairs).count() == 0
    assert dd.near_dup_components(empty_pairs, algorithm="star").count() == 0
    idx = str(tmp_path / "digests")
    dd.digest_build_index(empty_docs, idx)
    assert dd.drop_seen_digests(empty_docs, idx).count() == 0


def test_curation_ops_empty(spark, empty_docs):
    from laradb_spark.pipelines import curation as cu

    assert cu.decontaminate(empty_docs, empty_docs).count() == 0
    assert cu.trim_length_outliers(empty_docs).count() == 0
    assert cu.redact_pii(empty_docs).count() == 0
    packed = cu.pack_sequences(
        spark.createDataFrame([], "doc_id long, n_tokens long"), 512
    )
    assert packed.count() == 0


def test_similarity_ops_empty(spark, empty_emb):
    from laradb_spark.pipelines import similarity as sim

    q = spark.createDataFrame([], "query_id long, embedding array<double>")
    assert sim.brute_force_topk(empty_emb, q).count() == 0
    # k-means init on an empty corpus degenerates to zero centroids; the
    # dedup must come back empty, not divide-by-zero
    assert sim.semantic_dedup(empty_emb).count() == 0
    assert sim.semantic_dedup_fast(empty_emb).count() == 0


def test_timeseries_and_graph_empty(spark):
    from laradb_spark.operators.graph import triangle_count
    from laradb_spark.operators.timeseries import fill_gaps_forward

    e = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(e).first().n_triangles == 0
    s = spark.createDataFrame([], "k string, bin long, v long")
    assert fill_gaps_forward(s, "k", "bin", "v").count() == 0
