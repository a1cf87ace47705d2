"""Map-only curation/text operators run UNCHANGED on streams — the
unified batch/streaming contract extends to the pipeline surface: the
same `redact_pii` / `hash_split` / `mix_sources` / quality expressions
applied to a readStream produce exactly the batch rows (stateless ops
need no watermark; Spark plans them as streaming map stages)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from laradb_spark.pipelines import curation as cu
from laradb_spark.pipelines import text as tx
from laradb_spark.streaming.windows import run_stream_to_memory

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("source", T.StringType()),
])

ROWS = [
    (1, "mail bob@corp.io or +1 555-123-4567 now", "src0"),
    (2, "plain text with the and of tokens", "src0"),
    (3, "short", "src1"),
    (4, "another document with a few more words in it", "src1"),
]


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("docs_stream"))
    spark.createDataFrame(ROWS, DOC_SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, doc_dir):
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_dir)
    )


def _pipeline(df):
    """redact → split → mix: three stateless curation stages composed."""
    out = cu.redact_pii(df)
    out = cu.hash_split(out, val_frac=0.5)
    out = cu.mix_sources(out, {"src0": 1.0}, default_rate=0.5)
    return out.select("doc_id", "text", "split", "n_email", "n_phone")


def test_curation_pipeline_batch_stream_equivalence(spark, doc_dir):
    batch = _pipeline(spark.read.parquet(doc_dir))
    stream = _pipeline(_stream(spark, doc_dir))
    assert stream.isStreaming
    q = run_stream_to_memory(stream, "curation_out", "append")
    try:
        got = spark.sql("SELECT * FROM curation_out").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch.collect()))
    finally:
        q.stop()


def test_text_quality_streams(spark, doc_dir):
    batch = tx.quality_features(spark.read.parquet(doc_dir))
    stream = tx.quality_features(_stream(spark, doc_dir))
    assert stream.isStreaming
    q = run_stream_to_memory(stream, "quality_out", "append")
    try:
        got = spark.sql("SELECT * FROM quality_out").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch.collect()))
    finally:
        q.stop()


def test_quality_classifier_scores_streams(spark, doc_dir):
    """Classifier inference is a stream-static broadcast join + one
    streaming aggregate: offline-trained (static) weights score a
    readStream exactly as the batch plan — the FineWeb-style filter
    drops into an ingest pipeline unchanged."""
    batch_docs = spark.read.parquet(doc_dir)
    pos = batch_docs.filter(F.col("source") == "src0")
    neg = batch_docs.filter(F.col("source") != "src0")
    weights = cu.train_quality_weights(pos, neg)

    batch = cu.quality_classifier_score(batch_docs, weights)
    stream = cu.quality_classifier_score(_stream(spark, doc_dir), weights)
    assert stream.isStreaming
    q = run_stream_to_memory(stream, "clf_out", "complete")
    try:
        got = spark.sql("SELECT * FROM clf_out").collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch.collect()))
    finally:
        q.stop()


def test_curate_ingest_loop_dedups_gates_and_ledgers(spark, tmp_path):
    """The end-to-end incremental loop: batch 2's exact duplicate of a
    batch-1 text is dropped by the stored digest index; the classifier
    gate rejects the bad-bucket doc AND the token-less doc; the ledger
    records (n_new, n_kept, n_tokens_kept) per (batch, source); every
    first-seen digest (kept or rejected) lands in the index."""
    import os
    import time

    from laradb_spark.pipelines.curation import _hashed_feature_stream
    from laradb_spark.streaming.ingest import curate_ingest_stream

    # weights: every feature bucket the bad doc hits scores -1000 ppm;
    # buckets computed via the SAME hashed stream the scorer uses
    bad = spark.createDataFrame([(0, "bad bad bad")], "doc_id long, text string")
    bad_buckets = [r.b for r in _hashed_feature_stream(bad, "text", 4096).select("b").distinct().collect()]
    weights = spark.createDataFrame([(b, -1000) for b in bad_buckets], "b int, w long")

    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "good good good", "s1"), (2, "bad bad bad", "s1")], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes → file 1 micro-batches before file 2
    spark.createDataFrame(
        [
            (3, "good good good", "s2"),   # exact dup of doc 1 → index drop
            (4, "fresh fresh fresh", "s2"),  # scores 0 → kept
            (5, "", "s2"),                   # token-less → rejected by gate
        ],
        DOC_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, stats, ck = (str(tmp_path / d) for d in ("idx", "out", "stats", "ck"))
    stream = (
        spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = curate_ingest_stream(stream, weights, idx, out, stats, ck, threshold_ppm=0)
    q.awaitTermination(120)

    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 4]
    assert spark.read.parquet(idx).distinct().count() == 4  # good, bad, fresh, ''
    ledger = {
        (r.batch_id, r.source): (r.n_new, r.n_kept, r.n_tokens_kept)
        for r in spark.read.parquet(stats).collect()
    }
    assert ledger[(0, "s1")] == (2, 1, 3)
    assert ledger[(1, "s2")] == (2, 1, 3)  # dup doc 3 never reaches the ledger

    # restart with new data: the grown index still screens batch-1 text,
    # and the gate decision for a dup of a REJECTED doc is never re-made
    time.sleep(1.1)
    spark.createDataFrame(
        [(6, "bad bad bad", "s3"), (7, "novel words here", "s3")], DOC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = curate_ingest_stream(
        spark.readStream.schema(DOC_SCHEMA).option("maxFilesPerTrigger", 1).parquet(src),
        weights, idx, out, stats, ck, threshold_ppm=0,
    )
    q2.awaitTermination(120)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 4, 7]
    ledger2 = {
        (r.batch_id, r.source): (r.n_new, r.n_kept, r.n_tokens_kept)
        for r in spark.read.parquet(stats).collect()
    }
    assert ledger2[(2, "s3")] == (1, 1, 3)  # only doc 7 is new
