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
