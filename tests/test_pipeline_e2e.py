"""End-to-end pretraining-pipeline integration: the stages compose —
C4 line cleaning → exact dedup → fuzzy (minhash) dedup → quality gate →
token-shard materialization → decode — and the final artifact is the
surviving documents' cleaned text, byte for byte. Guards cross-module
drift the per-stage suites can't see (column contracts, id plumbing,
text mutation between stages)."""

from pyspark.sql import functions as F

from laradb_spark.pipelines import dedup as dd
from laradb_spark.pipelines import shards as sh
from laradb_spark.pipelines import text as tx
from laradb_spark.pipelines.lines import c4_line_clean

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("t", "h"), ("e", "r")]


def _sentence(words):
    return " ".join(words) + "."


def test_full_pipeline_composes(spark, tmp_path):
    base = [f"w{i:02d}" for i in range(60)]
    good_a = _sentence(base)
    near_a = _sentence(base[:55] + ["zebra"] + base[56:])  # ~1-word edit
    good_b = _sentence([f"q{i:02d}" for i in range(60)])
    docs = spark.createDataFrame(
        [
            (1, good_a),
            (2, good_a),                      # exact duplicate of 1
            (3, near_a),                      # near-duplicate of 1
            (4, good_b),                      # distinct survivor
            (5, "var x = { junk }"),          # C4 '{' tell → dropped
            (6, "no terminal punctuation here"),  # no kept line → dropped
        ],
        "doc_id long, text string",
    )

    # 1. line-level clean (per-line punct+word rules, doc-level tells)
    cleaned = c4_line_clean(docs, min_words=3, min_lines=1).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert {r.doc_id for r in cleaned.select("doc_id").collect()} == {1, 2, 3, 4}

    # 2. exact dedup (first occurrence wins)
    exact = dd.drop_exact_duplicates(cleaned)
    assert {r.doc_id for r in exact.select("doc_id").collect()} == {1, 3, 4}

    # 3. fuzzy dedup: LSH candidates → exact-Jaccard verify → components
    pairs = dd.lsh_candidate_jaccard(exact, threshold=0.8)
    fuzzy = dd.drop_near_duplicates(exact, pairs)
    assert {r.doc_id for r in fuzzy.select("doc_id").collect()} == {1, 4}

    # 4. quality gate (structural floor — these synthetic docs pass)
    scored = fuzzy.join(tx.quality_score(fuzzy), on="doc_id")
    kept = scored.filter(F.col("quality") >= 0.2).select("doc_id", "text")
    assert {r.doc_id for r in kept.collect()} == {1, 4}

    # 5. materialize token shards and certify the artifact round-trips
    path = str(tmp_path / "e2e_shards")
    sh.write_token_shards(kept, MERGES, path, context_len=16)
    back = {
        r.doc_id: r.text
        for r in sh.reassemble_docs_from_packs(
            spark.read.parquet(path), MERGES, context_len=16
        ).collect()
    }
    want = {r.doc_id: r.text for r in kept.collect()}
    assert back == want
