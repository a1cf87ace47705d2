"""Streaming dedup (dropDuplicatesWithinWatermark) and the Kafka source
surface (options + JSON value decoding; the connector jars are absent, so
load() must fail with actionable guidance)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from laradb_spark.streaming import (
    dedup_stream,
    kafka_source_options,
    kafka_stream_source,
    kafka_value_json,
    stream_from_parquet_dir,
)
from laradb_spark.streaming.windows import run_stream_to_memory

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

M = 60_000
BASE = 1_700_000_000_000 - (1_700_000_000_000 % 3_600_000)


@pytest.fixture(scope="module")
def dup_stream_dir(spark, tmp_path_factory):
    # event 1 delivered 3×, event 2 delivered 2× (at-least-once transport);
    # split across two files so re-deliveries span micro-batches.
    d = str(tmp_path_factory.mktemp("dup_events"))
    batch1 = [
        (1, BASE + 1 * M, 1, "click", 1.0),
        (1, BASE + 1 * M, 1, "click", 1.0),
        (2, BASE + 2 * M, 1, "view", 2.0),
        (3, BASE + 3 * M, 2, "click", 3.0),
    ]
    batch2 = [
        (1, BASE + 1 * M, 1, "click", 1.0),
        (2, BASE + 2 * M, 1, "view", 2.0),
        (4, BASE + 4 * M, 2, "view", 4.0),
    ]
    spark.createDataFrame(batch1, EV_SCHEMA).coalesce(1).write.parquet(f"{d}/f=1")
    spark.createDataFrame(batch2, EV_SCHEMA).coalesce(1).write.parquet(f"{d}/f=2")
    return d


def test_dedup_stream_drops_redeliveries(spark, dup_stream_dir):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(dup_stream_dir)
    )
    out = dedup_stream(stream, id_cols=("event_id",), watermark="10 minutes")
    q = run_stream_to_memory(out, "dedup_out", "append")
    try:
        got = spark.sql("SELECT event_id FROM dedup_out").collect()
        assert sorted(r.event_id for r in got) == [1, 2, 3, 4]
    finally:
        q.stop()


def test_dedup_stream_batch_twin(spark, dup_stream_dir):
    batch = (
        spark.read.option("recursiveFileLookup", "true")
        .schema(EV_SCHEMA)
        .parquet(dup_stream_dir)
    )
    out = dedup_stream(batch, id_cols=("event_id",))
    assert sorted(r.event_id for r in out.collect()) == [1, 2, 3, 4]
    assert out.columns == batch.columns  # _etime helper column removed


def test_stream_static_digest_dedup(spark, tmp_path):
    """drop_seen_digests on a STREAMING frame = stream-static left-anti
    join against the stored digest index (the incremental-ingest shape:
    history never re-scans, new shards screen per micro-batch)."""
    from pyspark.sql import types as T

    from laradb_spark.pipelines.dedup import digest_build_index, drop_seen_digests

    hist = spark.createDataFrame([(1, "seen before")], ["doc_id", "text"])
    idx = str(tmp_path / "digests")
    digest_build_index(hist, idx)

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "incoming")
    spark.createDataFrame(
        [(10, "fresh"), (11, "seen before"), (12, "fresh")], doc_schema
    ).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(doc_schema).parquet(src)
    out = drop_seen_digests(stream, idx)
    assert out.isStreaming
    q = run_stream_to_memory(out, "inc_dedup_out", "append")
    try:
        got = spark.sql("SELECT doc_id FROM inc_dedup_out").collect()
        assert sorted(r.doc_id for r in got) == [10, 12]
    finally:
        q.stop()


def test_kafka_source_options():
    opts = kafka_source_options(
        "b1:9092,b2:9092", "events", max_offsets_per_trigger=100_000,
        fail_on_data_loss=False,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "100000",
    }
    with pytest.raises(ValueError):
        kafka_source_options("", "events")


def test_kafka_stream_source_missing_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream_source(spark, "localhost:9092", "events")


def test_kafka_value_json_decoding(spark):
    # kafka-shaped batch frame: the decode plan is identical for a real stream
    rows = [
        (b"k1", b'{"event_id": 1, "value": 2.5}', "events", 0, 0,
         __import__("datetime").datetime(2024, 1, 1, 0, 0, 0)),
        (b"k2", b'{"event_id": 2, "value": 3.5}', "events", 0, 1,
         __import__("datetime").datetime(2024, 1, 1, 0, 0, 1)),
        (b"k3", b"not json", "events", 1, 0,
         __import__("datetime").datetime(2024, 1, 1, 0, 0, 2)),
    ]
    kdf = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    )
    out = kafka_value_json(kdf, "event_id long, value double").collect()
    by_id = {r.event_id: r for r in out}
    assert by_id[1].value == 2.5 and by_id[2].value == 3.5
    assert by_id[1].kafka_ts is not None
    # malformed payload → NULL struct fields, row retained (inspectable), not a crash
    assert None in by_id


def test_foreach_batch_ingest_loop_sees_prior_batch_digests(spark, tmp_path):
    """dedup_ingest_stream re-reads the digest index inside foreachBatch,
    so a duplicate arriving in a LATER micro-batch of the SAME run is
    dropped — the freshness a plan-frozen stream-static join can't give
    (its parquet listing resolves once at stream start)."""
    import os
    import time

    from pyspark.sql import types as T

    from laradb_spark.streaming.dedup import dedup_ingest_stream

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame([(1, "alpha"), (2, "beta")], doc_schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mod times → file 1 batches before file 2
    spark.createDataFrame(
        [(3, "alpha"), (4, "gamma")], doc_schema  # 3 duplicates batch-1 text
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("idx", "out", "ck"))
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src)
    )
    q = dedup_ingest_stream(stream, idx, out, ck)
    q.awaitTermination(120)
    got = sorted(r.text for r in spark.read.parquet(out).collect())
    assert got == ["alpha", "beta", "gamma"]  # the later 'alpha' was dropped
    n_idx = spark.read.parquet(idx).distinct().count()
    assert n_idx == 3

    # restart with NEW data: the grown index still screens old texts
    time.sleep(1.1)
    spark.createDataFrame([(5, "gamma"), (6, "delta")], doc_schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    q2 = dedup_ingest_stream(
        spark.readStream.schema(doc_schema).option("maxFilesPerTrigger", 1).parquet(src),
        idx, out, ck,
    )
    q2.awaitTermination(120)
    got2 = sorted(r.text for r in spark.read.parquet(out).collect())
    assert got2 == ["alpha", "beta", "delta", "gamma"]


def test_span_ingest_loop_strips_across_and_within_batches(spark, tmp_path):
    """span_ingest_stream strips windows seen in EARLIER micro-batches of
    the same run (index re-read per batch) AND windows duplicated within
    one batch (all occurrences — the BFF rule); novel text passes
    verbatim and the index grows with each batch's hashes."""
    import os
    import time

    from pyspark.sql import types as T

    from laradb_spark.streaming.dedup import span_ingest_stream

    doc_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    src = str(tmp_path / "in")
    os.makedirs(src)
    # batch 1: doc 1 seeds "a b c"; docs 2+3 duplicate "p q r" WITHIN the batch
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "p q r x y"), (3, "z p q r w")], doc_schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mod times → file 1 batches before file 2
    # batch 2: doc 10 repeats batch-1's "a b c"; doc 11 is novel
    spark.createDataFrame(
        [(10, "x a b c y"), (11, "u v w x y z")], doc_schema
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("idx", "out", "ck"))
    stream = (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file
        .parquet(src)
    )
    q = span_ingest_stream(stream, idx, out, ck, window=3)
    q.awaitTermination(120)
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.kept_tokens)
           for r in spark.read.parquet(out).collect()}
    assert got == {
        1: ("a b c d e", 5, 5),    # first occurrence, nothing flagged yet
        2: ("x y", 5, 2),          # intra-batch dup "p q r" stripped (both)
        3: ("z w", 5, 2),
        10: ("x y", 5, 2),         # cross-batch dup of batch-1's "a b c"
        11: ("u v w x y z", 6, 6), # novel
    }
    # index holds every batch's distinct window hashes: batch 1 has
    # 3+3+3 − 1 intra-batch repeat ("p q r") = 8; batch 2 has 3+4 = 7,
    # one of which ("a b c") batch 1 already wrote → 14 distinct
    n_idx = spark.read.parquet(idx).distinct().count()
    assert n_idx == 14


def test_fuzzy_ingest_loop_drops_near_dups_across_batches(spark, tmp_path):
    """The fuzzy loop: batch 1 indexes a doc; batch 2's lightly-edited
    copy is dropped by stored-signature agreement while its fresh doc
    survives and is indexed; within-batch near-dups keep the smaller id."""
    import os
    import time

    from laradb_spark.streaming.dedup import fuzzy_ingest_stream

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    schema = "doc_id long, text string, source string"
    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [
            (1, base, "s"),
            (2, base.replace("kilo", "zulu"), "s"),  # intra-batch near-dup → dropped
            (3, "some genuinely different text about engines and planners", "s"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [
            (10, base.replace("alpha", "omega"), "s"),  # near-dup of indexed 1 → dropped
            (11, "fresh words that match nothing stored anywhere at all", "s"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("idx", "out", "ck"))
    q = fuzzy_ingest_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        idx, out, ck, threshold=0.5,
    )
    q.awaitTermination(120)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1, 3, 11]
    # the index holds exactly the survivors' signatures
    assert sorted(r.id for r in spark.read.parquet(f"{idx}/sigs").collect()) == [1, 3, 11]


def test_fuzzy_ingest_within_batch_chain_resolves_transitively(spark, tmp_path):
    """A within-batch near-dup CHAIN keeps exactly one doc per connected
    component (the min id), matching the batch family's
    drop_near_duplicates — not the greedy pairwise rule, which would keep
    a second doc whenever the chain's middle node holds the largest id.

    Fixture (deterministic under the fixed permutation table; agreements
    probed at NUM_PERM=32): texts A/B/C are a 60-word base with single-
    word edits such that sig-agreement(A,B)=30, (B,C)=30, (A,C)=28 and
    the τ=0.9 bar is 29 — so A~B~C but A≁C. The MIDDLE text B gets
    doc_id 3 and the ends get 1 (C) and 2 (A): greedy drop-the-larger
    over pairs {(2,3),(1,3)} keeps {1,2}; one-per-component keeps {1}."""
    import os
    import time

    from laradb_spark.streaming.dedup import fuzzy_ingest_stream

    base_words = [f"w{i:02d}" for i in range(60)]

    def mk(subs):
        ws = list(base_words)
        for pos, rep in subs.items():
            ws[pos] = rep
        return " ".join(ws)

    text_a = mk({})
    text_b = mk({55: "zebra"})
    text_c = mk({55: "zebra", 5: "quark"})
    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [(2, text_a), (3, text_b), (1, text_c)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("idx", "out", "ck"))
    q = fuzzy_ingest_stream(
        spark.readStream.schema(schema).parquet(src), idx, out, ck, threshold=0.9
    )
    q.awaitTermination(120)
    assert sorted(r.doc_id for r in spark.read.parquet(out).collect()) == [1]
    assert sorted(r.id for r in spark.read.parquet(f"{idx}/sigs").collect()) == [1]


def test_line_ingest_replay_does_not_inflate_counts(spark, tmp_path):
    """The sharpest exactly-once case in the loop family (r14, the
    bm25_index_stream txn discipline factored as streaming.txn): the LINE
    loop's index stores COUNTS, so an at-least-once replay used to
    silently inflate them — corrupting the strip threshold for every
    future batch. A wiped-checkpoint replay of the same batches must
    no-op on the applied markers: counts unchanged, output unchanged."""
    import os
    import shutil
    import time

    from laradb_spark.streaming.dedup import line_ingest_stream

    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "nav bar\nunique one"), (2, "nav bar\nunique two")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(
        [(3, "nav bar\nunique three")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    idx, out, ck = (str(tmp_path / d) for d in ("idx", "out", "ck"))

    def run(ckpt):
        q = line_ingest_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            idx, out, ckpt, max_occurrences=2,
        )
        q.awaitTermination(120)

    run(ck)
    want_out = sorted(
        (r.doc_id, r.clean_text) for r in spark.read.parquet(out).collect()
    )
    # batch 2's 'nav bar' crossed the threshold (count 3 > 2) -> stripped
    assert (3, "unique three") in want_out and len(want_out) == 3
    counts = {
        r.h: r.n
        for r in spark.read.parquet(idx)
        .groupBy("h").agg(F.sum("n").alias("n")).collect()
    }
    assert os.path.exists(f"{idx}/_stream_applied/batch_0")
    assert os.path.exists(f"{idx}/_stream_applied/batch_1")

    # wiped checkpoint -> same two batches redeliver as ids 0 and 1
    shutil.rmtree(ck)
    run(ck)
    again_out = sorted(
        (r.doc_id, r.clean_text) for r in spark.read.parquet(out).collect()
    )
    again_counts = {
        r.h: r.n
        for r in spark.read.parquet(idx)
        .groupBy("h").agg(F.sum("n").alias("n")).collect()
    }
    assert again_out == want_out
    assert again_counts == counts


def test_dedup_ingest_resumes_crashed_publish(spark, tmp_path, monkeypatch):
    """Crash mid-publish in the shared txn: the restart redelivers the
    batch (checkpoint uncommitted), finds the completed stage CARRYING its
    own marker, and FINISHES the publish — survivors and digests end
    exactly as an uncrashed run, nothing double-appended."""
    import os
    import shutil

    from laradb_spark.streaming.dedup import dedup_ingest_stream

    schema = "doc_id long, text string"
    src = str(tmp_path / "in")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "alpha"), (2, "alpha"), (3, "beta")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    idx, out, ck = (str(tmp_path / d) for d in ("idx", "out", "ck"))

    real_move = shutil.move

    def crash_move(src_p, dst_p):
        raise OSError("injected mid-publish crash")

    monkeypatch.setattr(shutil, "move", crash_move)
    q = dedup_ingest_stream(
        spark.readStream.schema(schema).parquet(src), idx, out, ck
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass
    assert not q.isActive
    monkeypatch.setattr(shutil, "move", real_move)
    # staged, marked with its owner, nothing published, no applied marker
    assert os.path.exists(f"{idx}/_append_pending/_STAGED_OK")
    assert os.path.exists(f"{idx}/_append_pending/_markers/batch_0")
    assert not os.path.exists(f"{idx}/_stream_applied/batch_0")

    q2 = dedup_ingest_stream(
        spark.readStream.schema(schema).parquet(src), idx, out, ck
    )
    q2.awaitTermination(120)
    assert os.path.exists(f"{idx}/_stream_applied/batch_0")
    assert not os.path.exists(f"{idx}/_append_pending")
    assert sorted(r.text for r in spark.read.parquet(out).collect()) == [
        "alpha", "beta",
    ]
    assert spark.read.parquet(idx).distinct().count() == 2


def test_txn_refusals(tmp_path):
    """Unit-level txn guards: a completed FOREIGN stage (no ownership
    marker for this batch) refuses instead of publishing someone else's
    data as this batch; publish with no completed stage refuses with the
    re-run instruction."""
    import os

    import pytest as _pytest

    from laradb_spark.streaming.txn import (
        exactly_once_apply,
        publish_pending_batch,
    )

    root = str(tmp_path / "rootdir")
    pend = os.path.join(root, "_append_pending")
    os.makedirs(os.path.join(pend, "_markers"))
    open(os.path.join(pend, "_markers", "batch_9"), "w").close()
    open(os.path.join(pend, "_STAGED_OK"), "w").close()
    with _pytest.raises(RuntimeError, match="does NOT belong"):
        exactly_once_apply(
            root, 0, "unit", lambda p: (_ for _ in ()).throw(AssertionError), {}
        )
    # and an un-marked pending dir is not publishable
    os.remove(os.path.join(pend, "_STAGED_OK"))
    with _pytest.raises(RuntimeError, match="no completed stage"):
        publish_pending_batch(root)
