"""Token-shard materialization: the packed-corpus write is exactly the
concat-and-chunk of the per-doc byte-BPE encodings, and the metadata-only
occupancy report agrees with the materialized shards."""

from pyspark.sql import functions as F

from laradb_spark.pipelines import shards as sh
from laradb_spark.pipelines.tokenizer import (
    bpe_byte_encode_ids,
    bpe_byte_vocab,
    bpe_encode_str_sweep,
    byte_map_str,
    pretokenize_str,
)

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("ll", "o")]
TEXTS = [
    (1, "hello hello world"),
    (2, ""),  # zero tokens — packing must skip it without breaking
    (3, "shell shellfish hell"),
    (4, "what the hell — hello? hellllo!"),
    (5, "llllll llhe hehehe"),
]
L = 7


def _encode_py(t):
    vocab = bpe_byte_vocab(MERGES)
    out = []
    for p in pretokenize_str(t or ""):
        out += [vocab[s] for s in bpe_encode_str_sweep(byte_map_str(p), MERGES)]
    return out


def test_encode_ids_matches_python(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = {r.doc_id: list(r.token_ids) for r in bpe_byte_encode_ids(df, MERGES).collect()}
    for did, t in TEXTS:
        assert got[did] == _encode_py(t), did


def test_write_token_shards_matches_python_replay(spark, tmp_path):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    path = str(tmp_path / "shards")
    sh.write_token_shards(df, MERGES, path, context_len=L)

    # python replay: concat in doc_id order, chunk every L
    stream, starts = [], {}
    for did, t in sorted(TEXTS):
        ids = _encode_py(t)
        if ids:
            starts.setdefault(len(stream) // L, []).append(
                (len(stream) % L, did)
            )
            stream += ids
    want = {
        p: stream[p * L : (p + 1) * L] for p in range((len(stream) + L - 1) // L)
    }

    rows = spark.read.parquet(path).collect()
    got = {r.pack_id: list(r.token_ids) for r in rows}
    assert got == want
    # all packs full except the last
    last = max(got)
    for p, ids in got.items():
        assert len(ids) == (len(stream) - last * L if p == last else L)
    got_starts = {
        r.pack_id: [(s.pos, s.doc_id) for s in (r.doc_starts or [])] for r in rows
    }
    for p in want:
        assert got_starts[p] == sorted(starts.get(p, [])), p


def test_pack_occupancy_agrees_with_materialized_shards(spark, tmp_path):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    counted = bpe_byte_encode_ids(df, MERGES).select(
        "doc_id", F.size("token_ids").alias("n_tokens")
    )
    occ = {
        r.pack_id: (r.n_tokens, r.n_docs_starting)
        for r in sh.pack_occupancy(counted, L).collect()
    }
    path = str(tmp_path / "shards2")
    sh.write_token_shards(df, MERGES, path, context_len=L)
    mat = {
        r.pack_id: (len(r.token_ids), len(r.doc_starts or []))
        for r in spark.read.parquet(path).collect()
    }
    assert occ == mat


def test_doc_starts_stored_as_empty_array_not_null(spark, tmp_path):
    """A pack fully inside one long document has no doc start; the stored
    value must be an EMPTY array, not NULL, so loaders need no null guard
    (the left join would otherwise persist a NULL)."""
    # doc 1: "ll" * 40 encodes to 40 'll' tokens -> packs 0..4 at L=8;
    # packs 1..3 sit strictly inside doc 1
    long_doc = [(1, "ll" * 40), (2, "hello")]
    df = spark.createDataFrame(long_doc, "doc_id long, text string")
    path = str(tmp_path / "shards_long")
    sh.write_token_shards(df, MERGES, path, context_len=8)
    rows = {r.pack_id: r for r in spark.read.parquet(path).collect()}
    interior = [p for p in rows if rows[p].doc_starts is not None and len(rows[p].doc_starts) == 0]
    assert interior, "expected at least one interior pack with an empty doc_starts"
    for r in rows.values():
        assert r.doc_starts is not None  # the format is non-nullable


def test_reassemble_docs_from_packs_roundtrips_through_parquet(spark, tmp_path):
    """The full artifact loop: encode -> pack -> parquet -> read -> segment
    reassembly across pack boundaries -> byte-BPE decode == the source
    text, byte for byte — including a doc spanning several whole packs
    (head-segment ownership must forward-fill across pack rows) and
    multi-whitespace text (the donation limb)."""
    texts = [
        (1, "hello hell"),
        (2, "ll" * 30),            # spans > 2 packs at L=8
        (3, "he  said\n\thello"),  # donation: double space + \n\t run
        (4, ""),                   # zero tokens: absent from packs
        (5, "shell llhe"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    path = str(tmp_path / "rt_shards")
    sh.write_token_shards(df, MERGES, path, context_len=8)
    back = {
        r.doc_id: r.text
        for r in sh.reassemble_docs_from_packs(
            spark.read.parquet(path), MERGES, context_len=8
        ).collect()
    }
    want = {d: t for d, t in texts if t}
    assert back == want


def test_compact_token_shards(spark, tmp_path):
    """Small-files maintenance: committed batch partitions merge into ONE
    negative compacted segment with identical rows; the uncommitted batch
    and an empty committed dir are untouched; re-compaction folds the
    previous segment; a fresh store is a no-op."""
    import os

    root = str(tmp_path / "shards")
    mk = lambda b, rows: spark.createDataFrame(
        rows, "pack_id long, token_ids array<int>, doc_starts array<struct<pos:int,doc_id:bigint>>"
    ).repartition(3).write.mode("overwrite").parquet(f"{root}/batch={b}")
    mk(1, [(0, [1, 2], [(0, 10)]), (1, [3, 4], [])])
    mk(2, [(2, [5, 6], [(1, 11)])])
    mk(3, [(3, [7, 8], [])])                     # NOT committed — must survive
    os.makedirs(f"{root}/batch=4")               # empty committed dir — ignored

    before = spark.read.parquet(root).collect()
    rep = sh.compact_token_shards(spark, root, committed_batch_id=2, target_bytes=1 << 30)
    assert rep["batches_compacted"] == 2 and rep["rows"] == 3
    assert rep["segment"] == -1 and rep["files_after"] == 1
    assert rep["files_before"] > rep["files_after"]
    dirs = sorted(d for d in os.listdir(root) if d.startswith("batch="))
    assert dirs == ["batch=-1", "batch=3", "batch=4"]
    after = spark.read.parquet(root).collect()
    assert sorted([(r.pack_id, r.token_ids) for r in after]) == sorted(
        [(r.pack_id, r.token_ids) for r in before]
    )
    # second run: batch=3 is now committed; folds segment -1 + batch 3 → -2
    rep2 = sh.compact_token_shards(spark, root, committed_batch_id=3, target_bytes=1 << 30)
    assert rep2["segment"] == -2 and rep2["batches_compacted"] == 2
    assert sorted(
        (r.pack_id, r.token_ids) for r in spark.read.parquet(root).collect()
    ) == sorted((r.pack_id, r.token_ids) for r in before)
    # nothing left to merge
    rep3 = sh.compact_token_shards(spark, root, committed_batch_id=3)
    assert rep3["batches_compacted"] == 0


def test_compact_token_shards_crash_never_duplicates(spark, tmp_path, monkeypatch):
    """r14: the compaction publish hides sources BEFORE the segment goes
    live (marker-gated, resumable) — the old rename-live-then-delete
    order permanently DUPLICATED every not-yet-deleted batch's packs if
    the delete loop crashed. Inject a crash mid-hide: the store shows no
    duplicated pack at any point, finish_compact_token_shards recovers to
    the exact end state, and a subsequent compact() call self-settles a
    crashed store before new work."""
    import os

    import pytest

    root = str(tmp_path / "shards_crash")
    mk = lambda b, rows: spark.createDataFrame(
        rows, "pack_id long, token_ids array<int>, doc_starts array<struct<pos:int,doc_id:bigint>>"
    ).repartition(2).write.mode("overwrite").parquet(f"{root}/batch={b}")
    mk(1, [(0, [1, 2], [(0, 10)]), (1, [3, 4], [])])
    mk(2, [(2, [5, 6], [(1, 11)])])
    before = sorted(
        (r.pack_id, tuple(r.token_ids)) for r in spark.read.parquet(root).collect()
    )

    real_rename = os.rename
    state = {"n": 0}

    def crash_second_rename(src, dst):
        # publish renames: hide batch=1, hide batch=2, segment live
        state["n"] += 1
        if state["n"] == 2:
            raise OSError("injected crash mid-hide")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crash_second_rename)
    with pytest.raises(OSError, match="injected"):
        sh.compact_token_shards(spark, root, committed_batch_id=2, target_bytes=1 << 30)
    monkeypatch.setattr(os, "rename", real_rename)
    # crash state: batch=1 hidden, batch=2 visible, segment NOT live —
    # visible rows are a SUBSET (never a duplicate) of the corpus
    visible = sorted(
        (r.pack_id, tuple(r.token_ids)) for r in spark.read.parquet(root).collect()
    )
    assert len(visible) == len(set(visible))
    assert set(visible) < set(before)
    assert os.path.isdir(f"{root}/_retired_batch_1")
    assert os.path.exists(f"{root}/_compacting_1/_COMPACT_OK")

    sh.finish_compact_token_shards(root)
    after = sorted(
        (r.pack_id, tuple(r.token_ids)) for r in spark.read.parquet(root).collect()
    )
    assert after == before  # every row exactly once
    dirs = sorted(d for d in os.listdir(root) if not d.startswith("_"))
    assert dirs == ["batch=-1"]
    assert not any(d.startswith("_retired") or d.startswith("_compacting")
                   for d in os.listdir(root))

    # aborted-write discard: an unmarked _compacting dir (crash during the
    # segment write) is settled away by the next compact() call
    os.makedirs(f"{root}/_compacting_9/junk_dir")
    mk(5, [(9, [9, 9], [])])
    rep = sh.compact_token_shards(spark, root, committed_batch_id=5, target_bytes=1 << 30)
    assert rep["batches_compacted"] == 2  # segment -1 + batch 5 fold
    assert not os.path.exists(f"{root}/_compacting_9")
    final = sorted(
        (r.pack_id, tuple(r.token_ids)) for r in spark.read.parquet(root).collect()
    )
    assert final == sorted(before + [(9, (9, 9))])
