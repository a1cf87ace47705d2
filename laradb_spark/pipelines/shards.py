"""Token-shard materialization: the END PRODUCT of a pretraining data
pipeline — the curated corpus encoded to integer token ids, concatenated
in deterministic document order, cut into fixed-length contexts, and
written as parquet shards a training loader reads directly.

Green-field relative to the reference (its surface stops at the Lara
algebra); composes the byte-level BPE encoder (``pipelines.tokenizer``)
with the two-phase parallel packing scan (``pipelines.curation``).

Scale shape
-----------
* offsets: ``pack_sequences`` — the two-phase ``global_exclusive_cumsum``
  (range partition → local window → #partitions-sized offset collect),
  bit-identical to a global window at any size, never a 1-task sort;
* token placement: one posexplode to (global_pos → pack_id, pos) — rows
  proportional to corpus TOKENS (inherent to materialization: every
  token must land in its context) with integral div/mod arithmetic
  (exact past 2^53);
* sequence assembly: groupBy(pack_id) with ``collect_list`` groups
  BOUNDED BY context_len by construction — no skew possible, parallelism
  = number of packs;
* boundary metadata rides as a per-pack ``doc_starts`` array (docs whose
  first token falls in the pack); a doc spanning whole packs is implied
  by the previous pack, as in standard packed-corpus formats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .curation import pack_sequences
from .tokenizer import bpe_byte_decode, bpe_byte_encode_ids


def pack_occupancy(
    df: DataFrame,
    context_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-pack occupancy report from per-doc token counts ALONE (no
    token materialization): ``(pack_id, n_tokens, n_docs_starting)``.
    The planner's view of a packing run — the final pack's fill ratio
    and the docs-per-context distribution drive context-length and
    shuffle-sharding choices before paying for the real write.

    Each doc explodes to the packs its span overlaps (rows ∝ tokens /
    context_len), then one aggregate; overlap arithmetic is integral."""
    packed = pack_sequences(df, context_len, n_tokens_col, id_col).filter(
        F.col(n_tokens_col) > 0
    )
    L = int(context_len)
    last = F.expr(f"(start_tok + {n_tokens_col} - 1) div {L}")
    per = packed.select(
        F.col("start_tok"),
        F.col(n_tokens_col).alias("_n"),
        F.explode(F.sequence(F.col("pack_id"), last)).alias("pack_id"),
    )
    lo = F.greatest(F.col("pack_id") * L, F.col("start_tok"))
    hi = F.least((F.col("pack_id") + 1) * L, F.col("start_tok") + F.col("_n"))
    return per.groupBy("pack_id").agg(
        F.sum(hi - lo).alias("n_tokens"),
        F.sum(
            F.when(F.col("start_tok") >= F.col("pack_id") * L, 1).otherwise(0)
        ).cast("long").alias("n_docs_starting"),
    )


def build_token_packs(
    df: DataFrame,
    merges: list[tuple[str, str]],
    context_len: int,
    text: str = "text",
) -> DataFrame:
    """The pack frame ``write_token_shards`` materializes, as a plan:
    encode (byte-level BPE → integer ids), pack (concat in doc_id order,
    cut every ``context_len``) — one row per pack, ``(pack_id, token_ids
    array<int>, doc_starts array<struct<pos,doc_id>>)``. Every pack is
    exactly ``context_len`` tokens except the final partial one;
    ``doc_starts`` is an EMPTY array (never NULL) for packs fully inside
    one document."""
    enc = bpe_byte_encode_ids(df, merges, text=text)
    counted = enc.select(
        "doc_id", F.size("token_ids").alias("n_tokens"), "token_ids"
    )
    packed = pack_sequences(counted, context_len)
    L = int(context_len)
    tokpos = (
        packed.filter(F.col("n_tokens") > 0)
        .select("start_tok", F.posexplode("token_ids").alias("_i", "_tid"))
        .select(
            (F.col("start_tok") + F.col("_i")).alias("_g"), F.col("_tid")
        )
        .select(
            F.expr(f"_g div {L}").alias("pack_id"),
            (F.col("_g") % L).cast("int").alias("_pos"),
            "_tid",
        )
    )
    seqs = tokpos.groupBy("pack_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_tid"))),
            lambda s: s["_tid"],
        ).alias("token_ids")
    )
    starts = (
        packed.filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            F.expr(f"start_tok div {L}").alias("pack_id"),
            (F.col("start_tok") % L).cast("int").alias("_pos"),
        )
        .groupBy("pack_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos").alias("pos"), "doc_id"))
            ).alias("doc_starts")
        )
    )
    # A pack fully inside one long document has no doc start at all — the
    # left join yields NULL there. Emit an EMPTY typed array instead so
    # the format is non-nullable and loaders need no null guard.
    dt = starts.schema["doc_starts"].dataType.simpleString()
    return seqs.join(starts, on="pack_id", how="left").withColumn(
        "doc_starts",
        F.coalesce(F.col("doc_starts"), F.expr(f"CAST(array() AS {dt})")),
    )


def write_token_shards(
    df: DataFrame,
    merges: list[tuple[str, str]],
    path: str,
    context_len: int,
    text: str = "text",
) -> None:
    """Materialize :func:`build_token_packs` as parquet at ``path`` — the
    training-loader artifact."""
    build_token_packs(df, merges, context_len, text=text).write.mode(
        "overwrite"
    ).parquet(path)


def reassemble_docs_from_packs(
    packs: DataFrame,
    merges: list[tuple[str, str]],
    context_len: int,
) -> DataFrame:
    """Invert a pack table back to ``(doc_id, text)`` — the shard-audit
    path certifying the training artifact is LOSSLESS: every document's
    token span is reassembled across pack boundaries purely from the
    stored ``(token_ids, doc_starts)`` metadata, then byte-BPE-decoded
    (lossless by the byte alphabet). ``md5(reassembled) == md5(source)``
    per doc is the end-to-end roundtrip proof (registry row
    ``shard_decode_roundtrip``).

    Shape: each pack row SELF-SPLITS into per-doc segments with one
    array transform (no token-level shuffle keyed by position): tokens
    at/after a doc start belong to that start; the pack's HEAD segment
    (before the first start — the whole pack when ``doc_starts`` is
    empty) belongs to the last doc started in an earlier pack, resolved
    by an ignorenulls ``last_value`` window over pack_id — rows ∝ PACKS,
    not tokens (a 100 TB audit would range-partition that fill exactly
    like the packing cumsum). Per-doc assembly sorts each doc's segments
    by global position and concatenates; groups are doc-sized, the same
    bound as the encoder that produced them."""
    L = int(context_len)
    starts_sorted = F.array_sort(F.col("doc_starts"))
    n_starts = F.size(starts_sorted)

    def seg(s: Column, i: Column) -> Column:
        nxt = F.try_element_at(starts_sorted, i + 2)
        end = F.when(nxt.isNull(), F.size("token_ids")).otherwise(nxt["pos"])
        return F.struct(
            s["doc_id"].alias("doc_id"),
            (F.col("pack_id") * L + s["pos"]).alias("gpos"),
            F.slice(F.col("token_ids"), s["pos"] + 1, end - s["pos"]).alias("ids"),
        )

    head_len = F.when(n_starts > 0, F.try_element_at(starts_sorted, F.lit(1))["pos"]).otherwise(
        F.size("token_ids")
    )
    with_segs = packs.select(
        "pack_id",
        F.transform(starts_sorted, seg).alias("_segs"),
        F.slice(F.col("token_ids"), 1, head_len).alias("_head"),
        F.when(n_starts > 0, F.try_element_at(starts_sorted, F.lit(-1))["doc_id"]).alias(
            "_last_started"
        ),
    )
    # owner of each pack's head segment: the last doc started strictly
    # before this pack (ignorenulls last_value over pack order; rows ∝ packs)
    w = (
        Window.orderBy("pack_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_owner = with_segs.withColumn(
        "_head_owner", F.last("_last_started", ignorenulls=True).over(w)
    )
    own_segs = with_owner.select(F.explode("_segs").alias("s")).select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.gpos").alias("gpos"),
        F.col("s.ids").alias("ids"),
    )
    head_segs = with_owner.filter(
        (F.size("_head") > 0) & F.col("_head_owner").isNotNull()
    ).select(
        F.col("_head_owner").alias("doc_id"),
        (F.col("pack_id") * L).alias("gpos"),
        F.col("_head").alias("ids"),
    )
    per_doc = (
        own_segs.unionByName(head_segs)
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gpos", "ids"))),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
    )
    return bpe_byte_decode(per_doc, merges)


def compact_token_shards(
    spark,
    shards_path: str,
    committed_batch_id: int,
    target_bytes: int = 128 << 20,
) -> dict:
    """Small-files maintenance for the streaming shard store — the 100 TB
    operational gap a per-micro-batch writer leaves behind: thousands of
    ``batch=<id>`` directories each holding a few small parquet files
    turn every training-loader listing and scan into a metadata storm.

    Merges every IMMUTABLE batch partition (``batch`` ≤
    ``committed_batch_id`` — the exactly-once contract in
    ``streaming.ingest.shard_ingest_stream`` guarantees a replay of a
    committed batch no-ops, so those directories can never be rewritten;
    batches beyond the committed id may still be overwritten by a
    crash-retry and are left untouched) into a single compacted segment
    written as the synthetic partition ``batch=<next negative id>`` —
    type-compatible with the hive partition column, never collides with
    a real (positive) batch id, and re-compaction folds previous
    compacted segments (also negative, also ≤ committed) into the next.

    Safety: the compacted segment is written and VERIFIED (row count +
    order-insensitive xxhash64 over every column) against the source
    partitions before any source directory is touched; on mismatch the
    new segment is deleted and the store is left exactly as found. The
    publish itself (r14) is crash-safe AND duplicate-safe: a
    ``_COMPACT_OK`` marker + ``_sources`` manifest land inside the
    verified segment, sources HIDE (rename to underscore-prefixed
    ``_retired_batch_<b>`` dirs, invisible to readers) BEFORE the segment
    goes live, and hidden copies are swept only after — so no crash point
    leaves a reader seeing a row twice (the old publish renamed the
    segment live FIRST, so a crash during source removal duplicated every
    not-yet-removed batch's packs permanently). Any crash is finished by
    :func:`finish_compact_token_shards`, which this function also runs
    first to settle a previous crash before computing eligibility.

    Returns a report dict: ``{batches_compacted, files_before,
    files_after, rows, segment}``. Local-filesystem directory removal
    uses ``shutil``; on a real cluster the same sequence maps 1:1 onto
    the Hadoop FileSystem rename/delete API."""
    import math
    import os
    import shutil

    from ..streaming.txn import writer_lock

    with writer_lock(shards_path, "compact_token_shards"):
        return _compact_token_shards_locked(
            spark, shards_path, committed_batch_id, target_bytes
        )


def _compact_token_shards_locked(
    spark, shards_path: str, committed_batch_id: int, target_bytes: int
) -> dict:
    import math
    import os
    import shutil

    # settle any crashed previous publish BEFORE computing eligibility —
    # otherwise hidden sources would be invisible to batch_dirs() and a
    # fresh compaction could reuse the pending segment id
    finish_compact_token_shards(shards_path)

    def batch_dirs() -> list[tuple[int, str]]:
        out = []
        for d in os.listdir(shards_path):
            if d.startswith("batch=") and os.path.isdir(os.path.join(shards_path, d)):
                try:
                    out.append((int(d.split("=", 1)[1]), os.path.join(shards_path, d)))
                except ValueError:
                    continue
        return out

    def pq_files(root: str) -> list[str]:
        return [
            os.path.join(dp, f)
            for dp, _dn, fns in os.walk(root)
            for f in fns
            if f.endswith(".parquet")
        ]

    # a committed batch that completed zero packs writes an empty dir —
    # unreadable as parquet, nothing to merge; leave it alone
    eligible = [
        (b, p) for b, p in batch_dirs()
        if b <= committed_batch_id and pq_files(p)
    ]
    if len(eligible) < 2:
        return {"batches_compacted": 0, "files_before": 0, "files_after": 0,
                "rows": 0, "segment": None}
    segment = min(min(b for b, _ in eligible), 0) - 1

    src_files = [f for _b, p in eligible for f in pq_files(p)]
    src = spark.read.parquet(*[p for _b, p in eligible])
    total_bytes = sum(os.path.getsize(f) for f in src_files)
    n_out = max(1, math.ceil(total_bytes / max(1, target_bytes)))

    def fingerprint(df):
        h = df.select(
            F.xxhash64(*[F.col(c) for c in sorted(df.columns)]).alias("_h")
        )
        row = h.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return row["n"], row["s"]

    want = fingerprint(src)
    out_dir = os.path.join(shards_path, f"batch={segment}")
    tmp_dir = os.path.join(shards_path, f"_compacting_{abs(segment)}")
    src.coalesce(n_out).write.mode("overwrite").parquet(tmp_dir)
    got = fingerprint(spark.read.parquet(tmp_dir))
    if got != want:  # pragma: no cover - defense against a writer bug
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise RuntimeError(
            f"compaction verification failed: source {want} != compacted {got}; "
            "store left untouched"
        )
    # crash-safe publish: manifest + marker ride INSIDE the verified
    # segment (underscore-prefixed files are invisible to parquet
    # readers, the _SUCCESS precedent), then the shared finisher hides
    # sources, renames the segment live, and sweeps — resumable from any
    # crash point via finish_compact_token_shards(shards_path)
    with open(os.path.join(tmp_dir, "_sources"), "w") as f:
        for b, _p in eligible:
            f.write(f"{b}\n")
    open(os.path.join(tmp_dir, "_COMPACT_OK"), "w").close()
    finish_compact_token_shards(shards_path)
    return {
        "batches_compacted": len(eligible),
        "files_before": len(src_files),
        "files_after": len(pq_files(out_dir)),
        "rows": int(want[0]),
        "segment": segment,
    }


def finish_compact_token_shards(shards_path: str) -> None:
    """Complete a crashed :func:`compact_token_shards` publish — and the
    publish the compactor itself runs (one definition). Idempotent;
    ``compact_token_shards`` also calls it up front so a crashed store
    settles before new work. Recovery contract:

    - a ``_compacting_<n>`` dir WITHOUT ``_COMPACT_OK``: an interrupted
      segment write — discarded (the marker lands before any source is
      hidden, so nothing else changed);
    - WITH the marker: hide each source batch listed in its ``_sources``
      manifest (rename ``batch=<b>`` → ``_retired_batch_<b>``; the
      underscore prefix hides it from readers), then rename the segment
      live as ``batch=-<n>``;
    - sweep ``_retired_batch_*`` dirs LAST — a retired dir exists only
      under a marked pending segment or an already-published one, so the
      sweep never removes the sole copy of a row.

    No crash point shows a reader a duplicated row (sources hide before
    the segment appears) or loses one (hidden copies survive until the
    segment is live). The transient all-hidden window is covered by the
    package-wide offline single-writer maintenance contract."""
    import os
    import shutil

    if not os.path.isdir(shards_path):
        return
    for d in sorted(os.listdir(shards_path)):
        full = os.path.join(shards_path, d)
        if not (d.startswith("_compacting_") and os.path.isdir(full)):
            continue
        if not os.path.exists(os.path.join(full, "_COMPACT_OK")):
            shutil.rmtree(full)  # aborted write: nothing was hidden yet
            continue
        with open(os.path.join(full, "_sources")) as f:
            src_batches = [line.strip() for line in f if line.strip()]
        for b in src_batches:
            live = os.path.join(shards_path, f"batch={b}")
            if os.path.isdir(live):
                retired = os.path.join(shards_path, f"_retired_batch_{b}")
                shutil.rmtree(retired, ignore_errors=True)
                os.rename(live, retired)
        out_dir = os.path.join(shards_path, f"batch=-{d[len('_compacting_'):]}")
        if os.path.isdir(out_dir):  # pragma: no cover - defense in depth
            raise RuntimeError(
                f"finish_compact_token_shards: live segment {out_dir} already "
                f"exists while pending {full} holds the marker — refusing to "
                "clobber; inspect the store"
            )
        os.rename(full, out_dir)
    for d in sorted(os.listdir(shards_path)):
        if d.startswith("_retired_batch_"):
            shutil.rmtree(os.path.join(shards_path, d), ignore_errors=True)
