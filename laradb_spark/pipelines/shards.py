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
