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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import pack_sequences
from .tokenizer import bpe_byte_encode_ids


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


def write_token_shards(
    df: DataFrame,
    merges: list[tuple[str, str]],
    path: str,
    context_len: int,
    text: str = "text",
) -> None:
    """Encode (byte-level BPE → integer ids), pack (concat in doc_id
    order, cut every ``context_len``), and write ``{path}`` as parquet:
    one row per pack — ``(pack_id, token_ids array<int>, doc_starts
    array<struct<pos,doc_id>>)``. Every pack is exactly ``context_len``
    tokens except the final partial one."""
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
    # left join yields NULL there. Store an EMPTY typed array instead so
    # the on-disk format is non-nullable and loaders need no null guard.
    dt = starts.schema["doc_starts"].dataType.simpleString()
    seqs.join(starts, on="pack_id", how="left").withColumn(
        "doc_starts",
        F.coalesce(F.col("doc_starts"), F.expr(f"CAST(array() AS {dt})")),
    ).write.mode("overwrite").parquet(path)
