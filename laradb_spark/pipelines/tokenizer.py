"""BPE-merge tokenizer application against a broadcast merge table.

Token budgets (``curation.token_apportionment``, ``pack_sequences``) and
mixture planning count tokens; until now they inherited the
``text.bpe_ish_token_count`` approximation. This module applies a REAL
byte-pair-encoding merge table (Sennrich et al. 2016 shape, no
end-of-word marker): start from the word's codepoints, then apply each
merge ``(a, b) -> ab`` in rank order, replacing all non-overlapping
occurrences left to right. Because a trained pair can only involve
symbols that existed before it during training, the single in-rank-order
sweep is exactly equivalent to the repeatedly-merge-the-lowest-rank-pair
formulation (the GPT-2 encoder loop) — ``tests/test_tokenizer.py`` pins
that equivalence property.

Two engine paths, bit-identical by construction:

* **expression path** (``bpe_token_count`` / ``bpe_encode``): each word's
  symbol sequence is a STRING ``\\x1f a \\x1f\\x1f b \\x1f ...`` — every
  symbol wrapped in a pair of US (unit-separator, 0x1f) chars, so a merge
  is one literal ``replace`` and symbol boundaries can never be crossed
  (no lookarounds needed, which keeps the very same chain replayable in
  DuckDB's RE2 dialect for the oracle). The merge chain is baked into the
  plan as literals: right for demo/oracle-sized tables (tens to hundreds
  of merges); the count path explodes words first so the whole chain runs
  under whole-stage codegen (the `_hashed_feature_stream` discipline —
  a `transform` lambda would run interpreted).
* **Arrow path** (``bpe_token_count_arrow``): real vocabularies carry
  ~50k merges — a 50k-deep literal expression chain is not a plan, it's a
  stack overflow. This twin broadcasts the rank dict and runs the
  rank-priority encoder per word with an LRU cache (word frequency is
  Zipfian: the cache turns corpus-scale encoding into vocab-scale work).
  Map-only; the shuffle is the same docs-sized count aggregate.

The US char 0x1f is RESERVED: both paths strip it from words on entry
(and the oracle mirrors), so a hostile byte can't forge a symbol
boundary.

Reference parity note: the reference engine has no sub-word tokenizer
(its tokenization surface is the WordCount ExtFun split,
`WordCountQuery.kt:33`); this extends the LLM-pipeline surface SURVEY.md
§2 prescribes beyond it.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import fan_out
from .text import tokens

BPE_SEP = "\x1f"

# Demo merge table: 40 merges trained offline with the classic BPE
# procedure (most-frequent adjacent pair, ties to the lexicographically
# smallest pair, no end-of-word marker) on the synthetic sf0.01
# documents corpus — deterministic and re-derivable from public test
# data; real deployments pass their own exported merge list instead.
DEMO_BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"),
]


def _wrap(a: str) -> str:
    return f"{BPE_SEP}{a}{BPE_SEP}"


def _word_symbols(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Wrapped symbol string for one word: strip the reserved US char,
    wrap every codepoint, then apply the merge chain in rank order."""
    sym = F.regexp_replace(
        F.regexp_replace(word, BPE_SEP, ""), "(?s)(.)", f"{BPE_SEP}$1{BPE_SEP}"
    )
    for a, b in merges:
        sym = F.replace(sym, F.lit(_wrap(a) + _wrap(b)), F.lit(_wrap(a + b)))
    return sym


def _symbol_count(sym: Column) -> Column:
    """Symbols in a wrapped string: split on the \\x1f\\x1f boundary; ''
    (a word that was nothing but reserved chars) has zero symbols."""
    return (
        F.when(sym == F.lit(""), F.lit(0))
        .otherwise(F.size(F.split(sym, BPE_SEP + BPE_SEP)))
        .cast("long")
    )


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text: str = "text",
) -> DataFrame:
    """Per-document BPE token count under a merge table:
    ``(doc_id, n_words, n_bpe_tokens)``; docs with no words are absent
    (like ``dsir_importance`` — the statistic is undefined, not zero).

    Scale shape: explode words (map-only — the merge chain is a plain
    projection under whole-stage codegen, NOT an interpreted transform
    lambda), then one docs-sized count aggregate with map-side combine.
    The corpus text never shuffles."""
    merges = DEMO_BPE_MERGES if merges is None else merges
    w = fan_out(df).select("doc_id", F.explode(tokens(F.col(text))).alias("_w"))
    cnt = _symbol_count(_word_symbols(F.col("_w"), merges))
    return (
        w.select("doc_id", cnt.alias("_c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("_c").alias("n_bpe_tokens"),
        )
    )


def bpe_tokens_per_source(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    source_col: str = "source",
    text: str = "text",
) -> DataFrame:
    """Per-source BPE token totals ``(source, n_docs, n_tokens)`` — the
    frame ``curation.apportion_token_counts`` apportions a budget over,
    replacing the whitespace approximation with real merge-table counts
    in mixture planning. ``n_docs`` counts EVERY doc of the source
    (token-less ones hold 0 tokens but exist); the counts come off the
    same codegen'd exploded-word chain as ``bpe_token_count``."""
    merges = DEMO_BPE_MERGES if merges is None else merges
    n_docs = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    w = fan_out(df).select(
        F.col(source_col), F.explode(tokens(F.col(text))).alias("_w")
    )
    n_toks = (
        w.select(source_col, _symbol_count(_word_symbols(F.col("_w"), merges)).alias("_c"))
        .groupBy(source_col)
        .agg(F.sum("_c").alias("n_tokens"))
    )
    return n_docs.join(n_toks, on=source_col, how="left").select(
        source_col,
        "n_docs",
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Per-document BPE token ARRAY (order-preserving): the words stay
    inside one `transform` lambda so token order needs no re-sort. The
    lambda runs interpreted — use ``bpe_token_count`` when only the
    statistic is needed (codegen path) and the Arrow twin for real
    vocabularies."""
    merges = DEMO_BPE_MERGES if merges is None else merges
    toks = F.flatten(
        F.transform(
            tokens(F.col(text)),
            lambda w: F.filter(
                F.transform(
                    F.split(_word_symbols(w, merges), BPE_SEP + BPE_SEP),
                    lambda p: F.replace(p, F.lit(BPE_SEP), F.lit("")),
                ),
                lambda s: s != F.lit(""),
            ),
        )
    )
    return df.select("doc_id", toks.alias(out_col))


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text: str = "text",
) -> list[tuple[str, str]]:
    """Distributed BPE TRAINING (the classic Sennrich procedure, no
    end-of-word marker): learn ``n_merges`` merges from the corpus —
    most-frequent adjacent symbol pair per round, ties broken to the
    lexicographically smallest pair, all deterministic.

    Scale shape (the pagerank-style driver loop): the corpus tokenizes
    ONCE into a persisted ``(word, count)`` VOCAB frame — distinct words,
    not occurrences; Zipf makes this vocabulary-sized however big the
    corpus is. Each round is then two small jobs over the vocab frame:
    one pair-count aggregate (explode adjacent pairs weighted by word
    count, map-side combine) and one deterministic argmax collected to
    the driver (2 values), after which the symbol arrays rewrite via one
    map-only ``transform`` and the new frame persists (old one
    unpersists — the Lloyd-loop discipline). n_merges sequential rounds
    is inherent to BPE (merge k+1's counts depend on merge k's rewrite).

    Rewrite semantics match ``_merge_once`` exactly (left-to-right
    non-overlapping), so the learned table replays bit-for-bit through
    every apply path; the pure-Python test trainer is the oracle."""
    from ..util import persist_once

    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = persist_once(
        fan_out(df)
        .select(F.explode(tokens(F.col(text))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            # codepoint-safe char split: the proven (?s)(.) trick from the
            # apply path (a lookaround split can land inside a surrogate
            # pair); empties filtered so a reserved-char-only word is []
            F.filter(
                F.split(
                    F.regexp_replace(
                        F.regexp_replace(F.col("_w"), BPE_SEP, ""),
                        "(?s)(.)",
                        "$1" + BPE_SEP,
                    ),
                    BPE_SEP,
                ),
                lambda s: s != F.lit(""),
            ).alias("syms"),
            "c",
        )
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                        F.slice(
                            F.col("syms"),
                            2,
                            F.greatest(F.size("syms") - 1, F.lit(0)),
                        ),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
                "c",
            )
            .groupBy("p")
            .agg(F.sum("c").alias("n"))
        )
        best = (
            pairs.orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b")).limit(1).collect()
        )
        if not best:
            break
        a, b = best[0]["p"]["a"], best[0]["p"]["b"]
        merges.append((a, b))
        merged = F.lit(a + b)
        old = vocab
        # left-to-right non-overlapping rewrite as an aggregate fold over
        # the symbol array: carry (out_array, skip_next) through the fold
        vocab = persist_once(
            old.select(
                F.aggregate(
                    F.zip_with(
                        F.col("syms"),
                        F.concat(F.slice(F.col("syms"), 2, F.size("syms")), F.array(F.lit(None).cast("string"))),
                        lambda x, y: F.struct(x.alias("x"), y.alias("y")),
                    ),
                    F.struct(
                        F.expr("CAST(array() AS array<string>)").alias("out"),
                        F.lit(False).alias("skip"),
                    ),
                    lambda acc, s: F.when(acc["skip"], F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")))
                    .when(
                        (s["x"] == F.lit(a)) & (s["y"].eqNullSafe(F.lit(b))),
                        F.struct(
                            F.concat(acc["out"], F.array(merged)).alias("out"),
                            F.lit(True).alias("skip"),
                        ),
                    )
                    .otherwise(
                        F.struct(
                            F.concat(acc["out"], F.array(s["x"])).alias("out"),
                            F.lit(False).alias("skip"),
                        )
                    ),
                    lambda acc: acc["out"],
                ).alias("syms"),
                "c",
            )
        )
        old.unpersist()
    vocab.unpersist()
    return merges


def bpe_save_merges(
    spark, merges: list[tuple[str, str]], path: str
) -> None:
    """Persist a merge table as the shareable artifact ``(rank, a, b)``
    — the tokenizer analogue of the stored ANN/BM25 index layouts: train
    once (offline or via the test-suite trainer), apply everywhere.
    Rank IS the file's authority on order; row order on disk is not."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    spark.createDataFrame(rows, "rank int, a string, b string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def bpe_load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Load a ``bpe_save_merges`` artifact back into rank order. The
    merge list is vocabulary-sized (tens of KB at 50k merges) — a
    bounded driver-side collect by construction."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.a, r.b) for r in rows]


def bpe_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: rank for rank, pair in enumerate(merges)}


def _merge_once(syms: list[str], a: str, b: str) -> list[str]:
    """All non-overlapping (a, b) occurrences left to right — the list
    twin of the wrapped-string literal replace."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_encode_str_sweep(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder: the in-rank-order sweep, the exact Python twin
    of the expression path's replace chain. O(len(merges)) per word —
    use for tests/oracles, not corpus encoding."""
    syms = list(word.replace(BPE_SEP, ""))
    for a, b in merges:
        if len(syms) < 2:
            break
        syms = _merge_once(syms, a, b)
    return syms


def bpe_encode_str(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Fast encoder: repeatedly merge the lowest-rank pair PRESENT (the
    GPT-2 encoder loop) — equivalent to the sweep because a trained pair
    only involves symbols that existed before it (property-tested)."""
    syms = list(word.replace(BPE_SEP, ""))
    while len(syms) >= 2:
        best, best_rank = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        syms = _merge_once(syms, *best)
    return syms


def bpe_token_count_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    text: str = "text",
) -> DataFrame:
    """Arrow twin of ``bpe_token_count`` for REAL merge tables (~50k
    rules, far past literal-expression-chain territory). Bit-identical
    output contract; per-word LRU cache (Zipfian corpora: encoding cost
    collapses to distinct-word cost per partition)."""
    import pandas as pd

    from .text import tokenize_str

    merges = DEMO_BPE_MERGES if merges is None else merges
    ranks = bpe_ranks(merges)

    def count(batches):
        # cache built executor-side (an lru_cache-decorated local can't
        # pickle into the Arrow worker); one cache per task is exactly the
        # partition-local reuse the Zipfian argument needs
        n_tokens = lru_cache(maxsize=1 << 20)(
            lambda word: len(bpe_encode_str(word, ranks))
        )
        for pdf in batches:
            if not len(pdf):
                continue
            doc_ids, n_words, n_toks = [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text]):
                words = tokenize_str(txt or "")
                if not words:
                    continue  # absent, like the expression path
                doc_ids.append(did)
                n_words.append(len(words))
                n_toks.append(sum(n_tokens(w) for w in words))
            yield pd.DataFrame(
                {"doc_id": doc_ids, "n_words": n_words, "n_bpe_tokens": n_toks}
            )

    return fan_out(df).select("doc_id", text).mapInPandas(
        count, "doc_id long, n_words long, n_bpe_tokens long"
    )
