"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting. Everything is built-in-expression based (JVM,
whole-stage codegen) — at 100 TB these run as map-only stages with zero
shuffle, so the only cost is the parquet scan + codegen throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..util import bind_once, fan_out, persist_once

# Single-space tokenization — chosen (over \s+) because it is exactly
# reproducible in every engine (DuckDB STRING_SPLIT) for oracle parity.
TOKEN_SEP = " "

PUNCT_RE = r"[.,!?;:]"
DIGIT_RE = r"[0-9]"

# Tiny per-language stopword lists for the n-gram/stopword-voting heuristic.
# Deliberately small and frozen: the lists are part of the operator contract
# (the oracle embeds the same constants).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "a", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "que", "pour", "dans"],
}
CJK_RE = r"[一-鿿]"


def tokens(text: Column) -> Column:
    """THE tokenizer contract: TOKEN_SEP split, empty strings dropped
    (oracle: ``list_filter(string_split(text, ' '), w -> w <> '')``)."""
    return F.filter(F.split(text, TOKEN_SEP), lambda w: w != F.lit(""))


def tokenize_str(s: str) -> list[str]:
    """Driver-side twin of ``tokens()`` — TOKEN_SEP split, empties
    dropped. Anything that pre-tokenizes query strings on the driver
    (BM25 probe terms, bucket pruning) MUST go through this, not a bare
    ``str.split()``: a diverging split silently desyncs probes from the
    stored postings. ``F.split`` reads TOKEN_SEP as a REGEX, so this twin
    must too (``re.split``, not ``str.split`` — a literal reading would
    desync the moment TOKEN_SEP becomes e.g. ``\\s+``); the residual risk
    is Java-vs-Python regex dialect, which the plain patterns used here
    share."""
    import re

    return [w for w in re.split(TOKEN_SEP, s) if w]


def token_count(text: Column) -> Column:
    """Whitespace token count (``tokens`` contract) as BIGINT."""
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word-boundary pieces plus one token per
    4 chars of long words — a cheap, deterministic stand-in when no merge
    table is at hand. For REAL merge-table counts use
    ``pipelines.tokenizer`` (``bpe_token_count`` / the Arrow twin /
    ``bpe_train``) — also JVM-side and oracle-reproducible."""
    words = tokens(text)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(F.lit(1), F.ceil(F.length(w) / 4)).cast("long"),
    )


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/punctuation/stopword/digit ratios — the standard cheap quality
    signals for pretraining-data filtering.

    The token array is staged in its own projection so it's computed once,
    not once per derived column (HOFs don't get codegen subexpr elimination)."""
    staged = df.select("doc_id", F.col(text).alias("_t"), tokens(F.col(text)).alias("_toks"))
    t = F.col("_t")
    toks = F.col("_toks")
    n_tok = F.size(toks).cast("long")
    stop_hits = F.size(F.filter(toks, lambda w: F.lower(w).isin(STOPWORDS["en"])))
    return staged.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(F.length(F.concat_ws("", toks)) / F.greatest(n_tok, F.lit(1)), 4).alias(
            "avg_token_len"
        ),
        F.round(
            F.size(F.regexp_extract_all(t, F.lit(PUNCT_RE), 0))
            / F.greatest(F.length(t), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.size(F.regexp_extract_all(t, F.lit(DIGIT_RE), 0))
            / F.greatest(F.length(t), F.lit(1)),
            6,
        ).alias("digit_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: penalize too-short docs, low stopword
    density, high punctuation/digit noise."""
    q = quality_features(df, text)
    score = (
        F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.1
        + (1 - F.least(F.col("digit_ratio") * 10.0, F.lit(1.0))) * 0.1
    )
    return q.select("doc_id", F.round(score, 4).alias("quality"))


def lang_id(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-voting language ID with a CJK character override.
    Deterministic argmax with fixed tie-break order en>es>de>fr; no hits →
    'und'. (A real system uses fastText/CLD3 — not in this container; the
    voting scheme is the classic n-gram heuristic and is fully
    oracle-reproducible.)"""
    t = F.col(text)
    toks = F.transform(tokens(t), lambda w: F.lower(w))
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(words)))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = (
        F.when(F.size(F.regexp_extract_all(t, F.lit(CJK_RE), 0)) > 0, F.lit("zh"))
        .when(best <= 0, F.lit("und"))
        .when(scores["en"] == best, F.lit("en"))
        .when(scores["es"] == best, F.lit("es"))
        .when(scores["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.select("doc_id", pred.alias("pred_lang"))


def normalize_text(df: DataFrame, text: str = "text") -> DataFrame:
    """Web-text normalization, the first map stage of a scrape-ingest
    pipeline: strip HTML-ish tags, collapse whitespace runs, trim,
    lowercase. Pure JVM regex expressions — map-only, zero shuffle, and
    byte-reproducible across engines (no locale-dependent casefolding is
    used on the data's ASCII+Latin-1 range).

    Returns (doc_id, norm_text, n_chars_raw, n_chars_norm)."""
    raw = F.col(text)
    stripped = F.regexp_replace(raw, r"<[^>]*>", " ")
    collapsed = F.regexp_replace(stripped, r"\s+", " ")
    norm = F.lower(F.trim(collapsed))
    return df.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(raw).cast("long").alias("n_chars_raw"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def fingerprint(df: DataFrame, text: str = "text", ngram: int = 5) -> DataFrame:
    """Document fingerprint: minimum md5 over word n-gram shingles (a
    winnowing-style rolling fingerprint; md5 is the cross-engine-stable
    hash). Docs shorter than one shingle fingerprint the whole text."""
    return df.select(
        "doc_id",
        F.array_min(
            F.transform(_all_ngrams(F.col(text), ngram), lambda s: F.md5(s))
        ).alias("fingerprint"),
    )


def _all_ngrams(text_col: Column, n: int) -> Column:
    """Every word n-gram occurrence (NOT distinct; short docs floor to one
    whole-text gram, mirroring word_ngrams/oracle GREATEST semantics).
    Token array bound once (util.bind_once): the window lambda references
    it per gram, and an inline ``tokens()`` there re-splits the whole
    document per gram — O(tokens²)."""

    def build(toks: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))

    return bind_once(tokens(text_col), build)


def frequent_ngrams(df: DataFrame, n: int = 2, k: int = 20, text: str = "text") -> DataFrame:
    """Corpus-wide top-``k`` most frequent word n-grams — the heavy-hitter
    scan behind boilerplate detection. Total order (count desc, gram asc)
    makes the cut deterministic. Scale shape: explode → one partial+final
    count aggregate → ``orderBy().limit(k)``, which Spark executes as
    TakeOrderedAndProject (per-partition top-k, merge on the driver — no
    global sort shuffle). The n-gram explode is the heavy map — fan the
    scan out to core count first (no-op at ≥cores splits, util.fan_out)."""
    g = fan_out(df).select(F.explode(_all_ngrams(F.col(text), n)).alias("ng"))
    return (
        g.groupBy("ng")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("ng"))
        .limit(k)
    )


def _mg_update(counts: dict, batch_counts, cap: int) -> int:
    """Fold one batch's token value-counts into a Misra–Gries summary
    IN PLACE, compacting to ≤ ``cap`` entries; returns the decrement
    applied (0 when no compaction was needed). Batched MG: subtract the
    (cap+1)-th largest count from every entry and drop the non-positive
    — every surviving estimate underestimates its true count by at most
    the cumulative decrement returned across calls (Misra & Gries 1982).
    Module-level and pure so the invariant is unit-testable without a
    cluster."""
    import numpy as np

    for t, c in batch_counts.items():
        counts[t] = counts.get(t, 0) + int(c)
    if len(counts) <= cap:
        return 0
    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    d = int(np.partition(vals, -(cap + 1))[-(cap + 1)])
    for t in [t for t, c in counts.items() if c <= d]:
        del counts[t]
    for t in counts:
        counts[t] -= d
    return d


def heavy_hitter_tokens(
    df: DataFrame,
    min_ppm: int = 20_000,
    text: str = "text",
    counters: int | None = None,
) -> DataFrame:
    """Corpus-wide frequent tokens — every token whose occurrence
    frequency is ≥ ``min_ppm`` of all token occurrences — via the
    classic two-pass sketch-then-verify plan:
    ``(token, n_occurrences, freq_ppm)``.

    Pass 1 runs a per-partition Misra–Gries summary (``counters``
    entries, default ``max(64, ceil(4·10⁶ / min_ppm))``) over the token
    stream. Merged MG estimates NEVER overestimate and underestimate by
    at most E = Σ_p (partition decrement totals) ≤ N/(counters+1), so
    filtering candidates at ``est ≥ θN − E`` (θ = min_ppm/10⁶) has NO
    false negatives. Pass 2 exact-counts ONLY the candidates (broadcast
    semi-join against the token stream) and applies the exact integer
    threshold ``10⁶·count ≥ min_ppm·N``. The output row set is
    therefore EXACTLY the true heavy hitters — deterministic and
    independent of partition layout; the sketch only gates work, never
    truth, which is what makes a sketch operator SQL-oracle-able (a
    broken sketch drops candidates and the hash catches it).

    Scale shape: this is how you find frequent tokens WITHOUT the
    vocabulary-sized shuffle ``frequent_ngrams`` pays — pass 1 shuffles
    ≤ counters·partitions sketch rows (map-side bounded memory), pass 2
    shuffles only candidate tokens (≤ ~1/θ of them exist). The corpus
    is scanned exactly twice and deliberately NOT persisted (at 100 TB a
    cache would evict; two streaming scans beat one materialization) —
    but the SKETCH OUTPUT (bounded: ≤ counters·partitions + sentinel
    rows) IS persisted, because both the totals broadcast and the
    candidate broadcast hang off it and Spark would otherwise recompute
    the whole scan+explode+sketch subtree once per broadcast (measured
    at sf0.1: three corpus passes instead of two, ~1.5× the steady-state
    time). The per-partition token count and decrement total ride pass 1
    as sentinel rows (tok NULL), so no extra scan computes N."""
    if min_ppm <= 0:
        raise ValueError("min_ppm must be > 0")
    cap = counters if counters is not None else max(64, -(-4_000_000 // min_ppm))
    # the no-false-negative guarantee needs E ≤ N/(cap+1) < θN, i.e.
    # cap ≥ 1/θ — refuse a cap that silently voids the contract
    if cap < -(-1_000_000 // min_ppm):
        raise ValueError(
            f"counters={cap} voids the no-false-negative bound for "
            f"min_ppm={min_ppm}; need ≥ ceil(1e6/min_ppm)"
        )

    toks = fan_out(df).select(F.explode(tokens(F.col(text))).alias("tok"))

    def sketch(batches):
        import pandas as pd

        counts: dict = {}
        dec = 0
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            n += len(pdf)
            dec += _mg_update(counts, pdf["tok"].value_counts().to_dict(), cap)
        yield pd.DataFrame(
            {
                "tok": list(counts.keys()) + [None],
                "est": list(counts.values()) + [dec],
                "np": [0] * len(counts) + [n],
            }
        )

    sk = persist_once(toks.mapInPandas(sketch, "tok string, est long, np long"))
    totals = sk.filter(F.col("tok").isNull()).agg(
        F.coalesce(F.sum("est"), F.lit(0)).alias("E"),
        F.coalesce(F.sum("np"), F.lit(0)).alias("N"),
    )
    cands = (
        sk.filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("est").alias("_est"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.expr(
                f"CAST(1000000 AS DECIMAL(38,0)) * _est"
                f" >= CAST({min_ppm} AS DECIMAL(38,0)) * N"
                f" - CAST(1000000 AS DECIMAL(38,0)) * E"
            )
        )
        .select("tok")
    )
    return (
        toks.join(F.broadcast(cands), on="tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(totals))
        .filter(
            F.expr(
                f"CAST(1000000 AS DECIMAL(38,0)) * n_occurrences"
                f" >= CAST({min_ppm} AS DECIMAL(38,0)) * N"
            )
        )
        .select(
            F.col("tok").alias("token"),
            "n_occurrences",
            F.expr("(CAST(1000000 AS DECIMAL(38,0)) * n_occurrences) div N").alias(
                "freq_ppm"
            ),
        )
    )


def boilerplate_ppm(
    df: DataFrame, n: int = 2, top_k: int = 20, text: str = "text"
) -> DataFrame:
    """Per-document boilerplate contamination: the ppm of a doc's n-gram
    occurrences that fall in the corpus-wide top-``top_k`` n-gram set
    (CCNet-style corpus-level boilerplate signal — complements
    ``repetition_stats``, which is within-doc). Integer ppm via integral
    div (gotcha #4b). The top set is tiny → broadcast left-semi-ish join;
    the corpus grams never shuffle."""
    top = frequent_ngrams(df, n, top_k, text).select("ng")
    g = fan_out(df).select("doc_id", F.explode(_all_ngrams(F.col(text), n)).alias("ng"))
    total = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("_tot"))
    hits = (
        g.join(F.broadcast(top), on="ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_hit"))
    )
    return (
        total.join(hits, on="doc_id", how="left")
        .select(
            "doc_id",
            F.expr("(1000000 * coalesce(_hit, 0)) div _tot").alias("boilerplate_ppm"),
        )
    )


def tfidf_top_terms(
    df: DataFrame, k: int = 5, text: str = "text", group: str = "source"
) -> DataFrame:
    """Top-``k`` characteristic terms per ``group`` by an integer-exact
    tf-idf: score = tf(term, group) · ((10^6 · N_docs) div df(term)) — all
    BIGINT arithmetic, so ranking is bit-identical across engines (a
    float ln() idf would tie-flake, DEVNOTES gotcha #4). Ties break on
    term asc. Two aggregates (per-group tf, per-term df) + one broadcast
    join of the tiny df table; ranking via the two-phase ``grouped_rank``
    — the scored frame is vocabulary-sized, but sources can be few, and a
    per-source window would sort each source's whole vocabulary in one
    task."""
    from ..operators.ranking import grouped_rank

    toks = fan_out(df).select(
        "doc_id", F.col(group).alias("grp"), F.explode(tokens(F.col(text))).alias("term")
    )
    tf = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("_df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "grp", "term",
            F.expr("tf * ((1000000 * _n) div _df)").alias("score"),
        )
    )
    ranked = grouped_rank(scored, ["grp"], [F.desc("score"), F.asc("term")])
    return (
        ranked.filter(F.col("_r") <= k)
        .select(
            F.col("grp").alias(group), "term", "score",
            F.col("_r").cast("int").alias("rank"),
        )
    )


# Gopher rule thresholds (Rae et al. 2021 §A2, adapted to integer-exact
# milli/ppm arithmetic so the flags hash-match a SQL oracle). Line-based
# rules (bullet-start / ellipsis-end fractions) are omitted: they need a
# line structure this engine treats as a tokenizer concern.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN_MILLI = 3_000
GOPHER_MAX_MEAN_WORD_LEN_MILLI = 10_000
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MIN_ALPHA_WORD_PPM = 800_000
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style document quality rules as per-doc boolean flags plus
    the combined ``pass_gopher`` — the classic pretraining prefilter
    (word-count bounds, mean-word-length bounds, ≥2 stopword hits, ≥80%
    words containing an alphabetic character). All arithmetic is integer
    (mean word length in milli-chars via integral division, alpha
    fraction in ppm), so the flags are bit-identical across engines —
    a float mean at exactly 3.0 chars would tie-flake the bound.

    One narrow projection per doc — no shuffle, no join; the flags
    compute inside the scan's map stage at any corpus size."""
    toks = tokens(F.col(text))
    n = F.size(toks).cast("long")
    chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w).cast("long")
    )
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
    ).cast("long")
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))).cast("long")
    out = df.select(
        "doc_id",
        n.alias("word_count"),
        chars.alias("_chars"),
        stop_hits.alias("stopword_hits"),
        alpha_words.alias("_alpha"),
    )
    out = out.select(
        "doc_id",
        "word_count",
        F.when(F.col("word_count") > 0, F.expr("(1000 * _chars) div word_count"))
        .otherwise(F.lit(None))
        .alias("mean_word_len_milli"),
        "stopword_hits",
        F.when(F.col("word_count") > 0, F.expr("(1000000 * _alpha) div word_count"))
        .otherwise(F.lit(None))
        .alias("alpha_word_ppm"),
    )
    f_words = F.col("word_count").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    f_len = F.coalesce(
        F.col("mean_word_len_milli").between(
            GOPHER_MIN_MEAN_WORD_LEN_MILLI, GOPHER_MAX_MEAN_WORD_LEN_MILLI
        ),
        F.lit(False),
    )
    f_stop = F.col("stopword_hits") >= GOPHER_MIN_STOPWORD_HITS
    f_alpha = F.coalesce(
        F.col("alpha_word_ppm") >= GOPHER_MIN_ALPHA_WORD_PPM, F.lit(False)
    )
    return out.select(
        "doc_id", "word_count", "mean_word_len_milli", "stopword_hits",
        "alpha_word_ppm",
        f_words.alias("ok_word_count"),
        f_len.alias("ok_mean_word_len"),
        f_stop.alias("ok_stopwords"),
        f_alpha.alias("ok_alpha_words"),
        (f_words & f_len & f_stop & f_alpha).alias("pass_gopher"),
    )


# ppm ratio of two corpus-wide counts with a DECIMAL(38,0) numerator:
# 1000000 * cb overflows int64 once a single bigram crosses ~9.2e12
# occurrences (ANSI Spark throws). IntegralDivide returns BIGINT and the
# quotient is <= 1e6, so only the numerator needs the wide type. The
# DuckDB oracle mirrors with HUGEINT. Exercised at the cliff by
# tests/test_text.py::test_bigram_ppm_expr_survives_int64_cliff.
BIGRAM_PPM_EXPR = "(CAST(1000000 AS DECIMAL(38,0)) * cb) div cw"


def bigram_arrays(toks: Column) -> tuple[Column, Column]:
    """(heads, tails) slices whose zip is the token array's adjacent
    bigram stream — ONE definition for every bigram consumer (the LM
    score, the DSIR feature stream) so the pairing cannot drift."""
    heads = F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0)))
    tails = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    return heads, tails


def bigram_lm_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Corpus-trained count-ratio bigram language-model score per doc —
    the CCNet/KenLM perplexity-filter SHAPE with integer-exact
    arithmetic: for each adjacent word pair, p̂(w₂|w₁) ≈ c(w₁w₂)/c(w₁·)
    expressed in ppm via integral division (no float log, so the score
    hash-matches a SQL oracle bit-for-bit); a doc's score is the
    n-weighted integral mean over its bigram occurrences. High score =
    the doc's word transitions are typical of the corpus; boilerplate
    scores high, keyboard mash scores low — filter on either tail.

    Scale shape: ONE pass over the bigram stream aggregates per-(doc,
    bigram) counts (map-side combine); corpus bigram counts c(w₁w₂) and
    context counts c(w₁·) both DERIVE from that frame (same one-pass
    discipline as bm25_scores), which is also the only persist. The
    scoring joins shuffle on bigram/context keys — vocabulary-sized,
    never corpus-sized. Docs with < 2 tokens have no bigrams and are
    absent from the output (score undefined).

    Overflow bound: the ppm numerator ``1000000 · c(w₁w₂)`` uses a
    DECIMAL(38,0) intermediate (the oracle mirrors with HUGEINT) because
    the corpus-WIDE bigram count crosses int64 at ~9.2e12 occurrences —
    plausible at 100 TB. The quotient is ≤ 10⁶ so the ``div`` result
    (BIGINT — Spark's IntegralDivide is LongType even on decimals) and
    the per-DOC mean ``Σ n·ppm ≤ 10⁶·doc_len`` stay int64-safe."""
    def bg_of(toks: Column) -> Column:
        # token array bound once (util.bind_once) — heads and tails each
        # evaluate their input, so an inline tokens() splits twice per row
        heads, tails = bigram_arrays(toks)
        return F.zip_with(
            heads, tails, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        )

    bg = fan_out(df).select(
        "doc_id",
        F.explode(bind_once(tokens(F.col(text)), bg_of)).alias("_bg"),
    ).select("doc_id", "_bg.w1", "_bg.w2")
    doc_bg = persist_once(
        bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    )
    # cb persisted (vocabulary-sized, bounded): cw re-aggregated it from
    # the doc_bg cache otherwise — same fix as kn_bigram_score (r16).
    cb = persist_once(doc_bg.groupBy("w1", "w2").agg(F.sum("n").alias("cb")))
    cw = cb.groupBy("w1").agg(F.sum("cb").alias("cw"))
    scored = (
        doc_bg.join(cb, on=["w1", "w2"])
        .join(cw, on="w1")
        .select("doc_id", "n", F.expr(BIGRAM_PPM_EXPR).alias("_ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.expr("sum(n * _ppm) div sum(n)").alias("lm_score_ppm"),
        F.sum("n").alias("n_bigrams"),
    )


KN_D_MILLI = 750  # the standard absolute-discount D = 0.75, in milli units

# Interpolated Kneser-Ney bigram probability in ppm over the joined stat
# columns (c12, cw, npost, npre, ntypes) — ONE definition shared by the
# seen-head, unseen-bigram, and unseen-head limbs; the DuckDB oracle
# replays the same floor-div chain. DECIMAL(38,0) on the discount
# numerator: 10⁶·10³·c12 crosses int64 at c12 ≈ 9.2e9 — plausible for a
# stopword bigram at 100 TB (same overflow discipline as BIGRAM_PPM_EXPR).
KN_PPM_EXPR = f"""
CASE WHEN cw > 0 THEN
  (CASE WHEN 1000 * c12 > {KN_D_MILLI}
        THEN (CAST(1000000 AS DECIMAL(38,0)) * (1000 * c12 - {KN_D_MILLI}))
             div (1000 * cw)
        ELSE 0 END)
  + (((1000 * {KN_D_MILLI} * npost) div cw)
     * (CASE WHEN ntypes > 0 THEN (1000000 * npre) div ntypes ELSE 0 END))
    div 1000000
ELSE
  CASE WHEN ntypes > 0 THEN (1000000 * npre) div ntypes ELSE 0 END
END
"""


def kn_bigram_score(
    df: DataFrame, train_where: "str | None" = None, text: str = "text"
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM score per document — the honest
    in-engine analogue of CCNet's KenLM perplexity filter (Wenzek et al.
    2020 train a smoothed LM on TARGET-domain text and score the whole
    crawl; :func:`bigram_lm_score`'s raw count-ratio can't do that — an
    unseen bigram scores 0/NULL, so cross-domain scoring collapses for
    any doc with novel transitions). KN smoothing (Kneser & Ney 1995;
    Chen & Goodman 1999 §2.7) fixes exactly that with discounted mass
    re-spent on the CONTINUATION distribution:

      P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
                 + D·N₁₊(w₁,·)/c(w₁·) · P_cont(w₂)
      P_cont(w₂) = N₁₊(·,w₂) / |distinct bigram types|

    with D = 0.75 and full backoff to P_cont for an unseen head — the
    standard interpolated form. All arithmetic is integral ppm with
    floor division (``KN_PPM_EXPR``), so scores are BIGINTs that
    hash-match a SQL oracle; the quantization floor (p < 1 ppm rounds to
    0) only matters for vocabularies past 10⁶ continuation types, where
    a real pipeline is at KenLM scale anyway.

    ``train_where`` (a SQL boolean over ``df``'s columns, e.g.
    ``"source = 'wiki'"``) selects the TRAINING slice; every document is
    scored. ``None`` trains on the full input (self-scoring, like
    ``bigram_lm_score``). Returns ``(doc_id, kn_score_ppm, n_bigrams,
    oov_bigram_ppm)`` — the OOV share (bigrams unseen in training) is
    the complementary novelty signal CCNet buckets on.

    Scale shape: ONE pass over the bigram stream aggregates per-(doc,
    bigram) counts with the train flag carried (map-side combine; the
    only persist); every training statistic — c(w₁w₂), c(w₁·),
    N₁₊(w₁,·), N₁₊(·,w₂), the 1-row type count — DERIVES from that
    frame (the bm25_scores one-pass discipline). Scoring joins shuffle
    on vocabulary-sized keys, never corpus-sized; the type count
    broadcasts."""
    def bg_of(toks: Column) -> Column:
        heads, tails = bigram_arrays(toks)
        return F.zip_with(
            heads, tails, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        )

    flag = F.expr(train_where) if train_where is not None else F.lit(True)
    bg = fan_out(df).select(
        "doc_id",
        flag.alias("_train"),
        F.explode(bind_once(tokens(F.col(text)), bg_of)).alias("_bg"),
    ).select("doc_id", "_train", "_bg.w1", "_bg.w2")
    doc_bg = persist_once(
        bg.groupBy("doc_id", "_train", "w1", "w2").agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    train_bg = doc_bg.filter("_train")
    # cb persists too (vocabulary-sized, bounded at any corpus scale —
    # the doc_bg discipline one derivation up): heads, pre AND the type
    # count each re-aggregated cb from the doc_bg cache otherwise — the
    # r16 plan showed cb's Exchange + HashAggregate pair FOUR times in
    # one query (guide §2.4: two ops keyed the same way share one
    # exchange; here four consumers share one cached aggregate).
    cb = persist_once(train_bg.groupBy("w1", "w2").agg(F.sum("n").alias("c12")))
    heads = cb.groupBy("w1").agg(
        F.sum("c12").alias("cw"), F.count(F.lit(1)).alias("npost")
    )
    pre = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("npre"))
    types = cb.agg(F.count(F.lit(1)).alias("ntypes"))
    joined = (
        doc_bg.join(cb, on=["w1", "w2"], how="left")
        .join(heads, on="w1", how="left")
        .join(pre, on="w2", how="left")
        .crossJoin(F.broadcast(types))
        .select(
            "doc_id",
            "n",
            # coalesce the left-join misses to 0 ONCE, under the names
            # KN_PPM_EXPR reads — the expression applies verbatim (and
            # identically in the oracle's CTE)
            F.coalesce("c12", F.lit(0)).alias("c12"),
            F.coalesce("cw", F.lit(0)).alias("cw"),
            F.coalesce("npost", F.lit(0)).alias("npost"),
            F.coalesce("npre", F.lit(0)).alias("npre"),
            "ntypes",
        )
    )
    scored = joined.select(
        "doc_id", "n", F.col("c12").alias("_c12_raw"), F.expr(KN_PPM_EXPR).alias("_ppm")
    )
    return scored.groupBy("doc_id").agg(
        F.expr("sum(n * _ppm) div sum(n)").alias("kn_score_ppm"),
        F.sum("n").alias("n_bigrams"),
        F.expr(
            "(1000000 * sum(CASE WHEN _c12_raw = 0 THEN n ELSE 0 END)) div sum(n)"
        ).alias("oov_bigram_ppm"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text: str = "text",
) -> DataFrame:
    """Split each document into overlapping token windows — the chunking
    step of a RAG / long-context training pipeline. Chunk i covers tokens
    [i·stride, i·stride + chunk_tokens) with stride = chunk_tokens −
    overlap; the last chunk may be short; an empty doc yields one empty
    chunk (explicit, not dropped). Map-only JVM expressions: the token
    array is staged once, windows are slice/concat — zero shuffle at any
    corpus size. Returns (doc_id, chunk_idx, chunk_text, n_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    staged = df.select("doc_id", tokens(F.col(text)).alias("_toks"))
    n = F.size(F.col("_toks"))
    # number of chunks = 1 + ceil(max(n - chunk, 0) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(F.col("_toks"), i * stride + 1, chunk_tokens).alias("_w"),
        ),
    )
    ex = staged.select("doc_id", F.explode(chunks).alias("c"))
    return ex.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.concat_ws(" ", F.col("c._w")).alias("chunk_text"),
        F.size(F.col("c._w")).cast("long").alias("n_tokens"),
    )


def repetition_stats(df: DataFrame, text: str = "text", n: int = 2) -> DataFrame:
    """Within-document repetition signals (the Gopher-style quality
    filters): the fraction of all word n-grams taken by the single most
    frequent n-gram, and the fraction of n-gram occurrences that are
    duplicates. High values flag boilerplate/degenerate text.

    Shape: explode (doc_id, n-gram) → one groupBy — the only shuffled
    payload is the n-grams of one document per group, never full text.
    Ratios are integer parts-per-million (integral div — a rounded
    double would flake on power-of-two denominators, gotcha #4b)."""
    g = df.select("doc_id", F.explode(_all_ngrams(F.col(text), n)).alias("_g"))
    per = g.groupBy("doc_id", "_g").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("doc_id").agg(
        F.expr("(1000000 * max(c)) div sum(c)").alias("top_ngram_ppm"),
        F.expr("(1000000 * (sum(c) - count(*))) div sum(c)").alias("dup_ngram_ppm"),
    )


def gopher_funnel(df: DataFrame, text: str = "text") -> DataFrame:
    """Sequential filter-funnel report over the Gopher rules — the
    curation debugging view ("which filter kills how much?"): docs are
    charged to the FIRST rule they fail, in the documented order
    (word_count → mean_word_len → stopwords → alpha_words), so
    ``n_killed`` sums to total − survivors and each stage's ``n_in`` is
    the previous stage's ``n_out``.

    One pass: the per-doc flags reduce to five conditional counts in a
    single aggregate; the 4-row report materializes from that one row
    with ``stack`` — no second scan, no shuffle beyond the final
    1-row aggregate (bounded by construction)."""
    flags = gopher_quality_flags(df, text)
    ok1, ok2 = F.col("ok_word_count"), F.col("ok_mean_word_len")
    ok3, ok4 = F.col("ok_stopwords"), F.col("ok_alpha_words")
    one = F.lit(1)
    c = flags.agg(
        F.count(one).alias("n"),
        F.sum(F.when(~ok1, one).otherwise(0)).alias("k1"),
        F.sum(F.when(ok1 & ~ok2, one).otherwise(0)).alias("k2"),
        F.sum(F.when(ok1 & ok2 & ~ok3, one).otherwise(0)).alias("k3"),
        F.sum(F.when(ok1 & ok2 & ok3 & ~ok4, one).otherwise(0)).alias("k4"),
    )
    return c.selectExpr(
        """stack(4,
             1, 'word_count',    n,                k1,
             2, 'mean_word_len', n - k1,           k2,
             3, 'stopwords',     n - k1 - k2,      k3,
             4, 'alpha_words',   n - k1 - k2 - k3, k4
           ) AS (stage, filter_name, n_in, n_killed)"""
    ).select(
        F.col("stage").cast("int").alias("stage"),
        "filter_name",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_killed").cast("long").alias("n_killed"),
        (F.col("n_in") - F.col("n_killed")).cast("long").alias("n_out"),
    )


def ngram_diversity(
    df: DataFrame, n: int = 2, text: str = "text", source_col: str = "source"
) -> DataFrame:
    """Distinct-n diversity per source (Li et al. 2016's "distinct-n"
    at corpus granularity): distinct word n-grams ÷ total n-gram
    occurrences, in ppm — low values flag templated/boilerplate-heavy
    sources before they flatten a training mix. Occurrences use the
    ``_all_ngrams`` floor (a short doc contributes its whole text once),
    so every doc counts.

    One pass: explode the n-gram stream, one aggregate per source with
    ``count`` + ``count_distinct`` (Spark expands the distinct aggregate
    to a two-stage plan with map-side partial distinct — never a
    per-source collect). Integer ppm via integral division."""
    # NULL text folds to '' BEFORE the gram stream so a NULL-text doc
    # contributes the same single '' gram on every engine (the oracle
    # mirrors with COALESCE; without it DuckDB's array_to_string yields a
    # NULL gram that COUNT(DISTINCT) drops while Spark's concat_ws '' gram
    # is counted — diverging diversity_ppm on NULL-bearing corpora).
    g = fan_out(df).select(
        F.col(source_col),
        F.explode(_all_ngrams(F.coalesce(F.col(text), F.lit("")), n)).alias("_g"),
    )
    return (
        g.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count_distinct("_g").alias("distinct_ngrams"),
        )
        .select(
            source_col,
            "total_ngrams",
            "distinct_ngrams",
            F.expr("(1000000 * distinct_ngrams) div total_ngrams").alias(
                "diversity_ppm"
            ),
        )
    )


def lm_quality_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text: str = "text",
    group: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style head/middle/tail split (Wenzek et al. 2020): bucket
    each document WITHIN its ``group`` (language, per the CCNet recipe)
    by corpus LM score — there KenLM perplexity, here the integer-exact
    count-ratio LM from :func:`bigram_lm_score` so the cut is
    hash-checkable cross-engine. Rank per group by (lm_score_ppm DESC,
    id ASC) — head = most corpus-typical — and assign
    ``bucket = ((rank−1)·n_buckets) div group_size + 1``: the rank-range
    n-tile (NTILE-like; bucket sizes differ by ≤ 1, and the formula is
    the contract on BOTH engines — NTILE's extra-row placement differs
    subtly, so neither side uses it). Returns (id, group, lm_score_ppm,
    bucket). Docs with < 2 tokens have no bigrams, hence no LM score,
    and are absent — CCNet likewise drops what its LM cannot score.

    Scale shape: bigram_lm_score's vocabulary-sized shuffles, then
    ``grouped_rank``'s two-phase ranking — a plain per-group window
    would sort each language's ENTIRE frame in one task (a language at
    100 TB is billions of docs; group count ≈ 5 is the worst possible
    window parallelism). Group sizes ride along from grouped_rank's
    offset table — no second count pass."""
    from ..operators.ranking import grouped_rank

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    scored = bigram_lm_score(df, text)
    g = df.select(id_col, F.col(group).alias("grp")).join(scored, on=id_col)
    ranked = grouped_rank(g, ["grp"], [F.desc("lm_score_ppm"), F.asc(id_col)])
    return ranked.select(
        id_col,
        F.col("grp").alias(group),
        "lm_score_ppm",
        F.expr(f"cast(((_r - 1) * {int(n_buckets)}) div _n + 1 as int)").alias("bucket"),
    )


def kn_build_lm(
    df: DataFrame,
    path: str,
    train_where: "str | None" = None,
    text: str = "text",
) -> None:
    """Materialize the Kneser-Ney training statistics as a stored LM
    artifact — the build/serve split every other scorer here has (BM25
    postings, decon n-grams, span/line/minhash indexes): train ONCE over
    the (possibly huge) target-domain corpus, then score any number of
    incoming batches against the frozen tables. Layout:
    ``{path}/cb`` = (w1, w2, c12); ``{path}/heads`` = (w1, cw, npost);
    ``{path}/pre`` = (w2, npre); ``{path}/types`` = one row (ntypes).
    All four derive from one pass over the training bigram stream
    (map-side combine), exactly like the inline trainer."""
    flag = F.expr(train_where) if train_where is not None else F.lit(True)

    def bg_of(toks: Column) -> Column:
        heads, tails = bigram_arrays(toks)
        return F.zip_with(
            heads, tails, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        )

    bg = fan_out(df.filter(flag)).select(
        "doc_id", F.explode(bind_once(tokens(F.col(text)), bg_of)).alias("_bg")
    ).select("_bg.w1", "_bg.w2")
    cb = persist_once(
        bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    )
    cb.write.mode("overwrite").parquet(f"{path}/cb")
    cb.groupBy("w1").agg(
        F.sum("c12").alias("cw"), F.count(F.lit(1)).alias("npost")
    ).write.mode("overwrite").parquet(f"{path}/heads")
    cb.groupBy("w2").agg(F.count(F.lit(1)).alias("npre")).write.mode(
        "overwrite"
    ).parquet(f"{path}/pre")
    cb.agg(F.count(F.lit(1)).alias("ntypes")).write.mode("overwrite").parquet(
        f"{path}/types"
    )
    cb.unpersist()


def kn_score_indexed(
    df: DataFrame, lm_path: str, text: str = "text"
) -> DataFrame:
    """Score a batch against a stored :func:`kn_build_lm` artifact —
    identical output to :func:`kn_bigram_score` under the same training
    slice (same ``KN_PPM_EXPR`` floor-div chain; test-pinned), but the
    training corpus is never re-scanned: the batch's bigram profile
    joins the frozen vocabulary-keyed stat tables. The incremental-
    curation shape: one LM build per target-domain refresh, per-shard
    scoring forever after."""
    spark = df.sparkSession

    def bg_of(toks: Column) -> Column:
        heads, tails = bigram_arrays(toks)
        return F.zip_with(
            heads, tails, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
        )

    bg = fan_out(df).select(
        "doc_id", F.explode(bind_once(tokens(F.col(text)), bg_of)).alias("_bg")
    ).select("doc_id", "_bg.w1", "_bg.w2")
    doc_bg = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    cb = spark.read.parquet(f"{lm_path}/cb")
    heads = spark.read.parquet(f"{lm_path}/heads")
    pre = spark.read.parquet(f"{lm_path}/pre")
    types = spark.read.parquet(f"{lm_path}/types")
    joined = (
        doc_bg.join(cb, on=["w1", "w2"], how="left")
        .join(heads, on="w1", how="left")
        .join(pre, on="w2", how="left")
        .crossJoin(F.broadcast(types))
        .select(
            "doc_id",
            "n",
            F.coalesce("c12", F.lit(0)).alias("c12"),
            F.coalesce("cw", F.lit(0)).alias("cw"),
            F.coalesce("npost", F.lit(0)).alias("npost"),
            F.coalesce("npre", F.lit(0)).alias("npre"),
            "ntypes",
        )
    )
    scored = joined.select(
        "doc_id", "n", F.col("c12").alias("_c12_raw"), F.expr(KN_PPM_EXPR).alias("_ppm")
    )
    return scored.groupBy("doc_id").agg(
        F.expr("sum(n * _ppm) div sum(n)").alias("kn_score_ppm"),
        F.sum("n").alias("n_bigrams"),
        F.expr(
            "(1000000 * sum(CASE WHEN _c12_raw = 0 THEN n ELSE 0 END)) div sum(n)"
        ).alias("oov_bigram_ppm"),
    )
